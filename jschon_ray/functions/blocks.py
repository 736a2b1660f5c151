"""Block-output hygiene for pandas-format UDFs.

A map_batches/map_groups UDF that returns a raw ``pd.DataFrame`` makes
Ray store a PANDAS block; when that block later feeds a shuffle or an
Arrow-format stage, Ray converts it with ``pa.Table.from_pandas``, which
attaches the ``b'pandas'`` schema-metadata blob. Metadata-carrying
``pa.Schema`` objects are unhashable, so every downstream reduce task
logs ``Failed to hash the schemas (for deduplication)`` (ray
transform_pyarrow.unify_schemas), and the blob ships with every block.

The conversion cannot be intercepted process-wide: closure UDFs are
cloudpickled BY VALUE, so the worker that runs them never imports
jschon_ray and never sees an import-time patch. The reliable place is
the UDF itself — ``arrow_out`` wraps a pandas UDF to emit a clean Arrow
block directly. For stages whose output feeds a shuffle this adds NO
work (Ray would convert the block for the exchange anyway); it just
moves the conversion to where we control the schema.
"""

from __future__ import annotations

import functools

import pandas as pd
import pyarrow as pa


def arrow_out(fn):
    """Wrap a pandas-returning UDF so its blocks are metadata-free
    Arrow tables. Pass the wrapped fn to map_batches/map_groups with
    ``batch_format="pandas"`` exactly as before."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        out = fn(*args, **kwargs)
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        if isinstance(out, pa.Table) and out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    return wrapper
