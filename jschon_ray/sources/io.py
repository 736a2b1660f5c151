"""TableIO seam: parquet now, Lance-ready.

The north rule targets Lance tables; this sandbox has no ``lance`` package
and the driver testdata is parquet (TESTDATA.md), so reads/writes go through
this thin seam: swap in ``ray.data.read_lance`` / ``write_lance`` where Lance
is installed without touching pipeline code.

Scale notes: always pass ``columns=`` so only needed columns leave storage;
readers return a streaming Dataset (never materialized here).
"""

from __future__ import annotations

import glob
import os

try:
    import lance  # noqa: F401
    HAVE_LANCE = False  # flip to True when read_lance is wired + tested
except ImportError:
    HAVE_LANCE = False


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_files(path) -> list:
    """Concrete parquet file paths behind a table path (file or dir)."""
    if isinstance(path, str) and os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path] if isinstance(path, str) else list(path)


def read_table(path, *, columns=None, filter=None, override_num_blocks=None):
    """Read a table (file, directory of parts, or list of paths) as a
    streaming ray.data.Dataset with column pruning + predicate pushdown."""
    import ray.data as rd

    if isinstance(path, str) and os.path.isdir(path):
        path = sorted(glob.glob(os.path.join(path, "*.parquet")))
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if filter is not None:
        kwargs["filter"] = filter
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, **kwargs)


def write_table(ds, path: str, **kwargs):
    """Write a Dataset as a directory of parquet part files (resumable
    layout: one directory per logical partition, never one giant file)."""
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path, **kwargs)
    return path
