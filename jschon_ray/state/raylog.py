"""Targeted filter for one benign Ray Data executor warning.

Ray 2.49's streaming executor warns once per operator when a task emits a
RefBundle whose schema diverges from the previous bundle's. When a shuffle
partition is legitimately EMPTY (e.g. a dedup bucket with no duplicates),
the group-apply UDF is never invoked, the zero-yield task's output bundle
carries NO schema (``new schema: .`` / ``PandasBlockSchema(names=[])``),
and the warning fires even though every non-empty bundle is schema-stable
— our map_groups UDFs all pin typed Arrow empties (functions/dedup.py),
but Ray drops zero-yield task outputs before schema propagation, so the
fix cannot be made from the UDF side.

This filter drops EXACTLY that empty-new-schema variant; genuine schema
divergences (two non-empty schemas disagreeing) still log. The divergence
itself is harmless under the default ``enforce_schemas=False``: the next
non-empty bundle resets the operator schema (ray
streaming_executor_state.py:782-800).
"""

from __future__ import annotations

import logging
import re

_EMPTY_NEW_SCHEMA = re.compile(
    r"new schema: (\.|PandasBlockSchema\(names=\[\], types=\[\]\)\.)")


class _EmptyBundleSchemaFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        if record.levelno != logging.WARNING:
            return True
        msg = record.getMessage()
        if "produced a RefBundle with a different schema" not in msg:
            return True
        return not _EMPTY_NEW_SCHEMA.search(msg)


def quiet_empty_schema_warnings() -> None:
    """Install the empty-bundle schema-divergence filter (idempotent)."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptyBundleSchemaFilter)
               for f in logger.filters):
        logger.addFilter(_EmptyBundleSchemaFilter())
