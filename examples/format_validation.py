"""Opt-in format assertion (/root/reference/jschon/vocabulary/format.py:
14-32, examples/format_validation.py): formats annotate by default and
assert only when enabled.
"""
import pyarrow as pa

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import compile_spec
from jschon_ray.vspec.formats import enabled_formats, format_validator


@format_validator("ipv4")
def validate_ipv4(value: str) -> None:
    parts = value.split(".")
    if len(parts) != 4 or not all(p.isdigit() and 0 <= int(p) <= 255
                                  for p in parts):
        raise ValueError(f"{value!r} is not an IPv4 address")


table = pa.table({"host": ["10.0.0.1", "999.1.2.3", "not-an-ip", None]})
spec = {"$id": "https://example.com/fmt",
        "properties": {"host": {"format": "ipv4"}}}

# annotation-only (formats not enabled): everything passes
cs = compile_spec(spec, table.schema, catalog=SpecCatalog())
valid, _ = cs.evaluate_table(table)
print("annotate-only:", [bool(v) for v in valid])

# assertion-enabled
cs = compile_spec(spec, table.schema, catalog=SpecCatalog(),
                  formats=enabled_formats("ipv4"))
valid, viols = cs.evaluate_table(table)
for i in range(table.num_rows):
    print(table["host"][i].as_py(), bool(valid[i]),
          [v["error"] for v in viols[i]])
