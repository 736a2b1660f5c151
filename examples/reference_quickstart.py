"""The reference README's quick-start, verbatim inputs, on this engine.

/root/reference/README.rst "Example" builds the anyOf demo schema,
evaluates JSON([12, "Monkeys"]) and prints result.output('basic'). A
switching user runs the SAME schema and instance here through the
per-row evaluator (the reference's execution shape — arbitrary JSON
documents) and gets the identical output('basic') structure; the
second half shows the engine's own execution shape: the same anyOf
constraint compiled as a COLUMN check and evaluated vectorized over an
Arrow batch.
"""
import json

import pyarrow as pa

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import compile_spec
from jschon_ray.vspec.output import create_output
from jschon_ray.vspec.row_oracle import RowEvaluator

demo_schema = {
    "$id": "https://example.com/demo",
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "array",
    "items": {
        "anyOf": [
            {
                "type": "string",
                "description": "Cool! We got a string here!",
            },
            {
                "type": "integer",
                "description": "Hey! We got an integer here!",
            },
        ]
    },
}

instance = [12, "Monkeys"]

# 1) the README flow, byte-compatible: per-row evaluator + output('basic')
root = RowEvaluator(SpecCatalog()).evaluate(demo_schema, instance)
basic = create_output(root, "basic")
print(json.dumps(basic, indent=2))
assert basic["valid"] is True

# 2) the engine's shape: the same anyOf as a column constraint over a
#    batch — one row per original array element, mixed across two rows
table = pa.table({
    "payload": pa.array(["Monkeys", None], pa.string()),
    "count": pa.array([None, 12], pa.int64()),
})
col_spec = {
    "$id": "https://example.com/demo-columns",
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "properties": {
        "payload": demo_schema["items"],
        "count": demo_schema["items"],
    },
}
cs = compile_spec(col_spec, table.schema)
out = cs.check_batch(table)
print("vectorized batch valid:", out["valid"].to_pylist())
assert out["valid"].to_pylist() == [True, True]
