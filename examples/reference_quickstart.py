"""The reference README's quick-start, verbatim inputs, on this engine.

/root/reference/README.rst "Example" builds the anyOf demo schema,
evaluates JSON([12, "Monkeys"]) and prints result.output('basic'). A
switching user runs the SAME schema and instance here — first through
the per-row evaluator (the reference's execution shape), then through
the vectorized Arrow engine over a one-column table (this engine's
execution shape) — and gets the same annotations.
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

# per-row path (the reference's own README flow)
root = RowEvaluator(SpecCatalog()).evaluate(demo_schema, instance)
basic = create_output(root, "basic")
print(json.dumps(basic, indent=2))

# vectorized path: the same document as one row of a JSON-typed column
table = pa.table({"doc": pa.array([json.dumps(instance)], pa.string())})
cs = compile_spec(
    {"$id": "https://example.com/demo-col",
     "$schema": "https://json-schema.org/draft/2020-12/schema",
     "type": "object",
     "properties": {"doc": demo_schema["items"]}},
    table.schema)
print("vectorized column path: schema compiles ->",
      type(cs).__name__)
print("row oracle valid:", basic["valid"])
