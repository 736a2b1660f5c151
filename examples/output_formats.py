"""The five output formats over one failing clip row.

Mirrors the reference's output-format examples (its ``Result.output``;
/root/reference/jschon/output.py:39-165) on our result tree.
"""
import json

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.output import create_output
from jschon_ray.vspec.row_oracle import RowEvaluator

spec = {
    "$id": "https://example.com/clip-lite",
    "type": "object",
    "required": ["clip_id", "codec"],
    "properties": {
        "clip_id": {"type": "string", "pattern": "^clip-[0-9a-f]{12}$"},
        "sr_hz": {"type": "integer", "minimum": 8000, "maximum": 48000},
        "codec": {"enum": ["pcm_s16le", "wav", "flac"]},
    },
}

row = {"clip_id": "CLIP-1", "sr_hz": 96000, "codec": "amr"}

root = RowEvaluator(SpecCatalog()).evaluate(spec, row)
for fmt in ("flag", "basic", "detailed", "verbose", "hierarchical"):
    print(f"== {fmt}")
    print(json.dumps(create_output(root, fmt), indent=2, sort_keys=False))
