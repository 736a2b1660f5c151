"""Canonical validation specs for the audio clips table.

The flagship constraint suite mirrors the per-row analogue measured in
BASELINE.md (type/required/pattern/enum/bounds/lengths over the input_hint
columns), expressed in the jschon-2020-12 dialect vspec compiles.
"""

from ..sources.clips import CODECS

CLIP_SPEC_ID = "https://jschon-ray.dev/specs/clip"

CLIP_SPEC = {
    "$id": CLIP_SPEC_ID,
    "type": "object",
    "required": ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"],
    "properties": {
        "clip_id": {"type": "string",
                    "pattern": "^clip-[0-9a-f]{12}$"},
        "bytes": {"type": "binary"},
        "sr_hz": {"type": "integer", "minimum": 8000, "maximum": 48000,
                  "multipleOf": 25},
        "dur_ms": {"type": "integer", "exclusiveMinimum": 0,
                   "maximum": 600000},
        "codec": {"enum": CODECS},
        "transcript": {"type": "string", "minLength": 1, "maxLength": 1024},
    },
}

# conditional rule exercising if/then combinators at dataset scale:
# lossless codecs must carry a transcript
CLIP_SPEC_STRICT = {
    **CLIP_SPEC,
    "$id": CLIP_SPEC_ID + "-strict",
    "if": {"properties": {"codec": {"enum": ["pcm_s16le", "wav", "flac"]}},
           "required": ["codec"]},
    "then": {"required": ["transcript"]},
}
