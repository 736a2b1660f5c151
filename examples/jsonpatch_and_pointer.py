"""RFC 6902 JSON Patch (per-document and vectorized over a column batch)
and Relative JSON Pointer navigation.

Reference semantics: /root/reference/jschon/jsonpatch.py:230-331 and
jsonpointer.py:358-392.
"""
import json

import pyarrow as pa

from jschon_ray.vspec.patch import apply_patch, patch_batch
from jschon_ray.vspec.pointer import RelativeJSONPointer

doc = {"clip": {"codec": "wav", "tags": ["a", "b"]}}
ops = [
    {"op": "replace", "path": "/clip/codec", "value": "flac"},
    {"op": "add", "path": "/clip/tags/1", "value": "x"},
    {"op": "move", "from": "/clip/tags/0", "path": "/clip/tags/-"},
    {"op": "test", "path": "/clip/codec", "value": "flac"},
    {"op": "copy", "from": "/clip/codec", "path": "/clip/orig_codec"},
    {"op": "remove", "path": "/clip/tags/0"},
]
print(json.dumps(apply_patch(doc, ops), sort_keys=True))

batch = pa.table({"codec": ["wav", "amr"], "sr_hz": [16000, 8000]})
out = patch_batch(batch, [
    {"op": "replace", "path": "/codec", "value": "flac"},
    {"op": "add", "path": "/lang", "value": "en"},
    {"op": "remove", "path": "/sr_hz"},
])
print(out.to_pydict())

data = {"foo": ["bar", "baz"], "highly": {"nested": {"objects": True}}}
for start, ref in [("/foo/1", "0"), ("/foo/1", "1/0"), ("/foo/1", "0#"),
                   ("/foo/1", "2/highly/nested/objects"),
                   ("/highly/nested", "0/objects")]:
    print(start, ref, "->",
          json.dumps(RelativeJSONPointer(ref).evaluate(data, start)))
