"""Stats-based payload-check discharge (pipelines/validate.py):
exactness of the spec rewrite + every veto path."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jschon_ray.pipelines.specs import CLIP_SPEC, CLIP_SPEC_STRICT
from jschon_ray.pipelines.validate import (
    _discharge_col,
    _stats_dischargeable,
    discharge_payload_checks,
)
from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.row_oracle import RowEvaluator


def test_clip_specs_are_dischargeable():
    assert _stats_dischargeable(CLIP_SPEC, "bytes")
    assert _stats_dischargeable(CLIP_SPEC_STRICT, "bytes")


@pytest.mark.parametrize("spec", [
    {"minProperties": 2},
    {"propertyNames": {"maxLength": 10}},
    {"properties": {"bytes": {"minLength": 4}}},        # real content check
    {"patternProperties": {"^by": {"type": "binary"}}},  # regex sees col
    {"dependentRequired": {"bytes": ["transcript"]}},
    {"dependentRequired": {"codec": ["bytes"]}},
    {"dependentSchemas": {"bytes": {"required": ["codec"]}}},
    {"allOf": [{"not": {"properties": {"bytes": {"maxLength": 1}}}}]},
])
def test_vetoes(spec):
    assert not _stats_dischargeable(spec, "bytes")


@pytest.mark.parametrize("spec", [
    {"properties": {"bytes": {"type": "binary",
                              "contentMediaType": "audio/wav"}}},
    {"properties": {"bytes": True}, "required": ["bytes"]},
    {"not": {"required": ["bytes"]}},  # rewrite keeps equivalence
    {"if": {"required": ["bytes", "codec"]}, "then": {"required": ["codec"]}},
])
def test_allowed(spec):
    assert _stats_dischargeable(spec, "bytes")


def test_rewrite_equivalence_per_row():
    """For rows where bytes is a non-null binary value, the rewritten spec
    must produce the same verdict as the original (the discharge premise)."""
    rows = [
        {"clip_id": "clip-0011aabbccdd", "bytes": b"\x00\x01",
         "sr_hz": 16000, "dur_ms": 100, "codec": "wav", "transcript": "hi"},
        {"clip_id": "bad id", "bytes": b"x", "sr_hz": 7,
         "dur_ms": -1, "codec": "nope", "transcript": ""},
        {"bytes": b"x"},  # other required names still reported
    ]
    spec2 = _discharge_col(CLIP_SPEC, "bytes")
    assert "bytes" not in spec2["required"]
    assert "bytes" not in spec2["properties"]
    for row in rows:
        ev = RowEvaluator(SpecCatalog())
        full = ev.evaluate(CLIP_SPEC, dict(row))
        pruned_row = {k: v for k, v in row.items() if k != "bytes"}
        ev2 = RowEvaluator(SpecCatalog())
        part = ev2.evaluate(spec2, pruned_row)
        assert full.valid == part.valid, row


def _write(path, nulls: bool):
    vals = [b"ab", None if nulls else b"cd", b"ef"]
    pq.write_table(pa.table({
        "clip_id": ["a", "b", "c"],
        "bytes": pa.array(vals, pa.binary()),
    }), path)


def test_metadata_gate(tmp_path):
    clean = os.path.join(tmp_path, "clean.parquet")
    dirty = os.path.join(tmp_path, "dirty.parquet")
    _write(clean, nulls=False)
    _write(dirty, nulls=True)

    spec = {"required": ["clip_id", "bytes"],
            "properties": {"bytes": {"type": "binary"}}}
    s2, ok = discharge_payload_checks(spec, [clean], "bytes")
    assert ok and "bytes" not in s2["required"]

    s3, ok = discharge_payload_checks(spec, [clean, dirty], "bytes")
    assert not ok and s3 == spec  # one null row vetoes everything

    # column missing from the file -> veto
    other = os.path.join(tmp_path, "other.parquet")
    pq.write_table(pa.table({"clip_id": ["a"]}), other)
    _, ok = discharge_payload_checks(spec, [other], "bytes")
    assert not ok
