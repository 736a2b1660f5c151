"""Spec inference (vspec/infer.py): profile a table, emit a spec the
engine compiles, and the bootstrap loop closes — the source data
validates clean against its own inferred contract while corrupted
deliveries fail."""

import numpy as np
import pyarrow as pa
import pytest

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import compile_spec
from jschon_ray.vspec.infer import infer_spec
from jschon_ray.vspec.metaschema import validate_spec


def _table():
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "score": pa.array([0.5, 1.5, 2.5, None, 3.5]),
        "status": ["new", "sent", "new", "done", None],
        "note": [f"free text {i}" * (i + 1) for i in range(5)],
    })


def test_infer_spec_shape(ray_session):
    import ray.data as rd

    spec = infer_spec(rd.from_arrow(_table()), enum_max=4)
    props = spec["properties"]
    assert props["id"] == {"type": "integer", "minimum": 1, "maximum": 5}
    assert props["score"]["type"] == "number"
    assert props["score"]["minimum"] == 0.5
    assert props["status"]["enum"] == ["done", "new", "sent"]
    assert "enum" not in props["note"]          # cardinality exceeded
    assert props["note"]["minLength"] >= 1
    assert spec["required"] == ["id", "note"]   # never-null columns only
    validate_spec(spec)                          # metaschema-clean


def test_inferred_spec_validates_source_clean(ray_session):
    import ray.data as rd

    t = _table()
    spec = infer_spec(rd.from_arrow(t))
    cs = compile_spec(spec, t.schema, catalog=SpecCatalog())
    valid, _ = cs.evaluate_table(t)
    assert all(valid)


def test_inferred_spec_flags_corrupted_delivery(ray_session):
    import ray.data as rd

    t = _table()
    spec = infer_spec(rd.from_arrow(t), enum_max=4)
    bad = pa.table({
        "id": pa.array([6, None], pa.int64()),       # out of range + null
        "score": pa.array([0.5, 99.0]),              # out of range
        "status": ["new", "unknown-status"],         # outside the enum
        "note": ["ok text", "x"],
    })
    cs = compile_spec(spec, bad.schema, catalog=SpecCatalog())
    valid, viols = cs.evaluate_table(bad)
    assert list(valid) == [False, False]
    locs = {v["keywordLocation"] for row in viols for v in row}
    assert "/properties/id/maximum" in locs
    assert "/properties/score/maximum" in locs
    assert "/properties/status/enum" in locs
    assert "/required" in locs                        # null id == absent


def test_widen_numeric_gives_headroom(ray_session):
    import ray.data as rd

    t = _table()
    spec = infer_spec(rd.from_arrow(t), widen_numeric=0.5)
    assert spec["properties"]["id"]["minimum"] == -1   # 1 - 0.5*4
    assert spec["properties"]["id"]["maximum"] == 7
    assert spec["properties"]["score"]["maximum"] == 5.0


def test_infer_on_real_testdata(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    spec = infer_spec(ds)
    validate_spec(spec)
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    cs = compile_spec(spec, t.schema, catalog=SpecCatalog())
    valid, _ = cs.evaluate_table(t)
    assert all(valid)  # inferred from the same data -> self-consistent
    # the contract is non-trivial: numeric bounds + enums were learned
    assert "minimum" in spec["properties"]["o_totalprice"]
    assert "enum" in spec["properties"]["o_orderpriority"]
