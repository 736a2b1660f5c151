"""Spec-driven repair kernels (functions/repair.py) — no Ray needed."""

import pyarrow as pa

from jschon_ray.functions.repair import compile_repair

SPEC = {
    "type": "object",
    "properties": {
        "price": {"type": "number", "minimum": 1.0, "maximum": 100.0,
                  "default": 1.0},
        "status": {"enum": ["A", "B"], "default": "A"},
        "note": {"type": "string", "maxLength": 4},
        "untouched": {"type": "integer"},     # no repair keywords
    },
}


def _run(rows):
    fn, cols = compile_repair(SPEC)
    assert cols == ["price", "status", "note"]
    t = pa.table({
        "price": pa.array([r[0] for r in rows], pa.float64()),
        "status": pa.array([r[1] for r in rows], pa.string()),
        "note": pa.array([r[2] for r in rows], pa.string()),
        "untouched": pa.array([r[3] for r in rows], pa.int64()),
    })
    return fn(t)


def test_repair_rules():
    out = _run([
        (50.0, "A", "ok", 7),        # valid -> unchanged
        (None, "B", "ok", 7),        # null price -> default 1.0
        (-5.0, "A", "ok", 7),        # below min -> clamp to 1.0
        (500.0, "A", "ok", 7),       # above max -> clamp to 100.0
        (50.0, "Z", "ok", 7),        # out of enum -> default 'A'
        (50.0, None, "ok", 7),       # null enum -> default 'A'
        (50.0, "A", "toolong", 7),   # -> 'tool'
        (50.0, "A", None, 7),        # null, no default -> stays null
    ])
    assert out["price"].to_pylist() == [50.0, 1.0, 1.0, 100.0,
                                        50.0, 50.0, 50.0, 50.0]
    assert out["status"].to_pylist() == ["A", "B", "A", "A",
                                        "A", "A", "A", "A"]
    assert out["note"].to_pylist() == ["ok", "ok", "ok", "ok",
                                       "ok", "ok", "tool", None]
    assert out["untouched"].to_pylist() == [7] * 8
    assert out["repaired"].to_pylist() == [False, True, True, True,
                                           True, True, True, False]


def test_repair_missing_column_is_noop():
    fn, _ = compile_repair(SPEC)
    t = pa.table({"other": pa.array([1, 2], pa.int64())})
    out = fn(t)
    assert out["repaired"].to_pylist() == [False, False]


def test_repair_null_without_default_survives_clamp():
    spec = {"properties": {"x": {"minimum": 0.0, "maximum": 10.0}}}
    fn, _ = compile_repair(spec)
    out = fn(pa.table({"x": pa.array([None, -1.0], pa.float64())}))
    assert out["x"].to_pylist() == [None, 0.0]
    assert out["repaired"].to_pylist() == [False, True]
