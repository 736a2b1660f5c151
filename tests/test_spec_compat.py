"""Spec evolution compatibility (vspec/compat.py).

The contract: a report with no breaking/unknown rows GUARANTEES every
old-valid row stays valid under the new spec — checked property-style
against the row oracle on generated instances."""

import numpy as np
import pytest

from jschon_ray.vspec.compat import (BREAKING, COMPATIBLE, UNKNOWN,
                                     spec_compat)
from jschon_ray.vspec.row_oracle import RowEvaluator


def _spec(props, required=()):
    return {"type": "object", "properties": props,
            "required": list(required)}


def test_widenings_are_compatible():
    old = _spec({"a": {"type": "integer", "minimum": 5, "maximum": 10},
                 "b": {"enum": ["x", "y"]},
                 "c": {"type": "string", "maxLength": 4}},
                required=["a", "b"])
    new = _spec({"a": {"type": "number", "minimum": 0, "maximum": 20},
                 "b": {"enum": ["x", "y", "z"]},
                 "c": {"type": "string", "maxLength": 9}},
                required=["a"])
    verdict, changes = spec_compat(old, new)
    assert verdict == COMPATIBLE
    assert all(e == COMPATIBLE for *_, e in changes)
    assert len(changes) >= 6


@pytest.mark.parametrize("old_kw,new_kw", [
    ({"minimum": 0}, {"minimum": 1}),                 # raised lower bound
    ({"maximum": 10}, {"maximum": 9}),                # lowered upper
    ({}, {"maximum": 9}),                             # new bound
    ({"type": "number"}, {"type": "integer"}),        # narrowed type
    ({"enum": ["x", "y"]}, {"enum": ["x"]}),          # shrunk enum
    ({}, {"enum": ["x"]}),                            # new enum
    ({"maxLength": 5}, {"maxLength": 3}),
    ({"multipleOf": 4}, {"multipleOf": 3}),           # 4 not mult of 3
])
def test_narrowings_are_breaking(old_kw, new_kw):
    verdict, changes = spec_compat(_spec({"a": old_kw}),
                                   _spec({"a": new_kw}))
    assert verdict == BREAKING, changes


def test_integer_to_number_widens_and_multiple_divides():
    v, _ = spec_compat(_spec({"a": {"type": "integer"}}),
                       _spec({"a": {"type": "number"}}))
    assert v == COMPATIBLE
    v, _ = spec_compat(_spec({"a": {"multipleOf": 6}}),
                       _spec({"a": {"multipleOf": 3}}))
    assert v == COMPATIBLE                 # every mult of 6 is mult of 3


def test_new_required_breaks_pattern_unknown():
    v, ch = spec_compat(_spec({"a": {}}, required=[]),
                        _spec({"a": {}}, required=["a"]))
    assert v == BREAKING
    v, ch = spec_compat(_spec({"a": {"pattern": "^x"}}),
                        _spec({"a": {"pattern": "^y"}}))
    assert v == UNKNOWN


def test_compatible_report_implies_no_new_invalids():
    """Property-style: generate instances; whenever the report says
    COMPATIBLE, every old-valid instance must be new-valid."""
    rng = np.random.default_rng(11)
    ev = RowEvaluator()
    pairs = [
        (_spec({"n": {"type": "integer", "minimum": 0, "maximum": 50},
                "s": {"enum": ["a", "b"]}}, required=["n"]),
         _spec({"n": {"type": "number", "minimum": -5, "maximum": 99},
                "s": {"enum": ["a", "b", "c"]}})),
        (_spec({"t": {"type": "string", "minLength": 2, "maxLength": 6}}),
         _spec({"t": {"type": "string", "minLength": 1, "maxLength": 8}})),
        (_spec({"m": {"multipleOf": 10}}),
         _spec({"m": {"multipleOf": 5}})),
    ]
    checked = 0
    for old, new in pairs:
        verdict, _ = spec_compat(old, new)
        assert verdict == COMPATIBLE
        for _ in range(120):
            inst = {}
            if rng.random() < 0.9:
                inst["n"] = int(rng.integers(-10, 60))
            if rng.random() < 0.7:
                inst["s"] = str(rng.choice(["a", "b", "c", "zzz"]))
            if rng.random() < 0.7:
                inst["t"] = "x" * int(rng.integers(0, 9))
            if rng.random() < 0.7:
                inst["m"] = int(rng.integers(0, 40))
            if ev.evaluate(dict(old), inst).valid:
                assert ev.evaluate(dict(new), inst).valid, (old, new, inst)
                checked += 1
    assert checked > 50
