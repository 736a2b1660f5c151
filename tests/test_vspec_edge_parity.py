"""Engine-parity edges pinned after the round-3 vspec review: JSON-null
list elements, anonymous-document refs, RE2-vs-re '$' semantics, the
2019-09 empty-items discard rule, RFC 6901 array tokens, and the
column-pruning allowlist."""

import numpy as np
import pyarrow as pa
import pytest

from jschon_ray.vspec.evaluator import _columns_used, compile_spec
from jschon_ray.vspec.pointer import evaluate as ptr_eval


def test_null_struct_elements_own_no_fields():
    t = pa.table({"xs": pa.array(
        [[{"a": 10}, None]],
        pa.list_(pa.struct([("a", pa.int64())])))})
    # properties must not reach into the Arrow garbage slot under a
    # JSON-null element
    cs = compile_spec({"properties": {"xs": {"items": {
        "type": ["object", "null"],
        "properties": {"a": {"minimum": 5}}}}}}, t.schema)
    assert cs.evaluate_table(t)[0].tolist() == [True]
    # object keywords are inapplicable to null instances
    for kw in ({"required": ["a"]}, {"minProperties": 1}):
        cs2 = compile_spec({"properties": {"xs": {"items": {
            "type": ["object", "null"], **kw}}}}, t.schema)
        assert cs2.evaluate_table(t)[0].tolist() == [True], kw


def test_anonymous_spec_internal_ref_resolves():
    t = pa.table({"a": pa.array([1, -2], pa.int64())})
    cs = compile_spec({"$defs": {"pos": {"minimum": 0}},
                       "properties": {"a": {"$ref": "#/$defs/pos"}}},
                      t.schema)
    assert cs.evaluate_table(t)[0].tolist() == [True, False]


def test_pattern_dollar_matches_before_trailing_newline():
    # Python re (the reference engine) lets '$' match before ONE
    # trailing newline; RE2 does not — the vectorized path must agree
    # with the reference
    t = pa.table({"s": pa.array(["abc\n", "abd\n", "abc", "abd"],
                                pa.string())})
    cs = compile_spec({"properties": {"s": {"pattern": "c$"}}}, t.schema)
    assert cs.evaluate_table(t)[0].tolist() == [True, False, True, False]


def test_2019_empty_items_discards_additional_items():
    spec = {"$schema": "https://json-schema.org/draft/2019-09/schema",
            "properties": {"xs": {"items": [], "additionalItems": False}}}
    t = pa.table({"xs": pa.array([[1, 2]], pa.list_(pa.int64()))})
    cs = compile_spec(spec, t.schema)
    assert cs.evaluate_table(t)[0].tolist() == [True]


def test_pointer_rejects_nonrfc_array_tokens():
    for tok in ("/-1", "/01", "/+1"):
        with pytest.raises((IndexError, ValueError, KeyError)):
            ptr_eval(tok, [10, 20, 30])
    assert ptr_eval("/0", [10, 20, 30]) == 10


def test_columns_used_conservative_on_dynamic_refs():
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    assert _columns_used({"$dynamicRef": "#thing"}, schema) == ["a", "b"]
    assert _columns_used({"$recursiveRef": "#"}, schema) == ["a", "b"]
    assert _columns_used({"x-plugin": 1, "properties": {"a": {}}},
                         schema) == ["a", "b"]
    assert _columns_used({"properties": {"a": {}}, "required": ["a"]},
                         schema) == ["a"]
