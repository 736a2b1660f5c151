"""Vectorized evaluator vs per-row oracle parity, per keyword.

Mirrors the reference's per-keyword oracle tests
(/root/reference/tests/test_validators.py) recast over Arrow tables: for each
spec × table, the vectorized verdicts and the full ordered violation lists
must equal the row oracle's output('basic') errors.
"""

import json

import numpy as np
import pyarrow as pa
import pytest

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import compile_spec, strip_absent
from jschon_ray.vspec.row_oracle import RowEvaluator, output_basic


def enc(v):
    return v if isinstance(v, str) else json.dumps(v, ensure_ascii=False)


def assert_parity(spec, table, formats=None):
    cs = compile_spec(spec, table.schema, formats=formats,
                      catalog=SpecCatalog())
    valid, viols = cs.evaluate_table(table)
    ev = RowEvaluator(SpecCatalog(), formats)
    for i, row in enumerate(table.to_pylist()):
        root = ev.evaluate(spec, strip_absent(row))
        assert root.valid == bool(valid[i]), \
            f"row {i}: vec={bool(valid[i])} oracle={root.valid} spec={spec}"
        if root.valid:
            assert viols[i] == [], f"row {i}: valid but has violations"
            continue
        oracle = [
            {**e, "error": enc(e["error"])}
            for e in output_basic(root)["errors"]
        ]
        got = viols[i]
        assert got == oracle, (
            f"row {i} violations mismatch\n got: {json.dumps(got, indent=1)}\n"
            f" exp: {json.dumps(oracle, indent=1)}"
        )
    return valid, viols


SPEC_ID = {"$id": "https://example.com/t"}


class TestScalarKeywords:
    def test_bounds_int(self):
        spec = {**SPEC_ID, "properties": {"x": {
            "minimum": 10, "maximum": 100, "exclusiveMinimum": 9,
            "exclusiveMaximum": 101}}}
        t = pa.table({"x": pa.array([5, 10, 50, 100, 101, None], pa.int64())})
        assert_parity(spec, t)

    def test_bounds_float(self):
        spec = {**SPEC_ID, "properties": {"x": {"minimum": 0.5,
                                                "exclusiveMaximum": 2.5}}}
        t = pa.table({"x": pa.array([0.4, 0.5, 2.49, 2.5, None])})
        assert_parity(spec, t)

    def test_type_integer_refinement(self):
        spec = {**SPEC_ID, "properties": {"x": {"type": "integer"}}}
        t = pa.table({"x": pa.array([1.0, 1.5, -3.0, None])})
        assert_parity(spec, t)

    def test_type_mismatch_static(self):
        spec = {**SPEC_ID, "properties": {"x": {"type": ["string", "null"]}}}
        t = pa.table({"x": pa.array([1, 2, None], pa.int32())})
        assert_parity(spec, t)

    def test_enum_string(self):
        spec = {**SPEC_ID, "properties": {"c": {"enum": ["a", "b", 3]}}}
        t = pa.table({"c": ["a", "b", "c", None]})
        assert_parity(spec, t)

    def test_enum_number_cross_type(self):
        spec = {**SPEC_ID, "properties": {"x": {"enum": [1, 2.5, "z", True]}}}
        t = pa.table({"x": pa.array([1.0, 2.5, 3.0, None])})
        assert_parity(spec, t)

    def test_const(self):
        spec = {**SPEC_ID, "properties": {"x": {"const": 5}}}
        t = pa.table({"x": pa.array([5, 5.0, 6, None], pa.float64())})
        assert_parity(spec, t)

    def test_const_bool_vs_number(self):
        spec = {**SPEC_ID, "properties": {"b": {"const": True}}}
        t = pa.table({"b": pa.array([True, False, None])})
        assert_parity(spec, t)

    def test_multiple_of_int(self):
        spec = {**SPEC_ID, "properties": {"x": {"multipleOf": 50}}}
        t = pa.table({"x": pa.array([100, 125, 0, -150, None], pa.int64())})
        assert_parity(spec, t)

    def test_multiple_of_decimal_semantics(self):
        # 0.3 % 0.1 is nonzero in binary floats but zero in Decimal —
        # exactness parity with validation.py:66-75
        spec = {**SPEC_ID, "properties": {"x": {"multipleOf": 0.1}}}
        t = pa.table({"x": pa.array([0.3, 0.25, 1.0, None])})
        assert_parity(spec, t)

    def test_multiple_of_int_col_float_divisor(self):
        spec = {**SPEC_ID, "properties": {"x": {"multipleOf": 0.5}}}
        t = pa.table({"x": pa.array([1, 2, 3, None], pa.int64())})
        assert_parity(spec, t)

    def test_lengths(self):
        spec = {**SPEC_ID, "properties": {"s": {"minLength": 2,
                                                "maxLength": 4}}}
        t = pa.table({"s": ["", "ab", "abcd", "abcde", "日本語テキスト", None]})
        assert_parity(spec, t)

    def test_pattern(self):
        spec = {**SPEC_ID, "properties": {"s": {"pattern": "^a+b$"}}}
        t = pa.table({"s": ["ab", "aab", "ba", "xaby", "", None]})
        assert_parity(spec, t)

    def test_pattern_unanchored_search(self):
        spec = {**SPEC_ID, "properties": {"s": {"pattern": "b+c"}}}
        t = pa.table({"s": ["abcd", "xyz", "bc", None]})
        assert_parity(spec, t)

    def test_pattern_lookahead_python_path(self):
        spec = {**SPEC_ID, "properties": {"s": {"pattern": "a(?=b)"}}}
        t = pa.table({"s": ["ab", "ac", None]})
        assert_parity(spec, t)


class TestObjectKeywords:
    def test_required(self):
        spec = {**SPEC_ID, "required": ["a", "b", "zzz"]}
        t = pa.table({"a": [1, None, 1], "b": ["x", "y", None]})
        assert_parity(spec, t)

    def test_dependent_required(self):
        spec = {**SPEC_ID, "dependentRequired": {"a": ["b", "c"]}}
        t = pa.table({"a": [1, None, 1], "b": ["x", "y", None],
                      "c": [1.0, None, None]})
        assert_parity(spec, t)

    def test_min_max_properties(self):
        spec = {**SPEC_ID, "minProperties": 2, "maxProperties": 2}
        t = pa.table({"a": [1, None, 1], "b": ["x", None, "z"],
                      "c": [None, None, 2.0]})
        assert_parity(spec, t)

    def test_properties_and_required_order(self):
        spec = {**SPEC_ID,
                "type": "object",
                "required": ["a"],
                "properties": {"a": {"type": "integer", "minimum": 0},
                               "b": {"type": "string"}}}
        t = pa.table({"a": pa.array([1, -5, None], pa.int64()),
                      "b": ["x", "y", "z"]})
        assert_parity(spec, t)

    def test_pattern_properties(self):
        spec = {**SPEC_ID, "patternProperties": {"^a": {"type": "integer"},
                                                 "b$": {"minLength": 2}}}
        t = pa.table({"ab": pa.array([1.5, 2.0, None]),
                      "cb": ["x", "xy", None],
                      "zz": [1, 2, 3]})
        assert_parity(spec, t)

    def test_additional_properties(self):
        spec = {**SPEC_ID, "properties": {"a": {"type": "integer"}},
                "additionalProperties": {"type": "string"}}
        t = pa.table({"a": pa.array([1, 2, None], pa.int64()),
                      "b": ["x", "y", None],
                      "c": pa.array([1, None, 2], pa.int64())})
        assert_parity(spec, t)

    def test_additional_properties_false(self):
        spec = {**SPEC_ID, "properties": {"a": {}},
                "additionalProperties": False}
        t = pa.table({"a": [1, None], "extra": ["x", None]})
        assert_parity(spec, t)

    def test_property_names(self):
        spec = {**SPEC_ID, "propertyNames": {"pattern": "^[ab]$"}}
        t = pa.table({"a": [1, None], "zz": ["x", None]})
        assert_parity(spec, t)

    def test_dependent_schemas(self):
        spec = {**SPEC_ID, "dependentSchemas": {
            "a": {"required": ["b"]},
            "b": {"properties": {"c": {"minimum": 10}}}}}
        t = pa.table({"a": [1, None, 1], "b": [None, "y", "z"],
                      "c": pa.array([5, 20, None], pa.int64())})
        assert_parity(spec, t)


class TestCombinators:
    def test_all_any_one(self):
        for comb in ("allOf", "anyOf", "oneOf"):
            spec = {**SPEC_ID, comb: [
                {"properties": {"x": {"minimum": 10}}},
                {"properties": {"x": {"maximum": 20}}},
            ]}
            t = pa.table({"x": pa.array([5, 15, 25, None], pa.int64())})
            assert_parity(spec, t)

    def test_not(self):
        spec = {**SPEC_ID, "not": {"properties": {"x": {"minimum": 10}}}}
        t = pa.table({"x": pa.array([5, 15, None], pa.int64())})
        assert_parity(spec, t)

    def test_if_then_else(self):
        spec = {**SPEC_ID,
                "if": {"properties": {"c": {"const": "a"}}, "required": ["c"]},
                "then": {"properties": {"x": {"minimum": 10}}},
                "else": {"properties": {"x": {"maximum": 5}}}}
        t = pa.table({"c": ["a", "a", "b", "b", None],
                      "x": pa.array([15, 5, 3, 9, 100], pa.int64())})
        assert_parity(spec, t)

    def test_then_without_if_discarded(self):
        spec = {**SPEC_ID, "then": {"properties": {"x": {"minimum": 10}}}}
        t = pa.table({"x": pa.array([1], pa.int64())})
        assert_parity(spec, t)

    def test_nested_combinators(self):
        spec = {**SPEC_ID, "anyOf": [
            {"allOf": [{"properties": {"x": {"minimum": 0}}},
                       {"properties": {"x": {"multipleOf": 2}}}]},
            {"not": {"properties": {"y": {"const": "bad"}}}},
        ]}
        t = pa.table({"x": pa.array([-2, 3, 4, None], pa.int64()),
                      "y": ["bad", "bad", "ok", "bad"]})
        assert_parity(spec, t)


class TestArrayKeywords:
    def table(self):
        return pa.table({"xs": pa.array(
            [[1, 2, 3], [], [5, 5], None, [100], [1, 2, 2, 50]],
            pa.list_(pa.int64()))})

    def test_min_max_items(self):
        spec = {**SPEC_ID, "properties": {"xs": {"minItems": 1,
                                                 "maxItems": 3}}}
        assert_parity(spec, self.table())

    def test_unique_items(self):
        spec = {**SPEC_ID, "properties": {"xs": {"uniqueItems": True}}}
        assert_parity(spec, self.table())

    def test_items(self):
        spec = {**SPEC_ID, "properties": {"xs": {
            "items": {"type": "integer", "maximum": 10}}}}
        assert_parity(spec, self.table())

    def test_prefix_items_and_items(self):
        spec = {**SPEC_ID, "properties": {"xs": {
            "prefixItems": [{"maximum": 1}, {"maximum": 2}],
            "items": {"maximum": 10}}}}
        assert_parity(spec, self.table())

    def test_contains_min_max(self):
        spec = {**SPEC_ID, "properties": {"xs": {
            "contains": {"minimum": 2},
            "minContains": 1, "maxContains": 2}}}
        assert_parity(spec, self.table())

    def test_min_contains_zero_retro_pass(self):
        spec = {**SPEC_ID, "properties": {"xs": {
            "contains": {"minimum": 1000}, "minContains": 0}}}
        assert_parity(spec, self.table())

    def test_null_elements(self):
        spec = {**SPEC_ID, "properties": {"xs": {
            "items": {"type": ["integer", "null"]}}}}
        t = pa.table({"xs": pa.array([[1, None], [None], [2]],
                                     pa.list_(pa.int64()))})
        assert_parity(spec, t)

    def test_string_list(self):
        spec = {**SPEC_ID, "properties": {"tags": {
            "items": {"pattern": "^t"}, "uniqueItems": True}}}
        t = pa.table({"tags": pa.array([["ta", "tb"], ["xa"], ["ta", "ta"]],
                                       pa.list_(pa.string()))})
        assert_parity(spec, t)


class TestStructAndRefs:
    def test_struct_column(self):
        spec = {**SPEC_ID, "properties": {"meta": {
            "type": "object",
            "required": ["lang"],
            "properties": {"lang": {"enum": ["en", "fr"]},
                           "score": {"minimum": 0}}}}}
        t = pa.table({"meta": pa.array(
            [{"lang": "en", "score": 1.0},
             {"lang": "xx", "score": -1.0},
             {"lang": None, "score": 2.0},
             None],
            pa.struct([("lang", pa.string()), ("score", pa.float64())]))})
        assert_parity(spec, t)

    def test_ref_defs(self):
        spec = {**SPEC_ID,
                "$defs": {"pos": {"type": "integer", "exclusiveMinimum": 0}},
                "properties": {"x": {"$ref": "#/$defs/pos"}}}
        t = pa.table({"x": pa.array([1, 0, -1, None], pa.int64())})
        assert_parity(spec, t)

    def test_ref_anchor(self):
        spec = {**SPEC_ID,
                "$defs": {"named": {"$anchor": "pos", "minimum": 0}},
                "properties": {"x": {"$ref": "#pos"}}}
        t = pa.table({"x": pa.array([1, -1], pa.int64())})
        assert_parity(spec, t)

    def test_boolean_subschemas(self):
        spec = {**SPEC_ID, "properties": {"a": True, "b": False}}
        t = pa.table({"a": [1, None], "b": ["x", None]})
        assert_parity(spec, t)

    def test_fallback_unevaluated(self):
        # unevaluatedProperties routes the whole (sub)schema through the
        # per-row fallback; verdicts must still match the oracle.
        spec = {**SPEC_ID, "properties": {"a": {"type": "integer"}},
                "unevaluatedProperties": False}
        t = pa.table({"a": pa.array([1, None], pa.int64()),
                      "b": ["x", None]})
        assert_parity(spec, t)


class TestFormats:
    def test_format_assertion(self):
        def check_even_len(v):
            if len(v) % 2:
                raise ValueError(f"odd length {len(v)}")
        formats = {"even": (check_even_len, ("string",))}
        spec = {**SPEC_ID, "properties": {"s": {"format": "even"}}}
        t = pa.table({"s": ["ab", "abc", None]})
        assert_parity(spec, t, formats=formats)

    def test_format_not_enabled_annotates_only(self):
        spec = {**SPEC_ID, "properties": {"s": {"format": "whatever"}}}
        t = pa.table({"s": ["ab", None]})
        valid, _ = assert_parity(spec, t)
        assert valid.all()


class TestWholeBatch:
    def test_check_batch_shape(self):
        spec = {**SPEC_ID, "properties": {"x": {"minimum": 0}}}
        t = pa.table({"x": pa.array([1, -1], pa.int64())})
        cs = compile_spec(spec, t.schema)
        out = cs.check_batch(t)
        assert out.column_names == ["x", "valid", "violations"]
        assert out["valid"].to_pylist() == [True, False]
        v = out["violations"].to_pylist()
        assert v[0] == [] and len(v[1]) == 2  # /properties + leaf

    def test_columns_used_pruning(self):
        spec = {**SPEC_ID, "properties": {"x": {"minimum": 0}},
                "required": ["y"]}
        t = pa.table({"x": [1], "y": [2], "z": [3]})
        cs = compile_spec(spec, t.schema)
        assert cs.columns_used == ["x", "y"]
