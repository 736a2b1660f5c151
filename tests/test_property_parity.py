"""Property-based parity: random tables x random specs, vectorized engine
vs the per-row oracle (SURVEY.md §5 layer 2 — the reference's Hypothesis
strategy recast for batches; the oracle itself is pinned to the reference
by tests/test_reference_parity.py).

NaN/Infinity are excluded from generation — the reference rejects them at
parse time (/root/reference/jschon/utils.py:66-70).
"""

import json

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import compile_spec, strip_absent
from jschon_ray.vspec.row_oracle import RowEvaluator, output_basic

# -- value strategies (no NaN/inf; unicode incl. astral + combining) -------
ints = st.one_of(st.none(), st.integers(-100, 100))
floats = st.one_of(st.none(), st.floats(-100, 100, allow_nan=False,
                                        allow_infinity=False, width=64))
texts = st.one_of(st.none(), st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=8))
int_lists = st.one_of(st.none(), st.lists(ints, max_size=4))
structs = st.one_of(st.none(), st.fixed_dictionaries(
    {"lang": texts, "n": floats}))


@st.composite
def tables(draw):
    n = draw(st.integers(1, 6))
    return pa.table({
        "a": pa.array(draw(st.lists(ints, min_size=n, max_size=n)),
                      pa.int64()),
        "f": pa.array(draw(st.lists(floats, min_size=n, max_size=n)),
                      pa.float64()),
        "s": pa.array(draw(st.lists(texts, min_size=n, max_size=n)),
                      pa.string()),
        "xs": pa.array(draw(st.lists(int_lists, min_size=n, max_size=n)),
                       pa.list_(pa.int64())),
        "m": pa.array(draw(st.lists(structs, min_size=n, max_size=n)),
                      pa.struct([("lang", pa.string()),
                                 ("n", pa.float64())])),
    })


# -- spec grammar ----------------------------------------------------------
num_checks = st.fixed_dictionaries({}, optional={
    "type": st.sampled_from(["integer", "number", ["integer", "null"]]),
    "minimum": st.integers(-50, 50),
    "maximum": st.integers(-50, 50),
    "exclusiveMinimum": st.integers(-50, 50),
    "multipleOf": st.sampled_from([2, 5, 0.5, 0.1]),
    "enum": st.lists(st.one_of(st.integers(-5, 5),
                               st.sampled_from([0.5, "x", True, None])),
                     min_size=1, max_size=4),
})
str_checks = st.fixed_dictionaries({}, optional={
    "type": st.just("string"),
    "minLength": st.integers(0, 4),
    "maxLength": st.integers(0, 6),
    "pattern": st.sampled_from(["^a", "[0-9]", "^[^b]*$", "å", "."]),
    "const": st.sampled_from(["", "a", "åß"]),
})
list_checks = st.fixed_dictionaries({}, optional={
    "minItems": st.integers(0, 3),
    "maxItems": st.integers(0, 4),
    "uniqueItems": st.booleans(),
    "items": num_checks,
    "prefixItems": st.lists(num_checks, min_size=1, max_size=2),
    "contains": st.fixed_dictionaries({"minimum": st.integers(-5, 5)}),
    "minContains": st.integers(0, 2),
    "maxContains": st.integers(0, 3),
    "unevaluatedItems": st.one_of(st.booleans(), num_checks),
})
struct_checks = st.fixed_dictionaries({}, optional={
    "type": st.just("object"),
    "required": st.lists(st.sampled_from(["lang", "n"]), max_size=2,
                         unique=True),
    "properties": st.fixed_dictionaries({}, optional={
        "lang": str_checks, "n": num_checks}),
})

col_specs = st.fixed_dictionaries({}, optional={
    "a": num_checks, "f": num_checks, "s": str_checks,
    "xs": list_checks, "m": struct_checks,
})


@st.composite
def specs(draw):
    body = {"properties": draw(col_specs)}
    req = draw(st.lists(st.sampled_from(["a", "f", "s", "xs", "m", "zz"]),
                        max_size=3, unique=True))
    if req:
        body["required"] = req
    unev = draw(st.sampled_from([None, False,
                                 {"type": ["integer", "string"]}]))
    if unev is not None:
        body["unevaluatedProperties"] = unev
    wrap = draw(st.sampled_from(["none", "allOf", "anyOf", "not", "ifthen"]))
    if wrap == "allOf":
        body = {"allOf": [body, {"required": draw(
            st.lists(st.sampled_from(["a", "s"]), max_size=1))}]}
    elif wrap == "anyOf":
        body = {"anyOf": [body, {"required": ["zz"]}]}
    elif wrap == "not":
        body = {"not": body}
    elif wrap == "ifthen":
        body = {"if": {"required": ["a"]}, "then": body,
                "else": {"required": ["s"]}}
    return body


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(table=tables(), spec_body=specs(), uid=st.integers(0, 10**6))
def test_vectorized_matches_row_oracle(table, spec_body, uid):
    spec = {"$id": f"https://example.com/prop-{uid}", **spec_body}
    cs = compile_spec(spec, table.schema, catalog=SpecCatalog())
    vec_valid, vec_viols = cs.evaluate_table(table)
    ev = RowEvaluator(SpecCatalog())
    for i, raw in enumerate(table.to_pylist()):
        row = strip_absent(raw)
        ours = output_basic(ev.evaluate(spec, row))
        assert bool(vec_valid[i]) == ours["valid"], \
            f"row {i} {row!r} spec {json.dumps(spec_body)}"
        if not ours["valid"]:
            exp = [{**e, "error": e["error"] if isinstance(e["error"], str)
                    else json.dumps(e["error"], ensure_ascii=False)}
                   for e in ours["errors"]]
            assert vec_viols[i] == exp, (
                f"row {i} {row!r}\nspec {json.dumps(spec_body)}\n"
                f"got {json.dumps(vec_viols[i], indent=1)}\n"
                f"exp {json.dumps(exp, indent=1)}")
