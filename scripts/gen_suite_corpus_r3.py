"""Generate round-3 conformance-corpus files (suite-style triples).

Authors deterministic (schema, instance, valid) matrices in the official
JSON-Schema-Test-Suite file format and writes them under
tests/suite_corpus/. Every generated triple's truth value is computed by
an INDEPENDENT straight-from-the-spec rule implemented here, then
cross-checked at generation time against the actual reference evaluator
(/root/reference via tests/ref_oracle.py) — any disagreement aborts the
run, so nothing unverified lands in the corpus.

Usage: PYTHONPATH=/root/repo python scripts/gen_suite_corpus_r3.py

Re-running is idempotent (fixed rosters, no randomness).
"""
from __future__ import annotations

import json
import pathlib
import re
import sys
from decimal import Decimal

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tests"))

CORPUS = ROOT / "tests" / "suite_corpus"


# ---------------------------------------------------------------------------
# independent truth rules (JSON Schema 2020-12 / 2019-09 core+validation)

def is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def type_ok(t, v):
    if t == "null":
        return v is None
    if t == "boolean":
        return isinstance(v, bool)
    if t == "object":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, list)
    if t == "string":
        return isinstance(v, str)
    if t == "number":
        return is_num(v)
    if t == "integer":
        return is_num(v) and (isinstance(v, int) or v == int(v))
    raise ValueError(t)


def jeq(a, b):
    """JSON equality: booleans distinct from numbers, 1 == 1.0."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if is_num(a) and is_num(b):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(jeq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(jeq(a[k], b[k]) for k in a)
    return False


def dsc(v):
    return json.dumps(v, ensure_ascii=False)


# instance roster reused across families
VALS = [None, True, False, 0, 1, -2, 3.5, 1.0, "", "foo", "café",
        [], [1, 2], {}, {"a": 1}]


def matrix_case(description, schema, insts, truth):
    return {
        "description": description,
        "schema": schema,
        "tests": [{"description": f"instance {dsc(v)}",
                   "data": v, "valid": bool(truth(v))} for v in insts],
    }


# ---------------------------------------------------------------------------
# families

def fam_type_matrix():
    cases = []
    for t in ("null", "boolean", "object", "array", "number", "string",
              "integer"):
        cases.append(matrix_case(
            f"type {t} across the value roster", {"type": t}, VALS,
            lambda v, t=t: type_ok(t, v)))
    for ts in (["integer", "string"], ["null", "object"],
               ["boolean", "array"], ["number", "null"]):
        cases.append(matrix_case(
            f"type union {ts}", {"type": ts}, VALS,
            lambda v, ts=tuple(ts): any(type_ok(t, v) for t in ts)))
    return "generated_type_matrix.json", cases


def fam_numeric_bounds():
    cases = []
    insts = [2, 3, 4, 2.5, 3.0, 3.5, -3, 0, "3", True, [3]]
    rules = {
        "maximum": lambda v, m: v <= m,
        "exclusiveMaximum": lambda v, m: v < m,
        "minimum": lambda v, m: v >= m,
        "exclusiveMinimum": lambda v, m: v > m,
    }
    for kw, rule in rules.items():
        for bound in (3, 3.0, -2.5, 0):
            cases.append(matrix_case(
                f"{kw} {dsc(bound)}", {kw: bound}, insts,
                lambda v, r=rule, m=bound: (not is_num(v)) or r(v, m)))
    for mult in (2, 1.5, 0.01):
        cases.append(matrix_case(
            f"multipleOf {dsc(mult)} (exact decimal semantics)",
            {"multipleOf": mult},
            [0, 4, 4.5, 6, 7, 0.02, 0.03, 1.01, 0.005, "x", True],
            lambda v, m=mult: (not is_num(v)) or
            (Decimal(str(v)) % Decimal(str(m))) == 0))
    return "generated_numeric_bounds.json", cases


def fam_string_bounds():
    insts = ["", "a", "ab", "abcde", "abcdef", "café", "cafés",
             "\U0001d11ex", 12, None, ["ab"]]
    cases = []
    for kw, rule in (("maxLength", lambda v, n: len(v) <= n),
                     ("minLength", lambda v, n: len(v) >= n)):
        for n in (0, 1, 2, 5):
            cases.append(matrix_case(
                f"{kw} {n} (code-point counting)", {kw: n}, insts,
                lambda v, r=rule, n=n: (not isinstance(v, str)) or r(v, n)))
    for pat in ("^a", "a+$", "^$", "[0-9]{2}", "a.c"):
        cases.append(matrix_case(
            f"pattern {dsc(pat)} is unanchored", {"pattern": pat},
            ["", "a", "abc", "xa", "xyza", "12", "x12y", "abcx",
             "aXc", 5, None],
            lambda v, p=pat: (not isinstance(v, str))
            or re.search(p, v) is not None))
    return "generated_string_bounds.json", cases


def fam_array_bounds():
    arrays = [[], [1], [1, 2], [1, 2, 3], [1, 2, 3, 4], "notarray", 3]
    cases = []
    for kw, rule in (("maxItems", lambda v, n: len(v) <= n),
                     ("minItems", lambda v, n: len(v) >= n)):
        for n in (0, 1, 3):
            cases.append(matrix_case(
                f"{kw} {n}", {kw: n}, arrays,
                lambda v, r=rule, n=n: (not isinstance(v, list))
                or r(v, n)))
    uniq = [[1, 2], [1, 1], [1, 1.0], [True, 1], [False, 0], [[1], [1]],
            [[1], [2]], [{"a": 1}, {"a": 1}], [{"a": 1}, {"a": 2}],
            ["a", "a"], [None, None], [0, -0], [0, 0.0],
            [{"a": 1, "b": 2}, {"b": 2, "a": 1}], "notarray"]

    def all_unique(v):
        if not isinstance(v, list):
            return True
        return not any(jeq(v[i], v[j]) for i in range(len(v))
                       for j in range(i + 1, len(v)))

    cases.append(matrix_case("uniqueItems true (JSON equality: bool is "
                             "not number, 1 == 1.0)",
                             {"uniqueItems": True}, uniq, all_unique))
    cases.append(matrix_case("uniqueItems false never fails",
                             {"uniqueItems": False}, uniq,
                             lambda v: True))
    return "generated_array_bounds.json", cases


def fam_object_bounds():
    objs = [{}, {"a": 1}, {"a": 1, "b": 2}, {"a": 1, "b": 2, "c": 3},
            [], "x", 7]
    cases = []
    for kw, rule in (("maxProperties", lambda v, n: len(v) <= n),
                     ("minProperties", lambda v, n: len(v) >= n)):
        for n in (0, 1, 2):
            cases.append(matrix_case(
                f"{kw} {n}", {kw: n}, objs,
                lambda v, r=rule, n=n: (not isinstance(v, dict))
                or r(v, n)))
    for req in (["a"], ["a", "b"], ["zz"], []):
        cases.append(matrix_case(
            f"required {dsc(req)}", {"required": req}, objs,
            lambda v, req=tuple(req): (not isinstance(v, dict))
            or all(k in v for k in req)))
    dep = {"a": ["b"], "c": ["a", "b"]}
    cases.append(matrix_case(
        "dependentRequired chain", {"dependentRequired": dep},
        objs + [{"c": 3}, {"c": 3, "a": 1}, {"c": 3, "a": 1, "b": 2},
                {"b": 2}],
        lambda v: (not isinstance(v, dict)) or all(
            all(r in v for r in reqs)
            for k, reqs in dep.items() if k in v)))
    return "generated_object_bounds.json", cases


def fam_enum_const():
    cases = []
    enum = [1, "1", True, [1], {"a": 1}, None, 2.5]
    cases.append(matrix_case(
        "heterogeneous enum (1 matches 1.0, not true)", {"enum": enum},
        [1, 1.0, "1", True, False, [1], [1.0], {"a": 1}, {"a": 1.0},
         {"a": 2}, None, 2.5, 2, "x"],
        lambda v: any(jeq(v, m) for m in enum)))
    for c in (1, "foo", [1, 2], {"a": [1, {"b": 2}]}, None, False):
        cases.append(matrix_case(
            f"const {dsc(c)}", {"const": c},
            [c, 1, 1.0, "foo", [1, 2], [2, 1], {"a": [1, {"b": 2}]},
             {"a": [1, {"b": 3}]}, None, False, 0],
            lambda v, c=c: jeq(v, c)))
    return "generated_enum_const.json", cases


# simple subschemas with independent truth functions, composed below
SUBS = [
    ({"type": "integer"}, lambda v: type_ok("integer", v)),
    ({"minimum": 2}, lambda v: (not is_num(v)) or v >= 2),
    ({"type": "string", "maxLength": 3},
     lambda v: isinstance(v, str) and len(v) <= 3),
]
COMP_INSTS = [1, 5, 2.5, "ab", "abcd", True, None, [1], {"a": 1}, 2]


def fam_applicators():
    cases = []
    s_list = [s for s, _ in SUBS]
    f_list = [f for _, f in SUBS]
    cases.append(matrix_case(
        "allOf over three subschemas", {"allOf": s_list}, COMP_INSTS,
        lambda v: all(f(v) for f in f_list)))
    cases.append(matrix_case(
        "anyOf over three subschemas", {"anyOf": s_list}, COMP_INSTS,
        lambda v: any(f(v) for f in f_list)))
    cases.append(matrix_case(
        "oneOf requires exactly one branch", {"oneOf": s_list},
        COMP_INSTS,
        lambda v: sum(bool(f(v)) for f in f_list) == 1))
    for s, f in SUBS:
        cases.append(matrix_case(
            f"not over {dsc(s)}", {"not": s}, COMP_INSTS,
            lambda v, f=f: not f(v)))
    ite_parts = [
        ({"if": SUBS[0][0], "then": SUBS[1][0]},
         lambda v: (not SUBS[0][1](v)) or SUBS[1][1](v)),
        ({"if": SUBS[0][0], "else": SUBS[2][0]},
         lambda v: SUBS[0][1](v) or SUBS[2][1](v)),
        ({"if": SUBS[0][0], "then": SUBS[1][0], "else": SUBS[2][0]},
         lambda v: SUBS[1][1](v) if SUBS[0][1](v) else SUBS[2][1](v)),
        ({"then": SUBS[1][0]}, lambda v: True),
        ({"else": SUBS[2][0]}, lambda v: True),
    ]
    for s, f in ite_parts:
        cases.append(matrix_case(f"if/then/else combo {dsc(s)}", s,
                                 COMP_INSTS, f))
    return "generated_applicators.json", cases


def fam_properties_interplay():
    A = {"type": "integer"}
    B = {"type": "string"}
    C = {"type": "boolean"}

    def truth(v, with_ap, ap_bool=None):
        if not isinstance(v, dict):
            return True
        for k, m in v.items():
            checks = []
            if k == "a":
                checks.append(type_ok("integer", m))
            if k.startswith("b"):
                checks.append(type_ok("string", m))
            if not checks and with_ap:
                if ap_bool is not None:
                    checks.append(ap_bool)
                else:
                    checks.append(type_ok("boolean", m))
            if not all(checks):
                return False
        return True

    insts = [{}, {"a": 1}, {"a": "x"}, {"b1": "s"}, {"b1": 1},
             {"a": 1, "b1": "s"}, {"z": True}, {"z": 1},
             {"a": 1, "z": True}, {"a": 1, "z": "no"},
             {"b1": "s", "z": False}, 3, "x"]
    cases = [
        matrix_case(
            "properties+patternProperties only (additional free)",
            {"properties": {"a": A}, "patternProperties": {"^b": B}},
            insts, lambda v: truth(v, with_ap=False)),
        matrix_case(
            "additionalProperties schema sees only unmatched keys",
            {"properties": {"a": A}, "patternProperties": {"^b": B},
             "additionalProperties": C},
            insts, lambda v: truth(v, with_ap=True)),
        matrix_case(
            "additionalProperties false forbids unmatched keys",
            {"properties": {"a": A}, "patternProperties": {"^b": B},
             "additionalProperties": False},
            insts, lambda v: truth(v, with_ap=True, ap_bool=False)),
        matrix_case(
            "propertyNames bounds every key",
            {"propertyNames": {"maxLength": 2}},
            [{}, {"ab": 1}, {"abc": 1}, {"a": 1, "abcd": 2}, 5, "x",
             {"": 1}],
            lambda v: (not isinstance(v, dict))
            or all(len(k) <= 2 for k in v)),
        matrix_case(
            "patternProperties overlapping patterns AND together",
            {"patternProperties": {"^x": {"type": "integer"},
                                   "x$": {"minimum": 5}}},
            [{}, {"x": 7}, {"x": 3}, {"x": "s"}, {"xy": 2}, {"yx": 9},
             {"yx": 2}, {"xx": 9}, {"xx": 2.5}, {"q": None}],
            lambda v: (not isinstance(v, dict)) or all(
                (not k.startswith("x") or type_ok("integer", m))
                and (not k.endswith("x")
                     or ((not is_num(m)) or m >= 5))
                for k, m in v.items())),
    ]
    return "generated_properties_interplay.json", cases


def fam_items_2020():
    """2020-12 prefixItems/items positional semantics."""
    arrays = [[], [1], [1, "a"], [1, "a", True], [1, "a", True, False],
              [1, "a", "x"], ["bad"], [1, 2], "na", 5]
    pre = [{"type": "integer"}, {"type": "string"}]
    pf = [lambda v: type_ok("integer", v), lambda v: type_ok("string", v)]

    def t_prefix_only(v):
        if not isinstance(v, list):
            return True
        return all(f(x) for f, x in zip(pf, v))

    def t_items_rest(v, rest):
        if not isinstance(v, list):
            return True
        if not t_prefix_only(v):
            return False
        return all(rest(x) for x in v[2:])

    cases = [
        matrix_case("prefixItems alone (tail unconstrained)",
                    {"prefixItems": pre}, arrays, t_prefix_only),
        matrix_case("prefixItems + items schema constrains the tail",
                    {"prefixItems": pre, "items": {"type": "boolean"}},
                    arrays,
                    lambda v: t_items_rest(
                        v, lambda x: type_ok("boolean", x))),
        matrix_case("prefixItems + items false forbids a tail",
                    {"prefixItems": pre, "items": False}, arrays,
                    lambda v: t_items_rest(v, lambda x: False)),
        matrix_case("items schema alone constrains every element",
                    {"items": {"type": "integer"}},
                    arrays,
                    lambda v: (not isinstance(v, list))
                    or all(type_ok("integer", x) for x in v)),
        matrix_case("contains + min/maxContains counting",
                    {"contains": {"type": "integer"},
                     "minContains": 2, "maxContains": 3},
                    [[], [1], [1, 2], [1, 2, 3], [1, 2, 3, 4],
                     ["a", 1, "b", 2], [1, "a"], ["a", "b"], 7],
                    lambda v: (not isinstance(v, list)) or
                    2 <= sum(1 for x in v if type_ok("integer", x)) <= 3),
    ]
    return "generated_items_matrix.json", cases


def fam_items_2019():
    """2019-09 items (schema/array form) + additionalItems matrix."""
    arrays = [[], [1], [1, "a"], [1, "a", True], [1, "a", True, False],
              [1, "a", "x"], ["bad"], [1, 2], 5]
    tuple_items = [{"type": "integer"}, {"type": "string"}]
    tf = [lambda v: type_ok("integer", v), lambda v: type_ok("string", v)]

    def t_tuple(v, extra):
        if not isinstance(v, list):
            return True
        if not all(f(x) for f, x in zip(tf, v)):
            return False
        return all(extra(x) for x in v[len(tuple_items):])

    cases = [
        matrix_case("2019-09 items schema form applies to every element "
                    "(additionalItems ignored)",
                    {"items": {"type": "integer"},
                     "additionalItems": False},
                    arrays,
                    lambda v: (not isinstance(v, list))
                    or all(type_ok("integer", x) for x in v)),
        matrix_case("2019-09 items array form, no additionalItems",
                    {"items": tuple_items}, arrays,
                    lambda v: t_tuple(v, lambda x: True)),
        matrix_case("2019-09 items array form + additionalItems false",
                    {"items": tuple_items, "additionalItems": False},
                    arrays, lambda v: t_tuple(v, lambda x: False)),
        matrix_case("2019-09 items array form + additionalItems schema",
                    {"items": tuple_items,
                     "additionalItems": {"type": "boolean"}},
                    arrays,
                    lambda v: t_tuple(v, lambda x: type_ok("boolean", x))),
        matrix_case("2019-09 additionalItems alone is ignored",
                    {"additionalItems": False}, arrays,
                    lambda v: True),
    ]
    return "generated_items_2019_matrix.json", cases


# ---------------------------------------------------------------------------
# hand-authored interplay files (truth from the spec, still
# reference-checked at generation time)

def fam_ref_matrix():
    cases = [
        {
            "description": "$ref to $defs sibling",
            "schema": {"$id": "https://gen.example/ref1",
                       "$defs": {"pos": {"minimum": 0}},
                       "$ref": "#/$defs/pos"},
            "tests": [
                {"description": "valid number", "data": 3, "valid": True},
                {"description": "negative", "data": -1, "valid": False},
                {"description": "non-number", "data": "x", "valid": True},
            ],
        },
        {
            "description": "$ref plus sibling keywords both apply (2020-12)",
            "schema": {"$id": "https://gen.example/ref2",
                       "$defs": {"pos": {"minimum": 0}},
                       "$ref": "#/$defs/pos", "maximum": 10},
            "tests": [
                {"description": "inside both", "data": 5, "valid": True},
                {"description": "violates ref", "data": -1,
                 "valid": False},
                {"description": "violates sibling", "data": 11,
                 "valid": False},
            ],
        },
        {
            "description": "$ref chain through two $defs",
            "schema": {"$id": "https://gen.example/ref3",
                       "$defs": {"a": {"$ref": "#/$defs/b"},
                                 "b": {"type": "string"}},
                       "$ref": "#/$defs/a"},
            "tests": [
                {"description": "string ok", "data": "s", "valid": True},
                {"description": "number fails", "data": 1,
                 "valid": False},
            ],
        },
        {
            "description": "$ref to boolean schema false",
            "schema": {"$id": "https://gen.example/ref4",
                       "$defs": {"no": False}, "$ref": "#/$defs/no"},
            "tests": [
                {"description": "anything fails", "data": 1,
                 "valid": False},
                {"description": "null fails", "data": None,
                 "valid": False},
            ],
        },
        {
            "description": "$anchor target resolution",
            "schema": {"$id": "https://gen.example/ref5",
                       "$defs": {"x": {"$anchor": "posint",
                                       "type": "integer",
                                       "minimum": 1}},
                       "$ref": "#posint"},
            "tests": [
                {"description": "positive int", "data": 2, "valid": True},
                {"description": "zero", "data": 0, "valid": False},
                {"description": "float", "data": 1.5, "valid": False},
            ],
        },
        {
            "description": "embedded resource with absolute $id",
            "schema": {
                "$id": "https://gen.example/root",
                "$defs": {"res": {"$id": "https://gen.example/leaf",
                                  "type": "array",
                                  "items": {"$ref": "#/$defs/elem"},
                                  "$defs": {"elem": {"type": "integer"}}}},
                "$ref": "https://gen.example/leaf",
            },
            "tests": [
                {"description": "ints ok", "data": [1, 2], "valid": True},
                {"description": "string element breaks leaf-local ref",
                 "data": [1, "x"], "valid": False},
                {"description": "non-array ok? no — leaf requires array",
                 "data": 3, "valid": False},
            ],
        },
        {
            "description": "relative $id resolution against base",
            "schema": {
                "$id": "https://gen.example/base/root.json",
                "$defs": {"sib": {"$id": "sibling.json",
                                  "type": "boolean"}},
                "$ref": "https://gen.example/base/sibling.json",
            },
            "tests": [
                {"description": "boolean ok", "data": True, "valid": True},
                {"description": "number fails", "data": 1,
                 "valid": False},
            ],
        },
        {
            "description": "recursive tree via $ref (classic)",
            "schema": {
                "$id": "https://gen.example/tree",
                "type": "object",
                "properties": {
                    "value": {"type": "integer"},
                    "kids": {"type": "array", "items": {"$ref": "#"}},
                },
                "required": ["value"],
            },
            "tests": [
                {"description": "leaf", "data": {"value": 1},
                 "valid": True},
                {"description": "two levels",
                 "data": {"value": 1, "kids": [{"value": 2}]},
                 "valid": True},
                {"description": "bad grandchild",
                 "data": {"value": 1,
                          "kids": [{"value": 2,
                                    "kids": [{"value": "x"}]}]},
                 "valid": False},
                {"description": "missing value in kid",
                 "data": {"value": 1, "kids": [{}]}, "valid": False},
            ],
        },
    ]
    return "generated_ref_matrix.json", cases


def fam_recursive_2019():
    cases = [
        {
            "description": "recursiveRef with recursiveAnchor at root "
                           "(tree recursion)",
            "schema": {
                "$id": "https://gen2019.example/rtree",
                "$recursiveAnchor": True,
                "type": "object",
                "properties": {
                    "value": {"type": "integer"},
                    "kids": {"type": "array",
                             "items": {"$recursiveRef": "#"}},
                },
                "required": ["value"],
            },
            "tests": [
                {"description": "leaf", "data": {"value": 1},
                 "valid": True},
                {"description": "nested ok",
                 "data": {"value": 1, "kids": [{"value": 2}]},
                 "valid": True},
                {"description": "nested bad",
                 "data": {"value": 1, "kids": [{"value": "x"}]},
                 "valid": False},
            ],
        },
        {
            "description": "recursiveRef extends across resources "
                           "(the meta-schema extension pattern)",
            "schema": {
                "$id": "https://gen2019.example/extended",
                "$recursiveAnchor": True,
                "$ref": "https://gen2019.example/base2019",
                "properties": {"extra": {"type": "string"}},
                "$defs": {
                    "base": {
                        "$id": "https://gen2019.example/base2019",
                        "$recursiveAnchor": True,
                        "type": "object",
                        "properties": {
                            "next": {"$recursiveRef": "#"},
                        },
                    },
                },
            },
            "tests": [
                {"description": "outer extension applies to nested "
                                "'next' through the dynamic anchor",
                 "data": {"next": {"extra": 5}}, "valid": False},
                {"description": "nested extra string ok",
                 "data": {"next": {"extra": "s"}}, "valid": True},
                {"description": "plain nesting ok",
                 "data": {"next": {"next": {}}}, "valid": True},
            ],
        },
        {
            "description": "recursiveRef with anchor false stays lexical",
            "schema": {
                "$id": "https://gen2019.example/lex",
                "$recursiveAnchor": True,
                "$ref": "https://gen2019.example/baselex",
                "properties": {"extra": {"type": "string"}},
                "$defs": {
                    "base": {
                        "$id": "https://gen2019.example/baselex",
                        "$recursiveAnchor": False,
                        "type": "object",
                        "properties": {
                            "next": {"$recursiveRef": "#"},
                        },
                    },
                },
            },
            "tests": [
                {"description": "outer extension does NOT reach nested "
                                "(anchor false -> lexical base)",
                 "data": {"next": {"extra": 5}}, "valid": True},
                {"description": "nested non-object still fails the "
                                "lexical base",
                 "data": {"next": {"next": 3}}, "valid": False},
            ],
        },
    ]
    return "generated_recursive_2019.json", cases


def fam_unevaluated_matrix():
    cases = [
        {
            "description": "unevaluatedProperties sees successful anyOf "
                           "branch annotations only",
            "schema": {
                "anyOf": [
                    {"properties": {"a": {"type": "integer"}},
                     "required": ["a"]},
                    {"properties": {"b": {"type": "string"}},
                     "required": ["b"]},
                ],
                "unevaluatedProperties": False,
            },
            "tests": [
                {"description": "a-branch covers a", "data": {"a": 1},
                 "valid": True},
                {"description": "b-branch covers b", "data": {"b": "s"},
                 "valid": True},
                {"description": "both branches pass, both covered",
                 "data": {"a": 1, "b": "s"}, "valid": True},
                {"description": "c never evaluated",
                 "data": {"a": 1, "c": 0}, "valid": False},
                {"description": "failed a-branch leaves a uncovered "
                                "when only b passes",
                 "data": {"a": "x", "b": "s"}, "valid": False},
            ],
        },
        {
            "description": "unevaluatedProperties with if/then/else",
            "schema": {
                "if": {"properties": {"kind": {"const": "num"}},
                       "required": ["kind"]},
                "then": {"properties": {"v": {"type": "number"}}},
                "else": {"properties": {"w": {"type": "string"}}},
                "properties": {"kind": {"type": "string"}},
                "unevaluatedProperties": False,
            },
            "tests": [
                {"description": "then-branch covers v",
                 "data": {"kind": "num", "v": 3}, "valid": True},
                {"description": "then-branch does not cover w",
                 "data": {"kind": "num", "w": "s"}, "valid": False},
                {"description": "else-branch covers w",
                 "data": {"kind": "str", "w": "s"}, "valid": True},
                {"description": "else-branch does not cover v",
                 "data": {"kind": "str", "v": 3}, "valid": False},
            ],
        },
        {
            "description": "cousin unevaluatedProperties cannot see "
                           "sibling-branch annotations",
            "schema": {
                "allOf": [
                    {"properties": {"a": True},
                     "unevaluatedProperties": False},
                    {"properties": {"b": True}},
                ],
            },
            "tests": [
                {"description": "a alone ok", "data": {"a": 1},
                 "valid": True},
                {"description": "b invisible to the cousin -> fails",
                 "data": {"b": 1}, "valid": False},
            ],
        },
        {
            "description": "nested unevaluatedProperties: inner false, "
                           "outer true",
            "schema": {
                "allOf": [{"unevaluatedProperties": False}],
                "unevaluatedProperties": True,
            },
            "tests": [
                {"description": "inner false fires first",
                 "data": {"a": 1}, "valid": False},
                {"description": "empty object fine", "data": {},
                 "valid": True},
            ],
        },
        {
            "description": "unevaluatedItems after prefixItems via allOf",
            "schema": {
                "allOf": [{"prefixItems": [{"type": "integer"}]}],
                "unevaluatedItems": False,
            },
            "tests": [
                {"description": "covered prefix ok", "data": [1],
                 "valid": True},
                {"description": "tail uncovered", "data": [1, 2],
                 "valid": False},
                {"description": "empty ok", "data": [], "valid": True},
            ],
        },
        {
            "description": "unevaluatedItems sees contains matches "
                           "(2020-12 semantics)",
            "schema": {
                "contains": {"type": "integer"},
                "unevaluatedItems": {"type": "string"},
            },
            "tests": [
                {"description": "ints covered by contains, strings by "
                                "unevaluatedItems",
                 "data": [1, "a", 2], "valid": True},
                {"description": "boolean neither contained nor string",
                 "data": [1, True], "valid": False},
            ],
        },
        {
            "description": "unevaluatedProperties schema form applies "
                           "to leftovers",
            "schema": {
                "properties": {"a": {"type": "integer"}},
                "unevaluatedProperties": {"type": "boolean"},
            },
            "tests": [
                {"description": "leftover boolean ok",
                 "data": {"a": 1, "z": True}, "valid": True},
                {"description": "leftover string fails",
                 "data": {"a": 1, "z": "s"}, "valid": False},
                {"description": "only matched props",
                 "data": {"a": 1}, "valid": True},
            ],
        },
    ]
    return "generated_unevaluated_matrix.json", cases


def fam_unevaluated_2019():
    cases = [
        {
            "description": "2019-09 unevaluatedItems with items array "
                           "form",
            "schema": {
                "allOf": [{"items": [{"type": "integer"}]}],
                "unevaluatedItems": {"type": "string"},
            },
            "tests": [
                {"description": "tail must be strings",
                 "data": [1, "a", "b"], "valid": True},
                {"description": "tail boolean fails",
                 "data": [1, True], "valid": False},
                {"description": "prefix alone ok", "data": [1],
                 "valid": True},
            ],
        },
        {
            "description": "2019-09 items schema form evaluates ALL "
                           "items (unevaluatedItems moot)",
            "schema": {
                "allOf": [{"items": {"type": "integer"}}],
                "unevaluatedItems": False,
            },
            "tests": [
                {"description": "all covered", "data": [1, 2],
                 "valid": True},
                {"description": "inner items still enforced",
                 "data": [1, "x"], "valid": False},
            ],
        },
        {
            "description": "2019-09 additionalItems annotations feed "
                           "unevaluatedItems",
            "schema": {
                "allOf": [{"items": [{"type": "integer"}],
                           "additionalItems": {"type": "string"}}],
                "unevaluatedItems": False,
            },
            "tests": [
                {"description": "prefix+tail all evaluated",
                 "data": [1, "a"], "valid": True},
                {"description": "bad tail fails in additionalItems",
                 "data": [1, 2], "valid": False},
            ],
        },
        {
            "description": "2019-09 unevaluatedProperties with "
                           "dependentSchemas coverage",
            "schema": {
                "dependentSchemas": {
                    "a": {"properties": {"extra": {"type": "string"}}},
                },
                "properties": {"a": {"type": "integer"}},
                "unevaluatedProperties": False,
            },
            "tests": [
                {"description": "dependent schema covers extra",
                 "data": {"a": 1, "extra": "s"}, "valid": True},
                {"description": "no trigger key -> extra uncovered",
                 "data": {"extra": "s"}, "valid": False},
            ],
        },
    ]
    return "generated_unevaluated_2019.json", cases


# ---------------------------------------------------------------------------
# generation + reference cross-check

FILES_2020 = [fam_type_matrix, fam_numeric_bounds, fam_string_bounds,
              fam_array_bounds, fam_object_bounds, fam_enum_const,
              fam_applicators, fam_properties_interplay, fam_items_2020,
              fam_ref_matrix, fam_unevaluated_matrix]
FILES_2019 = [fam_items_2019, fam_recursive_2019, fam_unevaluated_2019]


def check_against_reference(version, fname, cases):
    from ref_oracle import evaluate_with_reference, load_reference

    handle = load_reference(version)
    if handle is None:
        raise SystemExit("reference evaluator unavailable")
    meta = f"https://json-schema.org/draft/{version}/schema"
    bad = []
    for case in cases:
        schema = case["schema"]
        if isinstance(schema, dict) and "$schema" not in schema:
            schema = {"$schema": meta, **schema}
        for test in case["tests"]:
            out = evaluate_with_reference(schema, test["data"],
                                          handle=handle)
            if out["valid"] != test["valid"]:
                bad.append((fname, case["description"],
                            test["description"], test["valid"]))
    return bad


def main():
    total = 0
    mismatches = []
    for version, fams in (("2020-12", FILES_2020), ("2019-09", FILES_2019)):
        for fam in fams:
            fname, cases = fam()
            mismatches += check_against_reference(version, fname, cases)
            n = sum(len(c["tests"]) for c in cases)
            total += n
            path = CORPUS / version / fname
            with open(path, "w") as f:
                json.dump(cases, f, indent=1, ensure_ascii=False)
            print(f"{version}/{fname}: {len(cases)} cases, {n} triples")
    if mismatches:
        print("\nREFERENCE DISAGREES (fix truth or ledger):")
        for m in mismatches:
            print(" ", m)
        raise SystemExit(1)
    print(f"\ntotal new triples: {total} (all reference-verified)")


if __name__ == "__main__":
    main()
