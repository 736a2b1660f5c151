"""Generate round-4 conformance-corpus files (suite-style triples).

Doubles the vendored corpus toward official-suite mass (VERDICT r3 item
2), prioritizing 2019-09 and deeper keyword interplay. Every generated
triple's truth value comes from an INDEPENDENT straight-from-the-spec
mini-evaluator implemented here (annotation-tracking subset of JSON
Schema 2020-12 / 2019-09 core+validation — independent of both the
repo's engines and the reference), then every triple is cross-checked at
generation time against the actual reference evaluator
(/root/reference via tests/ref_oracle.py) under EVERY dialect the
harness will run it in — any disagreement aborts the run, so nothing
unverified lands in the corpus.

Usage: PYTHONPATH=/root/repo python scripts/gen_suite_corpus_r4.py
Idempotent: fixed rosters, no randomness.
"""
from __future__ import annotations

import json
import pathlib
import re
import sys
from decimal import Decimal
from fractions import Fraction

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

CORPUS = ROOT / "tests" / "suite_corpus"

ALL = object()   # sentinel: every array index evaluated


def is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def jeq(a, b):
    """JSON equality: 1 == 1.0, True != 1."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if is_num(a) and is_num(b):
        return Decimal(str(a)) == Decimal(str(b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(jeq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(jeq(x, y) for x, y in zip(a, b))
    return type(a) is type(b) and a == b


class Mini:
    """Independent annotation-tracking evaluator for the generated
    subset. dialect: '2020-12' (prefixItems/items) or '2019-09'
    (array-form items/additionalItems). Returns (valid, eval_props,
    eval_items) where eval_items is a set of indices or ALL."""

    def __init__(self, dialect="2020-12", root=None):
        self.dialect = dialect
        self.root = root

    def eval(self, s, v):
        if self.root is None:
            self.root = s
        if s is True or s == {}:
            return True, set(), set()
        if s is False:
            return False, set(), set()
        ok = True
        props: set = set()
        items = set()

        def absorb(sub_ok, sub_p, sub_i):
            nonlocal ok, props, items
            ok = ok and sub_ok
            if sub_ok:
                props |= sub_p
                if sub_i is ALL or items is ALL:
                    items = ALL
                else:
                    items |= sub_i

        if "$ref" in s:
            tgt = self._resolve(s["$ref"])
            absorb(*self.eval(tgt, v))

        # ---- assertions -------------------------------------------------
        if "type" in s:
            ts = s["type"] if isinstance(s["type"], list) else [s["type"]]
            ok = ok and any(self._type_ok(t, v) for t in ts)
        if "enum" in s:
            ok = ok and any(jeq(v, e) for e in s["enum"])
        if "const" in s:
            ok = ok and jeq(v, s["const"])
        if is_num(v):
            if "multipleOf" in s:
                q = Fraction(Decimal(str(v))) / \
                    Fraction(Decimal(str(s["multipleOf"])))
                ok = ok and q.denominator == 1
            if "maximum" in s:
                ok = ok and v <= s["maximum"]
            if "exclusiveMaximum" in s:
                ok = ok and v < s["exclusiveMaximum"]
            if "minimum" in s:
                ok = ok and v >= s["minimum"]
            if "exclusiveMinimum" in s:
                ok = ok and v > s["exclusiveMinimum"]
        if isinstance(v, str):
            if "maxLength" in s:
                ok = ok and len(v) <= s["maxLength"]
            if "minLength" in s:
                ok = ok and len(v) >= s["minLength"]
            if "pattern" in s:
                ok = ok and re.search(s["pattern"], v) is not None
        if isinstance(v, list):
            if "maxItems" in s:
                ok = ok and len(v) <= s["maxItems"]
            if "minItems" in s:
                ok = ok and len(v) >= s["minItems"]
            if s.get("uniqueItems"):
                ok = ok and all(
                    not jeq(v[i], v[j])
                    for i in range(len(v)) for j in range(i + 1, len(v)))
        if isinstance(v, dict):
            if "maxProperties" in s:
                ok = ok and len(v) <= s["maxProperties"]
            if "minProperties" in s:
                ok = ok and len(v) >= s["minProperties"]
            if "required" in s:
                ok = ok and all(k in v for k in s["required"])
            if "dependentRequired" in s:
                for k, reqs in s["dependentRequired"].items():
                    if k in v:
                        ok = ok and all(r in v for r in reqs)

        # ---- object applicators ----------------------------------------
        if isinstance(v, dict):
            declared = set()
            if "properties" in s:
                for k, sub in s["properties"].items():
                    if k in v:
                        declared.add(k)
                        sub_ok, _, _ = self.eval(sub, v[k])
                        ok = ok and sub_ok
            if "patternProperties" in s:
                for pat, sub in s["patternProperties"].items():
                    for k in v:
                        if re.search(pat, k):
                            declared.add(k)
                            sub_ok, _, _ = self.eval(sub, v[k])
                            ok = ok and sub_ok
            if "additionalProperties" in s:
                for k in v:
                    if k not in declared:
                        sub_ok, _, _ = self.eval(
                            s["additionalProperties"], v[k])
                        ok = ok and sub_ok
                props |= set(v)
            props |= declared
            if "propertyNames" in s:
                for k in v:
                    sub_ok, _, _ = self.eval(s["propertyNames"], k)
                    ok = ok and sub_ok
            if "dependentSchemas" in s:
                for k, sub in s["dependentSchemas"].items():
                    if k in v:
                        absorb(*self.eval(sub, v))

        # ---- array applicators -----------------------------------------
        if isinstance(v, list):
            if self.dialect == "2020-12":
                npre = 0
                if "prefixItems" in s:
                    npre = min(len(s["prefixItems"]), len(v))
                    for i in range(npre):
                        sub_ok, _, _ = self.eval(s["prefixItems"][i], v[i])
                        ok = ok and sub_ok
                    items |= set(range(npre)) if items is not ALL else set()
                if "items" in s:
                    for i in range(npre, len(v)):
                        sub_ok, _, _ = self.eval(s["items"], v[i])
                        ok = ok and sub_ok
                    if len(v) > npre or "prefixItems" not in s:
                        items = ALL
            else:  # 2019-09
                nconsumed = 0
                if "items" in s:
                    if isinstance(s["items"], list):
                        nconsumed = min(len(s["items"]), len(v))
                        for i in range(nconsumed):
                            sub_ok, _, _ = self.eval(s["items"][i], v[i])
                            ok = ok and sub_ok
                        if items is not ALL:
                            items |= set(range(nconsumed))
                        if "additionalItems" in s:
                            for i in range(len(s["items"]), len(v)):
                                sub_ok, _, _ = self.eval(
                                    s["additionalItems"], v[i])
                                ok = ok and sub_ok
                            if len(v) > len(s["items"]):
                                items = ALL
                    else:
                        for x in v:
                            sub_ok, _, _ = self.eval(s["items"], x)
                            ok = ok and sub_ok
                        items = ALL
            if "contains" in s:
                hits = [i for i, x in enumerate(v)
                        if self.eval(s["contains"], x)[0]]
                mn = s.get("minContains", 1)
                mx = s.get("maxContains")
                c_ok = len(hits) >= mn and (mx is None or len(hits) <= mx)
                ok = ok and c_ok
                if c_ok and items is not ALL:
                    items |= set(hits)

        # ---- in-place applicators --------------------------------------
        for sub in s.get("allOf", []):
            absorb(*self.eval(sub, v))
        if "anyOf" in s:
            results = [self.eval(sub, v) for sub in s["anyOf"]]
            any_ok = any(r[0] for r in results)
            ok = ok and any_ok
            for r in results:
                if r[0]:
                    props |= r[1]
                    items = ALL if (r[2] is ALL or items is ALL) \
                        else items | r[2]
        if "oneOf" in s:
            results = [self.eval(sub, v) for sub in s["oneOf"]]
            n_ok = sum(1 for r in results if r[0])
            ok = ok and n_ok == 1
            for r in results:
                if r[0]:
                    props |= r[1]
                    items = ALL if (r[2] is ALL or items is ALL) \
                        else items | r[2]
        if "not" in s:
            ok = ok and not self.eval(s["not"], v)[0]
        if "if" in s:
            c_ok, c_p, c_i = self.eval(s["if"], v)
            if c_ok:
                props |= c_p
                items = ALL if (c_i is ALL or items is ALL) \
                    else items | c_i
                if "then" in s:
                    absorb(*self.eval(s["then"], v))
            else:
                if "else" in s:
                    absorb(*self.eval(s["else"], v))

        # ---- unevaluated* (after everything else) ----------------------
        if "unevaluatedProperties" in s and isinstance(v, dict):
            for k in v:
                if k not in props:
                    sub_ok, _, _ = self.eval(
                        s["unevaluatedProperties"], v[k])
                    ok = ok and sub_ok
            props |= set(v)
        if "unevaluatedItems" in s and isinstance(v, list):
            if items is not ALL:
                for i in range(len(v)):
                    if i not in items:
                        sub_ok, _, _ = self.eval(
                            s["unevaluatedItems"], v[i])
                        ok = ok and sub_ok
            items = ALL

        if not ok:
            return False, set(), set()
        return True, props, items

    def _type_ok(self, t, v):
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

    def _resolve(self, ref):
        assert ref.startswith("#/$defs/"), ref
        node = self.root
        for part in ref[2:].split("/"):
            node = node[part]
        return node


def truth(schema, v, dialect="2020-12"):
    return Mini(dialect, schema).eval(schema, v)[0]


def matrix_case(desc, schema, instances, dialect="2020-12"):
    return {
        "description": desc,
        "schema": schema,
        "tests": [{
            "description": f"instance {json.dumps(inst)[:60]}",
            "data": inst,
            "valid": truth(schema, inst, dialect),
        } for inst in instances],
    }


# ---------------------------------------------------------------------------
# instance rosters (deterministic)

SCALARS = [None, True, False, 0, 1, -1, 7, 2.5, 3.0, -2.5, "", "a",
           "abc", "aXc", "zzz", [], {}]
STRINGS = ["", "a", "ab", "abc", "abcd", "aXc", "xyz", "Abc", "a c",
           "ba", "aaab", "café", "日本", "a" * 10]
NUMBERS = [0, 1, -1, 2, 3, 5, 10, 0.5, 1.5, 2.5, -0.5, 0.1, 0.01,
           1e9, -1e9, 9007199254740992, 9007199254740993,
           12345678901234567890, 1e308, 5.0, 0.0, -0.0, 2.999999999]
ARRAYS = [[], [1], [1, 2], [1, 2, 3], [1, 2, 3, 4], ["a"], ["a", "b"],
          [1, "a"], [True, False], [None], [1, 1], [1, 1.0],
          [[1], [2]], [{"k": 1}], ["a", 1, None, True],
          [2, 4, 6], [1, 3, 5], [0, 0, 0, 0, 0],
          [6], [2, 3, 4, 5, 6], ["a", "b", "c"], [1, [2, [3]]]]
OBJECTS = [{}, {"a": 1}, {"b": 2}, {"a": 1, "b": 2},
           {"a": 1, "b": 2, "c": 3}, {"a": "x"}, {"c": 3}, {"d": 4},
           {"a": 1, "d": 4}, {"a": 1, "b": 2, "c": 3, "d": 4},
           {"foo": 1}, {"fxo": 1}, {"a": [1, 2]}, {"a": {"b": 1}},
           {"A": 1}, {"a": 1, "A": 2}, {"a": 0}, {"a": 1.0},
           {"b": [1]}, {"ab": 2}, {"a": True}, {"x": "y", "z": 1},
           {"a": None}, {"b": 2, "c": "s", "d": None}]
MIXED = SCALARS + [[1, 2, "x"], {"a": 1, "b": "y"}]


# ---------------------------------------------------------------------------
# matrices

def conditional_matrix():
    C = {"properties": {"a": {"const": 1}}, "required": ["a"]}
    T = {"required": ["b"]}
    E = {"required": ["c"]}
    insts = OBJECTS + [{"a": 2}, {"a": 1, "c": 3}, {"a": 2, "c": 3},
                       {"a": 2, "b": 2}]
    return [
        matrix_case("if-then only", {"if": C, "then": T}, insts),
        matrix_case("if-else only", {"if": C, "else": E}, insts),
        matrix_case("if-then-else", {"if": C, "then": T, "else": E},
                    insts),
        matrix_case("then without if is ignored", {"then": {"type":
                    "string"}}, MIXED),
        matrix_case("else without if is ignored", {"else": False},
                    MIXED),
        matrix_case("if boolean true", {"if": True, "then": T,
                    "else": False}, insts),
        matrix_case("if boolean false", {"if": False, "then": False,
                    "else": E}, insts),
        matrix_case("nested conditional in then",
                    {"if": {"type": "object"},
                     "then": {"if": C, "then": T, "else": E},
                     "else": {"type": "string"}},
                    insts + ["x", 5]),
        matrix_case("two conditionals under allOf",
                    {"allOf": [{"if": C, "then": T},
                               {"if": {"required": ["d"]},
                                "then": {"required": ["b"]}}]},
                    insts),
        matrix_case("conditional with non-object condition",
                    {"if": {"type": "integer"},
                     "then": {"minimum": 3}, "else": {"type": "string"}},
                    MIXED + [2, 3, 4]),
        matrix_case("if with minimum over numbers",
                    {"if": {"minimum": 3}, "then": {"multipleOf": 2},
                     "else": {"multipleOf": 3}},
                    NUMBERS[:16]),
        matrix_case("conditional chained via $ref",
                    {"$defs": {"cond": {"if": C, "then": T}},
                     "$ref": "#/$defs/cond", "minProperties": 1},
                    insts),
    ]


def propname_dependents_matrix():
    insts = OBJECTS + [{"ab": 1}, {"abcd": 1}, {"": 1}]
    return [
        matrix_case("propertyNames maxLength",
                    {"propertyNames": {"maxLength": 3}}, insts),
        matrix_case("propertyNames pattern",
                    {"propertyNames": {"pattern": "^[a-z]"}}, insts),
        matrix_case("propertyNames false forbids all members",
                    {"propertyNames": False}, insts),
        matrix_case("propertyNames with enum",
                    {"propertyNames": {"enum": ["a", "b", "c"]}}, insts),
        matrix_case("dependentRequired single",
                    {"dependentRequired": {"a": ["b"]}}, insts),
        matrix_case("dependentRequired chain",
                    {"dependentRequired": {"a": ["b"], "b": ["c"]}},
                    insts),
        matrix_case("dependentSchemas adds constraint",
                    {"dependentSchemas": {"a": {"maxProperties": 2}}},
                    insts),
        matrix_case("dependentSchemas boolean false",
                    {"dependentSchemas": {"d": False}}, insts),
        matrix_case("dependentSchemas declares properties",
                    {"dependentSchemas": {
                        "a": {"properties": {"b": {"type": "integer"}}}}},
                    insts + [{"a": 1, "b": "x"}]),
        matrix_case("propertyNames + dependentRequired together",
                    {"propertyNames": {"maxLength": 2},
                     "dependentRequired": {"a": ["b"]}}, insts),
    ]


def contains_grid():
    sub = {"type": "integer", "minimum": 2}
    arrays = ARRAYS + [[2], [2, 2], [2, 2, 2], [2, "a"], [0.5, 2.0]]
    cases = []
    for mn in (0, 1, 2):
        for mx in (None, 1, 2):
            s = {"contains": sub, "minContains": mn}
            if mx is not None:
                s["maxContains"] = mx
            cases.append(matrix_case(
                f"contains integer>=2 minContains={mn} maxContains={mx}",
                s, arrays))
    cases.append(matrix_case("contains boolean true",
                             {"contains": True}, arrays))
    cases.append(matrix_case("contains boolean false",
                             {"contains": False}, arrays))
    cases.append(matrix_case("bare minContains without contains ignored",
                             {"minContains": 5}, arrays))
    return cases


def numeric_edges():
    insts = NUMBERS + [True, "5", None]
    # 1e308 excluded from the multipleOf grids: the reference computes
    # float-overflow modulo there (optional_float_overflow.json covers
    # that contract); it stays in the bounds grids below.
    mo_insts = [v for v in insts if v != 1e308]
    return [
        matrix_case("multipleOf 0.01", {"multipleOf": 0.01}, mo_insts),
        matrix_case("multipleOf 0.5", {"multipleOf": 0.5}, mo_insts),
        matrix_case("multipleOf 3", {"multipleOf": 3}, mo_insts),
        matrix_case("multipleOf 1e-8", {"multipleOf": 1e-8},
                    [0, 1, 0.5, 1e-8, 2.5e-8, 1.23e-8, 3, 1e-9]),
        matrix_case("integer type on float-valued numbers",
                    {"type": "integer"}, insts),
        matrix_case("bounds straddling 2^53",
                    {"minimum": 9007199254740991,
                     "maximum": 9007199254740993}, insts),
        matrix_case("exclusive bounds on decimals",
                    {"exclusiveMinimum": 0.1, "exclusiveMaximum": 2.5},
                    insts),
        matrix_case("bignum bounds",
                    {"minimum": 12345678901234567889,
                     "maximum": 12345678901234567891}, insts),
        matrix_case("zero crossing bounds",
                    {"minimum": -0.0, "maximum": 0.0}, insts),
        matrix_case("combined numeric assertions",
                    {"minimum": 0, "exclusiveMaximum": 10,
                     "multipleOf": 2.5}, insts),
    ]


def string_patterns():
    return [
        matrix_case("pattern is unanchored", {"pattern": "b.t"},
                    STRINGS + ["bat", "abbots", "bt", "b\nt"]),
        matrix_case("anchored both ends", {"pattern": "^a+$"},
                    STRINGS + ["aaaa", "baaa"]),
        matrix_case("character class", {"pattern": "[0-9]{2}"},
                    STRINGS + ["a1", "a12", "123"]),
        matrix_case("alternation", {"pattern": "^(cat|dog)s?$"},
                    STRINGS + ["cat", "dogs", "catdog"]),
        matrix_case("escaped dot", {"pattern": "^a\\.c$"},
                    STRINGS + ["a.c", "axc"]),
        matrix_case("unicode literal", {"pattern": "^café$"},
                    STRINGS + ["cafe"]),
        matrix_case("optional group", {"pattern": "^ab?c$"},
                    STRINGS + ["ac", "abc", "abbc"]),
        matrix_case("non-capturing group with quantifier",
                    {"pattern": "^(?:ab){2}$"},
                    STRINGS + ["abab", "ababab"]),
        matrix_case("minLength+maxLength+pattern combined",
                    {"minLength": 2, "maxLength": 4, "pattern": "^[a-z]+$"},
                    STRINGS),
        matrix_case("pattern on non-strings passes", {"pattern": "^x$"},
                    MIXED),
        matrix_case("codepoint length counting",
                    {"maxLength": 2}, ["", "ab", "abc", "日本", "日本語",
                                       "🀄", "🀄🀄", "🀄🀄🀄"]),
    ]


def enum_const_deep():
    return [
        matrix_case("enum of mixed types",
                    {"enum": [1, "1", [1], {"a": 1}, None, True]},
                    MIXED + [[1], {"a": 1}, 1.0, "1"]),
        matrix_case("enum numeric equality 1 vs 1.0",
                    {"enum": [1.0, 2]}, NUMBERS[:12] + [True]),
        matrix_case("const object deep equality",
                    {"const": {"a": [1, {"b": 2.0}]}},
                    [{"a": [1, {"b": 2}]}, {"a": [1, {"b": 2.5}]},
                     {"a": [1, {"b": 2, "c": 3}]}, {"a": [1]}, {}, 1]),
        matrix_case("const false is not 0",
                    {"const": False}, [False, 0, 0.0, True, 1, "false"]),
        matrix_case("const 0 is not false",
                    {"const": 0}, [False, 0, 0.0, -0.0, True, 1, ""]),
        matrix_case("enum with empty containers",
                    {"enum": [[], {}, ""]},
                    [[], {}, "", [0], {"a": 0}, " ", None, 0]),
        matrix_case("const array order matters",
                    {"const": [1, 2]}, [[1, 2], [2, 1], [1, 2, 3],
                                        [1.0, 2.0], [1], []]),
        matrix_case("enum alongside type",
                    {"type": "string", "enum": ["a", 1, "b"]},
                    MIXED),
    ]


def object_matrix2():
    insts = OBJECTS + [{"fxo": "s"}, {"foo": "s"}, {"other": True}]
    return [
        matrix_case("properties + patternProperties overlap both apply",
                    {"properties": {"foo": {"type": "integer"}},
                     "patternProperties": {"^f": {"minimum": 0}}},
                    insts + [{"foo": -1}, {"fxo": -1}]),
        matrix_case("additionalProperties false with both declared",
                    {"properties": {"a": True},
                     "patternProperties": {"^b": True},
                     "additionalProperties": False}, insts),
        matrix_case("additionalProperties schema applies to the rest",
                    {"properties": {"a": {"type": "integer"}},
                     "additionalProperties": {"type": "string"}},
                    insts + [{"a": 1, "z": "s"}, {"a": 1, "z": 2}]),
        matrix_case("patternProperties multiple overlapping patterns",
                    {"patternProperties": {"^a": {"type": "integer"},
                                           "c$": {"maximum": 5}}},
                    insts + [{"abc": 3}, {"abc": 9}, {"abc": "x"}]),
        matrix_case("empty-string property name",
                    {"properties": {"": {"type": "integer"}},
                     "additionalProperties": False},
                    [{}, {"": 1}, {"": "x"}, {"": 1, "a": 1}]),
        matrix_case("boolean subschemas in properties",
                    {"properties": {"a": True, "b": False}}, insts),
        matrix_case("required interacts with properties",
                    {"properties": {"a": {"type": "integer"}},
                     "required": ["a", "b"]}, insts),
        matrix_case("min/maxProperties with additionalProperties",
                    {"minProperties": 1, "maxProperties": 3,
                     "additionalProperties": {"type": "integer"}},
                    insts),
        matrix_case("nested object properties",
                    {"properties": {"a": {"properties": {
                        "b": {"type": "integer"}},
                        "required": ["b"]}}},
                    [{}, {"a": {}}, {"a": {"b": 1}}, {"a": {"b": "x"}},
                     {"a": 1}, {"a": {"c": 1}}]),
        matrix_case("case-sensitive property names",
                    {"properties": {"a": {"const": 1}},
                     "required": ["a"]},
                    [{"a": 1}, {"A": 1}, {"a": 1, "A": 2}, {}]),
    ]


def unevaluated_deep(dialect):
    """unevaluatedProperties/Items × in-place applicator interplay.
    2020-12 uses prefixItems/items; 2019-09 array-form items."""
    U = {"unevaluatedProperties": False}
    insts = OBJECTS
    cases = [
        matrix_case("unevaluatedProperties alone forbids everything",
                    dict(U), insts, dialect),
        matrix_case("unevaluatedProperties with properties",
                    {"properties": {"a": True}, **U}, insts, dialect),
        matrix_case("unevaluatedProperties with patternProperties",
                    {"patternProperties": {"^[ab]$": True}, **U},
                    insts, dialect),
        matrix_case("unevaluatedProperties sees allOf annotations",
                    {"properties": {"a": True},
                     "allOf": [{"properties": {"b": True}}], **U},
                    insts, dialect),
        matrix_case("failing anyOf branch contributes nothing",
                    {"anyOf": [{"properties": {"a": True},
                                "required": ["a"]},
                               {"properties": {"b": True},
                                "required": ["b"]}], **U},
                    insts, dialect),
        matrix_case("if/then annotations only when applied",
                    {"if": {"required": ["a"]},
                     "then": {"properties": {"a": True, "b": True}},
                     "else": {"properties": {"c": True}}, **U},
                    insts, dialect),
        matrix_case("unevaluatedProperties schema (not false)",
                    {"properties": {"a": True},
                     "unevaluatedProperties": {"type": "integer"}},
                    insts + [{"a": "s", "b": 1}, {"b": "s"}], dialect),
        matrix_case("dependentSchemas annotations count",
                    {"dependentSchemas": {
                        "a": {"properties": {"b": True}}},
                     "properties": {"a": True}, **U},
                    insts, dialect),
        matrix_case("oneOf single passing branch contributes",
                    {"oneOf": [{"required": ["a"],
                                "properties": {"a": True}},
                               {"required": ["b"],
                                "properties": {"b": True}}], **U},
                    insts, dialect),
        matrix_case("ref annotations visible to unevaluated",
                    {"$defs": {"base": {"properties": {"a": True}}},
                     "$ref": "#/$defs/base", **U},
                    insts, dialect),
    ]
    arrays = ARRAYS[:14]
    if dialect == "2020-12":
        cases += [
            matrix_case("unevaluatedItems after prefixItems",
                        {"prefixItems": [True, True],
                         "unevaluatedItems": False}, arrays, dialect),
            matrix_case("unevaluatedItems schema constrains the tail",
                        {"prefixItems": [True],
                         "unevaluatedItems": {"type": "integer"}},
                        arrays + [["a", 1], ["a", "b"]], dialect),
            matrix_case("items evaluates everything",
                        {"items": {"type": "integer"},
                         "unevaluatedItems": False}, arrays, dialect),
            matrix_case("contains marks matched items as evaluated",
                        {"contains": {"type": "integer"},
                         "unevaluatedItems": {"type": "string"}},
                        arrays + [["a", 1], [1, "a", True]], dialect),
            matrix_case("allOf prefixItems combine",
                        {"allOf": [{"prefixItems": [True]}],
                         "prefixItems": [True, True],
                         "unevaluatedItems": False}, arrays, dialect),
        ]
    else:
        cases += [
            matrix_case("unevaluatedItems after array-form items",
                        {"items": [True, True],
                         "unevaluatedItems": False}, arrays, dialect),
            matrix_case("additionalItems evaluates the tail",
                        {"items": [True], "additionalItems": True,
                         "unevaluatedItems": False}, arrays, dialect),
            matrix_case("schema-form items evaluates everything",
                        {"items": {"type": "integer"},
                         "unevaluatedItems": False}, arrays, dialect),
            matrix_case("unevaluatedItems schema on the tail",
                        {"items": [True],
                         "unevaluatedItems": {"type": "integer"}},
                        arrays + [["a", 1], ["a", "b"]], dialect),
        ]
    return cases


def items_grid_2019():
    arrays = ARRAYS + [[1, "a", True], ["a", 1]]
    return [
        matrix_case("schema-form items", {"items": {"type": "integer"}},
                    arrays, "2019-09"),
        matrix_case("array-form items positional",
                    {"items": [{"type": "integer"}, {"type": "string"}]},
                    arrays, "2019-09"),
        matrix_case("array-form items with additionalItems schema",
                    {"items": [{"type": "integer"}],
                     "additionalItems": {"type": "string"}},
                    arrays, "2019-09"),
        matrix_case("array-form items with additionalItems false",
                    {"items": [{"type": "integer"}, {"type": "integer"}],
                     "additionalItems": False}, arrays, "2019-09"),
        matrix_case("additionalItems without array items is ignored",
                    {"items": {"type": "integer"},
                     "additionalItems": False}, arrays, "2019-09"),
        matrix_case("bare additionalItems is ignored",
                    {"additionalItems": False}, arrays, "2019-09"),
        # NOTE deliberately no `items: []` case: with an empty array form
        # the reference emits no items annotation, so additionalItems
        # never applies — an underspecified corner we don't pin.
        matrix_case("items + contains interplay",
                    {"items": {"minimum": 0},
                     "contains": {"minimum": 5}},
                    arrays + [[5], [0, 5], [-1, 5]], "2019-09"),
        matrix_case("array assertions alongside items",
                    {"items": {"type": "integer"}, "minItems": 1,
                     "maxItems": 3, "uniqueItems": True},
                    arrays, "2019-09"),
    ]


def ref_scopes():
    """$id scoping / $defs chains / anchors — truths stated per case
    (structure too dynamic for the mini evaluator's #/$defs-only
    resolver), still reference-verified like everything else."""
    def case(desc, schema, tests):
        return {"description": desc, "schema": schema,
                "tests": [{"description": d, "data": v, "valid": ok}
                          for d, v, ok in tests]}
    return [
        case("two-hop $defs chain",
             {"$defs": {"a": {"$ref": "#/$defs/b"},
                        "b": {"type": "integer"}},
              "$ref": "#/$defs/a"},
             [("integer", 3, True), ("string", "x", False),
              ("float integer", 3.0, True), ("bool", True, False)]),
        case("ref with sibling keywords both apply",
             {"$defs": {"pos": {"minimum": 0}},
              "$ref": "#/$defs/pos", "maximum": 10},
             [("in range", 5, True), ("negative", -1, False),
              ("too big", 11, False), ("edge 0", 0, True),
              ("edge 10", 10, True), ("string passes", "x", True)]),
        case("embedded resource rebases pointer refs",
             {"$defs": {"inner": {
                 "$id": "https://example.com/inner-r4",
                 "$defs": {"leaf": {"const": 7}},
                 "$ref": "#/$defs/leaf"}},
              "$ref": "#/$defs/inner"},
             [("const match", 7, True), ("other", 8, False)]),
        case("anchor in root resource",
             {"$defs": {"n": {"$anchor": "num-r4",
                              "type": "number"}},
              "$ref": "#num-r4"},
             [("number", 1.5, True), ("string", "x", False),
              ("bool not number", True, False)]),
        case("recursive list via $defs",
             {"$defs": {"list": {
                 "anyOf": [{"type": "null"},
                           {"type": "object",
                            "properties": {
                                "head": {"type": "integer"},
                                "tail": {"$ref": "#/$defs/list"}},
                            "required": ["head", "tail"],
                            "additionalProperties": False}]}},
              "$ref": "#/$defs/list"},
             [("null", None, True),
              ("one cell", {"head": 1, "tail": None}, True),
              ("two cells", {"head": 1, "tail": {"head": 2,
                                                 "tail": None}}, True),
              ("bad head", {"head": "x", "tail": None}, False),
              ("bad deep tail",
               {"head": 1, "tail": {"head": 2, "tail": 3}}, False),
              ("missing tail", {"head": 1}, False)]),
        case("ref to boolean schema false",
             {"$defs": {"nope": False}, "$ref": "#/$defs/nope"},
             [("anything fails", 1, False), ("null fails", None, False)]),
        case("ref into if-then-else",
             {"$defs": {"cond": {"if": {"type": "integer"},
                                 "then": {"minimum": 0},
                                 "else": {"minLength": 2}}},
              "$ref": "#/$defs/cond"},
             [("non-negative int", 3, True), ("negative int", -3, False),
              ("long string", "ab", True), ("short string", "a", False),
              ("bool skips both", True, True)]),
        case("sibling ref inside allOf branch",
             {"$defs": {"s": {"type": "string"}},
              "allOf": [{"$ref": "#/$defs/s"}, {"minLength": 2}]},
             [("long string", "abc", True), ("short", "a", False),
              ("number", 3, False)]),
        case("nested defs shadowing by pointer",
             {"$defs": {"x": {"$defs": {"y": {"const": 1}},
                              "$ref": "#/$defs/x/$defs/y"}},
              "$ref": "#/$defs/x"},
             [("one", 1, True), ("two", 2, False)]),
        case("chain through three resources",
             {"$defs": {
                 "a": {"$id": "https://example.com/r4-a",
                       "$ref": "https://example.com/r4-b"},
                 "b": {"$id": "https://example.com/r4-b",
                       "type": "array"}},
              "$ref": "https://example.com/r4-a"},
             [("array", [1], True), ("object", {}, False),
              ("string", "x", False)]),
    ]


def content_annotations():
    """content* keywords are annotation-only in 2020-12/2019-09: every
    instance passes regardless of payload wellformedness."""
    insts = ["eyJmb28iOiAiYmFyIn0=", "not base64!", "{}", "{", 5, None,
             ["x"], {"k": 1}]
    return [
        matrix_case("contentEncoding base64",
                    {"contentEncoding": "base64"}, insts),
        matrix_case("contentMediaType json",
                    {"contentMediaType": "application/json"}, insts),
        matrix_case("encoding + mediaType + schema stack",
                    {"contentEncoding": "base64",
                     "contentMediaType": "application/json",
                     "contentSchema": {"required": ["foo"]}}, insts),
        matrix_case("contentSchema without mediaType is ignored",
                    {"contentSchema": False}, insts),
    ]


def recursive_grid_2019():
    """$recursiveRef/$recursiveAnchor — truths stated per case."""
    def case(desc, schema, tests):
        return {"description": desc, "schema": schema,
                "tests": [{"description": d, "data": v, "valid": ok}
                          for d, v, ok in tests]}
    tree_ok = {"v": 1, "kids": [{"v": 2, "kids": []}]}
    tree_bad = {"v": 1, "kids": [{"v": "x", "kids": []}]}
    return [
        case("recursiveRef without anchor behaves like #",
             {"properties": {"kids": {
                 "type": "array",
                 "items": {"$recursiveRef": "#"}},
                 "v": {"type": "integer"}},
              "required": ["v"]},
             [("good tree", tree_ok, True),
              ("bad nested v", tree_bad, False),
              ("leaf", {"v": 3}, True),
              ("missing v", {"kids": []}, False)]),
        case("recursiveAnchor true at root",
             {"$recursiveAnchor": True,
              "properties": {"kids": {
                  "type": "array",
                  "items": {"$recursiveRef": "#"}},
                  "v": {"type": "integer"}},
              "required": ["v"]},
             [("good tree", tree_ok, True),
              ("bad nested v", tree_bad, False),
              ("deep",
               {"v": 1, "kids": [{"v": 2,
                                  "kids": [{"v": 3, "kids": []}]}]},
               True)]),
    ]


# ---------------------------------------------------------------------------
# optional/format additions (labels per RFC; run with OUR validators —
# the harness's fmt mode — so no reference cross-check applies)

FORMAT_FILES = {
    "optional_format_relative_json_pointer.json": ("relative-json-pointer", [
        ("upwards 1", "1", True),
        ("upwards 0 with pointer", "0/foo/bar", True),
        ("upwards 2 with pointer", "2/0/baz", True),
        ("hash form", "0#", True),
        ("up then hash", "120#", True),
        ("negative prefix", "-1/foo", False),
        ("leading zero count", "01/a", False),
        ("bare pointer", "/foo", False),
        ("hash then pointer", "0#/foo", False),
        ("empty", "", False),
        ("plain word", "foo", False),
        ("bad escape in pointer", "0/~2", False),
    ]),
    "optional_format_uri_reference.json": ("uri-reference", [
        ("absolute uri", "http://example.com/a", True),
        ("relative path", "abc", True),
        ("absolute path", "/abc", True),
        ("network-path", "//example.com/x", True),
        ("empty string", "", True),
        ("query only", "?q=1", True),
        ("fragment only", "#frag", True),
        ("space is invalid", "ab c", False),
        ("bad percent escape", "/%zz", False),
        ("backslash is invalid", "\\\\a", False),
    ]),
    "optional_format_ipv6_more.json": ("ipv6", [
        ("full form", "2001:0db8:85a3:0000:0000:8a2e:0370:7334", True),
        ("compressed middle", "2001:db8::8a2e:370:7334", True),
        ("all zeros", "::", True),
        ("trailing ipv4", "::ffff:192.168.0.1", True),
        ("too many groups", "1:2:3:4:5:6:7:8:9", False),
        ("two double-colons", "1::2::3", False),
        ("group too long", "12345::", False),
        ("bad hex", "g::1", False),
        ("trailing colon", "1:2:3:4:5:6:7:", False),
        ("embedded ipv4 bad octet", "::ffff:256.0.0.1", False),
    ]),
    "optional_format_hostname_more.json": ("hostname", [
        ("single label", "localhost", True),
        # trailing dot pinned INVALID repo-wide (optional_format_hostname
        # .json "trailing dot is invalid here") — strict RFC 1123 labels
        ("trailing dot", "example.com.", False),
        ("digits label", "123.example.com", True),
        ("hyphen inside", "ab-cd.example.com", True),
        ("63-char label", "a" * 63 + ".example.com", True),
        ("64-char label", "a" * 64 + ".example.com", False),
        ("label ends with hyphen", "abc-.example.com", False),
        ("label starts with hyphen", "-abc.example.com", False),
        ("empty label", "a..b", False),
        ("underscore", "a_b.example.com", False),
        ("overlong name", ("a." * 127) + "ab", False),
    ]),
    "optional_format_date_more.json": ("date", [
        ("min date", "0001-01-01", True),
        ("max month day", "2024-12-31", True),
        ("april 31 invalid", "2024-04-31", False),
        ("month 13", "2024-13-01", False),
        ("month 00", "2024-00-10", False),
        ("day 00", "2024-01-00", False),
        ("century leap ok", "2000-02-29", True),
        ("century non-leap", "1900-02-29", False),
        ("trailing junk", "2024-01-02x", False),
        ("time suffix not a date", "2024-01-02T00:00:00Z", False),
    ]),
    "optional_format_time_more.json": ("time", [
        ("midnight zulu", "00:00:00Z", True),
        ("fractional seconds", "12:30:45.123456Z", True),
        ("negative offset", "23:00:00-11:30", True),
        ("offset minute 60", "10:00:00+05:60", False),
        ("hour 24", "24:00:00Z", False),
        ("second 61", "10:00:61Z", False),
        ("no offset", "10:00:00", False),
        ("lowercase z", "10:00:00z", True),
        ("offset hour 24", "10:00:00+24:00", False),
    ]),
    "optional_format_duration_more.json": ("duration", [
        ("weeks only", "P2W", True),
        ("date and time", "P1DT2H", True),
        ("time only", "PT5M", True),
        ("fractional seconds", "PT0.001S", True),
        ("weeks with days", "P1W2D", False),
        ("missing T for time part", "P1H", False),
        ("empty time part", "P1DT", False),
        ("wrong order", "PT2H1D", False),
        ("no designators", "P", False),
        ("years months days", "P1Y2M3D", True),
    ]),
    "optional_format_email_more.json": ("email", [
        ("plus tag", "a+tag@example.com", True),
        ("dotted local", "first.last@example.com", True),
        ("quoted local", "\"a b\"@example.com", True),
        ("double dot local", "a..b@example.com", False),
        ("leading dot local", ".ab@example.com", False),
        ("missing at", "abexample.com", False),
        ("two ats", "a@b@example.com", False),
        ("empty local", "@example.com", False),
        ("ip literal domain", "a@[192.168.0.1]", True),
    ]),
    "optional_format_uuid_more.json": ("uuid", [
        ("nil uuid", "00000000-0000-0000-0000-000000000000", True),
        ("version 4", "3d1c586a-994c-4b1e-b43a-7b4e0f2d6a11", True),
        ("braces not allowed", "{3d1c586a-994c-4b1e-b43a-7b4e0f2d6a11}",
         False),
        ("urn prefix not bare uuid",
         "urn:uuid:3d1c586a-994c-4b1e-b43a-7b4e0f2d6a11", False),
        ("bad group lengths", "3d1c586a-994c-4b1e-b43a7b4e0f2d6a11",
         False),
        ("non-hex char", "3d1c586a-994c-4b1e-b43a-7b4e0f2d6a1g", False),
        ("uppercase ok", "3D1C586A-994C-4B1E-B43A-7B4E0F2D6A11", True),
    ]),
    "optional_format_json_pointer_more.json": ("json-pointer", [
        ("deep pointer", "/a/b/c/d/e", True),
        ("numeric tokens", "/0/1/2", True),
        ("escaped slash", "/a~1b/c", True),
        ("escaped tilde", "/a~0b", True),
        ("unicode token", "/日本", True),
        ("tilde then digit ok", "/a~0", True),
        ("tilde 3", "/a~3", False),
        ("double slash empty tokens ok", "//", True),
        ("no leading slash", "a/b", False),
    ]),
}


def composition_grid():
    insts = MIXED + [2, 3, 4, "ab", [2, 3]]
    return [
        matrix_case("allOf of anyOf branches",
                    {"allOf": [{"anyOf": [{"type": "integer"},
                                          {"type": "string"}]},
                               {"anyOf": [{"minimum": 2},
                                          {"maxLength": 2}]}]}, insts),
        matrix_case("oneOf overlapping branches",
                    {"oneOf": [{"type": "integer"},
                               {"minimum": 2}]}, insts),
        matrix_case("oneOf with all-false branches",
                    {"oneOf": [False, False]}, insts),
        matrix_case("oneOf exactly one true branch",
                    {"oneOf": [True, False, False]}, insts),
        matrix_case("not of not", {"not": {"not": {"type": "integer"}}},
                    insts),
        matrix_case("not with applicator",
                    {"not": {"properties": {"a": {"const": 1}},
                             "required": ["a"]}},
                    OBJECTS + [3, "x"]),
        matrix_case("anyOf short-circuit equivalence",
                    {"anyOf": [True, False]}, insts),
        matrix_case("allOf with contradictory branches",
                    {"allOf": [{"type": "integer"},
                               {"type": "string"}]}, insts),
        matrix_case("triple nesting allOf-anyOf-not",
                    {"allOf": [{"anyOf": [
                        {"not": {"type": "null"}}]}]}, insts),
        matrix_case("oneOf with subschema assertions",
                    {"oneOf": [{"multipleOf": 2}, {"multipleOf": 3}]},
                    NUMBERS[:14] + ["x", None]),
        matrix_case("allOf duplicated branch",
                    {"allOf": [{"minimum": 2}, {"minimum": 2}]}, insts),
        matrix_case("empty allOf-style base with not-false",
                    {"not": False}, insts),
        matrix_case("anyOf nested in oneOf",
                    {"oneOf": [{"anyOf": [{"type": "integer"},
                                          {"type": "number"}]},
                               {"type": "string"}]}, insts),
        matrix_case("conditional inside allOf with assertions",
                    {"allOf": [{"if": {"type": "integer"},
                                "then": {"minimum": 0}}],
                     "not": {"const": 7}}, insts),
    ]


def uniqueness_grid():
    arrays = [
        [], [1], [1, 2], [1, 1], [1, 1.0], [1, True], [0, False],
        [True, True], [None, None], ["a", "a"], ["a", "A"],
        [{"a": 1}, {"a": 1}], [{"a": 1}, {"a": 1.0}],
        [{"a": 1}, {"b": 1}], [{"a": 1, "b": 2}, {"b": 2, "a": 1}],
        [[1, 2], [1, 2]], [[1, 2], [2, 1]], [[], []],
        [{}, {}], [1, [1]], [{"a": [1]}, {"a": [1.0]}],
        ["1", 1], [1.5, 3 / 2],
    ]
    return [
        matrix_case("uniqueItems true deep equality",
                    {"uniqueItems": True}, arrays),
        matrix_case("uniqueItems false accepts all",
                    {"uniqueItems": False}, arrays),
        matrix_case("uniqueItems with items schema",
                    {"uniqueItems": True, "items": {"type": ["integer",
                     "number", "array", "object", "boolean", "null",
                     "string"]}}, arrays),
        matrix_case("uniqueItems with min/maxItems",
                    {"uniqueItems": True, "minItems": 1, "maxItems": 3},
                    arrays),
        matrix_case("uniqueItems on non-arrays passes",
                    {"uniqueItems": True}, SCALARS),
        matrix_case("uniqueItems with contains",
                    {"uniqueItems": True,
                     "contains": {"type": "integer"}}, arrays),
    ]


def type_multi():
    insts = MIXED + [3.5, [1], {"a": 1}]
    return [
        matrix_case("two-type union", {"type": ["integer", "string"]},
                    insts),
        matrix_case("all seven types",
                    {"type": ["null", "boolean", "object", "array",
                              "number", "string", "integer"]}, insts),
        matrix_case("number excludes bools",
                    {"type": ["number"]}, insts),
        matrix_case("integer accepts integral floats",
                    {"type": "integer"},
                    [1, 1.0, 1.5, -2.0, 0.0, 1e10, True, "1"]),
        matrix_case("union with assertions both apply",
                    {"type": ["integer", "string"], "minimum": 2,
                     "minLength": 2}, insts),
        matrix_case("array-or-object with container assertions",
                    {"type": ["array", "object"], "minItems": 1,
                     "minProperties": 1}, insts),
        matrix_case("null only", {"type": ["null"]}, insts),
        matrix_case("boolean only", {"type": "boolean"}, insts),
        matrix_case("union in properties",
                    {"properties": {"a": {"type": ["integer", "null"]}}},
                    OBJECTS + [{"a": None}, {"a": "x"}, {"a": 1.0}]),
        matrix_case("union with enum interplay",
                    {"type": ["integer", "string"], "enum": [1, "a", 2.5,
                     None]}, insts),
    ]


def length_bounds_grid():
    insts = (STRINGS[:8] + ARRAYS[:8]
             + OBJECTS[:8] + [None, 5])
    return [
        matrix_case("maxLength 0", {"maxLength": 0}, insts),
        matrix_case("minLength equals maxLength",
                    {"minLength": 2, "maxLength": 2}, insts),
        matrix_case("minItems 0 accepts empty", {"minItems": 0}, insts),
        matrix_case("maxItems 0 only empty", {"maxItems": 0}, insts),
        matrix_case("minItems equals maxItems",
                    {"minItems": 2, "maxItems": 2}, insts),
        matrix_case("maxProperties 0 only empty object",
                    {"maxProperties": 0}, insts),
        matrix_case("minProperties equals maxProperties",
                    {"minProperties": 2, "maxProperties": 2}, insts),
        matrix_case("crossed bounds are unsatisfiable for strings",
                    {"minLength": 3, "maxLength": 2}, insts),
        matrix_case("all length families at once",
                    {"minLength": 1, "maxLength": 3, "minItems": 1,
                     "maxItems": 3, "minProperties": 1,
                     "maxProperties": 3}, insts),
        matrix_case("bounds with required interplay",
                    {"minProperties": 2, "required": ["a"]}, insts),
        matrix_case("length bounds ignore non-strings",
                    {"minLength": 100}, insts),
        matrix_case("item bounds ignore non-arrays",
                    {"minItems": 100}, insts),
    ]


def write(path: pathlib.Path, cases):
    path.write_text(json.dumps(cases, indent=2, ensure_ascii=False)
                    + "\n")
    n = sum(len(c["tests"]) for c in cases)
    print(f"wrote {path.relative_to(ROOT)}: {len(cases)} groups, "
          f"{n} tests")
    return n


def crosscheck(files_by_version):
    """Every non-format triple must agree with the actual reference
    evaluator under every dialect it will run in."""
    from ref_oracle import evaluate_with_reference, load_reference

    handles = {v: load_reference(v)
               for v in ("2020-12", "2019-09", "next")}
    if any(h is None for h in handles.values()):
        print("reference unavailable — SKIPPING crosscheck",
              file=sys.stderr)
        return
    meta = {"2020-12": "https://json-schema.org/draft/2020-12/schema",
            "2019-09": "https://json-schema.org/draft/2019-09/schema",
            "next": "https://json-schema.org/draft/next/schema"}
    n = bad = 0
    for versions, cases in files_by_version:
        for case in cases:
            for t in case["tests"]:
                for ver in versions:
                    schema = case["schema"]
                    if isinstance(schema, dict) and "$schema" not in schema:
                        schema = {"$schema": meta[ver], **schema}
                    if isinstance(schema, dict) and "$id" not in schema:
                        # the reference needs a catalog identity to
                        # resolve '#/...' refs (same synthetic-URI move
                        # as tests/test_suite_cases.py)
                        uid = f"{n}-{ver}"
                        schema = {**schema,
                                  "$id": f"https://gen-r4.local/{uid}"}
                    out = evaluate_with_reference(
                        schema, t["data"], handle=handles[ver])
                    n += 1
                    if bool(out["valid"]) != t["valid"]:
                        bad += 1
                        print(f"MISMATCH [{ver}] {case['description']} / "
                              f"{t['description']}: stated {t['valid']}, "
                              f"reference says {out['valid']}",
                              file=sys.stderr)
    if bad:
        sys.exit(f"{bad}/{n} reference mismatches — aborting")
    print(f"reference crosscheck: {n} evaluations, all agree")


def main():
    d2020 = CORPUS / "2020-12"
    d2019 = CORPUS / "2019-09"

    # SHARED files (harness runs them under 2020-12, 2019-09 and next)
    shared = {
        "generated_conditional_matrix.json": conditional_matrix(),
        "generated_propname_dependents.json": propname_dependents_matrix(),
        "generated_contains_grid.json": contains_grid(),
        "generated_numeric_edges.json": numeric_edges(),
        "generated_string_patterns.json": string_patterns(),
        "generated_enum_const_deep.json": enum_const_deep(),
        "generated_object_matrix2.json": object_matrix2(),
        "generated_ref_scopes.json": ref_scopes(),
        "generated_content_annotations.json": content_annotations(),
        "generated_composition_grid.json": composition_grid(),
        "generated_uniqueness_grid.json": uniqueness_grid(),
        "generated_type_multi.json": type_multi(),
        "generated_length_bounds_grid.json": length_bounds_grid(),
    }
    only_2020 = {
        "generated_unevaluated_deep.json": unevaluated_deep("2020-12"),
    }
    only_2019 = {
        "generated_2019_unevaluated_deep.json":
            unevaluated_deep("2019-09"),
        "generated_2019_items_grid.json": items_grid_2019(),
        "generated_2019_recursive_grid.json": recursive_grid_2019(),
    }

    total = 0
    files_by_version = []
    for name, cases in shared.items():
        total += write(d2020 / name, cases)
        files_by_version.append((("2020-12", "2019-09", "next"), cases))
    for name, cases in only_2020.items():
        total += write(d2020 / name, cases)
        files_by_version.append((("2020-12", "next"), cases))
    for name, cases in only_2019.items():
        total += write(d2019 / name, cases)
        files_by_version.append((("2019-09",), cases))

    for name, (fmt, rows) in FORMAT_FILES.items():
        cases = [{
            "description": f"validation of {fmt} strings",
            "schema": {"format": fmt},
            "tests": [{"description": d, "data": v, "valid": ok}
                      for d, v, ok in rows],
        }]
        total += write(d2020 / name, cases)

    print(f"total generated test rows: {total}")
    crosscheck(files_by_version)


if __name__ == "__main__":
    main()
