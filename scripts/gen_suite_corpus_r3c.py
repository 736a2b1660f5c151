"""Round-3c conformance corpus: hand-authored 2019-09 interplay families.

Each case's expected verdict is stated from spec reasoning (JSON Schema
2019-09 core/validation, annotation-driven unevaluated* semantics); at
generation time EVERY case is cross-checked against the actual reference
evaluator (/root/reference via tests/ref_oracle.py) — any disagreement
aborts the run, so nothing unverified lands in the corpus.

Covers the annotation-semantics corners the generated matrices don't:
  * applied-branch-only annotation flow (if/then/else, anyOf, oneOf, not)
    feeding unevaluatedProperties;
  * dependentSchemas annotations only when triggered;
  * contains with minContains: 0;
  * $ref WITH sibling keywords (2019-09 allows them, draft-07 did not)
    and ref-carried annotations feeding unevaluated*;
  * $anchor resolution inside $defs and embedded resources;
  * propertyNames NOT contributing evaluated-property annotations;
  * format as annotation-only (2019-09 default);
  * array-form items behind $ref feeding unevaluatedItems.

Usage: PYTHONPATH=/root/repo python scripts/gen_suite_corpus_r3c.py
Idempotent: fixed case rosters, no randomness.
"""
from __future__ import annotations

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

CORPUS = ROOT / "tests" / "suite_corpus" / "2019-09"
META = "https://json-schema.org/draft/2019-09/schema"


def case(desc, schema, tests):
    if isinstance(schema, dict) and "$schema" not in schema:
        schema = {"$schema": META, **schema}
    return {"description": desc, "schema": schema,
            "tests": [{"description": d, "data": data, "valid": v}
                      for d, data, v in tests]}


def fam_branch_annotations():
    cases = [
        case("if annotations apply only when if passes (unevaluatedProperties)",
             {"if": {"properties": {"a": {"type": "string"}},
                     "required": ["a"]},
              "then": {"properties": {"b": True}},
              "unevaluatedProperties": False},
             [("if+then pass: both properties evaluated",
               {"a": "x", "b": 1}, True),
              ("if passes alone", {"a": "x"}, True),
              ("if fails on type: its annotations are dropped",
               {"a": 1}, False),
              ("if fails on required: b stays unevaluated",
               {"b": 1}, False),
              ("empty object: nothing unevaluated", {}, True)]),
        case("else branch contributes annotations only when if fails",
             {"if": {"required": ["a"]},
              "properties": {"a": True},
              "else": {"properties": {"b": True}},
              "unevaluatedProperties": False},
             [("if passes: else annotations absent, b unevaluated",
               {"a": 1, "b": 2}, False),
              ("if fails: else evaluates b", {"b": 2}, True),
              ("if passes with only a", {"a": 1}, True)]),
        case("anyOf: every PASSING branch contributes annotations",
             {"anyOf": [
                 {"properties": {"a": {"type": "integer"}},
                  "required": ["a"]},
                 {"properties": {"b": {"type": "integer"}},
                  "required": ["b"]}],
              "unevaluatedProperties": False},
             [("first branch only", {"a": 1}, True),
              ("second branch only", {"b": 2}, True),
              ("both branches pass: both annotations",
               {"a": 1, "b": 2}, True),
              ("failing branch's property stays unevaluated",
               {"a": 1, "b": "x"}, False),
              ("no branch passes", {"c": 1}, False)]),
        case("oneOf: the single passing branch contributes annotations",
             {"oneOf": [
                 {"required": ["a"], "properties": {"a": True}},
                 {"required": ["b"], "properties": {"b": True}}],
              "unevaluatedProperties": False},
             [("first branch", {"a": 1}, True),
              ("second branch", {"b": 2}, True),
              ("both match: oneOf itself fails", {"a": 1, "b": 2}, False),
              ("extra property unevaluated", {"a": 1, "c": 3}, False)]),
        case("not: annotations inside a negated subschema never escape",
             {"not": {"not": {"properties": {"a": True},
                              "required": ["a"]}},
              "unevaluatedProperties": False},
             [("double negation passes but a stays unevaluated",
               {"a": 1}, False)]),
        case("failed allOf arm still fails overall (annotations moot)",
             {"allOf": [{"properties": {"a": {"type": "integer"}}},
                        {"properties": {"b": {"type": "string"}}}],
              "unevaluatedProperties": False},
             [("both arms evaluate their properties",
               {"a": 1, "b": "x"}, True),
              ("arm type failure dominates", {"a": "no", "b": "x"}, False),
              ("property outside both arms", {"a": 1, "c": 2}, False)]),
    ]
    return "branch_annotations_2019.json", cases


def fam_dependent_unevaluated():
    cases = [
        case("dependentSchemas contributes annotations only when triggered",
             {"properties": {"a": True},
              "dependentSchemas": {"a": {"properties": {"b": True}}},
              "unevaluatedProperties": False},
             [("trigger present: b evaluated", {"a": 1, "b": 2}, True),
              ("no trigger: b unevaluated", {"b": 2}, False),
              ("trigger alone", {"a": 1}, True),
              ("untouched property", {"a": 1, "c": 3}, False)]),
        case("dependentRequired is assertion-only (no annotations)",
             {"properties": {"a": True},
              "dependentRequired": {"a": ["b"]},
              "unevaluatedProperties": False},
             [("dependency satisfied but b unevaluated",
               {"a": 1, "b": 2}, False),
              ("dependency missing", {"a": 1}, False),
              ("no trigger, empty ok", {}, True)]),
    ]
    return "dependent_unevaluated_2019.json", cases


def fam_contains_min0():
    cases = [
        case("minContains: 0 makes contains pass on empty arrays",
             {"contains": {"type": "string"}, "minContains": 0},
             [("empty array", [], True),
              ("no match still passes under minContains 0", [1, 2], True),
              ("match passes", ["x"], True)]),
        case("minContains: 0 with maxContains cap",
             {"contains": {"type": "string"}, "minContains": 0,
              "maxContains": 1},
             [("zero matches ok", [1], True),
              ("one match ok", ["x", 1], True),
              ("two matches exceed maxContains", ["x", "y"], False)]),
        case("minContains raises the floor",
             {"contains": {"type": "string"}, "minContains": 2},
             [("one match below floor", ["x", 1], False),
              ("two matches", ["x", "y"], True),
              ("empty array fails", [], False)]),
    ]
    return "contains_min0_2019.json", cases


def fam_ref_siblings():
    cases = [
        case("2019-09 $ref applies ALONGSIDE sibling keywords",
             {"$id": "https://gen2019c.example/sib1",
              "$defs": {"s": {"type": "integer"}},
              "$ref": "#/$defs/s", "maximum": 5},
             [("passes both", 4, True),
              ("sibling maximum fails", 7, False),
              ("ref type fails", "x", False)]),
        case("annotations through $ref feed unevaluatedProperties",
             {"$id": "https://gen2019c.example/sib2",
              "$defs": {"base": {"properties": {"a": True}}},
              "$ref": "#/$defs/base",
              "properties": {"b": True},
              "unevaluatedProperties": False},
             [("ref evaluates a, sibling evaluates b",
               {"a": 1, "b": 2}, True),
              ("untouched property", {"a": 1, "c": 3}, False),
              ("empty ok", {}, True)]),
        case("nested $ref chains still carry annotations",
             {"$id": "https://gen2019c.example/sib3",
              "$defs": {
                 "l1": {"$ref": "#/$defs/l2"},
                 "l2": {"properties": {"deep": {"type": "integer"}}}},
              "$ref": "#/$defs/l1",
              "unevaluatedProperties": False},
             [("property evaluated two refs down", {"deep": 1}, True),
              ("type check still applies through the chain",
               {"deep": "x"}, False),
              ("other property unevaluated", {"other": 1}, False)]),
    ]
    return "ref_siblings_2019.json", cases


def fam_anchor():
    cases = [
        case("$anchor inside $defs resolves via plain-name fragment",
             {"$id": "https://gen2019c.example/root",
              "$defs": {"x": {"$anchor": "node", "type": "string"}},
              "$ref": "https://gen2019c.example/root#node"},
             [("string ok", "s", True),
              ("integer rejected", 1, False)]),
        case("$anchor of an embedded resource uses the EMBEDDED base URI",
             {"$id": "https://gen2019c.example/r2",
              "$defs": {"sub": {"$id": "https://gen2019c.example/sub",
                                "$anchor": "deep", "type": "integer"}},
              "$ref": "https://gen2019c.example/sub#deep"},
             [("integer ok", 3, True),
              ("string rejected", "s", False)]),
        case("relative $ref resolves against the nearest $id",
             {"$id": "https://gen2019c.example/dir/root.json",
              "$defs": {"leaf": {"$id": "leaf.json",
                                 "type": "boolean"}},
              "$ref": "https://gen2019c.example/dir/leaf.json"},
             [("boolean ok", True, True),
              ("number rejected", 1, False)]),
    ]
    return "anchor_defs_2019.json", cases


def fam_propertynames():
    cases = [
        case("propertyNames does NOT mark properties evaluated",
             {"propertyNames": {"minLength": 1},
              "unevaluatedProperties": False},
             [("name passes but property stays unevaluated",
               {"a": 1}, False),
              ("empty object fine", {}, True)]),
        case("propertyNames + patternProperties + unevaluatedProperties",
             {"propertyNames": {"maxLength": 2},
              "patternProperties": {"^a": {"type": "integer"}},
              "unevaluatedProperties": {"type": "string"}},
             [("pattern match evaluated as integer", {"ab": 3}, True),
              ("non-match falls to unevaluated string", {"xy": "s"}, True),
              ("non-match fails unevaluated type", {"xy": 3}, False),
              ("name too long fails propertyNames", {"abc": 1}, False),
              ("pattern match with wrong type", {"ab": "s"}, False)]),
        case("propertyNames applies to every member name",
             {"propertyNames": {"pattern": "^[a-z]+$"}},
             [("all lowercase", {"abc": 1, "de": 2}, True),
              ("one bad name", {"abc": 1, "X": 2}, False),
              ("non-object ignored", [1, 2], True)]),
    ]
    return "propertynames_interplay_2019.json", cases


def fam_format_annotation():
    cases = [
        case("format is annotation-only by default in 2019-09",
             {"format": "email"},
             [("non-email string still valid", "not an email", True),
              ("email valid", "a@example.com", True),
              ("non-string ignored by format", 42, True)]),
        case("unknown format names are ignored",
             {"format": "no-such-format-2019"},
             [("anything passes", "zzz", True)]),
    ]
    return "format_annotation_2019.json", cases


def fam_items_ref_unevaluated():
    cases = [
        case("array-form items behind $ref feed unevaluatedItems",
             {"$id": "https://gen2019c.example/iru1",
              "$defs": {"pre": {"items": [True, True]}},
              "$ref": "#/$defs/pre",
              "unevaluatedItems": {"type": "string"}},
             [("covered prefix only", [1, 2], True),
              ("tail matches unevaluated schema", [1, 2, "s"], True),
              ("tail violates unevaluated schema", [1, 2, 3], False),
              ("empty array", [], True)]),
        case("schema-form items behind $ref evaluate everything",
             {"$id": "https://gen2019c.example/iru2",
              "$defs": {"all": {"items": {"type": "integer"}}},
              "$ref": "#/$defs/all",
              "unevaluatedItems": False},
             [("all evaluated by items", [1, 2, 3], True),
              ("items type failure", [1, "x"], False)]),
        case("additionalItems annotations feed unevaluatedItems",
             {"items": [{"type": "integer"}],
              "additionalItems": {"type": "integer"},
              "unevaluatedItems": False},
             [("additionalItems covers the tail", [1, 2, 3], True),
              ("tail type failure", [1, "x"], False)]),
    ]
    return "items_ref_unevaluated_2019.json", cases


FAMILIES = [fam_branch_annotations, fam_dependent_unevaluated,
            fam_contains_min0, fam_ref_siblings, fam_anchor,
            fam_propertynames, fam_format_annotation,
            fam_items_ref_unevaluated]


def main():
    from ref_oracle import evaluate_with_reference, load_reference

    handle = load_reference("2019-09")
    if handle is None:
        print("FATAL: reference evaluator unavailable", file=sys.stderr)
        return 1

    total = 0
    for fam in FAMILIES:
        fname, cases = fam()
        for c in cases:
            for t in c["tests"]:
                out = evaluate_with_reference(c["schema"], t["data"],
                                              handle=handle, fmt="flag")
                got = bool(out["valid"])
                if got != t["valid"]:
                    print(f"FATAL: reference disagrees on "
                          f"{fname} / {c['description']} / "
                          f"{t['description']}: stated {t['valid']}, "
                          f"reference {got}", file=sys.stderr)
                    return 1
                total += 1
        path = CORPUS / fname
        with open(path, "w") as f:
            json.dump(cases, f, indent=1)
        print(f"wrote {path.name}: "
              f"{sum(len(c['tests']) for c in cases)} triples")
    print(f"all {total} triples reference-verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
