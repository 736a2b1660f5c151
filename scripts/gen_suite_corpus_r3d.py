"""Round-3d conformance corpus: applicator wrapper-transparency matrix.

Property under test: wrapping an assertion subschema X in any
verdict-preserving applicator shape must not change the verdict —
  identity, allOf[X], allOf[X, true], anyOf[X, false], anyOf[false, X],
  oneOf[X, false], not(not(X)), if X then true else false,
  if X (absent then) else false, $ref -> $defs/X.

Truth is computed INDEPENDENTLY (straight-from-the-spec rules for the
five inner assertions below), then every generated triple is
cross-checked against the actual reference evaluator under all three
dialects it will run in (2020-12 natively; 2019-09 and next via the
harness's shared-file mechanism) — any disagreement aborts the run.

Output: tests/suite_corpus/2020-12/generated_wrapper_matrix.json
(dialect-free schemas; test_suite_cases.py injects $schema per run and
must list the file in SHARED_WITH_2019).

Usage: PYTHONPATH=/root/repo python scripts/gen_suite_corpus_r3d.py
Idempotent: fixed rosters, no randomness.
"""
from __future__ import annotations

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

OUT = ROOT / "tests" / "suite_corpus" / "2020-12" / \
    "generated_wrapper_matrix.json"


def is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


# inner assertions with independent truth rules
INNERS = [
    ("type integer",
     {"type": "integer"},
     lambda v: (is_num(v) and (isinstance(v, int) or v == int(v)))),
    ("minimum 3",
     {"minimum": 3},
     lambda v: (not is_num(v)) or v >= 3),
    ("pattern ^a",
     {"pattern": "^a"},
     lambda v: (not isinstance(v, str)) or v.startswith("a")),
    ("required k",
     {"required": ["k"]},
     lambda v: (not isinstance(v, dict)) or "k" in v),
    ("maxItems 2",
     {"maxItems": 2},
     lambda v: (not isinstance(v, list)) or len(v) <= 2),
]

INSTANCES = [
    ("integer 2", 2),
    ("integer 5", 5),
    ("float 2.5", 2.5),
    ("string starting with a", "ab"),
    ("string not starting with a", "bz"),
    ("object with k", {"k": 1}),
    ("empty object", {}),
    ("two-item array", [1, 2]),
    ("three-item array", [1, 2, 3]),
    ("null", None),
]

# wrappers: (name, fn(inner_schema, uid) -> schema). All preserve the
# inner verdict by construction.
WRAPPERS = [
    ("identity", lambda x, u: dict(x)),
    ("allOf single", lambda x, u: {"allOf": [x]}),
    ("allOf with true", lambda x, u: {"allOf": [x, True]}),
    ("anyOf with false", lambda x, u: {"anyOf": [x, False]}),
    ("anyOf false first", lambda x, u: {"anyOf": [False, x]}),
    ("oneOf with false", lambda x, u: {"oneOf": [x, False]}),
    ("double negation", lambda x, u: {"not": {"not": x}}),
    ("if-then-else", lambda x, u: {"if": x, "then": True, "else": False}),
    ("if-else no then", lambda x, u: {"if": x, "else": False}),
    ("ref into defs",
     lambda x, u: {"$id": f"https://genwrap.example/{u}",
                   "$defs": {"inner": x}, "$ref": "#/$defs/inner"}),
]


def main():
    from ref_oracle import evaluate_with_reference, load_reference

    handles = {}
    for draft in ("2020-12", "2019-09", "next"):
        h = load_reference(draft)
        if h is None:
            print(f"FATAL: reference unavailable for {draft}",
                  file=sys.stderr)
            return 1
        handles[draft] = h

    cases = []
    uid = 0
    total = 0
    for wname, wrap in WRAPPERS:
        for iname, inner, truth in INNERS:
            uid += 1
            schema = wrap(inner, uid)
            tests = []
            for tname, inst in INSTANCES:
                expect = bool(truth(inst))
                for draft, h in handles.items():
                    out = evaluate_with_reference(
                        dict(schema), inst, handle=h, fmt="flag")
                    if bool(out["valid"]) != expect:
                        print(f"FATAL: {draft} reference disagrees on "
                              f"[{wname} / {iname} / {tname}]: "
                              f"stated {expect}, got {out['valid']}",
                              file=sys.stderr)
                        return 1
                tests.append({"description": tname, "data": inst,
                              "valid": expect})
                total += 1
            cases.append({
                "description": f"wrapper transparency: {wname} "
                               f"around {iname}",
                "schema": schema, "tests": tests})

    with open(OUT, "w") as f:
        json.dump(cases, f, indent=1)
    print(f"wrote {OUT.name}: {len(cases)} groups, {total} triples, "
          f"each verified under 3 reference dialects")
    return 0


if __name__ == "__main__":
    sys.exit(main())
