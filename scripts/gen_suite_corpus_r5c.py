"""Round-5c corpus: CROSS-DOCUMENT $recursiveRef (2019-09) — the
legacy-dialect analogue of refRemote_dynamic.json's remote $dynamicRef
cases. The official suite exercises same-document recursion
(recursiveRef.json, vendored); recursion THROUGH a remote document —
where the dynamic outermost $recursiveAnchor lives in the referencing
root, not the document containing the $recursiveRef — is the hard
ecosystem corner this file pins.

Cross-checked against the actual reference evaluator under 2019-09
(remotes registered leaves-first; abort on mismatch).

Run from repo root: python scripts/gen_suite_corpus_r5c.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
CORPUS = ROOT / "tests" / "suite_corpus"
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT))

B = "https://gen-r5c.jschon-ray.local"
META = "https://json-schema.org/draft/2019-09/schema"

TREE = {
    "$id": f"{B}/tree.json",
    "$recursiveAnchor": True,
    "type": "object",
    "properties": {
        "v": True,
        "kids": {"type": "array", "items": {"$recursiveRef": "#"}}},
}

TREE_NO_ANCHOR = {
    "$id": f"{B}/tree-static.json",
    "type": "object",
    "properties": {
        "v": True,
        "kids": {"type": "array", "items": {"$recursiveRef": "#"}}},
}


def case(desc, schema, tests, remotes):
    return {"description": desc, "schema": schema, "remotes": remotes,
            "tests": [{"description": d, "data": v, "valid": ok}
                      for d, v, ok in tests]}


CASES = [
    case(
        "remote $recursiveRef lands on the referencing ROOT's "
        "$recursiveAnchor (dynamic outermost), tightening recursion",
        {"$id": f"{B}/root-dyn.json",
         "$recursiveAnchor": True,
         "$ref": f"{B}/tree.json",
         "properties": {"v": {"type": "integer"}}},
        [("integers at every depth valid",
          {"v": 1, "kids": [{"v": 2, "kids": []}]}, True),
         ("string at depth caught by the ROOT constraint",
          {"v": 1, "kids": [{"v": "s", "kids": []}]}, False),
         ("string at the root caught directly",
          {"v": "s", "kids": []}, False)],
        remotes={f"{B}/tree.json": TREE},
    ),
    case(
        "root WITHOUT $recursiveAnchor: the remote $recursiveRef "
        "falls back to the remote's own resource root (plain-$ref "
        "behavior), so the root's tightening does NOT recurse",
        {"$id": f"{B}/root-static.json",
         "$ref": f"{B}/tree.json",
         "properties": {"v": {"type": "integer"}}},
        [("string at depth now ALLOWED (recursion re-enters only the "
          "remote)", {"v": 1, "kids": [{"v": "s", "kids": []}]}, True),
         ("string at the root still caught by the root's own "
          "properties", {"v": "s", "kids": []}, False),
         ("non-object kid still fails the remote's type",
          {"v": 1, "kids": [3]}, False)],
        remotes={f"{B}/tree.json": TREE},
    ),
    case(
        "$recursiveRef in a remote with NO $recursiveAnchor anywhere "
        "behaves as $ref to the remote root even when the referencing "
        "root carries an anchor",
        {"$id": f"{B}/root-dyn2.json",
         "$recursiveAnchor": True,
         "$ref": f"{B}/tree-static.json",
         "properties": {"v": {"type": "integer"}}},
        [("string at depth allowed (no anchor in the remote to chain "
          "through)", {"v": 1, "kids": [{"v": "s", "kids": []}]}, True),
         ("root string still caught", {"v": "s", "kids": []}, False)],
        remotes={f"{B}/tree-static.json": TREE_NO_ANCHOR},
    ),
]


def main():
    from ref_oracle import load_reference

    h = load_reference("2019-09")
    if h is None:
        sys.exit("reference unavailable")
    muri = h["URI"](META)
    n = bad = 0
    for c in CASES:
        for r_uri, doc in reversed(list(c["remotes"].items())):
            h["JSONSchema"](dict(doc), catalog=h["catalog"],
                            uri=h["URI"](r_uri), metaschema_uri=muri)
        schema = dict(c["schema"])
        schema.setdefault("$schema", META)
        root = h["JSONSchema"](schema, catalog=h["catalog"],
                               metaschema_uri=muri)
        for t in c["tests"]:
            out = root.evaluate(h["JSON"](t["data"])).output("flag")
            n += 1
            if bool(out["valid"]) != t["valid"]:
                bad += 1
                print(f"MISMATCH {c['description']} / "
                      f"{t['description']}: stated {t['valid']}, "
                      f"reference says {out['valid']}", file=sys.stderr)
    if bad:
        sys.exit(f"{bad}/{n} reference mismatches — aborting")
    print(f"reference crosscheck (2019-09): {n} evaluations, all agree")
    path = CORPUS / "2019-09" / "refRemote_recursive_2019.json"
    path.write_text(json.dumps(CASES, indent=2, ensure_ascii=False)
                    + "\n")
    print(f"wrote {path.relative_to(ROOT)}: {len(CASES)} groups, "
          f"{n} tests")


if __name__ == "__main__":
    main()
