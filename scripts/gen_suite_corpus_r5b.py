"""Round-5b corpus: the remote-ref ecosystem tail (VERDICT r4 "what's
missing" #1 — 'the long tail of remote-ref/ecosystem fixtures').

Recasts the official suite's hardest remote fixtures (remotes/
baseUriChangeFolder, scope-change-in-subschema, location-independent
identifiers, chained documents, URN bases, retrieval-vs-$id, anchor
shadowing across documents, remote $dynamicRef, remote annotations
feeding unevaluatedProperties) as self-contained cases whose remote
documents ride in each case's ``remotes`` dict — the harness registers
them per case (tests/test_suite_cases.py _register_remotes), exactly
like the official suite's localhost:1234 server.

Every triple is cross-checked against the ACTUAL reference evaluator
with the same remotes registered in its catalog (unique per-case URIs,
abort on mismatch) — same anchoring contract as gen_suite_corpus_r4/r5.

Run from repo root: python scripts/gen_suite_corpus_r5b.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
CORPUS = ROOT / "tests" / "suite_corpus"
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT))

B = "https://gen-r5b.jschon-ray.local"


def case(desc, schema, tests, remotes=None):
    return {"description": desc, "schema": schema,
            "remotes": remotes or {},
            "tests": [{"description": d, "data": v, "valid": ok}
                      for d, v, ok in tests]}


SHARED_CASES = [
    case(
        "base URI change through a folder $id (trailing-slash "
        "resource, relative file ref resolves inside it)",
        {"$id": f"{B}/A/root.json",
         "properties": {"list": {"$ref": "baseUriChangeFolder/"}}},
        [("array of integers passes", {"list": [1, 2]}, True),
         ("string item fails through two hops", {"list": ["a"]}, False),
         ("non-array fails the folder schema", {"list": 3}, False)],
        remotes={
            f"{B}/A/baseUriChangeFolder/": {
                "$id": f"{B}/A/baseUriChangeFolder/",
                "type": "array",
                "items": {"$ref": "folderInteger.json"}},
            f"{B}/A/baseUriChangeFolder/folderInteger.json": {
                "type": "integer"}},
    ),
    case(
        "base URI change in a SUBSCHEMA $id: the embedded resource's "
        "relative ref resolves against the embedded base",
        {"$id": f"{B}/Bc/scope_change_defs1.json",
         "type": "object",
         "properties": {"list": {"$ref": "baseUriChangeFolderInSubschema/"}},
         "$defs": {"baz": {
             "$id": "baseUriChangeFolderInSubschema/",
             "type": "array",
             "items": {"$ref": "folderInteger.json"}}}},
        [("integer list valid", {"list": [7]}, True),
         ("string item invalid", {"list": ["x"]}, False)],
        remotes={
            f"{B}/Bc/baseUriChangeFolderInSubschema/folderInteger.json":
                {"type": "integer"}},
    ),
    case(
        "location-independent identifier ($anchor) inside a remote "
        "document, referenced by plain-name fragment",
        {"$ref": f"{B}/C/locind.json#positive"},
        [("positive integer valid", 5, True),
         ("negative fails exclusiveMinimum", -5, False),
         ("string fails type", "x", False)],
        remotes={f"{B}/C/locind.json": {
            "$id": f"{B}/C/locind.json",
            "$defs": {"pos": {"$anchor": "positive",
                              "type": "integer",
                              "exclusiveMinimum": 0}}}},
    ),
    case(
        "ref chained across three remote documents ending in a $defs "
        "pointer",
        {"$ref": f"{B}/D/one.json"},
        [("long-enough string valid", "ab", True),
         ("short string fails minLength in doc three", "a", False),
         ("integer fails type in doc three", 3, False)],
        remotes={
            f"{B}/D/one.json": {"$id": f"{B}/D/one.json",
                                "$ref": "two.json"},
            f"{B}/D/two.json": {"$id": f"{B}/D/two.json",
                                "$ref": "three.json#/$defs/t"},
            f"{B}/D/three.json": {
                "$id": f"{B}/D/three.json",
                "$defs": {"t": {"type": "string", "minLength": 2}}}},
    ),
    case(
        "URN-identified remote document",
        {"$ref": "urn:uuid:deadbeef-1234-0000-0000-0000000000r5"
                 .replace("r5", "05")},
        [("object with required member valid", {"v": 1.5}, True),
         ("missing required member invalid", {}, False),
         ("non-number member invalid", {"v": "s"}, False)],
        remotes={"urn:uuid:deadbeef-1234-0000-0000-000000000005": {
            "$id": "urn:uuid:deadbeef-1234-0000-0000-000000000005",
            "properties": {"v": {"type": "number"}},
            "required": ["v"]}},
    ),
    case(
        "embedded resource inside a remote whose retrieval URI differs "
        "from its $id: the embedded $id resolves against the DOCUMENT "
        "$id, not the retrieval URI",
        {"$ref": f"{B}/F/actual-nested.json"},
        [("boolean instance valid", True, True),
         ("integer instance invalid", 3, False)],
        remotes={f"{B}/F/retrieval.json": {
            "$id": f"{B}/F/actual.json",
            "$defs": {"n": {"$id": "actual-nested.json",
                            "type": "boolean"}}}},
    ),
    case(
        "plain-name fragment in a remote ref resolves against the "
        "REMOTE's anchors even when the root declares the same anchor",
        {"$id": f"{B}/G/root.json",
         "$anchor": "same",
         "type": "object",
         "properties": {"x": {"$ref": f"{B}/G/other.json#same"}}},
        [("integer member valid (remote anchor wins)", {"x": 3}, True),
         ("string member invalid", {"x": "s"}, False)],
        remotes={f"{B}/G/other.json": {
            "$id": f"{B}/G/other.json",
            "$defs": {"i": {"$anchor": "same", "type": "integer"}}}},
    ),
]

DYNAMIC_CASES = [
    case(
        "remote $dynamicRef resolves through the ROOT's $dynamicAnchor "
        "(outermost dynamic scope), tightening recursion",
        {"$id": f"{B}/H/root.json",
         "$dynamicAnchor": "node",
         "$ref": f"{B}/H/tree.json",
         "properties": {"v": {"type": "integer"}}},
        [("integer values at every depth valid",
          {"v": 1, "kids": [{"v": 2, "kids": []}]}, True),
         ("string value at depth caught by the ROOT constraint "
          "(static $ref would pass it)",
          {"v": 1, "kids": [{"v": "s", "kids": []}]}, False),
         ("string value at the root caught directly",
          {"v": "s", "kids": []}, False)],
        remotes={f"{B}/H/tree.json": {
            "$id": f"{B}/H/tree.json",
            "$dynamicAnchor": "node",
            "type": "object",
            "properties": {
                "v": True,
                "kids": {"type": "array",
                         "items": {"$dynamicRef": "#node"}}}}},
    ),
    case(
        "annotations from a REMOTE ref feed unevaluatedProperties at "
        "the referencing root",
        {"$id": f"{B}/I/root.json",
         "$ref": f"{B}/I/base.json",
         "properties": {"b": True},
         "unevaluatedProperties": False},
        [("members seen by remote and local props valid",
          {"a": 1, "b": 2}, True),
         ("member unseen by either schema invalid",
          {"a": 1, "c": 3}, False)],
        remotes={f"{B}/I/base.json": {
            "$id": f"{B}/I/base.json",
            "properties": {"a": True}}},
    ),
]


def crosscheck(files_by_version):
    from ref_oracle import load_reference

    handles = {v: load_reference(v)
               for v in ("2020-12", "2019-09", "next")}
    if any(h is None for h in handles.values()):
        sys.exit("reference unavailable — refusing to write unchecked "
                 "cases")
    meta = {"2020-12": "https://json-schema.org/draft/2020-12/schema",
            "2019-09": "https://json-schema.org/draft/2019-09/schema",
            "next": "https://json-schema.org/draft/next/schema"}
    n = bad = 0
    for versions, cases in files_by_version:
        for ci, c in enumerate(cases):
            for ver in versions:
                h = handles[ver]
                muri = h["URI"](meta[ver])
                # remotes registered per (case, version) under their
                # own URIs — unique across the generator, so no catalog
                # clashes; the reference indexes embedded $ids itself.
                # It resolves refs EAGERLY at registration, so each
                # case lists its remotes referrer-first and we register
                # REVERSED (leaves first) — a failed registration would
                # leave a half-resolved schema in the shared catalog,
                # so no retry games.
                for r_uri, doc in reversed(list(c["remotes"].items())):
                    h["JSONSchema"](dict(doc), catalog=h["catalog"],
                                    uri=h["URI"](r_uri),
                                    metaschema_uri=muri)
                schema = dict(c["schema"])
                schema.setdefault("$schema", meta[ver])
                kwargs = {}
                if "$id" not in schema:
                    kwargs["uri"] = h["URI"](
                        f"{B}/case-{ver}-{ci}.json")
                root = h["JSONSchema"](schema, catalog=h["catalog"],
                                       metaschema_uri=muri, **kwargs)
                for t in c["tests"]:
                    try:
                        out = root.evaluate(h["JSON"](t["data"])) \
                            .output("flag")
                    except Exception as ex:
                        sys.exit(f"reference crashed on [{ver}] "
                                 f"{c['description']} / "
                                 f"{t['description']}: {ex!r}")
                    n += 1
                    if bool(out["valid"]) != t["valid"]:
                        bad += 1
                        print(f"MISMATCH [{ver}] {c['description']} / "
                              f"{t['description']}: stated "
                              f"{t['valid']}, reference says "
                              f"{out['valid']}", file=sys.stderr)
    if bad:
        sys.exit(f"{bad}/{n} reference mismatches — aborting")
    print(f"reference crosscheck: {n} evaluations, all agree")


def write(path, cases):
    path.write_text(json.dumps(cases, indent=2, ensure_ascii=False)
                    + "\n")
    n = sum(len(c["tests"]) for c in cases)
    print(f"wrote {path.relative_to(ROOT)}: {len(cases)} groups, "
          f"{n} tests")
    return n


def main():
    d2020 = CORPUS / "2020-12"
    crosscheck([(("2020-12", "2019-09", "next"), SHARED_CASES),
                (("2020-12", "next"), DYNAMIC_CASES)])
    total = write(d2020 / "refRemote_scopes.json", SHARED_CASES)
    total += write(d2020 / "refRemote_dynamic.json", DYNAMIC_CASES)
    print(f"total generated test rows: {total}")


if __name__ == "__main__":
    main()
