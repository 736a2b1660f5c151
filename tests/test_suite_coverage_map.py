"""tests/suite_coverage_map.json stays truthful: every local path it
cites exists, every corpus file is accounted for, and the absent list
doesn't silently grow."""

import json
import pathlib

HERE = pathlib.Path(__file__).parent
MAP = json.loads((HERE / "suite_coverage_map.json").read_text())
CORPUS = HERE / "suite_corpus"

DRAFTS = ["draft2020-12", "draft2019-09"]


def _entries():
    for d in DRAFTS:
        yield from MAP[d].items()


def test_cited_local_files_exist():
    for name, e in _entries():
        assert e["status"] in ("present", "partial", "absent"), name
        for rel in e["local"]:
            p = HERE / rel if rel.startswith("tests/") \
                else CORPUS / rel
            if rel.startswith("tests/"):
                p = HERE.parent / rel
            assert p.exists(), f"{name}: cited path missing: {rel}"


def test_statuses_have_required_fields():
    for name, e in _entries():
        if e["status"] == "absent":
            assert not e["local"], name
            assert e.get("note"), f"{name}: absent needs a reason"
        else:
            assert e["local"], f"{name}: {e['status']} needs local files"
        if e["status"] == "partial":
            assert e.get("note"), f"{name}: partial needs a deviation note"


def test_every_corpus_file_is_accounted_for():
    cited = set()
    for _, e in _entries():
        cited.update(r for r in e["local"] if not r.startswith("tests/"))
    on_disk = {str(p.relative_to(CORPUS))
               for p in CORPUS.glob("*/*.json")}
    # the 'next' directory is draft-next-only material outside the two
    # mapped drafts; 2019-09 extension files are extra breadth beyond
    # the official list (never a coverage gap)
    unmapped = {f for f in on_disk - cited
                if not f.startswith("next/")
                and not f.startswith("2019-09/")}
    assert not unmapped, sorted(unmapped)


def test_absent_set_is_the_known_one():
    """Round 5 closed the last four absents (idn-hostname/idn-email via
    the pure-Python IDNA2008-subset validators; dependencies-
    compatibility and no-schema via reference-cross-checked harness
    cases, scripts/gen_suite_corpus_r5.py). Nothing may regress to
    absent."""
    absent = sorted(n for d in DRAFTS
                    for n, e in MAP[d].items() if e["status"] == "absent")
    assert absent == [], absent


def test_required_files_all_covered():
    """Every NON-optional official file must be present in both drafts."""
    for d in DRAFTS:
        for name, e in MAP[d].items():
            if not name.startswith("optional/"):
                assert e["status"] in ("present", "partial"), (d, name)
