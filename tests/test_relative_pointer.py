"""Relative JSON Pointer vs the reference's own spec-derived corpus
(/root/reference/tests/data/relative_jsonpointer.json, consumed by the
reference's tests/test_jsonpointer.py)."""

import json
import os

import pytest

from jschon_ray.vspec.pointer import RelativeJSONPointer, RelativePointerError

CORPUS = "/root/reference/tests/data/relative_jsonpointer.json"


def load_cases():
    if not os.path.exists(CORPUS):
        return []
    with open(CORPUS) as f:
        groups = json.load(f)
    cases = []
    for g in groups:
        for t in g["tests"]:
            cases.append((g["data"], t["start"], t["ref"], t["result"]))
    return cases


CASES = load_cases()


@pytest.mark.skipif(not CASES, reason="reference corpus unavailable")
@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_relative_pointer_corpus(case_idx):
    data, start, ref, result = CASES[case_idx]
    if result == "<fail>":
        with pytest.raises(RelativePointerError):
            RelativeJSONPointer(ref).evaluate(data, start)
        return
    got = RelativeJSONPointer(ref).evaluate(data, start)
    expected = data if result == "<data>" else result
    assert got == expected, f"{start=} {ref=}"


def test_parse_and_str_roundtrip():
    for s in ["0", "1/0", "2/highly/nested/objects", "0#", "1#", "0-1#",
              "2+3/foo", "5/a~1b/c~0d"]:
        assert str(RelativeJSONPointer(s)) == s
    for bad in ["", "#", "-1", "01", "1+0", "a/b", "1 /x"]:
        with pytest.raises(RelativePointerError):
            RelativeJSONPointer(bad)
