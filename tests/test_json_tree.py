"""Mutable JSON tree (vspec/json_tree.py) — the in-place analogue of
reference json.py:236-273 (container mutators) and :327-445 (pointer
patch ops).  Cross-checked against the functional patch evaluator
(vspec/patch.py apply_patch) and hypothesis-free golden cases modeled on
reference tests/test_json.py."""

import pytest

from jschon_ray.vspec.json_tree import JSONDoc, JSONTreeError
from jschon_ray.vspec.patch import apply_patch

DOC = {"foo": ["bar", "baz"], "qux": {"n": 1, "flag": True}}


def test_wrap_unwrap_roundtrip():
    d = JSONDoc(DOC)
    assert d.value == DOC
    assert d.type == "object"
    assert d["foo"].type == "array"
    assert d["foo"][0].value == "bar"
    assert d["qux"]["n"].value == 1


def test_paths_and_parents():
    d = JSONDoc(DOC)
    assert d.path == ""
    assert d["foo"].path == "/foo"
    assert d["foo"][1].path == "/foo/1"
    assert d["qux"]["flag"].path == "/qux/flag"
    assert d["qux"]["flag"].document_root is d


def test_path_escaping():
    d = JSONDoc({"a/b": {"c~d": 1}})
    assert d["a/b"]["c~d"].path == "/a~1b/c~0d"
    assert d.resolve("/a~1b/c~0d").value == 1


def test_container_setitem_updates_tree():
    d = JSONDoc(DOC)
    d["qux"]["n"] = 42
    assert d.value["qux"]["n"] == 42
    d["foo"][0] = {"deep": [1, 2]}
    assert d["foo"][0]["deep"][1].value == 2
    assert d["foo"][0]["deep"][1].path == "/foo/0/deep/1"


def test_array_delete_rekeys_siblings():
    d = JSONDoc({"xs": [10, 20, 30, 40]})
    del d["xs"][1]
    assert d.value == {"xs": [10, 30, 40]}
    assert [c.key for c in d["xs"]] == ["0", "1", "2"]
    assert d["xs"][2].path == "/xs/2"


def test_array_insert_rekeys_siblings():
    d = JSONDoc({"xs": [10, 30]})
    d["xs"].insert(1, 20)
    assert d.value == {"xs": [10, 20, 30]}
    assert [c.key for c in d["xs"]] == ["0", "1", "2"]


def test_equality_is_json_equality():
    assert JSONDoc({"a": 1, "b": 2}) == {"b": 2, "a": 1}
    assert JSONDoc([1.0]) == [1]
    assert JSONDoc(False) != 0  # bool/number distinction


def test_add_object_member_and_array_element():
    d = JSONDoc(DOC)
    d.add("/qux/extra", [1])
    assert d.value["qux"]["extra"] == [1]
    d.add("/foo/1", "mid")
    assert d.value["foo"] == ["bar", "mid", "baz"]
    d.add("/foo/-", "end")
    assert d.value["foo"] == ["bar", "mid", "baz", "end"]


def test_add_root_replaces_value():
    d = JSONDoc(DOC)
    d.add("", {"fresh": True})
    assert d.value == {"fresh": True}


def test_add_errors():
    d = JSONDoc(DOC)
    with pytest.raises(JSONTreeError):
        d.add("/nope/x", 1)        # parent must exist
    with pytest.raises(JSONTreeError):
        d.add("/foo/9", 1)         # index out of range
    with pytest.raises(JSONTreeError):
        d.add("/foo/xx", 1)        # not an index
    with pytest.raises(JSONTreeError):
        d.add("/qux/n/sub", 1)     # cannot index a number


def test_remove_and_replace():
    d = JSONDoc(DOC)
    d.remove("/foo/0")
    assert d.value["foo"] == ["baz"]
    d.replace("/qux/n", "one")
    assert d.value["qux"]["n"] == "one"
    with pytest.raises(JSONTreeError):
        d.remove("/ghost")
    with pytest.raises(JSONTreeError):
        d.replace("/ghost", 1)


def test_move_copy_test():
    d = JSONDoc(DOC)
    d.copy("/qux/n", "/foo/-")
    assert d.value["foo"] == ["bar", "baz", 1]
    d.move("/qux/flag", "/flag")
    assert "flag" not in d.value["qux"] and d.value["flag"] is True
    d.test("/flag", True)
    with pytest.raises(JSONTreeError):
        d.test("/flag", False)


@pytest.mark.parametrize("ops", [
    [{"op": "add", "path": "/foo/1", "value": "X"}],
    [{"op": "remove", "path": "/foo/0"}],
    [{"op": "replace", "path": "/qux", "value": 7}],
    [{"op": "move", "from": "/foo/0", "path": "/qux/moved"}],
    [{"op": "copy", "from": "/qux/n", "path": "/foo/0"}],
    [{"op": "test", "path": "/qux/flag", "value": True},
     {"op": "add", "path": "/ok", "value": 1}],
    [{"op": "add", "path": "/a", "value": {"b": []}},
     {"op": "add", "path": "/a/b/-", "value": 1},
     {"op": "move", "from": "/a/b", "path": "/moved"},
     {"op": "remove", "path": "/a"}],
])
def test_in_place_patch_matches_functional_evaluator(ops):
    """Same op list through the mutable tree and the deep-copy evaluator
    must converge — json.py in-place semantics == jsonpatch semantics."""
    got = JSONDoc(DOC).patch(ops).value
    want = apply_patch(DOC, ops)
    assert got == want


def test_in_place_does_not_alias_input():
    src = {"a": [1, 2]}
    d = JSONDoc(src)
    d.add("/a/-", 3)
    assert src == {"a": [1, 2]}  # source dict untouched
