"""SpecCatalog URI sources: longest-prefix routing, lazy $ref loading,
default source, $id aliasing — the reference's add_uri_source/load_json
contract (/root/reference/jschon/catalog/__init__.py:102-164)."""

import json
import os

import pyarrow as pa
import pytest

from jschon_ray.vspec.catalog import LocalSource, SpecCatalog, SpecError
from jschon_ray.vspec.evaluator import compile_spec
from jschon_ray.vspec.row_oracle import RowEvaluator, output_basic


@pytest.fixture()
def spec_dir(tmp_path):
    d = tmp_path / "specs"
    d.mkdir()
    (d / "positive.json").write_text(json.dumps(
        {"exclusiveMinimum": 0}))
    (d / "codec.json").write_text(json.dumps(
        {"$defs": {"known": {"$anchor": "known",
                             "enum": ["wav", "flac"]}}}))
    (d / "aliased.json").write_text(json.dumps(
        {"$id": "https://elsewhere.example/real", "minimum": 5}))
    return str(d)


def make_catalog(spec_dir):
    cat = SpecCatalog()
    cat.add_uri_source("https://specs.example/", LocalSource(spec_dir,
                                                             suffix=".json"))
    return cat


def test_longest_prefix_and_default(spec_dir):
    cat = make_catalog(spec_dir)
    hits = []
    cat.add_uri_source(None, lambda rel: hits.append(rel) or {"type": "string"})
    cat.add_uri_source("https://specs.example/deep/",
                       lambda rel: {"const": rel})
    assert cat.load_json("https://specs.example/positive") == \
        {"exclusiveMinimum": 0}
    assert cat.load_json("https://specs.example/deep/x") == {"const": "x"}
    assert cat.load_json("https://other.example/y") == {"type": "string"}
    assert hits == ["https://other.example/y"]


def test_lazy_ref_resolution_row_and_vectorized(spec_dir):
    spec = {"$id": "https://specs.example/main",
            "properties": {
                "x": {"$ref": "positive"},
                "codec": {"$ref": "codec#known"},
            }}
    table = pa.table({"x": pa.array([1, -2, None], pa.int64()),
                      "codec": ["wav", "amr", None]})
    ev = RowEvaluator(make_catalog(spec_dir))
    valids = [output_basic(ev.evaluate(spec, r))["valid"]
              for r in [{"x": 1, "codec": "wav"},
                        {"x": -2, "codec": "amr"}]]
    assert valids == [True, False]

    cs = compile_spec(spec, table.schema, catalog=make_catalog(spec_dir))
    valid, _ = cs.evaluate_table(table)
    assert list(map(bool, valid)) == [True, False, True]


def test_id_aliasing(spec_dir):
    cat = make_catalog(spec_dir)
    spec = {"$id": "https://specs.example/root2",
            "properties": {"x": {"$ref": "aliased"}}}
    ev = RowEvaluator(cat)
    assert not output_basic(ev.evaluate(spec, {"x": 3}))["valid"]
    assert output_basic(ev.evaluate(spec, {"x": 7}))["valid"]


def test_errors(spec_dir):
    cat = make_catalog(spec_dir)
    with pytest.raises(SpecError):
        cat.load_json("https://unrouted.example/x")
    with pytest.raises(SpecError):
        cat.add_uri_source("https://no-slash.example", LocalSource(spec_dir))
    ev = RowEvaluator(cat)
    spec = {"$id": "https://specs.example/root3",
            "properties": {"x": {"$ref": "missing-doc"}}}
    with pytest.raises(SpecError):
        ev.evaluate(spec, {"x": 1})


# --- RemoteSource (injectable transport) ---------------------------------
# /root/reference/jschon/catalog/__init__.py:57-67; the sandbox has no
# network, so a fake transport stands in for urllib.


def test_remote_source_fetches_through_transport():
    from jschon_ray.vspec.catalog import RemoteSource

    fetched = []
    docs = {"https://remote.example/specs/rate.json": {"minimum": 8000},
            "https://remote.example/specs/sub/dir.json": {"type": "string"}}

    def fake_transport(url):
        fetched.append(url)
        return docs[url]

    cat = SpecCatalog()
    cat.add_uri_source(
        "https://remote.example/specs/",
        RemoteSource("https://remote.example/specs/", suffix=".json",
                     transport=fake_transport))
    assert cat.load_json("https://remote.example/specs/rate") == \
        {"minimum": 8000}
    assert cat.load_json("https://remote.example/specs/sub/dir") == \
        {"type": "string"}
    assert fetched == ["https://remote.example/specs/rate.json",
                       "https://remote.example/specs/sub/dir.json"]


def test_remote_source_ref_resolution_end_to_end():
    from jschon_ray.vspec.catalog import RemoteSource

    def fake_transport(url):
        assert url == "https://remote.example/specs/positive"
        return {"exclusiveMinimum": 0}

    cat = SpecCatalog()
    cat.add_uri_source(
        "https://remote.example/specs/",
        RemoteSource("https://remote.example/specs/",
                     transport=fake_transport))
    ev = RowEvaluator(cat)
    spec = {"$id": "https://remote.example/main",
            "properties": {"x": {"$ref": "specs/positive"}}}
    assert ev.evaluate(dict(spec), {"x": 3}).passed
    assert not ev.evaluate(dict(spec), {"x": -1}).passed


def test_remote_source_transport_error_wrapped():
    from jschon_ray.vspec.catalog import RemoteSource

    def failing_transport(url):
        raise OSError("connection refused")

    cat = SpecCatalog()
    cat.add_uri_source("https://down.example/",
                       RemoteSource("https://down.example/",
                                    transport=failing_transport))
    with pytest.raises(SpecError, match="failed to load"):
        cat.load_json("https://down.example/spec")


def test_remote_source_requires_trailing_slash():
    from jschon_ray.vspec.catalog import RemoteSource

    with pytest.raises(SpecError):
        RemoteSource("https://remote.example/specs")


# --- Catalog.cache session namespaces ------------------------------------
# /root/reference/jschon/catalog/__init__.py:370-391.


def test_cache_pops_resources_registered_inside():
    cat = SpecCatalog()
    cat.register({"$id": "https://keep.example/s", "minimum": 1})
    with cat.cache():
        cat.register({"$id": "https://tmp.example/s", "maximum": 9})
        assert cat.resource_root("https://tmp.example/s") is not None
    assert cat.resource_root("https://tmp.example/s") is None
    assert cat.resource_root("https://keep.example/s") is not None


def test_cache_restores_mutated_existing_entries():
    cat = SpecCatalog()
    cat.register({"$id": "https://keep.example/s", "minimum": 1})
    before = cat.resource_root("https://keep.example/s")
    with cat.cache():
        # re-register the same URI with different content inside the block
        cat.register({"$id": "https://keep.example/s", "maximum": 2})
        assert cat.resource_root("https://keep.example/s")["maximum"] == 2
    assert cat.resource_root("https://keep.example/s") is before


def test_cache_evaluation_inside_block():
    cat = SpecCatalog()
    ev = RowEvaluator(cat)
    with cat.cache():
        spec = {"$id": "https://tmp.example/r",
                "properties": {"x": {"$ref": "#/$defs/pos"}},
                "$defs": {"pos": {"exclusiveMinimum": 0}}}
        assert ev.evaluate(spec, {"x": 1}).passed
        assert not ev.evaluate(spec, {"x": 0}).passed
    assert cat.resource_root("https://tmp.example/r") is None
