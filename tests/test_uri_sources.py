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
