"""Vocabulary bundles + user metaschemas ($vocabulary gating).

Mirrors the reference's create_vocabulary/create_metaschema surface
(/root/reference/jschon/catalog/__init__.py:165-238,
vocabulary/core.py:37-62, tests/test_vocabulary.py) on the dialect-table
architecture: a metaschema compiles to a gated keyword table registered
under its URI.
"""

import pyarrow as pa
import pytest

from jschon_ray.vspec.catalog import SpecCatalog, SpecError
from jschon_ray.vspec.evaluator import compile_spec
from jschon_ray.vspec.extensions import register_keyword, unregister_keyword
from jschon_ray.vspec.metaschema import SpecValidationError, validate_spec
from jschon_ray.vspec.row_oracle import RowEvaluator
from jschon_ray.vspec.vocabulary import (
    create_metaschema,
    create_vocabulary,
    delete_metaschema,
    get_vocabulary,
)

V2020 = "https://json-schema.org/draft/2020-12/vocab/"


def _row_eval(ctx):
    if ctx.instance not in ("red", "green", "blue"):
        ctx.node.fail("not a colour")


@pytest.fixture
def colour_keyword():
    register_keyword("colourRef", instance_types=("string",),
                     row_eval=_row_eval)
    yield
    unregister_keyword("colourRef")


@pytest.fixture
def colour_metaschema(colour_keyword):
    create_vocabulary("https://example.test/vocab/colour", "colourRef")
    uri = "https://example.test/meta/colour"
    create_metaschema(uri, {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": uri,
        "$vocabulary": {
            V2020 + "core": True,
            V2020 + "applicator": True,
            V2020 + "validation": True,
            "https://example.test/vocab/colour": True,
        },
        "$dynamicAnchor": "meta",
        "allOf": [{"$ref": "https://json-schema.org/draft/2020-12/schema"}],
        "properties": {"colourRef": {"type": "boolean"}},
    })
    yield uri
    delete_metaschema(uri)


def test_standard_vocabularies_preregistered():
    v = get_vocabulary(V2020 + "validation")
    assert "minimum" in v.keywords and "pattern" in v.keywords
    v19 = get_vocabulary(
        "https://json-schema.org/draft/2019-09/vocab/applicator")
    assert "additionalItems" in v19.keywords
    assert "unevaluatedItems" in v19.keywords  # folded in for 2019-09


def test_unknown_vocabulary_raises():
    with pytest.raises(SpecError):
        get_vocabulary("https://example.test/vocab/nope")


def test_vocabulary_requires_known_keywords():
    with pytest.raises(SpecError):
        create_vocabulary("https://example.test/vocab/bad",
                          "totallyUnknownKeyword")


def test_metaschema_requires_core():
    with pytest.raises(SpecError):
        create_metaschema("https://example.test/meta/nocore", {
            "$vocabulary": {V2020 + "validation": True}})


def test_metaschema_unknown_required_vocab_raises():
    with pytest.raises(SpecError):
        create_metaschema("https://example.test/meta/unknownvocab", {
            "$vocabulary": {V2020 + "core": True,
                            "https://example.test/vocab/ghost": True}})


def test_metaschema_unknown_optional_vocab_skipped():
    uri = "https://example.test/meta/optvocab"
    create_metaschema(uri, {
        "$vocabulary": {V2020 + "core": True,
                        V2020 + "validation": True,
                        "https://example.test/vocab/ghost": False}})
    try:
        ev = RowEvaluator(SpecCatalog())
        out = ev.evaluate({"$schema": uri, "$id": "https://x/opt",
                           "minimum": 5}, 3)
        assert not out.passed  # validation vocabulary active
    finally:
        delete_metaschema(uri)


def test_custom_keyword_active_under_selecting_metaschema(colour_metaschema):
    spec = {"$schema": colour_metaschema, "$id": "https://x/c1",
            "properties": {"c": {"colourRef": True}}}
    ev = RowEvaluator(SpecCatalog())
    assert ev.evaluate(dict(spec), {"c": "red"}).passed
    assert not ev.evaluate(dict(spec), {"c": "mauve"}).passed


def test_custom_keyword_gated_out_without_vocabulary(colour_keyword):
    # plain 2020-12 $schema: colourRef is NOT in any selected vocabulary
    uri = "https://example.test/meta/plain"
    create_metaschema(uri, {
        "$vocabulary": {V2020 + "core": True, V2020 + "applicator": True,
                        V2020 + "validation": True}})
    try:
        spec = {"$schema": uri, "$id": "https://x/c2",
                "properties": {"c": {"colourRef": True}}}
        ev = RowEvaluator(SpecCatalog())
        assert ev.evaluate(dict(spec), {"c": "mauve"}).passed  # annotation
    finally:
        delete_metaschema(uri)


def test_gating_removes_standard_keywords():
    # no applicator vocabulary: properties degrades to an annotation
    uri = "https://example.test/meta/noapplicator"
    create_metaschema(uri, {
        "$vocabulary": {V2020 + "core": True, V2020 + "validation": True}})
    try:
        spec = {"$schema": uri, "$id": "https://x/c3",
                "properties": {"c": {"type": "integer"}}}
        ev = RowEvaluator(SpecCatalog())
        assert ev.evaluate(dict(spec), {"c": "not an int"}).passed
        # top-level validation still asserts
        spec2 = {"$schema": uri, "$id": "https://x/c4", "minLength": 10}
        assert not ev.evaluate(dict(spec2), "short").passed
    finally:
        delete_metaschema(uri)


def test_vectorized_engine_respects_gating(colour_metaschema):
    table = pa.table({"c": ["red", "mauve", None]})
    spec = {"$schema": colour_metaschema, "$id": "https://x/c5",
            "properties": {"c": {"colourRef": True}}}
    # colourRef has no compile_vec -> the subtree must fall back to the
    # row oracle rather than silently skipping the keyword
    cs = compile_spec(spec, table.schema, catalog=SpecCatalog())
    valid, viols = cs.evaluate_table(table)
    assert list(valid) == [True, False, True]


def test_validate_spec_against_custom_metaschema(colour_metaschema):
    good = {"$schema": colour_metaschema, "$id": "https://x/c6",
            "properties": {"c": {"colourRef": True}}}
    validate_spec(good)
    bad = {"$schema": colour_metaschema, "$id": "https://x/c7",
           "properties": {"c": {"colourRef": "not-a-boolean"}}}
    with pytest.raises(SpecValidationError):
        validate_spec(bad)


def test_metaschema_self_validation_failure_rolls_back(colour_keyword):
    uri = "https://example.test/meta/selfinvalid"
    with pytest.raises(SpecValidationError):
        create_metaschema(uri, {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": uri,
            "$vocabulary": {V2020 + "core": True},
            "allOf": [{"$ref": "https://json-schema.org/draft/2020-12/schema"}],
            "type": 12,  # invalid against the 2020-12 metaschema
        })
    from jschon_ray.vspec.vocabulary import get_metaschema_doc
    assert get_metaschema_doc(uri) is None


def test_2019_core_vocabulary_builds_2019_dialect():
    V2019 = "https://json-schema.org/draft/2019-09/vocab/"
    uri = "https://example.test/meta/legacy"
    create_metaschema(uri, {
        "$vocabulary": {V2019 + "core": True, V2019 + "applicator": True,
                        V2019 + "validation": True}})
    try:
        ev = RowEvaluator(SpecCatalog())
        # array-form items (2019-09 semantics) must apply
        spec = {"$schema": uri, "$id": "https://x/legacy",
                "items": [{"type": "integer"}, {"type": "string"}]}
        assert ev.evaluate(dict(spec), [1, "ok"]).passed
        assert not ev.evaluate(dict(spec), ["bad", "ok"]).passed
    finally:
        delete_metaschema(uri)
