"""Catalog sessions: the reference's named schema caches under
concurrency — two cacheids compiling the SAME URI with DIFFERENT
documents/vocabularies, live at the same time, never seeing each other
(/root/reference/jschon/catalog/__init__.py:370-391 Catalog.cache +
the per-cacheid _schema_cache)."""

import pytest

from jschon_ray.vspec.catalog import SpecCatalog, SpecError
from jschon_ray.vspec.extensions import register_keyword, unregister_keyword
from jschon_ray.vspec.row_oracle import RowEvaluator
from jschon_ray.vspec.vocabulary import (
    create_metaschema,
    create_vocabulary,
    delete_metaschema,
)

V2020 = "https://json-schema.org/draft/2020-12/vocab/"
SHARED_URI = "https://sessions.test/spec"
REFERRER = {"$id": "https://sessions.test/referrer",
            "$ref": SHARED_URI}


def test_same_uri_two_documents_concurrently():
    """Both sessions live at once; the same URI resolves to a DIFFERENT
    document in each; the base never learns the URI."""
    base = SpecCatalog()
    with base.session("s1") as s1, base.session("s2") as s2:
        s1.register({"type": "integer"}, uri=SHARED_URI)
        s2.register({"type": "string"}, uri=SHARED_URI)

        def verdict(catalog, instance):
            return RowEvaluator(catalog).evaluate(
                REFERRER, instance).passed

        # interleaved evaluations — no bleed in either direction
        assert verdict(s1, 5) is True
        assert verdict(s2, 5) is False
        assert verdict(s1, "x") is False
        assert verdict(s2, "x") is True
        assert verdict(s1, 7) is True

        with pytest.raises(SpecError):
            base.resolve(SHARED_URI, SHARED_URI)

    # namespaces die with the sessions
    with pytest.raises(SpecError):
        base.resolve(SHARED_URI, SHARED_URI)


def test_base_snapshot_visible_overrides_stay_local():
    base = SpecCatalog()
    base.register({"minimum": 10}, uri="https://sessions.test/base")
    s = base.session()
    # base registration visible in the session
    node, _, _ = s.resolve("https://sessions.test/base",
                           "https://sessions.test/base")
    assert node == {"minimum": 10}
    # session override does not leak back
    s.register({"minimum": 99}, uri="https://sessions.test/base")
    node_b, _, _ = base.resolve("https://sessions.test/base",
                                "https://sessions.test/base")
    assert node_b == {"minimum": 10}
    node_s, _, _ = s.resolve("https://sessions.test/base",
                             "https://sessions.test/base")
    assert node_s == {"minimum": 99}


def test_duplicate_live_cacheid_rejected():
    base = SpecCatalog()
    with base.session("dup"):
        with pytest.raises(SpecError):
            base.session("dup")
    # released on exit -> reusable
    with base.session("dup"):
        pass


def _row_eval(ctx):
    if ctx.instance not in ("red", "green", "blue"):
        ctx.node.fail("not a colour")


def test_same_uri_two_vocabularies_concurrently():
    """The VERDICT case: one spec URI compiled under two metaschemas
    whose vocabularies differ — in session 1 the custom keyword is
    ACTIVE (its vocabulary is in the metaschema), in session 2 it is
    an inert annotation (validation-only metaschema). Both sessions
    evaluate interleaved."""
    register_keyword("colourRef", instance_types=("string",),
                     row_eval=_row_eval)
    m_with = "https://sessions.test/meta/with-colour"
    m_without = "https://sessions.test/meta/without-colour"
    try:
        create_vocabulary("https://sessions.test/vocab/colour",
                          "colourRef")
        create_metaschema(m_with, {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": m_with,
            "$vocabulary": {
                V2020 + "core": True,
                V2020 + "validation": True,
                "https://sessions.test/vocab/colour": True,
            },
        })
        create_metaschema(m_without, {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": m_without,
            "$vocabulary": {
                V2020 + "core": True,
                V2020 + "validation": True,
            },
        })
        base = SpecCatalog()
        with base.session("v1") as s1, base.session("v2") as s2:
            s1.register({"$schema": m_with, "colourRef": True,
                         "minLength": 2}, uri=SHARED_URI)
            s2.register({"$schema": m_without, "colourRef": True,
                         "minLength": 2}, uri=SHARED_URI)

            def verdict(catalog, instance):
                return RowEvaluator(catalog).evaluate(
                    REFERRER, instance).passed

            # "mauve": long enough, but NOT a colour -> only the
            # colour-vocabulary session rejects it
            assert verdict(s1, "mauve") is False
            assert verdict(s2, "mauve") is True
            # both enforce the shared validation keyword
            assert verdict(s1, "r") is False
            assert verdict(s2, "r") is False
            assert verdict(s1, "red") is True
            assert verdict(s2, "red") is True
    finally:
        delete_metaschema(m_with)
        delete_metaschema(m_without)
        unregister_keyword("colourRef")
