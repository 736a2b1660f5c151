"""Vocabulary bundles and user-defined metaschemas.

The analogue of the reference's ``Catalog.create_vocabulary`` /
``Catalog.create_metaschema`` (/root/reference/jschon/catalog/__init__.py:
165-238) and the ``$vocabulary``-driven keyword binding performed by
``Metaschema`` + ``VocabularyKeyword`` (/root/reference/jschon/vocabulary/
core.py:37-62): a vocabulary is a named bundle of keywords; a metaschema
selects vocabularies via its ``$vocabulary`` object, and only keywords
belonging to a selected vocabulary are ACTIVE for specs declaring that
metaschema in ``$schema`` — everything else degrades to annotations.

Re-shaped for the batch engine: instead of binding Keyword classes, a
metaschema compiles to a DIALECT — a (keyword_table, static_set) pair
registered in ``dialect._CUSTOM_DIALECTS`` under the metaschema URI.  Both
engines (row oracle + vectorized compiler) already key every dispatch off
``dialect_tables(...)``, so gating needs no evaluator changes.  Custom
keywords participate through the existing plugin registry
(extensions.register_keyword) — put the plugin's key in a vocabulary and
any metaschema selecting that vocabulary activates it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import dialect as _dialect
from .catalog import SpecCatalog, SpecError
from .extensions import get_plugin

# --- standard vocabulary contents ----------------------------------------
# Keyword membership per official vocabulary, mirroring the reference's
# create_vocabulary calls in catalog/_2020_12.py, _2019_09.py, _next.py.

_CORE_2020 = ("$schema", "$vocabulary", "$id", "$anchor", "$dynamicAnchor",
              "$dynamicRef", "$ref", "$defs", "$comment")
_APPLICATOR_2020 = ("allOf", "anyOf", "oneOf", "not", "if", "then", "else",
                    "dependentSchemas", "prefixItems", "items", "contains",
                    "properties", "patternProperties", "additionalProperties",
                    "propertyNames")
_UNEVALUATED = ("unevaluatedItems", "unevaluatedProperties")
_VALIDATION = ("type", "enum", "const", "multipleOf", "maximum",
               "exclusiveMaximum", "minimum", "exclusiveMinimum", "maxLength",
               "minLength", "pattern", "maxItems", "minItems", "uniqueItems",
               "maxContains", "minContains", "maxProperties", "minProperties",
               "required", "dependentRequired")
_METADATA = ("title", "description", "default", "deprecated", "readOnly",
             "writeOnly", "examples")
_CONTENT = ("contentMediaType", "contentEncoding", "contentSchema")

_CORE_2019 = ("$schema", "$vocabulary", "$id", "$anchor", "$recursiveRef",
              "$recursiveAnchor", "$ref", "$defs", "$comment")
# 2019-09 folds unevaluated* into applicator and keeps array-form
# items/additionalItems (catalog/_2019_09.py).
_APPLICATOR_2019 = ("allOf", "anyOf", "oneOf", "not", "if", "then", "else",
                    "dependentSchemas", "items", "additionalItems",
                    "contains", "properties", "patternProperties",
                    "additionalProperties", "propertyNames",
                    "unevaluatedItems", "unevaluatedProperties")


def _u20(tail):
    return f"https://json-schema.org/draft/2020-12/vocab/{tail}"


def _u19(tail):
    return f"https://json-schema.org/draft/2019-09/vocab/{tail}"


def _unext(tail):
    return f"https://json-schema.org/draft/next/vocab/{tail}"


@dataclass
class Vocabulary:
    """A named bundle of keyword names (reference vocabulary/__init__.py
    Vocabulary — kwclasses become names resolved in dialect tables)."""

    uri: str
    keywords: tuple = ()
    # which standard table supplies (instance_types, depends_on) entries
    # for these names — "2020-12" | "2019-09" | "next"
    base: str = "2020-12"


_VOCABULARIES: dict[str, Vocabulary] = {}


def _register_standard():
    for uri, kws, base in [
        (_u20("core"), _CORE_2020, "2020-12"),
        (_u20("applicator"), _APPLICATOR_2020, "2020-12"),
        (_u20("unevaluated"), _UNEVALUATED, "2020-12"),
        (_u20("validation"), _VALIDATION, "2020-12"),
        (_u20("format-annotation"), ("format",), "2020-12"),
        (_u20("format-assertion"), ("format",), "2020-12"),
        (_u20("meta-data"), _METADATA, "2020-12"),
        (_u20("content"), _CONTENT, "2020-12"),
        (_u19("core"), _CORE_2019, "2019-09"),
        (_u19("applicator"), _APPLICATOR_2019, "2019-09"),
        (_u19("validation"), _VALIDATION, "2019-09"),
        (_u19("format"), ("format",), "2019-09"),
        (_u19("meta-data"), _METADATA, "2019-09"),
        (_u19("content"), _CONTENT, "2019-09"),
        (_unext("core"), _CORE_2020, "next"),
        (_unext("applicator"), _APPLICATOR_2020, "next"),
        (_unext("unevaluated"), _UNEVALUATED, "next"),
        (_unext("validation"), _VALIDATION, "next"),
        (_unext("format-annotation"), ("format",), "next"),
        (_unext("meta-data"), _METADATA, "next"),
        (_unext("content"), _CONTENT, "next"),
    ]:
        _VOCABULARIES[uri] = Vocabulary(uri, tuple(kws), base)


_register_standard()

_CORE_URIS = frozenset({_u20("core"), _u19("core"), _unext("core")})


def create_vocabulary(uri: str, *keywords, base: str = "2020-12"
                      ) -> Vocabulary:
    """Register a vocabulary: a bundle of keyword names available to
    metaschemas (reference catalog/__init__.py:166-178).

    ``keywords`` are names.  Standard names take their
    (instance_types, depends_on) entries from the ``base`` dialect's
    table; custom names must already be registered via
    ``extensions.register_keyword`` (their plugin supplies the entry).
    """
    names = []
    for k in keywords:
        name = k if isinstance(k, str) else getattr(k, "key")
        if name not in _dialect.KEYWORDS \
                and name not in _dialect.KEYWORDS_2019 \
                and get_plugin(name) is None:
            raise SpecError(
                f"vocabulary {uri!r}: keyword {name!r} is neither a "
                "standard keyword nor a registered plugin "
                "(extensions.register_keyword)")
        names.append(name)
    vocab = Vocabulary(uri, tuple(names), base)
    _VOCABULARIES[uri] = vocab
    return vocab


def get_vocabulary(uri: str) -> Vocabulary:
    try:
        return _VOCABULARIES[uri]
    except KeyError:
        raise SpecError(f"Unrecognized vocabulary URI {uri!r}")


# --- metaschemas ----------------------------------------------------------

_METASCHEMAS: dict[str, dict] = {}  # uri -> metaschema document


def get_metaschema_doc(uri: str) -> dict | None:
    return _METASCHEMAS.get(uri.rstrip("#"))


def create_metaschema(uri: str, metaschema_doc: dict | None = None,
                      default_core_vocabulary_uri: str | None = None,
                      *default_vocabulary_uris: str,
                      catalog: SpecCatalog | None = None) -> dict:
    """Create, register, and self-validate a metaschema
    (reference catalog/__init__.py:191-238).

    The metaschema's ``$vocabulary`` object (or the default vocabulary
    URIs, in its absence) selects which vocabularies' keywords are ACTIVE
    for specs whose ``$schema`` is ``uri``.  An unknown vocabulary with a
    true (required) value is an error; a false one is skipped (reference
    vocabulary/core.py:37-62).  The resulting keyword table registers as
    a dialect named ``uri``, so both engines gate on it automatically.

    Returns the metaschema document.
    """
    uri = uri.rstrip("#")
    if metaschema_doc is None:
        metaschema_doc = {"$id": uri}
    else:
        metaschema_doc = dict(metaschema_doc)
        metaschema_doc.setdefault("$id", uri)

    declared = metaschema_doc.get("$vocabulary")
    vocab_uris: list[str] = []
    if isinstance(declared, dict):
        for vuri, required in declared.items():
            if vuri in _VOCABULARIES:
                vocab_uris.append(vuri)
            elif required:
                raise SpecError(
                    f"metaschema {uri!r} requires unrecognized vocabulary "
                    f"{vuri!r}")
    else:
        if default_core_vocabulary_uri:
            vocab_uris.append(default_core_vocabulary_uri)
        vocab_uris.extend(default_vocabulary_uris)
        if not vocab_uris:
            raise SpecError(
                f"metaschema {uri!r} has no $vocabulary and no default "
                "vocabularies were given")

    vocabs = [get_vocabulary(v) for v in vocab_uris]
    if not any(v.uri in _CORE_URIS for v in vocabs):
        raise SpecError(
            f"metaschema {uri!r} does not select a core vocabulary")

    # base = the family of the core vocabulary (governs items semantics
    # and the static keyword set)
    base = next(v.base for v in vocabs if v.uri in _CORE_URIS)
    base_table, base_static = _dialect.dialect_tables(base)

    table: dict = {}
    for v in vocabs:
        src = _dialect.dialect_tables(v.base)[0]
        for name in v.keywords:
            if name in src:
                table[name] = src[name]
            elif name in base_table:
                table[name] = base_table[name]
            else:
                plugin = get_plugin(name)
                if plugin is None:
                    raise SpecError(
                        f"vocabulary {v.uri!r}: keyword {name!r} has no "
                        "entry and no plugin")
                table[name] = (plugin.instance_types, plugin.depends_on)
    static = frozenset(n for n in base_static if n in table)

    _dialect.register_dialect(uri, table, static, base)
    _METASCHEMAS[uri] = metaschema_doc
    if catalog is not None:
        catalog.register(metaschema_doc, uri)

    # self-validation: the metaschema document must be valid against ITS
    # metaschema (reference catalog/__init__.py:233-237) — its $schema,
    # or itself when absent/self-referential.
    from .metaschema import validate_spec
    try:
        validate_spec(metaschema_doc)
    except Exception:
        _dialect.unregister_dialect(uri)
        _METASCHEMAS.pop(uri, None)
        raise
    return metaschema_doc


def delete_metaschema(uri: str) -> None:
    uri = uri.rstrip("#")
    _dialect.unregister_dialect(uri)
    _METASCHEMAS.pop(uri, None)
