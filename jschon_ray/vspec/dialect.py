"""Keyword dialect: metadata, ordering, message formatting.

The reference evaluates keywords in schema-dict insertion order adjusted by a
stable topological sort over declared ``depends_on`` edges
(/root/reference/jschon/jsonschema.py:116-119,168-184). We reproduce that
ordering contract here so violation rows come out in the reference's
``output('basic')`` preorder.

Instance-type gating mirrors Keyword.instance_types
(/root/reference/jschon/vocabulary/__init__.py:128-139): a keyword is a no-op
on instances whose JSON type it does not declare. We extend the JSON type
lattice with ``binary`` and ``timestamp`` for Arrow-native columns: bounds
keywords accept timestamps, and ``format`` accepts binary (decode checks).
"""

from __future__ import annotations

import json

ALL_TYPES = (
    "null", "boolean", "number", "string", "array", "object",
    "binary", "timestamp",
)

# keyword -> (instance_types, depends_on)
# Sources: /root/reference/jschon/vocabulary/validation.py,
# applicator.py, core.py, annotation.py, format.py (class attrs).
KEYWORDS: dict[str, tuple[tuple, tuple]] = {
    # core (static / identification)
    "$schema": (ALL_TYPES, ()),
    "$vocabulary": (ALL_TYPES, ()),
    "$id": (ALL_TYPES, ()),
    "$anchor": (ALL_TYPES, ()),
    "$defs": (ALL_TYPES, ()),
    "$comment": (ALL_TYPES, ()),
    "$dynamicAnchor": (ALL_TYPES, ()),
    # applicators
    "$ref": (ALL_TYPES, ()),
    "$dynamicRef": (ALL_TYPES, ()),
    "allOf": (ALL_TYPES, ()),
    "anyOf": (ALL_TYPES, ()),
    "oneOf": (ALL_TYPES, ()),
    "not": (ALL_TYPES, ()),
    "if": (ALL_TYPES, ()),
    "then": (ALL_TYPES, ("if",)),
    "else": (ALL_TYPES, ("if",)),
    "dependentSchemas": (("object",), ()),
    "prefixItems": (("array",), ()),
    "items": (("array",), ("prefixItems",)),
    "contains": (("array",), ()),
    "properties": (("object",), ()),
    "patternProperties": (("object",), ()),
    "additionalProperties": (("object",), ("properties", "patternProperties")),
    "propertyNames": (("object",), ()),
    "unevaluatedItems": (
        ("array",),
        ("prefixItems", "items", "contains", "if", "then", "else",
         "allOf", "anyOf", "oneOf", "not", "$ref", "$dynamicRef"),
    ),
    "unevaluatedProperties": (
        ("object",),
        ("properties", "patternProperties", "additionalProperties",
         "if", "then", "else", "dependentSchemas",
         "allOf", "anyOf", "oneOf", "not", "$ref", "$dynamicRef"),
    ),
    # validation assertions
    "type": (ALL_TYPES, ()),
    "enum": (ALL_TYPES, ()),
    "const": (ALL_TYPES, ()),
    "multipleOf": (("number",), ()),
    "maximum": (("number", "timestamp"), ()),
    "exclusiveMaximum": (("number", "timestamp"), ()),
    "minimum": (("number", "timestamp"), ()),
    "exclusiveMinimum": (("number", "timestamp"), ()),
    "maxLength": (("string",), ()),
    "minLength": (("string",), ()),
    "pattern": (("string",), ()),
    "maxItems": (("array",), ()),
    "minItems": (("array",), ()),
    "uniqueItems": (("array",), ()),
    "maxContains": (("array",), ("contains",)),
    "minContains": (("array",), ("contains", "maxContains")),
    "maxProperties": (("object",), ()),
    "minProperties": (("object",), ()),
    "required": (("object",), ()),
    "dependentRequired": (("object",), ()),
    # annotation-only
    "title": (ALL_TYPES, ()),
    "description": (ALL_TYPES, ()),
    "default": (ALL_TYPES, ()),
    "deprecated": (ALL_TYPES, ()),
    "readOnly": (ALL_TYPES, ()),
    "writeOnly": (ALL_TYPES, ()),
    "examples": (ALL_TYPES, ()),
    "contentMediaType": (("string", "binary"), ()),
    "contentEncoding": (("string", "binary"), ()),
    "contentSchema": (("string", "binary"), ("contentMediaType",)),
    "format": (ALL_TYPES, ()),
}

# Keywords that never assert and never produce subresults we track.
STATIC_KEYWORDS = frozenset(
    {"$schema", "$vocabulary", "$id", "$anchor", "$dynamicAnchor", "$defs",
     "$comment"}
)

# --- 2019-09 dialect (/root/reference/jschon/vocabulary/legacy.py,
# catalog/_2019_09.py): array-form items, additionalItems,
# $recursiveRef/$recursiveAnchor; no prefixItems/$dynamicRef/$dynamicAnchor.
KEYWORDS_2019: dict[str, tuple[tuple, tuple]] = {
    **{k: v for k, v in KEYWORDS.items()
       if k not in ("prefixItems", "$dynamicRef", "$dynamicAnchor")},
    "items": (("array",), ()),
    "additionalItems": (("array",), ("items",)),
    "$recursiveRef": (ALL_TYPES, ()),
    "$recursiveAnchor": (ALL_TYPES, ()),
    "unevaluatedItems": (
        ("array",),
        ("items", "additionalItems", "if", "then", "else",
         "allOf", "anyOf", "oneOf", "not", "$ref", "$recursiveRef"),
    ),
    "unevaluatedProperties": (
        ("object",),
        ("properties", "patternProperties", "additionalProperties",
         "if", "then", "else", "dependentSchemas",
         "allOf", "anyOf", "oneOf", "not", "$ref", "$recursiveRef"),
    ),
}

STATIC_KEYWORDS_2019 = frozenset(
    {"$schema", "$vocabulary", "$id", "$anchor", "$recursiveAnchor", "$defs",
     "$comment"}
)


# --- draft-next dialect (/root/reference/jschon/catalog/_next.py,
# vocabulary/future.py:11-25): identical keyword surface to 2020-12; the
# only behavioral delta in the reference is IdKeyword_Next, whose ``$id``
# must be fragment-free (URI(value).validate(allow_fragment=False)).
KEYWORDS_NEXT = KEYWORDS
STATIC_KEYWORDS_NEXT = STATIC_KEYWORDS

# --- custom dialects (vocabulary bundles / user metaschemas) -------------
# name (usually the metaschema URI) -> (keyword_table, static_set, base)
# where base is the standard dialect whose behavioral branches apply
# (items semantics etc.). Populated by vocabulary.create_metaschema — the
# analogue of the reference's per-metaschema kwclass binding
# (/root/reference/jschon/catalog/__init__.py:165-238).
_CUSTOM_DIALECTS: dict[str, tuple[dict, frozenset, str]] = {}


def register_dialect(name: str, table: dict, static: frozenset,
                     base: str = "2020-12") -> None:
    _CUSTOM_DIALECTS[name] = (dict(table), frozenset(static), base)


def unregister_dialect(name: str) -> None:
    _CUSTOM_DIALECTS.pop(name, None)


def dialect_base(dialect: str) -> str:
    """The standard dialect whose behavioral branches (array-form items,
    $recursiveRef, ...) govern ``dialect``."""
    custom = _CUSTOM_DIALECTS.get(dialect)
    if custom is not None:
        return custom[2]
    return dialect


def infer_dialect(schema_uri: str | None) -> str:
    """Dialect from a ``$schema`` URI (jschon keys keyword classes off the
    metaschema, /root/reference/jschon/jsonschema.py:110-114)."""
    if schema_uri and schema_uri.rstrip("#") in _CUSTOM_DIALECTS:
        return schema_uri.rstrip("#")
    if schema_uri and "2019-09" in schema_uri:
        return "2019-09"
    if schema_uri and "/draft/next/" in schema_uri:
        return "next"
    return "2020-12"


def dialect_tables(dialect: str) -> tuple[dict, frozenset]:
    custom = _CUSTOM_DIALECTS.get(dialect)
    if custom is not None:
        return custom[0], custom[1]
    if dialect == "2019-09":
        return KEYWORDS_2019, STATIC_KEYWORDS_2019
    if dialect == "next":
        return KEYWORDS_NEXT, STATIC_KEYWORDS_NEXT
    return KEYWORDS, STATIC_KEYWORDS


def validate_id_for_dialect(value: str, dialect: str) -> None:
    """draft-next forbids ANY fragment in ``$id`` (reference
    vocabulary/future.py:18 — allow_fragment=False); 2019-09/2020-12
    tolerate an empty one."""
    if dialect_base(dialect) == "next" and "#" in value:
        raise ValueError(
            f'"$id" must be fragment-free in the draft-next dialect: '
            f"{value!r}")

ANNOTATION_KEYWORDS = frozenset(
    {"title", "description", "default", "deprecated", "readOnly", "writeOnly",
     "examples", "contentMediaType", "contentEncoding", "contentSchema"}
)


def keyword_order(keys, dialect: str = "2020-12") -> list[str]:
    """Stable topological order of schema keys.

    Semantics match JSONSchema._resolve_dependencies
    (/root/reference/jschon/jsonschema.py:168-184): repeatedly emit the first
    key (in original order) whose in-dialect dependencies have all been
    emitted. Unknown keywords have no dependencies.
    """
    table = dialect_tables(dialect)[0]
    keys = list(keys)
    keyset = set(keys)
    emitted: set[str] = set()
    pending = keys
    out: list[str] = []
    while pending:
        for k in pending:
            deps = table.get(k, ((), ()))[1]
            if all(d not in keyset or d in emitted for d in deps):
                out.append(k)
                emitted.add(k)
                pending = [p for p in pending if p != k]
                break
        else:  # cycle: emit remaining in original order
            out.extend(pending)
            break
    return out


def json_str(value) -> str:
    """Format a value the way jschon interpolates it into error messages.

    jschon formats ``{self.json}`` via JSON.__str__ -> json.dumps with
    ensure_ascii=False (/root/reference/jschon/json.py:198-209,
    utils.py:41-43).
    """
    return json.dumps(value, ensure_ascii=False, allow_nan=False)


def tuplify(value):
    """Mirror jschon.utils.tuplify (/root/reference/jschon/utils.py:25-28)."""
    if isinstance(value, (list, tuple)):
        return tuple(value)
    return (value,)
