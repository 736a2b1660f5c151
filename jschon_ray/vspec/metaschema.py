"""The spec-schema: validating declarative specs before compilation.

The analogue of the reference's metaschema machinery — schemas are
validated against their metaschema, and the metaschema validates itself
(/root/reference/jschon/catalog/__init__.py:191-238, SURVEY.md §2.7). Our
dialect's metaschema is authored here (2020-12-shaped, covering exactly
the keywords the engine implements); ``validate_spec`` runs it through the
per-row evaluator (specs are single small documents — no Ray needed) and
``check_self`` asserts the metaschema is valid against itself.
"""

from __future__ import annotations

from .catalog import SpecCatalog
from .row_oracle import RowEvaluator, output_basic

VSPEC_METASCHEMA_ID = "https://jschon-ray.dev/meta/2020-12"

# subschema recursion re-enters at the dynamic "meta" anchor, so a user
# metaschema that $refs this one has its OWN constraints applied at every
# subschema node (official 2020-12 metaschema behavior; reference
# tests/test_metaschema.py relies on this for custom-keyword syntax).
_SCHEMA_REF = {"$dynamicRef": "#meta"}

VSPEC_METASCHEMA = {
    "$id": VSPEC_METASCHEMA_ID,
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {
        "$id": {"type": "string"},
        "$schema": {"type": "string"},
        "$anchor": {"type": "string", "pattern": "^[A-Za-z_][-A-Za-z0-9._]*$"},
        "$dynamicAnchor": {"type": "string"},
        "$ref": {"type": "string"},
        "$dynamicRef": {"type": "string"},
        "$comment": {"type": "string"},
        "$defs": {"type": "object",
                  "additionalProperties": _SCHEMA_REF},
        "$vocabulary": {"type": "object",
                        "additionalProperties": {"type": "boolean"}},
        # applicators
        "allOf": {"$ref": "#/$defs/schemaArray"},
        "anyOf": {"$ref": "#/$defs/schemaArray"},
        "oneOf": {"$ref": "#/$defs/schemaArray"},
        "not": _SCHEMA_REF,
        "if": _SCHEMA_REF,
        "then": _SCHEMA_REF,
        "else": _SCHEMA_REF,
        "dependentSchemas": {"type": "object",
                             "additionalProperties": _SCHEMA_REF},
        "prefixItems": {"$ref": "#/$defs/schemaArray"},
        "items": _SCHEMA_REF,
        "contains": _SCHEMA_REF,
        "properties": {"type": "object",
                       "additionalProperties": _SCHEMA_REF},
        "patternProperties": {"type": "object",
                              "additionalProperties": _SCHEMA_REF,
                              "propertyNames": {"format": "regex"}},
        "additionalProperties": _SCHEMA_REF,
        "propertyNames": _SCHEMA_REF,
        "unevaluatedItems": _SCHEMA_REF,
        "unevaluatedProperties": _SCHEMA_REF,
        # validation
        "type": {"anyOf": [
            {"$ref": "#/$defs/simpleType"},
            {"type": "array", "items": {"$ref": "#/$defs/simpleType"},
             "minItems": 1, "uniqueItems": True},
        ]},
        "enum": {"type": "array"},
        "const": True,
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": ["number", "string"]},
        "exclusiveMaximum": {"type": ["number", "string"]},
        "minimum": {"type": ["number", "string"]},
        "exclusiveMinimum": {"type": ["number", "string"]},
        "maxLength": {"$ref": "#/$defs/nonNegativeInteger"},
        "minLength": {"$ref": "#/$defs/nonNegativeInteger"},
        "pattern": {"type": "string", "format": "regex"},
        "maxItems": {"$ref": "#/$defs/nonNegativeInteger"},
        "minItems": {"$ref": "#/$defs/nonNegativeInteger"},
        "uniqueItems": {"type": "boolean"},
        "maxContains": {"$ref": "#/$defs/nonNegativeInteger"},
        "minContains": {"$ref": "#/$defs/nonNegativeInteger"},
        "maxProperties": {"$ref": "#/$defs/nonNegativeInteger"},
        "minProperties": {"$ref": "#/$defs/nonNegativeInteger"},
        "required": {"$ref": "#/$defs/stringArray"},
        "dependentRequired": {"type": "object",
                              "additionalProperties":
                                  {"$ref": "#/$defs/stringArray"}},
        # annotations
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "deprecated": {"type": "boolean"},
        "readOnly": {"type": "boolean"},
        "writeOnly": {"type": "boolean"},
        "examples": {"type": "array"},
        "format": {"type": "string"},
        "contentMediaType": {"type": "string"},
        "contentEncoding": {"type": "string"},
        "contentSchema": _SCHEMA_REF,
    },
    "$defs": {
        "schemaArray": {"type": "array", "minItems": 1,
                        "items": _SCHEMA_REF},
        "stringArray": {"type": "array", "items": {"type": "string"},
                        "uniqueItems": True},
        "nonNegativeInteger": {"type": "integer", "minimum": 0},
        "simpleType": {"enum": ["array", "boolean", "integer", "null",
                                "number", "object", "string",
                                "binary", "timestamp"]},
    },
}


VSPEC_METASCHEMA_2019_ID = "https://jschon-ray.dev/meta/2019-09"

# 2019-09 dialect: array-form items, additionalItems, $recursiveRef/"
# $recursiveAnchor; no prefixItems/$dynamicRef/$dynamicAnchor
# (/root/reference/jschon/catalog/_2019_09.py keyword registration).
_K2019 = {k: v for k, v in VSPEC_METASCHEMA["properties"].items()
          if k not in ("prefixItems", "$dynamicRef", "$dynamicAnchor")}
_K2019.update({
    "items": {"anyOf": [_SCHEMA_REF, {"$ref": "#/$defs/schemaArray"}]},
    "additionalItems": _SCHEMA_REF,
    "$recursiveRef": {"const": "#"},
    "$recursiveAnchor": {"type": "boolean"},
})

VSPEC_METASCHEMA_2019 = {
    "$id": VSPEC_METASCHEMA_2019_ID,
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": _K2019,
    "$defs": VSPEC_METASCHEMA["$defs"],
}


class SpecValidationError(ValueError):
    def __init__(self, errors):
        self.errors = errors
        super().__init__(
            "spec is invalid against the vspec metaschema: "
            + "; ".join(f"{e['keywordLocation']}@{e['instanceLocation']}: "
                        f"{e['error']}" for e in errors[:5]))


def validate_spec(spec) -> None:
    """Raise SpecValidationError unless ``spec`` conforms to its dialect's
    metaschema (selected by the spec's own ``$schema``, like the
    reference's per-metaschema keyword binding).  A ``$schema`` naming a
    metaschema created via ``vocabulary.create_metaschema`` validates
    against that metaschema document instead (reference
    catalog/__init__.py:191-238)."""
    from .dialect import dialect_base, infer_dialect
    from .formats import enabled_formats
    from .vocabulary import get_metaschema_doc

    schema_uri = spec.get("$schema") if isinstance(spec, dict) else None
    dialect = infer_dialect(schema_uri)
    custom = get_metaschema_doc(schema_uri) \
        if isinstance(schema_uri, str) else None

    meta = VSPEC_METASCHEMA_2019 \
        if dialect_base(dialect) == "2019-09" else VSPEC_METASCHEMA
    cat = SpecCatalog()
    cat.register(VSPEC_METASCHEMA)
    cat.register(VSPEC_METASCHEMA_2019)
    # official-URI aliases so user metaschemas can $ref the standard
    # metaschemas (jschon serves these from its bundled submodule files)
    for official, doc in [
        ("https://json-schema.org/draft/2020-12/schema", VSPEC_METASCHEMA),
        ("https://json-schema.org/draft/next/schema", VSPEC_METASCHEMA),
        ("https://json-schema.org/draft/2019-09/schema",
         VSPEC_METASCHEMA_2019),
    ]:
        cat.register({**doc, "$id": official})
    if custom is not None:
        # a self-referential metaschema validates against itself, like
        # the reference's Metaschema.validate()
        meta = custom
        cat.register(custom)
    ev = RowEvaluator(cat, enabled_formats("regex"))
    root = ev.evaluate(meta, spec)
    if not root.valid:
        raise SpecValidationError(output_basic(root)["errors"])


def check_self() -> bool:
    """The metaschema must validate against itself
    (/root/reference/jschon/catalog/__init__.py:233-237)."""
    validate_spec(VSPEC_METASCHEMA)
    validate_spec(VSPEC_METASCHEMA_2019)
    return True
