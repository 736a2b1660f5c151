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
                  "additionalProperties": {"$ref": "#"}},
        "$vocabulary": {"type": "object",
                        "additionalProperties": {"type": "boolean"}},
        # applicators
        "allOf": {"$ref": "#/$defs/schemaArray"},
        "anyOf": {"$ref": "#/$defs/schemaArray"},
        "oneOf": {"$ref": "#/$defs/schemaArray"},
        "not": {"$ref": "#"},
        "if": {"$ref": "#"},
        "then": {"$ref": "#"},
        "else": {"$ref": "#"},
        "dependentSchemas": {"type": "object",
                             "additionalProperties": {"$ref": "#"}},
        "prefixItems": {"$ref": "#/$defs/schemaArray"},
        "items": {"$ref": "#"},
        "contains": {"$ref": "#"},
        "properties": {"type": "object",
                       "additionalProperties": {"$ref": "#"}},
        "patternProperties": {"type": "object",
                              "additionalProperties": {"$ref": "#"},
                              "propertyNames": {"format": "regex"}},
        "additionalProperties": {"$ref": "#"},
        "propertyNames": {"$ref": "#"},
        "unevaluatedItems": {"$ref": "#"},
        "unevaluatedProperties": {"$ref": "#"},
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
        "contentSchema": {"$ref": "#"},
    },
    "$defs": {
        "schemaArray": {"type": "array", "minItems": 1,
                        "items": {"$ref": "#"}},
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
    "items": {"anyOf": [{"$ref": "#"}, {"$ref": "#/$defs/schemaArray"}]},
    "additionalItems": {"$ref": "#"},
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
    reference's per-metaschema keyword binding)."""
    from .dialect import infer_dialect
    from .formats import enabled_formats

    dialect = infer_dialect(spec.get("$schema")) \
        if isinstance(spec, dict) else "2020-12"
    meta = VSPEC_METASCHEMA_2019 if dialect == "2019-09" \
        else VSPEC_METASCHEMA
    cat = SpecCatalog()
    cat.register(meta)
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
