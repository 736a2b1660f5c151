"""Per-row reference-semantics evaluator (pure Python, no Arrow).

This is a from-scratch implementation of the evaluation semantics of the
reference's recursive keyword dispatch
(/root/reference/jschon/jsonschema.py:191-220, vocabulary/validation.py,
vocabulary/applicator.py, vocabulary/core.py), operating on plain Python
values. It serves three purposes:

1. the *oracle* in property/parity tests — the vectorized Arrow evaluator
   (evaluator.py) must agree with it row by row, and it must agree with the
   reference evaluator on suite-style cases;
2. the *fallback* execution path for spec constructs the vectorized engine
   does not (yet) express (heterogeneous columns, unevaluated*, deep nesting);
3. the generality backstop: anything JSON, not just flat audio rows.

Error strings are formatted byte-identically to the reference's ``fail()``
messages so that ``output('basic')`` projections are comparable.

Arrow-inherited extensions to the JSON type lattice: ``binary`` (bytes
values) and ``timestamp`` (datetime values); bounds keywords accept
timestamps (documented deviation, dialect.py).
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal, InvalidOperation

from . import pointer as jptr
from .catalog import SpecCatalog, SpecError
from .extensions import RowCtx, get_plugin
from .dialect import (
    ANNOTATION_KEYWORDS,
    KEYWORDS,
    STATIC_KEYWORDS,
    dialect_base,
    dialect_tables,
    infer_dialect,
    validate_id_for_dialect,
    json_str,
    keyword_order,
    tuplify,
)


def jtype(value) -> str:
    """JSON type tag of a plain Python value.

    Mirrors JSON type tagging (/root/reference/jschon/json.py:120-151), with
    binary/timestamp extensions for Arrow-native payloads.
    """
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float, Decimal)):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (bytes, bytearray)):
        return "binary"
    if isinstance(value, (_dt.datetime, _dt.date)):
        return "timestamp"
    if isinstance(value, (list, tuple)):
        return "array"
    if isinstance(value, dict):
        return "object"
    raise TypeError(f"not JSON-compatible: {type(value)!r}")


def jeq(a, b) -> bool:
    """Type-aware deep equality (1 == 1.0, but True != 1).

    Mirrors JSON.__eq__ (/root/reference/jschon/json.py:277-289).
    """
    ta, tb = jtype(a), jtype(b)
    if ta != tb:
        return False
    if ta == "array":
        return len(a) == len(b) and all(jeq(x, y) for x, y in zip(a, b))
    if ta == "object":
        return a.keys() == b.keys() and all(jeq(v, b[k]) for k, v in a.items())
    return a == b


class _JsonRepr:
    """Renders as the reference's JSON.__repr__
    (/root/reference/jschon/json.py:203-205)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __repr__(self):
        return f"JSON({self.v!r})"


class RNode:
    """One (schema node × instance node) evaluation result.

    Semantics of jschon's Result (/root/reference/jschon/jsonschema.py:343-439):
    dynamic keyword path, instance path, children keyed (key, instance path),
    valid/assert/discard flags, annotation & error values.
    """

    __slots__ = ("key", "path", "ipath", "base", "sptr", "children",
                 "annotation", "error", "valid", "asserting", "discarded",
                 "_abs_override", "parent", "is_schema", "schema_doc")

    def __init__(self, key=None, path="", ipath="", base=None, sptr="",
                 parent=None):
        self.key = key
        self.path = path          # keywordLocation (dynamic)
        self.ipath = ipath        # instanceLocation
        self.base = base          # resource base URI of owning schema
        self.sptr = sptr          # pointer from resource root to this node
        self.parent = parent      # dynamic-scope chain (jschon Result.parent)
        self.children: dict[tuple, RNode] = {}
        self.annotation = None
        self.error = None
        self.valid = True
        self.asserting = True
        self.discarded = False
        self._abs_override = None
        # True when this node's schema location is a (sub)schema — set by
        # eval_schema; keyword-value nodes ($ref strings, keyword arrays)
        # stay False. Drives the 'hierarchical' output formatter, which
        # mirrors `isinstance(node.schema_node, JSONSchema)`
        # (/root/reference/jschon/output.py:131).
        self.is_schema = False
        # the schema dict evaluated at this node (jschon Result.schema) —
        # consulted by the $recursiveRef ancestry walk (legacy.py:38-46)
        self.schema_doc = None

    # -- jschon Result API analogues ------------------------------------
    def child(self, key: str, ipath: str, base=None, sptr=None,
              cls=None) -> "RNode":
        # type(self), not RNode: a custom result class propagates to the
        # whole subtree, like jschon's result_class constructor threading
        # (/root/reference/jschon/jsonschema.py:407,419 + :373-380).
        # `cls` switches the subtree to a DIFFERENT RNode subclass from
        # this node down — the analogue of Result.__call__'s `cls`
        # parameter (jsonschema.py:407: "applied to all nodes within the
        # yielded subtree"); extension keywords reach it through
        # RowCtx.descend.
        c = (cls or type(self))(
            key=key,
            path=jptr.join(self.path, key),
            ipath=ipath,
            base=base if base is not None else self.base,
            sptr=sptr if sptr is not None else jptr.join(self.sptr, key),
            parent=self,
        )
        self.children[(key, ipath)] = c
        return c

    def drop_discarded(self):
        self.children = {k: v for k, v in self.children.items()
                         if not v.discarded}

    def fail(self, error=None):
        self.valid = False
        self.error = error

    def pass_(self):
        self.valid = True
        self.error = None

    def sibling(self, parent: "RNode", key: str):
        return parent.children.get((key, self.ipath)) if parent else None

    @property
    def passed(self) -> bool:
        return self.valid or not self.asserting

    @property
    def absolute_uri(self):
        if self._abs_override is not None:
            return self._abs_override
        if self.base is None:
            return None
        return self.base + "#" + jptr.uri_fragment(self.sptr)

    def collect_annotations(self, ipath, key):
        """Annotations in this valid subtree for (key, instance path)
        (/root/reference/jschon/jsonschema.py:512-523)."""
        if self.valid and not self.discarded:
            if self.annotation is not None and \
                    (key is None or key == self.key) and \
                    (ipath is None or ipath == self.ipath):
                yield self.annotation
            for c in self.children.values():
                yield from c.collect_annotations(ipath, key)


class RowEvaluator:
    """Evaluate declarative specs against plain-Python instances."""

    def __init__(self, catalog: SpecCatalog | None = None,
                 formats: dict | None = None):
        self.catalog = catalog or SpecCatalog()
        # formats: {attr: (validator_fn, instance_types)} — assertion enabled
        self.formats = formats or {}
        self._pattern_cache: dict[str, re.Pattern] = {}
        # active dialect; switched per resource subtree by a $schema member
        # (jschon keys keyword classes off the metaschema,
        # /root/reference/jschon/jsonschema.py:110-114)
        self.dialect = "2020-12"

    def _rx(self, pattern: str) -> re.Pattern:
        rx = self._pattern_cache.get(pattern)
        if rx is None:
            rx = self._pattern_cache[pattern] = re.compile(pattern)
        return rx

    # -- entry point ----------------------------------------------------
    def evaluate(self, spec, instance, uri: str | None = None,
                 result_class: type | None = None) -> RNode:
        """Evaluate; ``result_class`` (an RNode subclass) customizes the
        result tree — the analogue of JSONSchema.evaluate's result_class
        (/root/reference/jschon/jsonschema.py:191,407,419). The class
        threads to every child node via ``RNode.child``."""
        if isinstance(spec, dict) and ("$id" in spec or uri):
            base = self.catalog.register(spec, uri)
        else:
            base = uri
        root = (result_class or RNode)(base=base, sptr="")
        self.eval_schema(spec, instance, "", root, base, "")
        return root

    # -- schema node ----------------------------------------------------
    def eval_schema(self, schema, instance, ipath, node: RNode,
                    base, sptr) -> None:
        """Evaluate ``schema`` at ``node`` (jschon JSONSchema.evaluate,
        /root/reference/jschon/jsonschema.py:191-220)."""
        node.is_schema = True
        node.schema_doc = schema
        if schema is True:
            return
        if schema is False:
            node.fail("The instance is disallowed by a boolean false schema")
            return
        if not isinstance(schema, dict):
            raise SpecError(f"invalid schema: {schema!r}")

        if "$id" in schema and isinstance(schema["$id"], str):
            from urllib.parse import urldefrag, urljoin
            # a resource root's own $schema governs its $id rules
            eff = infer_dialect(schema["$schema"]) \
                if isinstance(schema.get("$schema"), str) else self.dialect
            validate_id_for_dialect(schema["$id"], eff)
            # the KEYWORD node addressing an embedded resource keeps its
            # PARENT-resource display location (jschon builds the Result's
            # absoluteKeywordLocation from the parent schema's canonical
            # URI + key, jsonschema.py:505-512); a $ref arriving here
            # overwrites this with the refschema override afterwards
            if node.parent is not None and node.base and \
                    node._abs_override is None:
                node._abs_override = node.base + "#" \
                    + jptr.uri_fragment(node.sptr)
            # A $ref that jumps straight to an embedded resource root
            # arrives with ``base`` already equal to this node's canonical
            # URI (catalog.resolve returns the target resource's base);
            # re-joining the node's own relative $id against it would
            # double the path segment (scope/sub/inner.json ->
            # scope/sub/sub/inner.json). The catalog's registered doc
            # identity tells the two cases apart exactly.
            reg = self.catalog._resources.get(base) if base else None
            if not (reg is not None and reg.get("doc") is schema):
                base = urldefrag(
                    urljoin(base or schema["$id"], schema["$id"])).url
            sptr = ""
            # embedded resource root: this node's identity (and its place in
            # the dynamic scope, core.py:152) is the new base
            node.base = base
            node.sptr = ""

        prev_dialect = self.dialect
        if "$schema" in schema and isinstance(schema["$schema"], str):
            self.dialect = infer_dialect(schema["$schema"])
        try:
            kwtable, static = dialect_tables(self.dialect)
            itype = jtype(instance)
            for key in keyword_order(schema.keys(), self.dialect):
                if key in static:
                    continue
                instance_types = kwtable.get(
                    key, (("null", "boolean", "number", "string", "array",
                           "object", "binary", "timestamp"), ()))[0]
                if itype not in instance_types:
                    continue
                sub = node.child(key, ipath, base=base,
                                 sptr=jptr.join(sptr, key))
                sub.schema_doc = schema
                self.eval_keyword(key, schema, schema[key], instance, ipath,
                                  sub, node, base, jptr.join(sptr, key))
                if sub.discarded:
                    del node.children[(key, ipath)]

            if any(not c.passed for c in node.children.values()
                   if c.ipath == ipath):
                node.fail()
        finally:
            self.dialect = prev_dialect

    # -- keyword dispatch ------------------------------------------------
    def eval_keyword(self, key, schema, kval, instance, ipath, node: RNode,
                     parent: RNode, base, sptr) -> None:
        # keywords outside the active dialect degrade to annotations, as if
        # the metaschema supplied no class for them (jschon
        # vocabulary/__init__.py:100-107)
        in_dialect = key in dialect_tables(self.dialect)[0]
        if not in_dialect:
            # out-of-dialect keywords degrade to annotations even when a
            # plugin exists for the name ($vocabulary gating; jschon
            # vocabulary/__init__.py:100-107)
            node.annotation = kval
            node.asserting = False
            return
        m = getattr(self, "_kw_" + re.sub(r"[^A-Za-z]", "_", key), None)
        if m is not None:
            m(schema, kval, instance, ipath, node, parent, base, sptr)
            return
        plugin = get_plugin(key)
        if plugin is not None:
            plugin.row_eval(RowCtx(self, schema, kval, instance, ipath,
                                   node, parent, base, sptr))
        else:
            # unknown or annotation-only keywords degrade to annotations
            # (/root/reference/jschon/vocabulary/__init__.py:100-107,162-165)
            node.annotation = kval
            node.asserting = False

    # ---- core ----------------------------------------------------------
    @staticmethod
    def _ref_override(tbase, tptr):
        """absoluteKeywordLocation of a by-reference target: the refschema's
        canonical URI — fragmentless for a resource root
        (/root/reference/jschon/jsonschema.py:505-512 via refschema())."""
        return tbase if tptr == "" else tbase + "#" + jptr.uri_fragment(tptr)

    def _kw__ref(self, schema, kval, instance, ipath, node, parent, base, sptr):
        target, tbase, tptr = self.catalog.resolve(kval, base or "")
        node._abs_override = self._ref_override(tbase, tptr)
        self.eval_schema(target, instance, ipath, node, tbase, tptr)
        node.is_schema = False  # schema node here is the ref string

    def _kw__dynamicRef(self, schema, kval, instance, ipath, node, parent,
                        base, sptr):
        """Late-bound reference (/root/reference/jschon/vocabulary/core.py:
        121-169): when the initial target carries a matching $dynamicAnchor,
        re-resolve the fragment against every resource base on the dynamic
        scope (this node's ancestry), outermost match winning."""
        target, tbase, tptr = self.catalog.resolve(kval, base or "")
        frag = kval.split("#", 1)[1] if "#" in kval else None
        dynamic = (frag is not None and not frag.startswith("/")
                   and isinstance(target, dict)
                   and target.get("$dynamicAnchor") == frag)
        if dynamic:
            checked = set()
            t = node
            while t is not None:  # leaf -> root; later finds override
                b = t.base
                if b is not None and b not in checked:
                    checked.add(b)
                    found = self.catalog.try_resolve_anchor(b, frag)
                    if found is not None and isinstance(found[0], dict) \
                            and found[0].get("$dynamicAnchor") == frag:
                        target, tbase, tptr = found
                t = t.parent
        node._abs_override = self._ref_override(tbase, tptr)
        self.eval_schema(target, instance, ipath, node, tbase, tptr)
        node.is_schema = False

    # ---- validation: generic -------------------------------------------
    def _kw_type(self, schema, kval, instance, ipath, node, *_):
        types = tuplify(kval)
        it = jtype(instance)
        if it in types:
            return
        if it == "number" and "integer" in types and not isinstance(instance, bool):
            try:
                if instance == int(instance):
                    return
            except (OverflowError, ValueError):
                pass
        node.fail(f"The instance must be of type {json_str(kval)}")

    def _kw_enum(self, schema, kval, instance, ipath, node, *_):
        if not any(jeq(instance, v) for v in kval):
            node.fail("The instance value must be equal to one of the elements "
                      "in the defined enumeration")

    def _kw_const(self, schema, kval, instance, ipath, node, *_):
        if not jeq(instance, kval):
            node.fail("The instance value must be equal to the defined constant")

    def _kw_multipleOf(self, schema, kval, instance, ipath, node, *_):
        try:
            if Decimal(f"{instance}") % Decimal(f"{kval}") != 0:
                node.fail(f"The value must be a multiple of {json_str(kval)}")
        except InvalidOperation:
            node.fail(f"Invalid operation: {json_str(instance)} % {json_str(kval)}")

    def _kw_maximum(self, schema, kval, instance, ipath, node, *_):
        if not instance <= kval:
            node.fail(f"The value may not be greater than {json_str(kval)}")

    def _kw_exclusiveMaximum(self, schema, kval, instance, ipath, node, *_):
        if not instance < kval:
            node.fail(f"The value must be less than {json_str(kval)}")

    def _kw_minimum(self, schema, kval, instance, ipath, node, *_):
        if not instance >= kval:
            node.fail(f"The value may not be less than {json_str(kval)}")

    def _kw_exclusiveMinimum(self, schema, kval, instance, ipath, node, *_):
        if not instance > kval:
            node.fail(f"The value must be greater than {json_str(kval)}")

    def _kw_maxLength(self, schema, kval, instance, ipath, node, *_):
        if len(instance) > kval:
            node.fail(f"The text is too long (maximum {json_str(kval)} characters)")

    def _kw_minLength(self, schema, kval, instance, ipath, node, *_):
        if len(instance) < kval:
            node.fail(f"The text is too short (minimum {json_str(kval)} characters)")

    def _kw_pattern(self, schema, kval, instance, ipath, node, *_):
        # unanchored re.search semantics
        # (/root/reference/jschon/vocabulary/validation.py:132-142)
        if self._rx(kval).search(instance) is None:
            node.fail(f"The text must match the regular expression {json_str(kval)}")

    def _kw_maxItems(self, schema, kval, instance, ipath, node, *_):
        if len(instance) > kval:
            node.fail(f"The array has too many elements (maximum {json_str(kval)})")

    def _kw_minItems(self, schema, kval, instance, ipath, node, *_):
        if len(instance) < kval:
            node.fail(f"The array has too few elements (minimum {json_str(kval)})")

    def _kw_uniqueItems(self, schema, kval, instance, ipath, node, *_):
        if not kval:
            return
        seen = []
        for item in instance:
            if not any(jeq(item, s) for s in seen):
                seen.append(item)
        if len(instance) > len(seen):
            node.fail("The array's elements must all be unique")

    def _kw_maxContains(self, schema, kval, instance, ipath, node, parent, *_):
        contains = parent.children.get(("contains", ipath))
        if contains and contains.annotation is not None \
                and len(contains.annotation) > kval:
            node.fail('The array has too many elements matching the '
                      f'"contains" subschema (maximum {json_str(kval)})')

    def _kw_minContains(self, schema, kval, instance, ipath, node, parent, *_):
        contains = parent.children.get(("contains", ipath))
        if not contains:
            return
        count = len(contains.annotation) if contains.annotation is not None else 0
        valid = count >= kval
        if valid and not contains.valid:
            mx = parent.children.get(("maxContains", ipath))
            if not mx or mx.valid:
                contains.pass_()
        if not valid:
            node.fail('The array has too few elements matching the '
                      f'"contains" subschema (minimum {json_str(kval)})')

    def _kw_maxProperties(self, schema, kval, instance, ipath, node, *_):
        if len(instance) > kval:
            node.fail(f"The object has too many properties (maximum {json_str(kval)})")

    def _kw_minProperties(self, schema, kval, instance, ipath, node, *_):
        if len(instance) < kval:
            node.fail(f"The object has too few properties (minimum {json_str(kval)})")

    def _kw_required(self, schema, kval, instance, ipath, node, *_):
        missing = [name for name in kval if name not in instance]
        if missing:
            node.fail(f"The object is missing required properties {missing}")

    def _kw_dependentRequired(self, schema, kval, instance, ipath, node, *_):
        # NB: the reference interpolates the raw JSON node reprs here
        # (validation.py:243-256 lacks the `.value` that `required` uses),
        # yielding "{'a': [JSON('b')]}" — reproduced for byte parity.
        missing = {}
        for name, dependents in kval.items():
            if name in instance:
                missing_deps = [_JsonRepr(d) for d in dependents
                                if d not in instance]
                if missing_deps:
                    missing[name] = missing_deps
        if missing:
            node.fail(f"The object is missing dependent properties {missing}")

    # ---- format --------------------------------------------------------
    def _kw_contentSchema(self, schema, kval, instance, ipath, node, *_):
        """contentSchema annotates only beside a contentMediaType
        sibling; alone it is DISCARDED, not annotated (reference
        vocabulary/annotation.py:64-74 result.discard())."""
        node.asserting = False
        if isinstance(schema, dict) and "contentMediaType" in schema:
            node.annotation = kval
        else:
            node.discarded = True

    def _kw_format(self, schema, kval, instance, ipath, node, *_):
        node.annotation = kval
        entry = self.formats.get(kval)
        if entry and jtype(instance) in entry[1]:
            try:
                entry[0](instance)
            except ValueError as e:
                node.fail(f'The instance is invalid against the "{kval}" format: {e}')
        else:
            node.asserting = False

    # ---- applicators ---------------------------------------------------
    def _subschema_order(self, key):
        return key

    def _kw_allOf(self, schema, kval, instance, ipath, node, parent, base, sptr):
        err_indices = []
        for index, subschema in enumerate(kval):
            sub = node.child(str(index), ipath, base=base,
                             sptr=jptr.join(sptr, index))
            self.eval_schema(subschema, instance, ipath, sub, base,
                             jptr.join(sptr, index))
            if not sub.passed:
                err_indices.append(index)
        if err_indices:
            node.fail(f"The instance is invalid against subschemas {err_indices}")

    def _kw_anyOf(self, schema, kval, instance, ipath, node, parent, base, sptr):
        valid = False
        for index, subschema in enumerate(kval):
            sub = node.child(str(index), ipath, base=base,
                             sptr=jptr.join(sptr, index))
            self.eval_schema(subschema, instance, ipath, sub, base,
                             jptr.join(sptr, index))
            if sub.passed:
                valid = True
        if not valid:
            node.fail("The instance must be valid against at least one subschema")

    def _kw_oneOf(self, schema, kval, instance, ipath, node, parent, base, sptr):
        valid_indices, err_indices = [], []
        for index, subschema in enumerate(kval):
            sub = node.child(str(index), ipath, base=base,
                             sptr=jptr.join(sptr, index))
            self.eval_schema(subschema, instance, ipath, sub, base,
                             jptr.join(sptr, index))
            (valid_indices if sub.passed else err_indices).append(index)
        if len(valid_indices) != 1:
            node.fail('The instance must be valid against exactly one subschema; '
                      f'it is valid against {valid_indices} '
                      f'and invalid against {err_indices}')

    def _kw_not(self, schema, kval, instance, ipath, node, parent, base, sptr):
        self.eval_schema(kval, instance, ipath, node, base, sptr)
        if node.passed:
            node.fail("The instance must not be valid against the subschema")
        else:
            node.pass_()

    def _kw_if(self, schema, kval, instance, ipath, node, parent, base, sptr):
        self.eval_schema(kval, instance, ipath, node, base, sptr)
        node.asserting = False

    def _kw_then(self, schema, kval, instance, ipath, node, parent, base, sptr):
        if_ = parent.children.get(("if", ipath))
        if if_ is not None and if_.valid:
            self.eval_schema(kval, instance, ipath, node, base, sptr)
        else:
            node.discarded = True

    def _kw_else(self, schema, kval, instance, ipath, node, parent, base, sptr):
        if_ = parent.children.get(("if", ipath))
        if if_ is not None and not if_.valid:
            self.eval_schema(kval, instance, ipath, node, base, sptr)
        else:
            node.discarded = True

    def _kw_dependentSchemas(self, schema, kval, instance, ipath, node, parent,
                             base, sptr):
        annotation, err_names = [], []
        for name, subschema in kval.items():
            if name in instance:
                sub = node.child(name, ipath, base=base,
                                 sptr=jptr.join(sptr, name))
                self.eval_schema(subschema, instance, ipath, sub, base,
                                 jptr.join(sptr, name))
                (annotation if sub.passed else err_names).append(name)
        if err_names:
            node.fail(f"Properties {err_names} are invalid against "
                      'the corresponding "dependentSchemas" subschemas')
        else:
            node.annotation = annotation

    def _kw_prefixItems(self, schema, kval, instance, ipath, node, parent,
                        base, sptr):
        annotation = None
        error = []
        for index, item in enumerate(instance[:len(kval)]):
            annotation = index
            item_path = jptr.join(ipath, index)
            sub = node.child(str(index), item_path, base=base,
                             sptr=jptr.join(sptr, index))
            self.eval_schema(kval[index], item, item_path, sub, base,
                             jptr.join(sptr, index))
            if not sub.passed:
                error.append(index)
        if error:
            node.fail(error)
        elif annotation is not None:
            if annotation == len(instance) - 1:
                annotation = True
            node.annotation = annotation

    def _kw_items(self, schema, kval, instance, ipath, node, parent, base, sptr):
        if dialect_base(self.dialect) == "2019-09":
            return self._kw_items_2019(schema, kval, instance, ipath, node,
                                       parent, base, sptr)
        prefix = parent.children.get(("prefixItems", ipath))
        start_index = len(schema.get("prefixItems", [])) if prefix else 0
        annotation = None
        error = []
        for index in range(start_index, len(instance)):
            item_path = jptr.join(ipath, index)
            self.eval_schema(kval, instance[index], item_path, node, base, sptr)
            if node.valid:
                annotation = True
            else:
                error.append(index)
                node.pass_()
        if error:
            node.fail(error)
        else:
            node.annotation = annotation

    def _kw_items_2019(self, schema, kval, instance, ipath, node, parent,
                       base, sptr):
        """2019-09 items: schema form applies to every element; array form
        is positional (/root/reference/jschon/vocabulary/legacy.py:57-87)."""
        if len(instance) == 0:
            return
        if isinstance(kval, bool):
            self.eval_schema(kval, instance, ipath, node, base, sptr)
        elif isinstance(kval, dict):
            for index in range(len(instance)):
                item_path = jptr.join(ipath, index)
                self.eval_schema(kval, instance[index], item_path, node,
                                 base, sptr)
            if node.passed:
                node.annotation = True
        else:  # array form
            annotation = None
            error = []
            for index, item in enumerate(instance[:len(kval)]):
                annotation = index
                item_path = jptr.join(ipath, index)
                sub = node.child(str(index), item_path, base=base,
                                 sptr=jptr.join(sptr, index))
                self.eval_schema(kval[index], item, item_path, sub, base,
                                 jptr.join(sptr, index))
                if not sub.passed:
                    error.append(index)
            if error:
                node.fail(error)
            else:
                node.annotation = annotation

    def _kw_additionalItems(self, schema, kval, instance, ipath, node,
                            parent, base, sptr):
        """2019-09 only: items past the positional `items` array
        (/root/reference/jschon/vocabulary/legacy.py:90-112). Active only
        when the sibling items annotation is an int."""
        items = parent.children.get(("items", ipath))
        if items is not None and type(items.annotation) is int:
            annotation = None
            error = []
            for index in range(items.annotation + 1, len(instance)):
                item_path = jptr.join(ipath, index)
                self.eval_schema(kval, instance[index], item_path, node,
                                 base, sptr)
                if node.valid:
                    annotation = True
                else:
                    error.append(index)
                    node.pass_()
            if error:
                node.fail(error)
            else:
                node.annotation = annotation
        else:
            node.discarded = True

    def _kw__recursiveRef(self, schema, kval, instance, ipath, node, parent,
                          base, sptr):
        """2019-09 $recursiveRef "#": resolves to the current resource root,
        rebound to the outermost ancestor resource whose root sets
        $recursiveAnchor true (/root/reference/jschon/vocabulary/legacy.py:
        17-49)."""
        if kval != "#":
            raise SpecError('"$recursiveRef" may only take the value "#"')
        target, tbase, tptr = self.catalog.resolve("#", base or "")
        if isinstance(target, dict) and target.get("$recursiveAnchor") is True:
            t = node
            while t is not None:  # leaf -> root; later finds override
                sd = t.schema_doc
                if t.is_schema and isinstance(sd, dict) \
                        and sd.get("$recursiveAnchor") is True:
                    target, tbase, tptr = sd, t.base, t.sptr
                t = t.parent
        node._abs_override = self._ref_override(tbase, tptr)
        self.eval_schema(target, instance, ipath, node, tbase, tptr)
        node.is_schema = False

    def _kw_unevaluatedItems_2019(self, schema, kval, instance, ipath, node,
                                  parent, base, sptr):
        """2019-09 unevaluatedItems: covered by items/additionalItems
        annotations only — no prefixItems, no contains carve-out
        (/root/reference/jschon/vocabulary/legacy.py:115-166)."""
        last = -1
        for ann in parent.collect_annotations(ipath, "items"):
            if ann is True:
                node.discarded = True
                return
            if type(ann) is int and ann > last:
                last = ann
        for key in ("additionalItems", "unevaluatedItems"):
            for ann in parent.collect_annotations(ipath, key):
                if ann is True:
                    node.discarded = True
                    return
        annotation, error = None, []
        for index in range(last + 1, len(instance)):
            item_path = jptr.join(ipath, index)
            self.eval_schema(kval, instance[index], item_path, node, base,
                             sptr)
            if node.valid:
                annotation = True
            else:
                error.append(index)
                node.pass_()
        if error:
            node.fail(error)
        else:
            node.annotation = annotation

    def _kw_contains(self, schema, kval, instance, ipath, node, parent,
                     base, sptr):
        annotation = []
        for index, item in enumerate(instance):
            item_path = jptr.join(ipath, index)
            self.eval_schema(kval, item, item_path, node, base, sptr)
            if node.valid:
                annotation.append(index)
            else:
                node.pass_()
        node.annotation = annotation
        if not annotation:
            node.fail("The array does not contain any element that is valid "
                      'against the "contains" subschema')

    def _kw_properties(self, schema, kval, instance, ipath, node, parent,
                       base, sptr):
        annotation, err_names = [], []
        for name, item in instance.items():
            if name in kval:
                item_path = jptr.join(ipath, name)
                sub = node.child(name, item_path, base=base,
                                 sptr=jptr.join(sptr, name))
                self.eval_schema(kval[name], item, item_path, sub, base,
                                 jptr.join(sptr, name))
                (annotation if sub.passed else err_names).append(name)
        if err_names:
            node.fail(f"Properties {err_names} are invalid")
        else:
            node.annotation = annotation

    def _kw_patternProperties(self, schema, kval, instance, ipath, node,
                              parent, base, sptr):
        matched = set()
        err_names = []
        for name, item in instance.items():
            for regex, subschema in kval.items():
                if self._rx(regex).search(name) is not None:
                    item_path = jptr.join(ipath, name)
                    sub = node.child(regex, item_path, base=base,
                                     sptr=jptr.join(sptr, regex))
                    self.eval_schema(subschema, item, item_path, sub, base,
                                     jptr.join(sptr, regex))
                    if sub.passed:
                        matched |= {name}
                    else:
                        err_names.append(name)
        if err_names:
            node.fail(f"Properties {err_names} are invalid")
        else:
            node.annotation = list(matched)

    def _kw_additionalProperties(self, schema, kval, instance, ipath, node,
                                 parent, base, sptr):
        known = schema.get("properties", {}).keys() \
            if parent.children.get(("properties", ipath)) else ()
        patterns = schema.get("patternProperties", {}).keys() \
            if parent.children.get(("patternProperties", ipath)) else ()
        annotation, error = [], []
        for name, item in instance.items():
            if name not in known and not any(
                    self._rx(rx).search(name) for rx in patterns):
                item_path = jptr.join(ipath, name)
                self.eval_schema(kval, item, item_path, node, base, sptr)
                if node.valid:
                    annotation.append(name)
                else:
                    error.append(name)
                    node.pass_()
        if error:
            node.fail(error)
        else:
            node.annotation = annotation

    def _kw_unevaluatedProperties(self, schema, kval, instance, ipath, node,
                                  parent, base, sptr):
        # /root/reference/jschon/vocabulary/applicator.py:346-390
        evaluated = set()
        for key in ("properties", "patternProperties", "additionalProperties",
                    "unevaluatedProperties"):
            for ann in parent.collect_annotations(ipath, key):
                evaluated |= set(ann)
        annotation, error = [], []
        for name, item in instance.items():
            if name not in evaluated:
                item_path = jptr.join(ipath, name)
                self.eval_schema(kval, item, item_path, node, base, sptr)
                if node.valid:
                    annotation.append(name)
                else:
                    error.append(name)
                    node.pass_()
        if error:
            node.fail(error)
        else:
            node.annotation = annotation

    def _kw_unevaluatedItems(self, schema, kval, instance, ipath, node,
                             parent, base, sptr):
        # /root/reference/jschon/vocabulary/applicator.py:190-245
        if dialect_base(self.dialect) == "2019-09":
            return self._kw_unevaluatedItems_2019(schema, kval, instance,
                                                  ipath, node, parent, base,
                                                  sptr)
        last = -1
        for ann in parent.collect_annotations(ipath, "prefixItems"):
            if ann is True:
                node.discarded = True
                return
            if ann > last:
                last = ann
        for key in ("items", "unevaluatedItems"):
            for ann in parent.collect_annotations(ipath, key):
                if ann is True:
                    node.discarded = True
                    return
        contains_indices = set()
        for ann in parent.collect_annotations(ipath, "contains"):
            contains_indices |= set(ann)
        annotation, error = None, []
        for index in range(last + 1, len(instance)):
            if index in contains_indices:
                continue
            item_path = jptr.join(ipath, index)
            self.eval_schema(kval, instance[index], item_path, node, base, sptr)
            if node.valid:
                annotation = True
            else:
                error.append(index)
                node.pass_()
        if error:
            node.fail(error)
        else:
            node.annotation = annotation

    def _kw_propertyNames(self, schema, kval, instance, ipath, node, parent,
                          base, sptr):
        error = []
        for name in instance:
            name_path = jptr.join(ipath, name)
            self.eval_schema(kval, name, name_path, node, base, sptr)
            if not node.valid:
                error.append(name)
                node.pass_()
        if error:
            node.fail(error)


# -- output projections -------------------------------------------------

def output_flag(root: RNode) -> dict:
    return {"valid": root.valid}


def output_basic(root: RNode) -> dict:
    """jschon's 'basic' output (/root/reference/jschon/output.py:46-70):
    preorder walk of the subtree whose nodes share the root's validity,
    yielding nodes with a non-None error (or annotation when valid)."""
    valid = root.valid
    msgkey = "annotation" if valid else "error"
    childkey = "annotations" if valid else "errors"

    def visit(node: RNode):
        if node.valid is valid:
            msgval = node.annotation if valid else node.error
            if msgval is not None:
                yield {
                    "instanceLocation": node.ipath,
                    "keywordLocation": node.path,
                    "absoluteKeywordLocation": str(node.absolute_uri),
                    msgkey: msgval,
                }
            for c in node.children.values():
                yield from visit(c)

    return {"valid": valid, childkey: list(visit(root))}
