"""Spec catalog: a registry of declarative validation specs by URI.

Plays the role of jschon's Catalog
(/root/reference/jschon/catalog/__init__.py:70-368) for our engine: specs are
plain JSON-compatible dicts; ``$id`` establishes resource identity (including
embedded resources), ``$anchor`` registers fragment aliases, and ``$ref``
targets are resolved by URI + (pointer | anchor) fragment.

The catalog is driver-side state. Compiled plans embed resolved subschemas, so
workers never consult a catalog — compile once on the driver, ship the plan
(cloudpickle via Ray) into each actor (§2.7 mapping in SURVEY.md).
"""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin

from . import extensions as _ext
from . import pointer as jptr


class SpecError(Exception):
    pass


# Schema-bearing keyword positions, by value shape. The registration walk
# only descends through these (plus registered extension keywords), so an
# ``$id``/``$anchor`` inside an UNKNOWN keyword, ``enum``, or ``const`` is
# plain data and never becomes a real identifier — matching the reference,
# where only Subschema/ArrayOfSubschemas/ObjectOfSubschemas keyword classes
# compile children (/root/reference/jschon/vocabulary/__init__.py:174-221)
# and unknown keywords degrade to annotations (:100-107).
_MAP_OF_SCHEMAS = frozenset({
    "properties", "patternProperties", "dependentSchemas", "$defs",
    "definitions",
})
_LIST_OF_SCHEMAS = frozenset({"allOf", "anyOf", "oneOf", "prefixItems"})
_SINGLE_SCHEMA = frozenset({
    "additionalProperties", "contains", "propertyNames", "not", "if",
    "then", "else", "unevaluatedItems", "unevaluatedProperties",
    "additionalItems", "contentSchema",
})
# "items" is a single schema in 2020-12 and either a single schema or an
# array of positional schemas in 2019-09 — shape-dispatch on the value.
_SHAPE_POLYMORPHIC = frozenset({"items"})


class LocalSource:
    """Load spec documents from a directory by relative path.

    The analogue of the reference's LocalSource
    (/root/reference/jschon/catalog/__init__.py:35-55): callable with the
    URI's path relative to the registered prefix."""

    def __init__(self, base_dir: str, suffix: str = ""):
        self.base_dir = base_dir
        self.suffix = suffix

    def __call__(self, relative_path: str):
        import json
        import os
        path = os.path.join(self.base_dir, relative_path) + self.suffix
        with open(path) as f:
            return json.load(f)


def _default_transport(url: str):
    """Fetch + parse JSON over HTTP(S) (the reference's json_loadr,
    /root/reference/jschon/utils.py). Kept as a module-level seam so
    tests (and the no-network sandbox) inject a fake transport."""
    import json
    from urllib.request import urlopen
    with urlopen(url) as resp:  # pragma: no cover - no network in CI
        return json.load(resp)


class RemoteSource:
    """Load spec documents from a URL prefix.

    The analogue of the reference's RemoteSource
    (/root/reference/jschon/catalog/__init__.py:57-67): callable with the
    URI's path relative to the registered prefix; the document is fetched
    from ``base_url + relative_path + suffix``.  ``transport`` is any
    callable ``(url) -> spec dict`` — defaults to a urllib fetch, and is
    injectable so offline environments can serve fakes."""

    def __init__(self, base_url: str, suffix: str = "", transport=None):
        if not base_url.endswith("/"):
            raise SpecError('base_url must end with "/"')
        self.base_url = base_url
        self.suffix = suffix
        self.transport = transport or _default_transport

    def __call__(self, relative_path: str):
        return self.transport(
            urljoin(self.base_url, relative_path) + self.suffix)


class SpecCatalog:
    def __init__(self):
        # base_uri (no fragment) -> {"doc": spec, "anchors": {name: ptr}}
        self._resources: dict[str, dict] = {}
        # uri prefix -> callable(relative_path) -> spec dict ('' = default)
        self._uri_sources: dict[str, object] = {}

    def add_uri_source(self, base_uri: str | None, source) -> None:
        """Register a source for lazily loading URI-identified specs.

        Longest-prefix routing, `None` = default source — the reference's
        add_uri_source/load_json contract
        (/root/reference/jschon/catalog/__init__.py:102-164). `source` is
        any callable taking the path relative to the prefix."""
        if base_uri is None:
            self._uri_sources[""] = source
            return
        if "#" in base_uri or not base_uri.endswith("/"):
            raise SpecError('base_uri must be fragmentless and end with "/"')
        self._uri_sources[base_uri] = source

    def load_json(self, uri: str):
        """Load the spec document for `uri` via the most specific source."""
        candidates = sorted(
            (p for p in self._uri_sources if uri.startswith(p)),
            key=len, reverse=True)
        if not candidates:
            raise SpecError(f'no source is available for "{uri}"')
        prefix = candidates[0]
        try:
            return self._uri_sources[prefix](uri[len(prefix):])
        except SpecError:
            raise
        except Exception as e:
            raise SpecError(f"failed to load {uri!r}: {e}") from e

    def _load_resource(self, base: str) -> dict | None:
        """Lazy-load + register an unknown resource through the sources."""
        if not self._uri_sources:
            return None
        try:
            doc = self.load_json(base)
        except SpecError:
            return None
        self.register(doc, base)
        res = self._resources.get(base)
        if res is None or res["doc"] is None:
            # the document declared its own $id: alias the requested URI
            if isinstance(doc, dict) and isinstance(doc.get("$id"), str):
                canonical = urldefrag(urljoin(base, doc["$id"])).url
                res = self._resources.get(canonical)
                if res is not None:
                    self._resources[base] = res
        return res

    def register(self, spec, uri: str | None = None) -> str:
        """Register a spec document (and any embedded ``$id`` resources).

        Returns the canonical base URI of the root resource.
        """
        if isinstance(spec, bool):
            if uri is None:
                raise SpecError("boolean root spec requires an explicit uri")
            self._resources[uri] = {"doc": spec, "anchors": {}}
            return uri
        root_id = spec.get("$id", uri)
        if root_id is None:
            raise SpecError("spec has no $id and no uri was given")
        root_base = urldefrag(urljoin(uri or root_id, root_id)).url
        self._walk_register(spec, root_base, "")
        return root_base

    def _walk_register(self, node, base: str, ptr: str) -> None:
        if not isinstance(node, dict):
            return
        if "$id" in node and isinstance(node["$id"], str):
            new_base = urldefrag(urljoin(base, node["$id"])).url
            base, ptr = new_base, ""
        res = self._resources.setdefault(base, {"doc": None, "anchors": {}})
        if ptr == "":
            res["doc"] = node
        if "$anchor" in node and isinstance(node["$anchor"], str):
            res["anchors"][node["$anchor"]] = ptr
        # $dynamicAnchor also registers a plain fragment alias
        # (/root/reference/jschon/vocabulary/core.py:172-184 calls the same
        # catalog.add_schema as $anchor); its *dynamic* behavior lives in
        # the $dynamicRef evaluation, which re-checks the resolved node.
        if "$dynamicAnchor" in node and isinstance(node["$dynamicAnchor"], str):
            res["anchors"][node["$dynamicAnchor"]] = ptr
        for key, val in node.items():
            shape = None
            if key in _MAP_OF_SCHEMAS:
                shape = "map"
            elif key in _LIST_OF_SCHEMAS:
                shape = "list"
            elif key in _SINGLE_SCHEMA:
                shape = "single"
            elif key in _SHAPE_POLYMORPHIC:
                shape = "list" if isinstance(val, list) else "single"
            else:
                # registered extension keywords may carry subschemas
                # (KeywordEval.descend, extensions.py) — descend
                # shape-dispatched; anything else is data, not schemas
                # (module-level import: a function-level relative import
                # breaks under pickle-by-value on driver-owned workers
                # that don't have this repo on sys.path)
                if _ext.get_plugin(key) is not None:
                    shape = "list" if isinstance(val, list) else "single"
            if shape == "map" and isinstance(val, dict):
                for name, sub in val.items():
                    if isinstance(sub, dict):
                        self._walk_register(
                            sub, base, jptr.join(ptr, key, name))
            elif shape == "list" and isinstance(val, list):
                for i, item in enumerate(val):
                    if isinstance(item, dict):
                        self._walk_register(
                            item, base, jptr.join(ptr, key, i))
            elif shape == "single" and isinstance(val, dict):
                self._walk_register(val, base, jptr.join(ptr, key))

    def resolve(self, ref: str, base: str) -> tuple[object, str, str]:
        """Resolve a ``$ref`` value against a base URI.

        Returns (spec_node, target_base_uri, target_pointer). Mirrors
        RefKeyword.resolve (/root/reference/jschon/vocabulary/core.py:89-99).
        """
        target = urljoin(base, ref)
        target_base, frag = urldefrag(target)
        frag = jptr.parse_uri_fragment(frag)
        res = self._resources.get(target_base)
        if res is None or res["doc"] is None:
            res = self._load_resource(target_base)
        if res is None or res["doc"] is None:
            raise SpecError(f"unknown spec resource: {target_base!r} (ref {ref!r})")
        if frag == "":
            return res["doc"], target_base, ""
        if frag.startswith("/"):
            try:
                node = jptr.evaluate(frag, res["doc"])
            except (KeyError, IndexError, ValueError) as e:
                raise SpecError(f"bad $ref pointer {ref!r}: {e}") from None
            return node, target_base, frag
        ptr = res["anchors"].get(frag)
        if ptr is None:
            raise SpecError(f"unknown anchor {frag!r} in {target_base!r}")
        return jptr.evaluate(ptr, res["doc"]), target_base, ptr

    def cache(self):
        """Context manager for a throwaway registration namespace.

        The analogue of the reference's ``Catalog.cache``
        (/root/reference/jschon/catalog/__init__.py:370-391): resources
        registered inside the ``with`` block are popped on exit, so
        temporary specs (ad-hoc validation runs, tests) don't pollute a
        long-lived catalog.

        Example::

            with catalog.cache():
                catalog.register(tmp_spec)
                ...  # resolve/evaluate against tmp_spec
            # tmp_spec (and anything it pulled in) is gone
        """
        import contextlib

        @contextlib.contextmanager
        def _cache():
            # snapshot existing entries too: registering inside the block
            # can fill a pre-existing stub's doc or add anchors to it
            before = {k: (res["doc"], dict(res["anchors"]))
                      for k, res in self._resources.items()}
            try:
                yield self
            finally:
                for k in set(self._resources) - set(before):
                    del self._resources[k]
                for k, (doc, anchors) in before.items():
                    res = self._resources.get(k)
                    if res is not None:
                        res["doc"] = doc
                        res["anchors"] = anchors

        return _cache()

    def session(self, cacheid=None) -> "CatalogSession":
        """Open an ISOLATED compile namespace over this catalog — the
        analogue of the reference's named schema caches
        (``Catalog.cache(cacheid)`` + per-``cacheid`` ``_schema_cache``,
        /root/reference/jschon/catalog/__init__.py:370-391): two live
        sessions may register DIFFERENT documents under the SAME URI
        concurrently (e.g. one spec URI compiled under two metaschemas
        with different active vocabularies) without seeing each other,
        and the base catalog is never touched.

        Usable as a context manager; the ``cacheid`` must be unique
        among LIVE sessions (reference raises "cache identifier is
        already in use"). Process-cached task pools are safe by
        construction: compiled plans embed their resolved subschemas,
        so a plan built from one session stays correct on every worker
        regardless of other sessions — catalog state never ships.
        """
        return CatalogSession(self, cacheid)

    def resource_root(self, base: str):
        """Root schema document of a registered resource, or None."""
        res = self._resources.get(base)
        return None if res is None else res["doc"]

    def try_resolve_anchor(self, base: str, name: str):
        """Resolve ``base#name`` if registered, else None (no raise).

        Used by the $dynamicRef dynamic-scope walk
        (/root/reference/jschon/vocabulary/core.py:148-166), where lookup
        failures along the scope chain are silently skipped.
        """
        res = self._resources.get(base)
        if res is None or res["doc"] is None:
            return None
        ptr = res["anchors"].get(name)
        if ptr is None:
            return None
        return jptr.evaluate(ptr, res["doc"]), base, ptr


class CatalogSession(SpecCatalog):
    """Isolated registration namespace over a base SpecCatalog.

    Snapshot-on-create, copy-on-entry semantics: the session starts
    with per-entry copies of the base's registrations (documents shared
    by reference — the catalog never mutates spec dicts, only its entry
    records), so registrations and stub fills inside the session can
    never leak into the base or into a sibling session. URI sources are
    inherited (copied) so lazy loads work per session.

    See SpecCatalog.session for the reference mapping
    (catalog/__init__.py:370-391).
    """

    def __init__(self, base: SpecCatalog, cacheid=None):
        import uuid

        if cacheid is None:
            cacheid = uuid.uuid4()
        live = getattr(base, "_live_sessions", None)
        if live is None:
            live = base._live_sessions = set()
        if cacheid in live:
            raise SpecError("cache identifier is already in use")
        live.add(cacheid)
        self.cacheid = cacheid
        self._base_catalog = base
        self._resources = {k: {"doc": v["doc"],
                               "anchors": dict(v["anchors"])}
                           for k, v in base._resources.items()}
        self._uri_sources = dict(base._uri_sources)

    def close(self) -> None:
        """Release the cacheid (the namespace dies with the object)."""
        live = getattr(self._base_catalog, "_live_sessions", set())
        live.discard(self.cacheid)

    def __enter__(self) -> "CatalogSession":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
