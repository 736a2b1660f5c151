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

from . import pointer as jptr


class SpecError(Exception):
    pass


class SpecCatalog:
    def __init__(self):
        # base_uri (no fragment) -> {"doc": spec, "anchors": {name: ptr}}
        self._resources: dict[str, dict] = {}

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
            if key in ("enum", "const", "default", "examples"):
                continue  # data, not schemas
            if isinstance(val, dict):
                self._walk_register(val, base, jptr.join(ptr, key))
            elif isinstance(val, list):
                for i, item in enumerate(val):
                    if isinstance(item, (dict,)):
                        self._walk_register(item, base, jptr.join(ptr, key, i))

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
