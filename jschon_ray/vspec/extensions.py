"""Custom-keyword plugin registry — the user-extension surface.

Mirrors the reference's extension model (subclass Keyword, declare
key/instance_types/depends_on, implement evaluate — SURVEY.md §2.8,
/root/reference/examples/custom_keyword.py:25-49) re-shaped for the batch
engine: a plugin registers

  * ``row_eval(ctx)``      — per-row semantics (oracle + fallback path);
  * ``compile_vec(site, kval, compiler)`` (optional) — returns a compiled
    ``CKw`` whose ``evaluate`` runs vectorized over Arrow batches; omit it
    and the subschema containing the keyword runs through the per-row
    fallback with identical semantics.

Registration is process-global (like the reference's catalog registries);
compiled plans embed the handlers, so Ray workers receive them via the
plan's (by-value) pickle without needing to re-register.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import dialect


@dataclass
class KeywordPlugin:
    key: str
    instance_types: tuple
    depends_on: tuple
    row_eval: callable       # fn(RowCtx) -> None
    compile_vec: callable | None = None


_UNSET = object()


@dataclass
class RowCtx:
    """What a per-row keyword implementation sees (Result-API analogue)."""

    evaluator: object       # RowEvaluator (for subschema recursion)
    schema: dict            # containing schema object
    kval: object            # the keyword's value
    instance: object        # plain-Python instance
    ipath: str
    node: object            # RNode — fail()/annotation/asserting
    parent: object          # parent RNode — sibling lookups
    base: str
    sptr: str

    def descend(self, subschema, *, key, instance=_UNSET, ipath=None,
                cls=None):
        """Evaluate ``subschema`` as a subresult of this keyword's node
        — the analogue of the reference's ``with result(instance, key,
        schema, cls=MyResult)`` context manager
        (/root/reference/jschon/jsonschema.py:400-430). ``cls`` (an
        RNode subclass) applies to the yielded node AND every node of
        the subtree below it (RNode.child threads ``type(self)``);
        omit it to inherit the current tree's class. Returns the
        subresult node — inspect ``.passed`` / annotations, or call
        ``.fail()`` on the keyword's own node based on it. A custom
        class customizes result REPRESENTATION (extra state, output
        hooks); verdicts must not depend on it, exactly as in the
        reference.
        """
        inst = self.instance if instance is _UNSET else instance
        ip = self.ipath if ipath is None else ipath
        sub = self.node.child(key, ip, cls=cls)
        self.evaluator.eval_schema(subschema, inst, ip, sub,
                                   self.base, sub.sptr)
        return sub


_plugins: dict[str, KeywordPlugin] = {}


def register_keyword(key: str, *, instance_types=dialect.ALL_TYPES,
                     depends_on=(), row_eval, compile_vec=None) -> None:
    plugin = KeywordPlugin(key, tuple(instance_types), tuple(depends_on),
                           row_eval, compile_vec)
    _plugins[key] = plugin
    # feeds type gating + the stable toposort (dialect.keyword_order),
    # in every dialect's table
    entry = (plugin.instance_types, plugin.depends_on)
    dialect.KEYWORDS[key] = entry
    dialect.KEYWORDS_2019[key] = entry


def unregister_keyword(key: str) -> None:
    _plugins.pop(key, None)
    dialect.KEYWORDS.pop(key, None)
    dialect.KEYWORDS_2019.pop(key, None)


def get_plugin(key: str) -> KeywordPlugin | None:
    return _plugins.get(key)
