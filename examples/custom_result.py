"""A custom Result subclass scoped to one keyword's subtree.

The analogue of the reference's per-subtree result-class hook: a keyword
may pass ``cls=MyResult`` when descending into a subschema, and the
class "is applied to all nodes within the yielded subtree"
(/root/reference/jschon/jsonschema.py:400-430, the ``cls`` parameter of
``Result.__call__``; threading at :419 + :373-380). Here the applicator
keyword ``auditOf`` evaluates its subschema under ``AuditNode``, which
records every schema location it visits — result REPRESENTATION changes,
verdicts don't.
"""
from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.extensions import register_keyword, unregister_keyword
from jschon_ray.vspec.row_oracle import RNode, RowEvaluator

AUDIT: list[str] = []


class AuditNode(RNode):
    """RNode subclass: logs each node's dynamic path as it is created
    (the reference docs' canonical use of a Result subclass — carrying
    extra per-subtree state without touching evaluation semantics)."""

    __slots__ = ()

    def __init__(self, **kw):
        super().__init__(**kw)
        AUDIT.append(self.path or "<root>")


def row_eval(ctx):
    # descend like any applicator, but under the custom node class;
    # the keyword's own verdict mirrors the subresult's
    sub = ctx.descend(ctx.kval, key="auditOf", cls=AuditNode)
    if not sub.passed:
        ctx.node.fail("The instance is invalid against the audited "
                      "subschema")


register_keyword("auditOf", row_eval=row_eval)

spec = {
    "$id": "https://example.com/audited",
    "type": "object",
    "properties": {"name": {"type": "string"}},
    "auditOf": {
        "properties": {"meta": {"required": ["tag"],
                                "properties": {"tag": {"minLength": 2}}}},
    },
}

ev = RowEvaluator(SpecCatalog())
for instance in ({"name": "ok", "meta": {"tag": "ab"}},
                 {"name": "ok", "meta": {"tag": "x"}},
                 {"name": 3}):
    AUDIT.clear()
    result = ev.evaluate(spec, instance)
    print(instance, "->", result.passed)
    print("  audited locations:", sorted(AUDIT))
unregister_keyword("auditOf")
