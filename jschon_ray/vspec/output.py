"""Output formatters: projections of evaluation results.

Mirrors the reference's formatter registry + the four standard formats
(/root/reference/jschon/output.py:19-165). In the Ray engine the canonical
dataset-scale artifacts are the `valid` column (= ``flag``) and the
violation rows (= ``basic`` errors); the richer tree formats
(``detailed``/``verbose``/``hierarchical``) are produced from the per-row
oracle's result tree — they're debug/inspection views, evaluated per row on
demand, never in the hot path.
"""

from __future__ import annotations

from .row_oracle import RNode

_formatters: dict[str, callable] = {}


def output_formatter(format: str):
    """Register a formatter: fn(root: RNode, **kw) -> JSON-compatible.

    The user-extension analogue of the reference's decorator
    (/root/reference/jschon/output.py:22-33)."""

    def decorator(f):
        _formatters[format] = f
        return f

    return decorator


def create_output(root: RNode, format: str, **kwargs):
    return _formatters[format](root, **kwargs)


@output_formatter("flag")
def flag(root: RNode) -> dict:
    return {"valid": root.valid}


@output_formatter("basic")
def basic(root: RNode, annotations=None) -> dict:
    valid = root.valid
    msgval_of = (lambda n: n.annotation) if valid else (lambda n: n.error)
    msgkey = "annotation" if valid else "error"
    childkey = "annotations" if valid else "errors"

    def visit(node: RNode):
        if node.valid is valid:
            if (annotations is None or node.key in annotations) \
                    and (msgval := msgval_of(node)) is not None:
                yield {
                    "instanceLocation": node.ipath,
                    "keywordLocation": node.path,
                    "absoluteKeywordLocation": str(node.absolute_uri),
                    msgkey: msgval,
                }
            for c in node.children.values():
                yield from visit(c)

    return {"valid": valid, childkey: list(visit(root))}


@output_formatter("detailed")
def detailed(root: RNode) -> dict:
    valid = root.valid
    msgkey = "annotation" if valid else "error"
    childkey = "annotations" if valid else "errors"

    def visit(node: RNode):
        output = {
            "instanceLocation": node.ipath,
            "keywordLocation": node.path,
            "absoluteKeywordLocation": str(node.absolute_uri),
            childkey: [visit(c) for c in node.children.values()
                       if c.valid is valid],
        }
        if not output[childkey]:
            del output[childkey]
            msgval = node.annotation if valid else node.error
            if msgval is not None:
                output[msgkey] = msgval
        elif len(output[childkey]) == 1:
            output = output[childkey][0]
        return output

    return {
        "valid": valid,
        "instanceLocation": root.ipath,
        "keywordLocation": root.path,
        "absoluteKeywordLocation": str(root.absolute_uri),
        childkey: [visit(c) for c in root.children.values()
                   if c.valid is valid],
    }


@output_formatter("hierarchical")
def hierarchical(root: RNode) -> dict:
    """Draft-next schema-node-grouped format
    (/root/reference/jschon/output.py:129-165): one output object per
    (sub)schema node; keyword results fold into that node's
    annotations/errors maps; non-schema nodes pass their descendants
    through."""

    def visit(node: RNode):
        if node.is_schema:
            valid = node.valid
            output = {
                "valid": valid,
                "evaluationPath": node.path,
                "schemaLocation": str(node.absolute_uri),
                "instanceLocation": node.ipath,
            }
            details = []
            annotations = {}
            errors = {}
            for child in node.children.values():
                details += [out for out in visit(child)
                            if child.valid == valid]
                if valid and child.annotation is not None:
                    annotations[child.key] = child.annotation
                elif not valid and child.error is not None:
                    errors[child.key] = child.error
            if details:
                output["details"] = details
            if valid and annotations:
                output["annotations"] = annotations
            elif not valid and errors:
                output["errors"] = errors
            yield output
        else:
            for child in node.children.values():
                yield from visit(child)

    return next(visit(root))


@output_formatter("verbose")
def verbose(root: RNode) -> dict:
    def visit(node: RNode):
        valid = node.valid
        output = {
            "valid": valid,
            "instanceLocation": node.ipath,
            "keywordLocation": node.path,
            "absoluteKeywordLocation": str(node.absolute_uri),
        }
        msgkey = "annotation" if valid else "error"
        msgval = node.annotation if valid else node.error
        if msgval is not None:
            output[msgkey] = msgval
        childkey = "annotations" if valid else "errors"
        childarr = [visit(c) for c in node.children.values()]
        if childarr:
            output[childkey] = childarr
        return output

    return visit(root)
