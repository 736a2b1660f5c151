"""RFC 6902 JSON Patch: per-document ops + dataset-level column transforms.

Reference semantics: /root/reference/jschon/jsonpatch.py:124-331 (ops
evaluate sequentially against a deep copy; paths are RFC 6901 pointers;
``test`` uses JSON-model equality). Implemented fresh from the RFC over
plain Python values.

Dataset mapping (SURVEY.md §2.5): a patch whose paths address TOP-LEVEL
row properties compiles to vectorized Arrow column operations
(add/remove/replace/move/copy of whole columns, constant or computed
values); deeper paths fall back to per-row application inside map_batches.
"""

from __future__ import annotations

import copy

from . import pointer as jptr
from .row_oracle import jeq
import pyarrow as pa

from .evaluator import strip_absent


class PatchError(Exception):
    pass


def _split_parent(path: str):
    toks = jptr.tokens(path)
    if not toks:
        return None, None
    return toks[:-1], toks[-1]


def _resolve(doc, toks):
    node = doc
    for t in toks:
        if isinstance(node, dict):
            if t not in node:
                raise PatchError(f"path not found: {t!r}")
            node = node[t]
        elif isinstance(node, list):
            try:
                i = int(t)
            except ValueError:
                raise PatchError(f"bad array index {t!r}") from None
            if not 0 <= i < len(node):
                raise PatchError(f"index out of range: {t}")
            node = node[i]
        else:
            raise PatchError(f"cannot traverse scalar at {t!r}")
    return node


def _get(doc, path: str):
    return _resolve(doc, jptr.tokens(path))


def _add(doc, path, value):
    if path == "":
        return value
    parent_toks, key = _split_parent(path)
    parent = _resolve(doc, parent_toks)
    if isinstance(parent, dict):
        parent[key] = value
    elif isinstance(parent, list):
        if key == "-":
            parent.append(value)
        else:
            try:
                i = int(key)
            except ValueError:
                raise PatchError(f"bad array index {key!r}") from None
            if not 0 <= i <= len(parent):
                raise PatchError(f"index out of range: {i}")
            parent.insert(i, value)
    else:
        raise PatchError("add target parent is a scalar")
    return doc


def _remove(doc, path):
    if path == "":
        raise PatchError("cannot remove the whole document")
    parent_toks, key = _split_parent(path)
    parent = _resolve(doc, parent_toks)
    if isinstance(parent, dict):
        if key not in parent:
            raise PatchError(f"remove: path not found: {key!r}")
        del parent[key]
    elif isinstance(parent, list):
        i = int(key)
        if not 0 <= i < len(parent):
            raise PatchError(f"index out of range: {i}")
        del parent[i]
    else:
        raise PatchError("remove target parent is a scalar")
    return doc


def apply_patch(document, ops: list):
    """Apply an RFC 6902 op list to a deep copy; returns the new document.

    Mirrors JSONPatch.evaluate (/root/reference/jschon/jsonpatch.py:124-130).
    """
    doc = copy.deepcopy(document)
    for op in ops:
        kind = op.get("op")
        path = op["path"]
        if kind == "add":
            doc = _add(doc, path, copy.deepcopy(op["value"]))
        elif kind == "remove":
            doc = _remove(doc, path)
        elif kind == "replace":
            _get(doc, path)  # must exist
            doc = _remove(doc, path) if path != "" else doc
            doc = _add(doc, path, copy.deepcopy(op["value"]))
        elif kind == "move":
            frm = op["from"]
            if frm != path and path.startswith(frm + "/"):
                raise PatchError("cannot move into own child")
            val = _get(doc, frm)
            doc = _remove(doc, frm)
            doc = _add(doc, path, val)
        elif kind == "copy":
            val = copy.deepcopy(_get(doc, op["from"]))
            doc = _add(doc, path, val)
        elif kind == "test":
            if not jeq(_get(doc, path), op["value"]):
                raise PatchError(f"test failed at {path!r}")
        else:
            raise PatchError(f"unknown op {kind!r}")
    return doc


# ---------------------------------------------------------------------------
# dataset-level column patching


def _is_column_path(path: str) -> bool:
    toks = jptr.tokens(path) if path else []
    return len(toks) == 1


def patch_batch(batch, ops: list):
    """Apply a patch to every row of a pa.Table batch.

    Top-level-column ops are vectorized (whole-column add/remove/replace/
    move/copy, constant values); anything deeper applies per row via
    apply_patch (documented slow path). ``test`` ops at column level become
    a filter-precondition error if any row fails, matching sequential
    semantics only for homogeneous batches — use per-row mode when tests
    must gate individual rows.
    """

    if all(_is_column_path(op.get("path", "")) and
           _is_column_path(op.get("from", "/x")) and
           op.get("op") in ("add", "remove", "replace", "move", "copy")
           for op in ops):
        for op in ops:
            kind = op["op"]
            col = jptr.tokens(op["path"])[0]
            if kind in ("add", "replace"):
                arr = pa.array([op["value"]] * batch.num_rows)
                if col in batch.column_names:
                    batch = batch.set_column(
                        batch.schema.get_field_index(col), col, arr)
                else:
                    batch = batch.append_column(col, arr)
            elif kind == "remove":
                batch = batch.drop_columns([col])
            elif kind in ("move", "copy"):
                src = jptr.tokens(op["from"])[0]
                arr = batch[src]
                if col in batch.column_names:
                    batch = batch.set_column(
                        batch.schema.get_field_index(col), col, arr)
                else:
                    batch = batch.append_column(col, arr)
                if kind == "move":
                    batch = batch.drop_columns([src])
        return batch

    rows = [apply_patch(strip_absent(r), ops) for r in batch.to_pylist()]
    return pa.Table.from_pylist(rows)


def patch_dataset(ds, ops: list):
    """map_batches wrapper: apply an RFC 6902 patch to every row."""
    import functools

    return ds.map_batches(functools.partial(patch_batch, ops=ops),
                          batch_format="pyarrow")
