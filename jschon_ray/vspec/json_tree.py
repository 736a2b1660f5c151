"""Mutable JSON document tree — in-place patch target.

The analogue of the reference's ``JSON`` node class
(/root/reference/jschon/json.py): a parent-linked tree whose nodes know
their ``key`` and JSON-Pointer ``path``, with container mutators
(``__setitem__``/``__delitem__``/``insert``, json.py:236-273) and
pointer-level in-place patch operations ``add``/``remove``/``replace``
(json.py:327-445).  ``move``/``copy``/``test`` — stubbed "experimental,
not yet implemented" in the reference (json.py:446-459) — are
implemented here with RFC 6902 semantics, so a ``JSONDoc`` supports the
full six-op patch vocabulary in place.

This is the DOCUMENT-side complement to ``vspec/patch.py``'s functional
(deep-copy) patch evaluator: use ``JSONPatch.evaluate`` for
value-in/value-out semantics and ``apply_patch_in_place`` (patch.py) /
``JSONDoc.patch`` for repeated edits on a long-lived tree.  Children are
wrapped lazily and unwrapped transparently; ``value`` round-trips to
plain Python.
"""

from __future__ import annotations

from . import pointer as jptr
from .row_oracle import jeq, jtype


class JSONTreeError(ValueError):
    pass


class JSONDoc:
    """One node of a mutable JSON tree (reference json.py JSON class)."""

    __slots__ = ("data", "parent", "key")

    def __init__(self, value, *, parent: "JSONDoc | None" = None,
                 key: str | None = None):
        if isinstance(value, JSONDoc):
            value = value.value
        self.parent = parent
        self.key = key
        self.data = self._wrap(value)

    def _wrap(self, value):
        if isinstance(value, dict):
            return {k: JSONDoc(v, parent=self, key=k)
                    for k, v in value.items()}
        if isinstance(value, (list, tuple)):
            return [JSONDoc(v, parent=self, key=str(i))
                    for i, v in enumerate(value)]
        return value

    # -- identity ---------------------------------------------------------
    @property
    def type(self) -> str:
        """JSON type name (reference json.py ``type``)."""
        return jtype(self.value)

    @property
    def path(self) -> str:
        """JSON Pointer from the document root (reference json.py
        ``path``, built from the parent chain)."""
        node, toks = self, []
        while node.parent is not None:
            toks.append(node.key)
            node = node.parent
        return "".join("/" + jptr.escape_token(t) for t in reversed(toks))

    @property
    def document_root(self) -> "JSONDoc":
        node = self
        while node.parent is not None:
            node = node.parent
        return node

    @property
    def value(self):
        """Plain-Python value (recursive unwrap; reference json.py
        ``value`` with its invalidation-on-mutation contract)."""
        if isinstance(self.data, dict):
            return {k: v.value for k, v in self.data.items()}
        if isinstance(self.data, list):
            return [v.value for v in self.data]
        return self.data

    # -- container protocol (json.py:200-273) -----------------------------
    def __len__(self):
        if isinstance(self.data, (dict, list)):
            return len(self.data)
        if isinstance(self.data, str):
            return len(self.data)
        raise TypeError(f"{self.type} has no length")

    def __iter__(self):
        if isinstance(self.data, (dict, list)):
            return iter(self.data)
        raise TypeError(f"{self.type} is not iterable")

    def __contains__(self, key):
        return isinstance(self.data, dict) and key in self.data

    def __getitem__(self, index) -> "JSONDoc":
        if isinstance(self.data, dict):
            return self.data[index]
        if isinstance(self.data, list):
            return self.data[index]
        raise TypeError(f"cannot index into {self.type}")

    def __setitem__(self, index, obj) -> None:
        """Replace the child at ``index`` (json.py:236-248)."""
        if isinstance(self.data, dict):
            self.data[index] = JSONDoc(obj, parent=self, key=index)
        elif isinstance(self.data, list):
            self.data[index] = JSONDoc(obj, parent=self, key=str(index))
        else:
            raise TypeError(f"cannot index into {self.type}")

    def __delitem__(self, index) -> None:
        """Delete the child at ``index``; array siblings re-key
        (json.py:249-260)."""
        if isinstance(self.data, dict):
            del self.data[index]
        elif isinstance(self.data, list):
            del self.data[index]
            self._rekey(start=index)
        else:
            raise TypeError(f"cannot index into {self.type}")

    def insert(self, index: int, obj) -> None:
        """Insert into an array; following siblings re-key
        (json.py:261-273)."""
        if not isinstance(self.data, list):
            raise TypeError(f"cannot insert into {self.type}")
        self.data.insert(index, JSONDoc(obj, parent=self, key=str(index)))
        self._rekey(start=index + 1)

    def _rekey(self, start: int = 0) -> None:
        for i in range(start, len(self.data)):
            self.data[i].key = str(i)

    def __eq__(self, other) -> bool:
        other_v = other.value if isinstance(other, JSONDoc) else other
        return jeq(self.value, other_v)

    def __repr__(self):
        return f"JSONDoc({self.value!r})"

    # -- pointer navigation ----------------------------------------------
    def resolve(self, path: str) -> "JSONDoc":
        """Evaluate a JSON Pointer relative to this node, returning the
        NODE (not the value) — jsonpointer.py:187-221 over tree nodes."""
        node = self
        for tok in jptr.tokens(path):
            if isinstance(node.data, dict):
                try:
                    node = node.data[tok]
                except KeyError:
                    raise JSONTreeError(f"no member {tok!r} at "
                                        f"{node.path!r}") from None
            elif isinstance(node.data, list):
                try:
                    node = node.data[_index(tok, len(node.data))]
                except (ValueError, IndexError):
                    raise JSONTreeError(f"bad array index {tok!r} at "
                                        f"{node.path!r}") from None
            else:
                raise JSONTreeError(f"cannot index {node.type} at "
                                    f"{node.path!r}")
        return node

    # -- in-place patch ops (json.py:327-445; RFC 6902) -------------------
    def add(self, path: str, obj) -> None:
        """In-place JSON Patch ``add`` (json.py:327-374)."""
        if path == "":
            self.data = self._wrap(obj.value if isinstance(obj, JSONDoc)
                                   else obj)
            return
        toks = jptr.tokens(path)
        parent = self.resolve(jptr.join("", *toks[:-1]))
        last = toks[-1]
        if isinstance(parent.data, list):
            if last == "-":
                idx = len(parent.data)
            else:
                try:
                    idx = int(last)
                except ValueError:
                    raise JSONTreeError(f"invalid array index {last!r}")
                if not 0 <= idx <= len(parent.data):
                    raise JSONTreeError(f"invalid array index {last!r}")
            parent.insert(idx, obj)
        elif isinstance(parent.data, dict):
            parent[last] = obj
        else:
            raise JSONTreeError(
                f"expecting an array or object at {parent.path!r}")

    def remove(self, path: str) -> None:
        """In-place JSON Patch ``remove`` (json.py:376-410)."""
        if path == "":
            self.data = None
            return
        target = self.resolve(path)
        parent = target.parent
        if isinstance(parent.data, list):
            del parent[int(target.key)]
        else:
            del parent[target.key]

    def replace(self, path: str, obj) -> None:
        """In-place JSON Patch ``replace`` (json.py:412-444)."""
        if path == "":
            self.data = self._wrap(obj.value if isinstance(obj, JSONDoc)
                                   else obj)
            return
        target = self.resolve(path)  # must exist
        parent = target.parent
        if isinstance(parent.data, list):
            parent[int(target.key)] = obj
        else:
            parent[target.key] = obj

    def move(self, from_: str, to: str) -> None:
        """RFC 6902 ``move`` — left unimplemented in the reference
        (json.py:446-450); provided here."""
        value = self.resolve(from_).value
        self.remove(from_)
        self.add(to, value)

    def copy(self, from_: str, to: str) -> None:
        """RFC 6902 ``copy`` — left unimplemented in the reference
        (json.py:451-455); provided here."""
        self.add(to, self.resolve(from_).value)

    def test(self, path: str, obj) -> None:
        """RFC 6902 ``test`` — left unimplemented in the reference
        (json.py:457-459); provided here (raises on mismatch)."""
        target = self.resolve(path)
        want = obj.value if isinstance(obj, JSONDoc) else obj
        if not jeq(target.value, want):
            raise JSONTreeError(
                f"test failed at {path!r}: {target.value!r} != {want!r}")

    def patch(self, ops) -> "JSONDoc":
        """Apply an RFC 6902 op list in place; returns self."""
        for op in ops:
            kind = op["op"]
            if kind == "add":
                self.add(op["path"], op["value"])
            elif kind == "remove":
                self.remove(op["path"])
            elif kind == "replace":
                self.replace(op["path"], op["value"])
            elif kind == "move":
                self.move(op["from"], op["path"])
            elif kind == "copy":
                self.copy(op["from"], op["path"])
            elif kind == "test":
                self.test(op["path"], op["value"])
            else:
                raise JSONTreeError(f"unknown patch op {kind!r}")
        return self


def _index(tok: str, n: int) -> int:
    if tok == "-" or (len(tok) > 1 and tok.startswith("0")):
        raise ValueError(tok)
    i = int(tok)
    if not 0 <= i < n:
        raise IndexError(tok)
    return i
