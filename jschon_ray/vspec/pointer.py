"""RFC 6901 JSON Pointer string utilities.

Mirrors the semantics of the reference's JSONPointer
(/root/reference/jschon/jsonpointer.py:113-273) for the subset we need:
token escaping, path join, and URI-fragment encoding for
``absoluteKeywordLocation`` strings. We deliberately keep pointers as plain
strings — the engine's violation rows carry pointer *strings*, never node
objects, so there is nothing to gain from a class.
"""

from __future__ import annotations

from urllib.parse import quote, unquote


def escape_token(token: str) -> str:
    """Escape one reference token per RFC 6901 (~ -> ~0, / -> ~1)."""
    return token.replace("~", "~0").replace("/", "~1")


def unescape_token(token: str) -> str:
    """Unescape one reference token per RFC 6901."""
    return token.replace("~1", "/").replace("~0", "~")


def join(pointer: str, *tokens) -> str:
    """Append tokens (unescaped) to a pointer string."""
    out = pointer
    for t in tokens:
        out += "/" + escape_token(str(t))
    return out


def tokens(pointer: str) -> list[str]:
    """Split a pointer string into unescaped tokens. '' -> []."""
    if pointer == "":
        return []
    if not pointer.startswith("/"):
        raise ValueError(f"not a JSON pointer: {pointer!r}")
    return [unescape_token(t) for t in pointer.split("/")[1:]]


# RFC 3986 fragment charset: pchar / "/" / "?" where
# pchar = unreserved / pct-encoded / sub-delims / ":" / "@"
_FRAGMENT_SAFE = "!$&'()*+,;=@:/?-._~"


def uri_fragment(pointer: str) -> str:
    """Percent-encode a JSON pointer for use as a URI fragment.

    Matches jschon's JSONPointer.uri_fragment
    (/root/reference/jschon/jsonpointer.py:236-255).
    """
    return quote(pointer, safe=_FRAGMENT_SAFE)


def parse_uri_fragment(fragment: str) -> str:
    """Decode a URI fragment into a JSON pointer string."""
    return unquote(fragment)


_ARRAY_TOK = __import__("re").compile(r"0|[1-9][0-9]*")


def evaluate(pointer: str, doc):
    """Resolve a pointer against plain-Python JSON data.

    Reference semantics: /root/reference/jschon/jsonpointer.py:187-221.
    Raises KeyError/IndexError on failure.
    """
    node = doc
    for tok in tokens(pointer):
        if isinstance(node, dict):
            node = node[tok]
        elif isinstance(node, list):
            # RFC 6901 array tokens: 0 | [1-9][0-9]* — negative and
            # leading-zero tokens must fail, not resolve Python-style
            if not _ARRAY_TOK.fullmatch(tok):
                raise IndexError(f"invalid array index {tok!r}")
            node = node[int(tok)]
        else:
            raise KeyError(f"cannot index {type(node).__name__} with {tok!r}")
    return node


# ---------------------------------------------------------------------------
# Relative JSON Pointer (draft-bhutton-relative-json-pointer)


class RelativePointerError(ValueError):
    pass


_REL_RE = None


def _rel_re():
    global _REL_RE
    if _REL_RE is None:
        import re
        _REL_RE = re.compile(
            r"(?P<up>0|[1-9][0-9]*)"
            r"(?P<over>(\+|-)[1-9][0-9]*)?"
            r"(?P<ref>#|(/([^~/]|(~[01]))*)*)$")
    return _REL_RE


class RelativeJSONPointer:
    """Relative JSON Pointer over plain documents.

    The reference evaluates via parent back-links on its JSON node tree
    (/root/reference/jschon/jsonpointer.py:276-392); here the starting
    location is an explicit pointer string, so ancestry is just prefix
    arithmetic — no node objects needed.
    """

    __slots__ = ("up", "over", "index", "path")

    def __init__(self, value: str):
        m = _rel_re().fullmatch(value)
        if m is None:
            raise RelativePointerError(
                f"'{value}' is not a valid relative JSON pointer")
        up, over, ref = m.group("up", "over", "ref")
        self.up = int(up)
        self.over = int(over) if over else 0
        self.index = ref == "#"
        self.path = "" if self.index else ref

    def __str__(self):
        over = "" if not self.over else (
            f"+{self.over}" if self.over > 0 else str(self.over))
        return f"{self.up}{over}{'#' if self.index else self.path}"

    def evaluate(self, doc, start: str):
        """Resolve against ``doc`` from the node addressed by ``start``.

        Returns the referenced value, or (for ``#``) the index/name of the
        referenced node within its parent. Raises RelativePointerError on
        out-of-scope navigation, mirroring the reference's evaluate
        (/root/reference/jschon/jsonpointer.py:358-392).
        """
        toks = tokens(start)
        if self.up > len(toks):
            raise RelativePointerError("Up too many levels")
        toks = toks[:len(toks) - self.up]
        if self.over:
            if not toks:
                raise RelativePointerError(
                    "No containing node for index adjustment")
            parent = evaluate(join("", *toks[:-1]), doc)
            if not isinstance(parent, list):
                raise RelativePointerError(
                    "Index adjustment not valid for type "
                    f"{type(parent).__name__}")
            adjusted = int(toks[-1]) + self.over
            if adjusted < 0 or adjusted >= len(parent):
                raise RelativePointerError("Index adjustment out of range")
            toks[-1] = str(adjusted)
        if self.index:
            if not toks:
                raise RelativePointerError("No containing node")
            parent = evaluate(join("", *toks[:-1]), doc)
            return int(toks[-1]) if isinstance(parent, list) else toks[-1]
        try:
            return evaluate(join("", *toks) + self.path, doc)
        except (KeyError, IndexError, ValueError) as e:
            raise RelativePointerError(str(e)) from e
