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
            node = node[int(tok)]
        else:
            raise KeyError(f"cannot index {type(node).__name__} with {tok!r}")
    return node
