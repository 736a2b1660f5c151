"""Format validator registry (opt-in assertion).

Mirrors the reference's decorator registry + per-catalog enablement
(/root/reference/jschon/vocabulary/format.py:44-66,
catalog/__init__.py:267-279): registering a validator does NOT assert;
callers opt in by passing ``enabled_formats(...)`` to ``compile_spec`` /
``RowEvaluator`` / the validation stages.
"""

from __future__ import annotations

import re

_format_validators: dict[str, tuple] = {}


def format_validator(format_attr: str, *, instance_types=("string",)):
    """Register fn(value) -> None (raises ValueError when invalid)."""

    def decorator(f):
        _format_validators[format_attr] = (f, tuple(instance_types))
        return f

    return decorator


def enabled_formats(*attrs: str) -> dict:
    """{attr: (fn, types)} for the given registered formats — the value the
    evaluators accept as their ``formats`` argument."""
    out = {}
    for a in attrs:
        if a not in _format_validators:
            raise ValueError(f"no format validator registered for {a!r}")
        out[a] = _format_validators[a]
    return out


def all_registered() -> dict:
    return dict(_format_validators)


# -- built-ins --------------------------------------------------------------

_JSON_POINTER_RE = re.compile(r"^(/([^~/]|(~[01]))*)*$")


@format_validator("json-pointer")
def validate_json_pointer(value: str) -> None:
    """RFC 6901 syntax (/root/reference/jschon/formats.py:5-9)."""
    if _JSON_POINTER_RE.fullmatch(value) is None:
        raise ValueError(f"'{value}' is not a valid JSON pointer")


@format_validator("regex")
def validate_regex(value: str) -> None:
    try:
        re.compile(value)
    except re.error as e:
        raise ValueError(str(e)) from None


@format_validator("audio-decodable", instance_types=("object",))
def validate_audio_decodable(row) -> None:
    """Clip-level decode check (binds stages/decode.py into the spec
    dialect; per-row fallback path — the vectorized analogue is the
    ClipDecoder actor stage)."""
    from ..stages.decode import audio_decodable_format

    audio_decodable_format()(row)
