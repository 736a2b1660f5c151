"""Spec inference: bootstrap a declarative validation spec FROM data.

The reverse of the engine's main direction (and of the reference's
metaschema machinery): one streaming pass over a Dataset profiles every
column — JSON type, nullability, numeric range, string length band,
small-cardinality value sets — and emits a 2020-12-shaped spec dict that
``compile_spec`` accepts verbatim.  The data-engineering bootstrap loop:
infer on a trusted sample, review/tighten, then validate the full table
(and future deliveries) against the inferred contract.

Scale shape: per-block partials are one small JSON blob per block
(column stats only — no row data beyond capped distinct samples), merged
on the driver; nothing is shuffled and payload-sized columns contribute
only null counts + byte-length bands.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def _col_partial(name: str, col, dt: pa.DataType, enum_max: int) -> dict:
    n = len(col)
    nulls = col.null_count
    p = {"n": n, "nulls": nulls}
    if pa.types.is_boolean(dt):
        p["jtype"] = "boolean"
    elif pa.types.is_integer(dt):
        p["jtype"] = "integer"
    elif pa.types.is_floating(dt) or pa.types.is_decimal(dt):
        p["jtype"] = "number"
    elif pa.types.is_string(dt) or pa.types.is_large_string(dt):
        p["jtype"] = "string"
    elif pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
        p["jtype"] = "binary"
    elif pa.types.is_timestamp(dt) or pa.types.is_date(dt):
        p["jtype"] = "timestamp"
    elif pa.types.is_list(dt) or pa.types.is_large_list(dt):
        p["jtype"] = "array"
    elif pa.types.is_struct(dt):
        p["jtype"] = "object"
    else:
        p["jtype"] = None
    if n == nulls:
        return p

    if p["jtype"] in ("integer", "number"):
        mm = pc.min_max(col)
        p["min"] = mm["min"].as_py()
        p["max"] = mm["max"].as_py()
    elif p["jtype"] == "string":
        lens = pc.utf8_length(col)
        mm = pc.min_max(lens)
        p["minlen"] = mm["min"].as_py()
        p["maxlen"] = mm["max"].as_py()
        uniq = pc.drop_null(col).unique()
        if len(uniq) <= enum_max:
            p["values"] = sorted(uniq.to_pylist())
        else:
            p["values"] = None  # cardinality exceeded; poison the enum
    elif p["jtype"] == "binary":
        lens = pc.binary_length(col)
        mm = pc.min_max(lens)
        p["minlen"] = mm["min"].as_py()
        p["maxlen"] = mm["max"].as_py()
    elif p["jtype"] == "timestamp":
        mm = pc.min_max(col)
        p["min"] = str(mm["min"].as_py())
        p["max"] = str(mm["max"].as_py())
    return p


def _merge(a: dict, b: dict, enum_max: int) -> dict:
    out = {"n": a["n"] + b["n"], "nulls": a["nulls"] + b["nulls"],
           "jtype": a["jtype"] if a["jtype"] is not None else b["jtype"]}
    for k, fn in (("min", min), ("max", max), ("minlen", min),
                  ("maxlen", max)):
        va, vb = a.get(k), b.get(k)
        if va is None:
            out[k] = vb
        elif vb is None:
            out[k] = va
        else:
            out[k] = fn(va, vb)
    if "values" in a or "values" in b:
        va, vb = a.get("values"), b.get("values")
        if va is None or vb is None:
            out["values"] = None
        else:
            merged = sorted(set(va) | set(vb))
            out["values"] = merged if len(merged) <= enum_max else None
    return out


def infer_spec(ds, *, spec_id: str = "https://jschon-ray.dev/inferred",
               enum_max: int = 16, widen_numeric: float = 0.0) -> dict:
    """Infer a 2020-12 spec over ``ds``'s columns in one streaming pass.

    Emitted keywords per column: ``type`` (nullable columns skip checks
    on absent cells by construction — the Arrow null convention),
    numeric ``minimum``/``maximum`` (optionally widened by
    ``widen_numeric`` fraction of the observed span so near-boundary
    future rows don't flap), string ``minLength``/``maxLength`` and an
    ``enum`` when observed cardinality stays within ``enum_max``.
    Never-null columns become ``required``.
    """
    def partials(t: pa.Table) -> pa.Table:
        stats = {name: _col_partial(name, t[name], t.schema.field(name).type,
                                    enum_max)
                 for name in t.schema.names}
        return pa.table({"stats": pa.array([json.dumps(stats)])})

    merged: dict = {}
    for b in ds.map_batches(partials, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for blob in b["stats"].to_pylist():
            for name, p in json.loads(blob).items():
                merged[name] = _merge(merged[name], p, enum_max) \
                    if name in merged else p

    props: dict = {}
    required: list = []
    for name, p in merged.items():
        sub: dict = {}
        jt = p.get("jtype")
        if jt in ("integer", "number", "boolean", "string", "array",
                  "object", "timestamp", "binary"):
            # timestamp/binary are the engine's Arrow-native lattice
            # extensions (dialect.ALL_TYPES)
            sub["type"] = jt
        if jt == "timestamp" and p.get("min") is not None:
            sub["minimum"] = p["min"]   # ISO strings; bounds keywords
            sub["maximum"] = p["max"]   # accept them for timestamps
        if jt == "binary" and p.get("minlen") is not None:
            sub["minLength"] = int(p["minlen"])
            sub["maxLength"] = int(p["maxlen"])
        if jt in ("integer", "number") and p.get("min") is not None:
            span = (p["max"] - p["min"]) * widen_numeric
            sub["minimum"] = p["min"] - span
            sub["maximum"] = p["max"] + span
            if jt == "integer":
                sub["minimum"] = int(sub["minimum"])
                sub["maximum"] = int(sub["maximum"])
        if jt == "string":
            if p.get("values"):
                sub["enum"] = p["values"]
            else:
                if p.get("minlen") is not None:
                    sub["minLength"] = int(p["minlen"])
                    sub["maxLength"] = int(p["maxlen"])
        props[name] = sub
        if p["nulls"] == 0 and p["n"] > 0:
            required.append(name)

    return {"$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": spec_id,
            "type": "object",
            "properties": props,
            "required": sorted(required)}
