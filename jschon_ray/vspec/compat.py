"""Spec evolution compatibility: will old-valid data stay valid?

`spec_compat(old_spec, new_spec)` classifies every constraint change as
COMPATIBLE (the new spec is implied by the old — no old-valid row can
become invalid), BREAKING (the new constraint is strictly narrower), or
UNKNOWN (implication not decidable cheaply, e.g. a changed `pattern`).
This is the Avro/Protobuf schema-evolution check recast for validation
contracts: run it before swapping the spec of a 100 TB pipeline, and
only revalidate (incrementally — pipelines/queries.py
q_incremental_validate_orders) when something actually narrowed.

Decidable subset (the same flat-object keyword family the vectorized
evaluator optimizes, vspec/evaluator.py): type, enum, const, bounds
(minimum/maximum/exclusive*), length bounds, required, multipleOf.
Reference seed: jschon treats every spec as an independent static
document (/root/reference/jschon/jsonschema.py:27-125); cross-VERSION
reasoning is a dataset-scale need with no reference analogue.

The guarantee tested property-style in tests/test_spec_compat.py: if the
report has no BREAKING/UNKNOWN rows, every row valid under old is valid
under new (checked empirically via the row oracle on generated data).
"""

from __future__ import annotations

from decimal import Decimal

COMPATIBLE = "compatible"
BREAKING = "breaking"
UNKNOWN = "unknown"

# integer is a subtype of number (2020-12 semantics)
_TYPE_WIDEN = {"integer": {"integer", "number"}}


def _type_set(t):
    if t is None:
        return None
    return set([t] if isinstance(t, str) else t)


def _covers(new_types: set, old_types: set) -> bool:
    """Every value allowed by old_types is allowed by new_types."""
    for t in old_types:
        allowed = {t} | _TYPE_WIDEN.get(t, set())
        if not (allowed & new_types):
            return False
    return True


def _cmp_bound(prop, kw, old, new, changes, *, lower: bool):
    """Numeric bound change: for a lower bound, raising it is breaking;
    for an upper bound, lowering it is breaking. Absent old bound +
    present new bound = narrowing."""
    if old is None and new is None:
        return
    if new is None:                       # bound dropped -> widening
        changes.append((prop, kw, old, new, COMPATIBLE))
        return
    if old is None:
        changes.append((prop, kw, old, new, BREAKING))
        return
    o, n = Decimal(str(old)), Decimal(str(new))
    tightened = n > o if lower else n < o
    changes.append((prop, kw, old, new,
                    BREAKING if tightened else COMPATIBLE))


def _prop_compat(prop, old: dict, new: dict, changes):
    # type
    ot, nt = _type_set(old.get("type")), _type_set(new.get("type"))
    if nt != ot:
        if nt is None:
            changes.append((prop, "type", old.get("type"), None,
                            COMPATIBLE))
        elif ot is None or not _covers(nt, ot):
            changes.append((prop, "type", old.get("type"),
                            new.get("type"), BREAKING))
        else:
            changes.append((prop, "type", old.get("type"),
                            new.get("type"), COMPATIBLE))
    # enum / const (const == 1-element enum)
    oe = old.get("enum", [old["const"]] if "const" in old else None)
    ne = new.get("enum", [new["const"]] if "const" in new else None)
    if oe != ne:
        if ne is None:
            changes.append((prop, "enum", oe, None, COMPATIBLE))
        elif oe is None:
            changes.append((prop, "enum", None, ne, BREAKING))
        else:
            widened = all(any(v == w and type(v) is type(w) for w in ne)
                          for v in oe)
            changes.append((prop, "enum", oe, ne,
                            COMPATIBLE if widened else BREAKING))
    # numeric bounds: effective lower/upper with exclusivity folded in
    for kw, lower in (("minimum", True), ("exclusiveMinimum", True),
                      ("maximum", False), ("exclusiveMaximum", False)):
        if old.get(kw) != new.get(kw):
            _cmp_bound(prop, kw, old.get(kw), new.get(kw), changes,
                       lower=lower)
    # length / item / property count bounds
    for kw, lower in (("minLength", True), ("minItems", True),
                      ("minProperties", True), ("maxLength", False),
                      ("maxItems", False), ("maxProperties", False)):
        if old.get(kw) != new.get(kw):
            _cmp_bound(prop, kw, old.get(kw), new.get(kw), changes,
                       lower=lower)
    # multipleOf: compatible iff new divides old exactly (every multiple
    # of old is a multiple of new)
    om, nm = old.get("multipleOf"), new.get("multipleOf")
    if om != nm:
        if nm is None:
            changes.append((prop, "multipleOf", om, None, COMPATIBLE))
        elif om is None:
            changes.append((prop, "multipleOf", None, nm, BREAKING))
        else:
            ratio = Decimal(str(om)) / Decimal(str(nm))
            ok = ratio == ratio.to_integral_value()
            changes.append((prop, "multipleOf", om, nm,
                            COMPATIBLE if ok else BREAKING))
    # pattern / format: implication undecidable cheaply
    for kw in ("pattern", "format"):
        if old.get(kw) != new.get(kw):
            effect = COMPATIBLE if new.get(kw) is None else UNKNOWN
            changes.append((prop, kw, old.get(kw), new.get(kw), effect))
    # anything else that changed and we don't model
    modeled = {"type", "enum", "const", "minimum", "maximum",
               "exclusiveMinimum", "exclusiveMaximum", "minLength",
               "maxLength", "minItems", "maxItems", "minProperties",
               "maxProperties", "multipleOf", "pattern", "format",
               "default", "title", "description", "examples",
               "deprecated", "readOnly", "writeOnly", "$comment"}
    for kw in (set(old) | set(new)) - modeled:
        if old.get(kw) != new.get(kw):
            effect = COMPATIBLE if kw not in new else UNKNOWN
            changes.append((prop, kw, old.get(kw), new.get(kw), effect))


def spec_compat(old_spec: dict, new_spec: dict):
    """Compare two flat-object specs. Returns (verdict, changes):
    verdict in {'compatible', 'breaking', 'unknown'} (worst effect
    found), changes = list of (property, keyword, old, new, effect).
    A '.' property row covers the object level (required)."""
    changes = []
    oreq = set(old_spec.get("required", []))
    nreq = set(new_spec.get("required", []))
    for r in sorted(nreq - oreq):
        changes.append((".", "required", None, r, BREAKING))
    for r in sorted(oreq - nreq):
        changes.append((".", "required", r, None, COMPATIBLE))

    oprops = old_spec.get("properties", {})
    nprops = new_spec.get("properties", {})
    for prop in sorted(set(oprops) | set(nprops)):
        _prop_compat(prop, oprops.get(prop, {}), nprops.get(prop, {}),
                     changes)

    worst = COMPATIBLE
    for _, _, _, _, effect in changes:
        if effect == BREAKING:
            worst = BREAKING
            break
        if effect == UNKNOWN:
            worst = UNKNOWN
    return worst, changes
