"""Column-stats profiles and distribution-drift verdicts.

A profile is one mergeable summary per column: exact counters (count, nulls,
min, max, sum) + sketches (t-digest quantiles, HLL distinct, count-min
frequencies over a fixed probe set, fixed-bin histogram). Profiles are the
"baseline" side of the KS/PSI drift checks the north star mandates
(SURVEY.md §2.9) and the sketch-state blobs checkpointed per partition.
"""

from __future__ import annotations

import json
import pickle
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import (
    CountMinSketch,
    Histogram,
    HyperLogLog,
    TDigest,
    hash_array,
    ks_statistic,
    psi,
)


class ColumnProfile:
    __slots__ = ("name", "kind", "count", "nulls", "vmin", "vmax", "vsum",
                 "tdigest", "hll", "cms", "hist")

    def __init__(self, name: str, kind: str, hist_edges=None):
        self.name = name
        self.kind = kind  # 'numeric' | 'string'
        self.count = 0
        self.nulls = 0
        self.vmin = None
        self.vmax = None
        self.vsum = 0.0
        self.tdigest = TDigest() if kind == "numeric" else None
        self.hll = HyperLogLog()
        self.cms = CountMinSketch()
        self.hist = Histogram(hist_edges) if hist_edges is not None else None

    # -- build -----------------------------------------------------------
    def add_array(self, arr: pa.Array):
        n = len(arr)
        self.count += n
        self.nulls += arr.null_count
        valid = arr.drop_null()
        if len(valid) == 0:
            return self
        if self.kind == "numeric":
            v = valid.cast(pa.float64()).to_numpy(zero_copy_only=False)
            mn, mx = float(np.min(v)), float(np.max(v))
            self.vsum += float(np.sum(v))
            self.tdigest.add_batch(v)
            if self.hist is not None:
                self.hist.add_batch(v)
            h = hash_array(v)
        else:
            lengths = pc.utf8_length(valid).cast(pa.float64()) \
                if pa.types.is_string(valid.type) or \
                pa.types.is_large_string(valid.type) \
                else pc.binary_length(valid).cast(pa.float64())
            lv = lengths.to_numpy(zero_copy_only=False)
            mn, mx = float(np.min(lv)), float(np.max(lv))
            self.vsum += float(np.sum(lv))
            h = hash_array(valid.to_pylist())
        self.vmin = mn if self.vmin is None else min(self.vmin, mn)
        self.vmax = mx if self.vmax is None else max(self.vmax, mx)
        self.hll.add_hashes(h)
        self.cms.add_hashes(h)
        return self

    # -- merge -----------------------------------------------------------
    def merge(self, other: "ColumnProfile") -> "ColumnProfile":
        self.count += other.count
        self.nulls += other.nulls
        self.vsum += other.vsum
        for attr in ("vmin", "vmax"):
            a, b = getattr(self, attr), getattr(other, attr)
            if b is not None:
                merged = b if a is None else (min(a, b) if attr == "vmin"
                                              else max(a, b))
                setattr(self, attr, merged)
        if self.tdigest is not None and other.tdigest is not None:
            self.tdigest.merge(other.tdigest)
        self.hll.merge(other.hll)
        self.cms.merge(other.cms)
        if self.hist is not None and other.hist is not None:
            self.hist.merge(other.hist)
        return self

    # -- read ------------------------------------------------------------
    def stats(self) -> dict:
        out = {
            "column": self.name, "kind": self.kind, "count": self.count,
            "nulls": self.nulls, "min": self.vmin, "max": self.vmax,
            "sum": self.vsum, "distinct_approx": round(self.hll.estimate()),
        }
        if self.tdigest is not None and self.tdigest.count:
            out.update({f"p{int(q * 100):02d}": self.tdigest.quantile(q)
                        for q in (0.01, 0.25, 0.5, 0.75, 0.99)})
        return out

    def to_bytes(self) -> bytes:
        payload = {
            "name": self.name, "kind": self.kind, "count": self.count,
            "nulls": self.nulls, "vmin": self.vmin, "vmax": self.vmax,
            "vsum": self.vsum,
            "tdigest": self.tdigest.to_bytes() if self.tdigest else None,
            "hll": self.hll.to_bytes(),
            "cms": self.cms.to_bytes(),
            "hist": self.hist.to_bytes() if self.hist else None,
        }
        return zlib.compress(pickle.dumps(payload))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ColumnProfile":
        d = pickle.loads(zlib.decompress(blob))
        p = cls(d["name"], d["kind"])
        p.count, p.nulls = d["count"], d["nulls"]
        p.vmin, p.vmax, p.vsum = d["vmin"], d["vmax"], d["vsum"]
        p.tdigest = TDigest.from_bytes(d["tdigest"]) if d["tdigest"] else None
        p.hll = HyperLogLog.from_bytes(d["hll"])
        p.cms = CountMinSketch.from_bytes(d["cms"])
        p.hist = Histogram.from_bytes(d["hist"]) if d["hist"] else None
        return p


class TableProfile:
    def __init__(self, columns: dict | None = None):
        self.columns: dict[str, ColumnProfile] = columns or {}

    @staticmethod
    def column_kind(dtype: pa.DataType) -> str | None:
        if pa.types.is_integer(dtype) or pa.types.is_floating(dtype) \
                or pa.types.is_decimal(dtype):
            return "numeric"
        if pa.types.is_string(dtype) or pa.types.is_large_string(dtype) \
                or pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
            return "string"
        return None

    def add_table(self, t: pa.Table, columns=None, hist_edges=None):
        for name in (columns or t.column_names):
            dtype = t.schema.field(name).type
            kind = self.column_kind(dtype)
            if kind is None:
                continue
            cp = self.columns.get(name)
            if cp is None:
                edges = (hist_edges or {}).get(name)
                cp = self.columns[name] = ColumnProfile(name, kind, edges)
            col = t.column(name)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            cp.add_array(col)
        return self

    def merge(self, other: "TableProfile") -> "TableProfile":
        for name, cp in other.columns.items():
            if name in self.columns:
                self.columns[name].merge(cp)
            else:
                self.columns[name] = cp
        return self

    def stats_table(self) -> pa.Table:
        rows = [cp.stats() for cp in self.columns.values()]
        keys = sorted({k for r in rows for k in r},
                      key=lambda k: (k != "column", k))
        return pa.table({k: [r.get(k) for r in rows] for k in keys})

    def to_bytes(self) -> bytes:
        return zlib.compress(pickle.dumps(
            {n: cp.to_bytes() for n, cp in self.columns.items()}))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TableProfile":
        d = pickle.loads(zlib.decompress(blob))
        return cls({n: ColumnProfile.from_bytes(b) for n, b in d.items()})

    def save(self, path: str):
        with open(path, "wb") as f:
            f.write(self.to_bytes())

    @classmethod
    def load(cls, path: str) -> "TableProfile":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())


# ---------------------------------------------------------------------------
# drift


def drift_report(baseline: TableProfile, current: TableProfile,
                 *, ks_threshold: float = 0.1, psi_threshold: float = 0.2,
                 null_ratio_delta: float = 0.05) -> list[dict]:
    """Compare two profiles column-by-column; one verdict row per column.

    Checks: KS statistic on t-digests (numeric), PSI on shared-bin
    histograms (when both sides carry them), and null-ratio shift.
    Driver-side and tiny — the heavy lifting happened in the mergeable
    sketch build.
    """
    out = []
    for name, b in baseline.columns.items():
        c = current.columns.get(name)
        if c is None:
            out.append({"column": name, "drifted": True,
                        "reason": "column missing in current"})
            continue
        row = {"column": name, "drifted": False, "reason": None}
        if b.tdigest is not None and c.tdigest is not None \
                and b.tdigest.count and c.tdigest.count:
            row["ks"] = ks_statistic(b.tdigest, c.tdigest)
            if row["ks"] > ks_threshold:
                row["drifted"], row["reason"] = True, f"KS {row['ks']:.3f}"
        if b.hist is not None and c.hist is not None \
                and len(b.hist.edges) == len(c.hist.edges) \
                and np.allclose(b.hist.edges, c.hist.edges):
            row["psi"] = psi(b.hist, c.hist)
            if row["psi"] > psi_threshold and not row["drifted"]:
                row["drifted"], row["reason"] = True, f"PSI {row['psi']:.3f}"
        if b.count and c.count:
            bn, cn = b.nulls / b.count, c.nulls / c.count
            row["null_ratio_delta"] = abs(bn - cn)
            if row["null_ratio_delta"] > null_ratio_delta \
                    and not row["drifted"]:
                row["drifted"] = True
                row["reason"] = f"null ratio {bn:.3f}->{cn:.3f}"
        out.append(row)
    return out


def schema_diff(baseline: TableProfile, current: TableProfile, *,
                distinct_ratio: float = 2.0,
                mean_shift_sigmas: float = 3.0) -> list[dict]:
    """Structural schema-evolution diff between two profile versions —
    the dataset-scale analogue of the reference's additionalProperties /
    unevaluatedProperties column-set checks
    (/root/reference/jschon/vocabulary/applicator.py:311-390): columns
    ADDED or REMOVED, column KIND changes, approximate-distinct-count
    blowups/collapses, and mean shifts in robust-sigma units (IQR/1.349
    from the t-digest). Complements `drift_report` (distributional) with
    structure; driver-side and tiny, like all profile finalizers.

    Returns one row per detected change: {column, change, detail}.
    """
    out = []
    for name in sorted(set(baseline.columns) | set(current.columns)):
        b = baseline.columns.get(name)
        c = current.columns.get(name)
        if c is None:
            out.append({"column": name, "change": "removed",
                        "detail": f"kind={b.kind}"})
            continue
        if b is None:
            out.append({"column": name, "change": "added",
                        "detail": f"kind={c.kind}"})
            continue
        if b.kind != c.kind:
            out.append({"column": name, "change": "kind_changed",
                        "detail": f"{b.kind}->{c.kind}"})
            continue
        bd, cd = b.hll.estimate(), c.hll.estimate()
        if bd >= 1 and cd >= 1:
            ratio = max(bd, cd) / max(min(bd, cd), 1.0)
            if ratio > distinct_ratio:
                out.append({
                    "column": name, "change": "distinct_ratio",
                    "detail": f"{round(bd)}->{round(cd)} "
                              f"({ratio:.1f}x)"})
        nb, nc = b.count - b.nulls, c.count - c.nulls
        if b.kind == "numeric" and nb > 1 and nc > 1 \
                and b.tdigest is not None and b.tdigest.count:
            mb, mc = b.vsum / nb, c.vsum / nc
            iqr = b.tdigest.quantile(0.75) - b.tdigest.quantile(0.25)
            sigma = max(iqr / 1.349, 1e-12)
            shift = abs(mc - mb) / sigma
            if shift > mean_shift_sigmas:
                out.append({
                    "column": name, "change": "mean_shift",
                    "detail": f"{mb:.4g}->{mc:.4g} "
                              f"({shift:.1f} sigma)"})
    return out
