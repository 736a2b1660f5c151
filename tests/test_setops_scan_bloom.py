"""Set ops, keyed window scans, NTILE, Bloom filter, shuffle referential.

Oracles: plain python/pandas/duckdb recomputations on small synthetic
inputs; every Ray op is also exercised through an adversarial partitioning
(many small blocks) so partition-invariance is actually tested.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jschon_ray.functions.join import (key_set_op,
                                       referential_violations_shuffle)
from jschon_ray.functions.scan import _ntile_of_rank, global_ntile
from jschon_ray.functions.windows import keyed_window_scan
from jschon_ray.state.sketches import BloomFilter, build_bloom


# ---------------------------------------------------------------------------
# pure parts (no Ray)


@pytest.mark.parametrize("n,k", [(10, 3), (7, 7), (100, 7), (5, 8), (1, 1),
                                 (64, 64), (63, 8)])
def test_ntile_formula_matches_sql(n, k):
    ranks = np.arange(n, dtype=np.int64)
    ours = _ntile_of_rank(ranks, n, k)
    sql = duckdb.sql(
        f"SELECT ntile({k}) OVER (ORDER BY r) AS t "
        f"FROM range({n}) AS x(r) ORDER BY r").df()["t"].to_numpy()
    assert (ours == sql).all()


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(7)
    present = rng.choice(10_000_000, size=20_000, replace=False)
    bf = BloomFilter(num_bits=1 << 19, num_hashes=4).add_batch(present)
    assert bf.contains(present).all()
    absent = present + 10_000_000  # disjoint by construction
    fp = bf.contains(absent).mean()
    assert fp < 0.05, fp
    assert 0 <= bf.fp_rate() < 0.05


def test_bloom_merge_equals_bulk_and_roundtrip():
    a, b = np.arange(0, 500), np.arange(500, 1000)
    one = BloomFilter(num_bits=1 << 12, num_hashes=3).add_batch(
        np.concatenate([a, b]))
    m1 = BloomFilter(num_bits=1 << 12, num_hashes=3).add_batch(a)
    m2 = BloomFilter(num_bits=1 << 12, num_hashes=3).add_batch(b)
    merged = m1.merge(m2)
    assert (merged.words == one.words).all()
    rt = BloomFilter.from_bytes(merged.to_bytes())
    assert (rt.words == one.words).all() and rt.n_added == 1000
    with pytest.raises(ValueError):
        merged.merge(BloomFilter(num_bits=1 << 13, num_hashes=3))


# ---------------------------------------------------------------------------
# Ray ops


def _ds(df: pd.DataFrame, blocks: int = 7):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


def test_key_set_ops(ray_session):
    a = pd.DataFrame({"x": [1, 2, 2, 3, 5, 8, 8, 13]})
    b = pd.DataFrame({"y": [2, 3, 4, 4, 21]})
    got = {op: sorted(key_set_op(_ds(a), _ds(b), on_a="x", on_b="y",
                                 op=op).to_pandas()["key"])
           for op in ("intersect", "except", "union")}
    assert got["intersect"] == [2, 3]
    assert got["except"] == [1, 5, 8, 13]
    assert got["union"] == [1, 2, 3, 4, 5, 8, 13, 21]


def test_key_set_op_string_keys_and_nulls(ray_session):
    a = pd.DataFrame({"x": ["a", "b", None, "c", "b"]})
    b = pd.DataFrame({"y": ["b", "d", None]})
    out = key_set_op(_ds(a, 3), _ds(b, 2), on_a="x", on_b="y",
                     op="except").to_pandas()
    assert sorted(out["key"]) == ["a", "c"]


def test_keyed_window_scan_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "uid": rng.integers(0, 40, n),
        "ts": rng.integers(0, 10_000, n).astype("datetime64[s]"),
        "eid": np.arange(n),
        "v": np.round(rng.normal(50, 20, n), 2),
    })
    out = keyed_window_scan(
        _ds(df, 11), key_col="uid", ts_col="ts", tie_col="eid",
        value_col="v", k=5, num_buckets=8,
        to_int=lambda v: np.round(v * 100).astype(np.int64),
    ).to_pandas().sort_values(["uid", "eid"]).reset_index(drop=True)

    ref = df.sort_values(["uid", "ts", "eid"]).copy()
    cents = np.round(ref["v"].to_numpy() * 100).astype(np.int64)
    ref["cents"] = cents
    g = ref.groupby("uid")["cents"]
    ref["cum"] = g.cumsum()
    ref["roll"] = g.rolling(5, min_periods=1).sum() \
        .reset_index(level=0, drop=True).astype(np.int64)
    ref["rn"] = g.cumcount()
    ref["rolln"] = g.rolling(5, min_periods=1).count() \
        .reset_index(level=0, drop=True).astype(np.int64)
    ref = ref.sort_values(["uid", "eid"]).reset_index(drop=True)

    assert (out["uid"].to_numpy() == ref["uid"].to_numpy()).all()
    assert (out["row_in_key"].to_numpy() == ref["rn"].to_numpy()).all()
    assert (out["cum_value"].to_numpy() == ref["cum"].to_numpy()).all()
    assert (out["roll_sum"].to_numpy() == ref["roll"].to_numpy()).all()
    assert (out["roll_n"].to_numpy() == ref["rolln"].to_numpy()).all()


def test_keyed_window_scan_string_keys(ray_session):
    df = pd.DataFrame({
        "k": ["b", "a", "b", "a", "a", "c"],
        "ts": pd.to_datetime([3, 1, 1, 2, 3, 1], unit="s"),
        "tie": [0, 1, 2, 3, 4, 5],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })
    out = keyed_window_scan(
        _ds(df, 3), key_col="k", ts_col="ts", tie_col="tie",
        value_col="v", k=2, num_buckets=4).to_pandas()
    out = out.sort_values(["k", "tie"]).reset_index(drop=True)
    # a: order (1,1)(2,3)(3,4) -> v 2,4,5; b: (1,2)(3,0) -> v 3,1
    a = out[out["k"] == "a"].sort_values("row_in_key")
    assert list(a["cum_value"]) == [2.0, 6.0, 11.0]
    assert list(a["roll_sum"]) == [2.0, 6.0, 9.0]
    b = out[out["k"] == "b"].sort_values("row_in_key")
    assert list(b["tie"]) == [2, 0]
    assert list(b["cum_value"]) == [3.0, 4.0]


def test_global_ntile_matches_duckdb(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": np.arange(257, dtype=np.int64)})
    out = global_ntile(ray.data.from_pandas(df).repartition(9),
                       id_col="doc_id", k=7, seed=42).to_pandas()
    sql = duckdb.sql(
        "SELECT doc_id, ntile(7) OVER (ORDER BY md5(doc_id::VARCHAR "
        "|| ':42'), doc_id) AS tile FROM range(257) t(doc_id)").df()
    m = out.merge(sql, on="doc_id", suffixes=("", "_sql"))
    assert len(m) == 257
    assert (m["tile"].to_numpy() == m["tile_sql"].to_numpy()).all()
    sizes = out.groupby("tile").size()
    assert sizes.max() - sizes.min() <= 1


def _ref_violations(fact_keys, dim_keys):
    dim = set(dim_keys)
    out = {}
    for k in fact_keys:
        if k not in dim:
            out[k] = out.get(k, 0) + 1
    return out


def test_referential_shuffle_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    fact = pd.DataFrame({"fk": rng.integers(0, 500, 4000)})
    dim = pd.DataFrame({"pk": np.arange(0, 500, 2)})  # evens exist
    out = referential_violations_shuffle(
        _ds(fact, 13), _ds(dim, 5), fact_key="fk", dim_key="pk"
    ).to_pandas()
    ref = _ref_violations(fact["fk"], dim["pk"])
    got = dict(zip(out["fk"], out["n_rows"]))
    assert got == ref


def test_referential_shuffle_with_bloom_prefilter(ray_session):
    rng = np.random.default_rng(4)
    fact = pd.DataFrame({"fk": rng.integers(0, 300, 2500)})
    dim = pd.DataFrame({"pk": np.arange(0, 300, 3)})
    bloom = build_bloom(_ds(dim, 4), "pk", num_bits=1 << 14)
    out = referential_violations_shuffle(
        _ds(fact, 9), _ds(dim, 4), fact_key="fk", dim_key="pk",
        bloom=bloom).to_pandas()
    ref = _ref_violations(fact["fk"], dim["pk"])
    got = dict(zip(out["fk"], out["n_rows"]))
    assert got == ref


def test_build_bloom_distributed_equals_local(ray_session):
    vals = pd.DataFrame({"k": np.arange(5000, dtype=np.int64)})
    dist = build_bloom(_ds(vals, 17), "k", num_bits=1 << 16, num_hashes=3)
    local = BloomFilter(num_bits=1 << 16, num_hashes=3) \
        .add_batch(vals["k"].to_numpy())
    assert (dist.words == local.words).all()
    assert dist.n_added == 5000
