"""Exact distributed quantiles vs a sort-based oracle and DuckDB."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from jschon_ray.functions.quantiles import exact_quantiles


def disc_oracle(values, q):
    v = np.sort(np.asarray(values, dtype=np.float64))
    v = v[~np.isnan(v)]
    k = max(1, math.ceil(q * len(v)))
    return float(v[k - 1])


def run(values, qs, **kw):
    df = pd.DataFrame({"x": pd.Series(values, dtype="float64")})
    ds = ray.data.from_pandas(df).repartition(6)
    out = exact_quantiles(ds, "x", qs, **kw)
    return dict(zip(out["q"], out["value"]))


def test_small_bins_force_refinement_rounds(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 25.0, size=20000)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = run(vals, qs, bins=8, gather_limit=16, reduce_parallelism=3)
    for q in qs:
        assert got[q] == disc_oracle(vals, q), q


def test_duplicate_heavy_collapses_interval(ray_session):
    rng = np.random.default_rng(3)
    # 50k rows over 5 distinct values; gather_limit far below dup count
    vals = rng.choice([1.5, 2.5, 2.5, 7.0, 9.0], size=50000)
    got = run(vals, [0.1, 0.5, 0.9], bins=4, gather_limit=8)
    for q in [0.1, 0.5, 0.9]:
        assert got[q] == disc_oracle(vals, q), q


def test_nulls_ignored_and_all_null(ray_session):
    vals = [1.0, None, 3.0, None, 2.0]
    got = run(vals, [0.5])
    assert got[0.5] == 2.0
    got = run([None, None], [0.5])
    assert np.isnan(got[0.5])


def test_single_value_column(ray_session):
    got = run([4.2] * 1000, [0.0, 0.5, 1.0], bins=4, gather_limit=8)
    assert set(got.values()) == {4.2}


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_vs_numpy(ray_session, seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate([
        rng.uniform(-1e6, 1e6, size=5000),
        rng.choice([0.0, 1e-9, -17.5], size=2000),  # dup clumps
    ])
    qs = sorted(rng.uniform(0, 1, size=5).tolist())
    got = run(vals, qs, bins=32, gather_limit=64)
    for q in qs:
        assert got[q] == disc_oracle(vals, q), q


def test_matches_duckdb_lineitem(ray_session):
    path = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(path, columns=["l_extendedprice"])
    qs = [0.01, 0.5, 0.99]
    out = exact_quantiles(ds, "l_extendedprice", qs, bins=64,
                          gather_limit=128)
    con = duckdb.connect()
    for q, v in zip(out["q"], out["value"]):
        exp = con.execute(
            f"SELECT CAST(quantile_disc(l_extendedprice, {q}) AS DOUBLE) "
            f"FROM '{path}'").fetchone()[0]
        assert v == exp, q


# ---------------------------------------------------------------------------
# grouped exact quantiles (general domain)


def test_grouped_quantile_vs_duckdb(ray_session):
    from jschon_ray.functions.quantiles import grouped_quantile_disc

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 30000),
        "v": rng.normal(100, 40, 30000)})
    ds = ray.data.from_pandas(df).repartition(7)
    out = grouped_quantile_disc(ds, "g", "v", 0.9, bins=16,
                                gather_limit=32).set_index("g")
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("SELECT g, quantile_disc(v, 0.9) AS e FROM t "
                      "GROUP BY g").df().set_index("g")
    for g in exp.index:
        assert out.loc[g, "value"] == exp.loc[g, "e"], g


def test_grouped_quantile_duplicates_and_nulls(ray_session):
    from jschon_ray.functions.quantiles import grouped_quantile_disc

    df = pd.DataFrame({
        "g": ["a"] * 10000 + ["b"] * 3,
        "v": [7.5] * 10000 + [1.0, None, 3.0]})
    ds = ray.data.from_pandas(df).repartition(4)
    out = grouped_quantile_disc(ds, "g", "v", 0.5, bins=8,
                                gather_limit=16).set_index("g")
    assert out.loc["a", "value"] == 7.5     # collapse path
    assert out.loc["b", "value"] == 1.0     # n=2, rank=1
