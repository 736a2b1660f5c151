"""pivot_agg / grouped_median_lowcard / grouped_string_agg vs pandas and
duckdb oracles on synthetic inputs with adversarial partitioning."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jschon_ray.functions.relational import (grouped_median_lowcard,
                                             grouped_string_agg, pivot_agg)


def _ds(df, blocks=7):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


def test_pivot_counts_and_sums(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 2000),
        "cat": rng.integers(0, 4, 2000),
        "v": np.round(rng.normal(10, 3, 2000), 2),
    })
    out = pivot_agg(
        _ds(df, 9), row_key="g",
        col_codes_batch=lambda t: t["cat"].to_numpy(zero_copy_only=False),
        categories=[0, 1, 2, 3], value_col="v", prefix="k",
    ).to_pandas().sort_values("g").reset_index(drop=True)

    ref = df.pivot_table(index="g", columns="cat", values="v",
                         aggfunc=["count", "sum"], fill_value=0)
    for j in range(4):
        assert (out[f"k{j}_n"].to_numpy()
                == ref["count"][j].to_numpy()).all()
        assert np.allclose(out[f"k{j}_sum"].to_numpy(),
                           ref["sum"][j].to_numpy(), atol=1e-9)


def test_pivot_drops_negative_codes(ray_session):
    df = pd.DataFrame({"g": ["x", "x", "y"], "cat": [0, 9, 1]})
    out = pivot_agg(
        _ds(df, 2), row_key="g",
        col_codes_batch=lambda t: np.where(
            (c := t["cat"].to_numpy(zero_copy_only=False)) < 2, c, -1),
        categories=[0, 1],
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert list(out["c0_n"]) == [1, 0]
    assert list(out["c1_n"]) == [0, 1]


@pytest.mark.parametrize("n", [999, 1000])
def test_grouped_median_matches_duckdb(ray_session, n):
    rng = np.random.default_rng(n)
    df = pd.DataFrame({
        "g": rng.choice(["p", "q", "r"], n),
        "v": rng.integers(1, 51, n).astype(np.int64),
    })
    out = grouped_median_lowcard(_ds(df, 8), key="g", value_col="v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    ref = duckdb.sql(
        "SELECT g, median(v) AS median FROM df GROUP BY g ORDER BY g").df()
    assert list(out["g"]) == list(ref["g"])
    assert np.allclose(out["median"], ref["median"], atol=0)


def test_grouped_string_agg_ordered(ray_session):
    df = pd.DataFrame({
        "g": ["a", "b", "a", "a", "b"],
        "s": ["w3", "x2", "w1", "w2", "x1"],
        "o": [3, 2, 1, 2, 1],
    })
    out = grouped_string_agg(_ds(df, 3), key="g", value_col="s",
                             order_col="o").to_pandas()
    got = dict(zip(out["g"], out["agg"]))
    assert got == {"a": "w1|w2|w3", "b": "x1|x2"}
    assert dict(zip(out["g"], out["n_parts"])) == {"a": 3, "b": 2}


# ---------------------------------------------------------------------------
# grouped mode / distinct count / corr / rollup


def _rng_df(seed=11, n=3000):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], n),
        "v": rng.integers(1, 8, n).astype(float),
        "w": np.round(rng.normal(50, 10, n), 3),
    })


def test_grouped_mode_ties_pick_smallest(ray_session):
    from jschon_ray.functions.relational import grouped_mode_lowcard

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 3,
                       "v": [2.0, 1.0, 2.0, 1.0, 9.0, 9.0, 3.0]})
    out = grouped_mode_lowcard(_ds(df, 3), key="g", value_col="v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert out["mode_value"].tolist() == [1.0, 9.0]  # tie a: min(1,2)=1
    assert out["n_mode"].tolist() == [2, 2]


def test_grouped_mode_vs_pandas(ray_session):
    from jschon_ray.functions.relational import grouped_mode_lowcard

    df = _rng_df()
    out = grouped_mode_lowcard(_ds(df, 8), key="g", value_col="v") \
        .to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        counts = sub["v"].value_counts()
        mx = counts.max()
        expect = counts[counts == mx].index.min()
        assert out.loc[g, "mode_value"] == expect
        assert out.loc[g, "n_mode"] == mx


def test_grouped_distinct_count_exact(ray_session):
    from jschon_ray.functions.relational import grouped_distinct_count

    df = _rng_df(seed=4)
    df.loc[::17, "v"] = np.nan  # nulls must not be counted
    out = grouped_distinct_count(_ds(df, 9), key="g", value_col="v") \
        .to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        assert out.loc[g, "n_distinct"] == sub["v"].dropna().nunique()


def test_grouped_corr_vs_duckdb(ray_session):
    from jschon_ray.functions.relational import grouped_corr

    df = _rng_df(seed=9)
    df["w"] = df["v"] * 3.0 + np.random.default_rng(1).normal(0, 1, len(df))
    out = grouped_corr(_ds(df, 7), key="g", x_col="v", y_col="w") \
        .to_pandas().set_index("g")
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT g, corr(w, v) AS c FROM t GROUP BY g").df().set_index("g")
    for g in exp.index:
        assert abs(out.loc[g, "corr"] - exp.loc[g, "c"]) < 1e-9


def test_grouped_corr_degenerate_null(ray_session):
    from jschon_ray.functions.relational import grouped_corr

    df = pd.DataFrame({"g": ["a", "a", "b"],
                       "v": [1.0, 1.0, 5.0],   # zero variance in a
                       "w": [2.0, 3.0, 4.0]})  # single row in b
    out = grouped_corr(_ds(df, 2), key="g", x_col="v", y_col="w") \
        .to_pandas()
    assert out["corr"].isna().all()


def test_rollup_vs_duckdb(ray_session):
    from jschon_ray.functions.relational import rollup_agg

    df = _rng_df(seed=2)
    out = rollup_agg(_ds(df, 8), keys=["g", "v"], value_col="w")
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT g, v, CAST(count(*) AS BIGINT) AS n, sum(w) AS sum_w "
        "FROM t GROUP BY ROLLUP(g, v)").df()
    def norm(d):
        d = d.copy()
        d.columns = ["g", "v", "n", "sum_w"]
        d["g"] = d["g"].astype(str)
        d["v"] = d["v"].astype(str)
        d["sum_w"] = np.round(d["sum_w"].astype(float), 6)
        return d.sort_values(["g", "v", "n"]).reset_index(drop=True)
    a, b = norm(out), norm(exp)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_names=False)


def test_fd_violations_detects_disagreeing_keys(ray_session):
    from jschon_ray.functions.relational import fd_violations

    df = pd.DataFrame({
        "det": [1, 1, 1, 2, 2, 3, 3],
        "dep": ["a", "a", "b", "c", "c", "d", None]})  # 1 violates; null ignored
    out = fd_violations(_ds(df, 4), determinant=["det"],
                        dependent="dep").to_pandas()
    assert out["det"].tolist() == [1]
    assert out["n_values"].tolist() == [2]


def test_fd_violations_composite_determinant(ray_session):
    from jschon_ray.functions.relational import fd_violations

    df = pd.DataFrame({
        "a": [1, 1, 1, 2], "b": ["x", "x", "y", "x"],
        "dep": [10, 20, 30, 40]})
    out = fd_violations(_ds(df, 2), determinant=["a", "b"],
                        dependent="dep").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["a"] == 1 and out.iloc[0]["b"] == "x"
    assert out.iloc[0]["n_values"] == 2


def test_grouped_zscore_vs_pandas(ray_session):
    from jschon_ray.functions.relational import grouped_zscore

    df = _rng_df(seed=21)
    out = grouped_zscore(_ds(df, 6), key="g", value_col="w",
                         keep_cols=()).to_pandas()
    exp = df.copy()
    exp["z"] = df.groupby("g")["w"].transform(
        lambda s: (s - s.mean()) / s.std(ddof=1))
    merged = out.sort_values(["g", "w"]).reset_index(drop=True)
    expected = exp[["g", "w", "z"]].sort_values(["g", "w"]) \
        .reset_index(drop=True)
    assert np.allclose(merged["z"], expected["z"], atol=1e-9)


def test_grouped_zscore_degenerate_groups(ray_session):
    from jschon_ray.functions.relational import grouped_zscore

    df = pd.DataFrame({"g": ["a", "a", "b", "c"],
                       "w": [5.0, 5.0, 1.0, None]})
    out = grouped_zscore(_ds(df, 2), key="g", value_col="w") \
        .to_pandas()
    # zero-variance group a, single-row b, null value c -> all null z
    assert out["z"].isna().all()


def test_grouped_skew_kurt_vs_duckdb(ray_session):
    import duckdb

    from jschon_ray.functions.relational import grouped_skew_kurt

    df = _rng_df(seed=33)
    df["w"] = df["w"] ** 2  # make the distribution actually skewed
    out = grouped_skew_kurt(_ds(df, 6), key="g", value_col="w") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT g, skewness(w) AS skew, kurtosis(w) AS kurt FROM t "
        "GROUP BY g ORDER BY g").df()
    assert np.allclose(out["skew"], exp["skew"], atol=1e-7)
    assert np.allclose(out["kurt"], exp["kurt"], atol=1e-7)


def test_grouped_skew_kurt_degenerate(ray_session):
    from jschon_ray.functions.relational import grouped_skew_kurt

    df = pd.DataFrame({"g": ["a", "a", "b", "b", "b", "c"],
                       "w": [5.0, 5.0, 1.0, 2.0, 3.0, 7.0]})
    out = grouped_skew_kurt(_ds(df, 2), key="g", value_col="w") \
        .to_pandas().set_index("g")
    assert np.isnan(out.loc["a", "skew"])     # zero variance
    assert np.isnan(out.loc["c", "skew"])     # n < 3
    assert not np.isnan(out.loc["b", "skew"])  # n == 3 has skew...
    assert np.isnan(out.loc["b", "kurt"])      # ...but no kurtosis (n < 4)


def test_equi_width_histogram_exact_and_clamped(ray_session):
    from jschon_ray.functions.relational import equi_width_histogram

    vals = [-50, 0, 99, 100, 199, 250, 999, 1000, 5000, None]
    df = pd.DataFrame({"v": pd.array(vals, dtype="Int64")})
    out = equi_width_histogram(
        _ds(df.astype({"v": "Int64"}), 3), value_col="v",
        lo_e2=0, width_e2=100, n_bins=5).to_pandas() \
        .set_index("bin")["n"].to_dict()
    # -50 clamps into bin 0; 999 -> bin 4 (in range); 1000/5000 clamp to 4
    assert out == {0: 3, 1: 2, 2: 1, 4: 3}


def test_aggregate_consistency_violations(ray_session):
    """Masters with consistent, off-by-more-than-tol, and missing
    detail rows; verdicts in exact cents."""
    import ray.data as rd
    from jschon_ray.functions.relational import (
        aggregate_consistency_violations)

    detail = pa.table({"k": pa.array([1, 1, 2, 3], pa.int64()),
                       "v": pa.array([50.0, 50.25, 10.0, 7.0])})
    master = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                       "total": pa.array([100.25, 10.05, 9.0, 5.0])})
    out = aggregate_consistency_violations(
        rd.from_arrow(detail), rd.from_arrow(master), key="k",
        detail_value_col="v", master_total_col="total",
        rel_tol=0.01).to_pandas().set_index("k")
    # k=1 exact match; k=2 diff 5 cents < tol 10 cents -> consistent;
    # k=3 diff 200 cents > tol 9 -> mismatch; k=4 no detail rows
    assert set(out.index) == {3, 4}
    assert out.loc[3, "reason"] == "total_mismatch"
    assert out.loc[3, "diff_cents"] == 200
    assert out.loc[4, "reason"] == "missing_detail"
    assert out.loc[4, "diff_cents"] == 0


def test_null_value_semantics_match_sql(ray_session):
    """NULL values must follow SQL aggregate semantics: ignored by
    mode/median/percentile/trimmed-mean/corr-like aggregates, skipped by
    SUM cells in pivots — pinned against DuckDB on a null-heavy table."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from jschon_ray.functions.relational import (grouped_median_lowcard,
                                                 grouped_mode_lowcard,
                                                 grouped_spearman,
                                                 pivot_agg)

    t = pa.table({
        "k": pa.array(["a"] * 6 + ["b"] * 4, pa.string()),
        "v": pa.array([1, 1, 2, None, None, None, 5, None, 5, 7],
                      pa.int64()),
        "x": pa.array([1.0, 2.0, None, 4.0, 5.0, 6.0,
                       1.0, 2.0, 3.0, None], pa.float64()),
        "cat": pa.array(["p", "q", "p", "q", "p", "q",
                         "p", "p", "q", "q"], pa.string()),
    })
    con = duckdb.connect()
    con.register("t", t)
    ds = ray.data.from_arrow(t)

    med = grouped_median_lowcard(ds, key="k", value_col="v") \
        .to_pandas().set_index("k")["median"].to_dict()
    sql_med = dict(con.execute(
        "SELECT k, median(v) FROM t GROUP BY 1").fetchall())
    assert med == sql_med, (med, sql_med)

    mode = grouped_mode_lowcard(ds, key="k", value_col="v").to_pandas()
    # group a: values [1,1,2] -> mode 1 (NULLs ignored); group b: 5
    got = dict(zip(mode.k, mode.mode_value))
    assert got == {"a": 1, "b": 5}, got

    def codes(batch):
        c = batch["cat"].to_numpy(zero_copy_only=False)
        return np.where(c == "p", 0, np.where(c == "q", 1, -1))

    piv = pivot_agg(ds, row_key="k", col_codes_batch=codes,
                    categories=["p", "q"], value_col="x").to_pandas()
    sums = con.execute("""
        SELECT k, coalesce(sum(x) FILTER (cat='p'), 0) AS p,
                  coalesce(sum(x) FILTER (cat='q'), 0) AS q
        FROM t GROUP BY 1""").df().set_index("k")
    for _, r in piv.iterrows():
        assert abs(r["cp_sum"] - sums.loc[r["k"], "p"]) < 1e-9
        assert abs(r["cq_sum"] - sums.loc[r["k"], "q"]) < 1e-9

    rho = grouped_spearman(ray.data.from_arrow(pa.table({
        "k": pa.array(["g"] * 4, pa.string()),
        "x": pa.array([1.0, 2.0, None, 4.0], pa.float64()),
        "y": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })), key="k", x_col="x", y_col="y").to_pandas()
    # NULL pair dropped -> perfect rank agreement over the 3 left
    assert int(rho.n.iloc[0]) == 3 and float(rho.rho.iloc[0]) == 1.0
