"""hopping_agg + exact_distinct_counts vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from jschon_ray.functions.dedup import exact_distinct_counts
from jschon_ray.functions.windows import hopping_agg


def test_hopping_agg_matches_bruteforce(ray_session):
    rng = np.random.default_rng(13)
    n = 600
    ts = (np.datetime64("2024-03-01", "us")
          + rng.integers(0, 6 * 3_600_000_000, n).astype("timedelta64[us]"))
    df = pd.DataFrame({"k": rng.choice(["a", "b"], n), "ts": ts,
                       "v": np.round(rng.uniform(0, 10, n), 2)})

    got = hopping_agg(rd.from_pandas(df).repartition(5),
                      key_cols=("k",), ts_col="ts", value_col="v",
                      width_minutes=60, stride_minutes=20).to_pandas()

    stride = np.int64(20 * 60_000_000)
    rows = []
    for j in range(3):                     # width/stride = 3 windows/row
        g = df.copy()
        k = df["ts"].astype("datetime64[us]").astype(np.int64) // stride
        g["window_start"] = ((k - j) * stride).astype("datetime64[us]")
        rows.append(g)
    exp = pd.concat(rows).groupby(["k", "window_start"]).agg(
        n=("v", "size"), sum_value=("v", "sum")).reset_index()

    key = ["k", "window_start"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["n"].tolist() == exp["n"].tolist()
    assert np.allclose(got["sum_value"], exp["sum_value"])
    # every row lands in exactly width/stride windows
    assert got["n"].sum() == 3 * n


def test_hopping_rejects_nonmultiple(ray_session):
    with pytest.raises(ValueError):
        hopping_agg(rd.from_items([{"k": 1}]), width_minutes=50,
                    stride_minutes=20)


def test_exact_distinct_counts(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.integers(0, 37, 500),
        "c": [None if i % 7 == 0 else f"s{i % 11}" for i in range(500)],
    })
    got = exact_distinct_counts(rd.from_pandas(df).repartition(6),
                                ["a", "b", "c"]).to_pandas()
    got = dict(zip(got["col"], got["n_distinct"]))
    assert got == {"a": df["a"].nunique(), "b": df["b"].nunique(),
                   "c": df["c"].nunique()}   # pandas nunique drops nulls too


# ---------------------------------------------------------------------------
# funnel conversion (per-user ordered A -> B within window)


def _funnel_df():
    rows = [
        # u1: click 10:00 -> purchase 10:30 (within 1h) => converted
        ("u1", "2024-01-01 10:00", "click"),
        ("u1", "2024-01-01 10:30", "purchase"),
        # u2: purchase BEFORE click only => not converted
        ("u2", "2024-01-01 09:00", "purchase"),
        ("u2", "2024-01-01 10:00", "click"),
        # u3: click -> purchase after 2h => pair exists, outside window
        ("u3", "2024-01-01 08:00", "click"),
        ("u3", "2024-01-01 10:00", "purchase"),
        # u4: same-timestamp click & purchase => gap 0, converted
        ("u4", "2024-01-01 12:00", "click"),
        ("u4", "2024-01-01 12:00", "purchase"),
        # u5: only other event types => excluded entirely
        ("u5", "2024-01-01 13:00", "view"),
    ]
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows]),
        "event_type": [r[2] for r in rows]})


def test_funnel_hand_cases(ray_session):
    import ray.data

    from jschon_ray.functions.windows import funnel_conversion

    ds = ray.data.from_pandas(_funnel_df()).repartition(3)
    out = funnel_conversion(ds, user_col="user_id", ts_col="ts",
                            type_col="event_type", step_a="click",
                            step_b="purchase", within="1h") \
        .to_pandas().set_index("user_id")
    assert set(out.index) == {"u1", "u2", "u3", "u4"}
    assert bool(out.loc["u1", "converted"]) is True
    assert out.loc["u1", "min_gap_us"] == 30 * 60 * 1_000_000
    assert bool(out.loc["u2", "converted"]) is False
    assert pd.isna(out.loc["u2", "min_gap_us"])
    assert bool(out.loc["u3", "converted"]) is False
    assert out.loc["u3", "min_gap_us"] == 2 * 3600 * 1_000_000
    assert bool(out.loc["u4", "converted"]) is True
    assert out.loc["u4", "min_gap_us"] == 0


def test_funnel_fuzz_vs_bruteforce(ray_session):
    import ray.data

    from jschon_ray.functions.windows import funnel_conversion

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame({
        "user_id": [f"u{int(i)}" for i in rng.integers(0, 40, n)],
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "event_type": rng.choice(["click", "purchase", "view"], n)})
    out = funnel_conversion(
        ray.data.from_pandas(df).repartition(7), user_col="user_id",
        ts_col="ts", type_col="event_type", step_a="click",
        step_b="purchase", within="30min").to_pandas() \
        .set_index("user_id")

    within_us = 30 * 60 * 1_000_000
    sub = df[df["event_type"].isin(["click", "purchase"])]
    for u, g in sub.groupby("user_id"):
        a = g.loc[g["event_type"] == "click", "ts"].to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        b = g.loc[g["event_type"] == "purchase", "ts"].to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        gaps = [(tb - ta) for ta in a for tb in b if tb >= ta]
        assert out.loc[u, "n_a"] == len(a)
        assert out.loc[u, "n_b"] == len(b)
        if gaps:
            assert out.loc[u, "min_gap_us"] == min(gaps)
            assert bool(out.loc[u, "converted"]) == (min(gaps) <= within_us)
        else:
            assert pd.isna(out.loc[u, "min_gap_us"])
            assert bool(out.loc[u, "converted"]) is False


def test_retention_cohorts_hand_case(ray_session):
    import ray.data

    from jschon_ray.functions.windows import retention_cohorts

    df = pd.DataFrame({
        "user_id": ["a", "a", "a", "b", "b", "c"],
        "ts": pd.to_datetime([
            "2024-01-01 10:00",  # a cohort W0 (Mon Jan 1)
            "2024-01-03 11:00",  # a same week
            "2024-01-17 09:00",  # a week offset 2
            "2024-01-08 08:00",  # b cohort W1
            "2024-01-15 08:00",  # b offset 1
            "2024-01-02 12:00",  # c cohort W0, never returns
        ])})
    out = retention_cohorts(ray.data.from_pandas(df).repartition(3),
                            user_col="user_id", ts_col="ts") \
        .to_pandas()
    got = {(str(r["cohort"])[:10], int(r["offset"])): int(r["n_users"])
           for _, r in out.iterrows()}
    assert got == {
        ("2024-01-01", 0): 2,   # a + c
        ("2024-01-01", 2): 1,   # a returns in week 2
        ("2024-01-08", 0): 1,   # b
        ("2024-01-08", 1): 1,   # b returns
    }


def test_event_bigrams_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from jschon_ray.functions.windows import event_bigrams

    rng = np.random.default_rng(23)
    n = 3000
    df = pd.DataFrame({
        "user_id": [f"u{int(i)}" for i in rng.integers(0, 30, n)],
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 50000, n), unit="s"),
        "event_id": np.arange(n),
        "event_type": rng.choice(["a", "b", "c"], n)})
    out = event_bigrams(ray.data.from_pandas(df).repartition(6),
                        user_col="user_id", ts_col="ts",
                        tie_col="event_id", type_col="event_type") \
        .to_pandas().sort_values(["prev", "next"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        WITH o AS (SELECT event_type,
                          lag(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
                   FROM t)
        SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
        FROM o WHERE prev IS NOT NULL GROUP BY prev, next
        ORDER BY prev, next""").df()
    assert (out["prev"].to_numpy() == exp["prev"].to_numpy()).all()
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_keyed_moving_median_vs_pandas(ray_session):
    """Moving median equals pandas rolling(min_periods=1).median per
    key, for k=3 over shuffled multi-key input."""
    import ray.data as rd
    from jschon_ray.functions.windows import keyed_moving_median

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.normal(0, 10, n), 2)})
    out = keyed_moving_median(
        rd.from_pandas(df), key_col="user_id", ts_col="ts",
        tie_col="event_id", value_col="value", k=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    exp["med"] = exp.groupby("user_id")["value"].transform(
        lambda s: s.rolling(3, min_periods=1).median())
    exp = exp.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(out["med"], np.round(exp["med"], 4))
