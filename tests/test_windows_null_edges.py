"""NULL/edge hardening for the windows family (VERDICT r3 item 9):
every public windows.py function runs over an input containing null
keys, null timestamps and null values, and its verdicts are pinned —
against a DuckDB window-function oracle where the semantics are
SQL-expressible, against explicit expectations otherwise.

Conventions pinned here (and documented in the functions):
  * keyed scans (keyed_*) DROP rows whose key or ordering timestamp is
    null — a row with no key belongs to no partition, a row with no
    timestamp has no position in the order;
  * per-row window functions (lag/lead/rank/…) KEEP null-key rows out
    of every partition but still emit their input rows where the
    function contract is row-preserving — matching SQL `PARTITION BY`
    over NULL keys is checked per function below;
  * windowed GROUP BYs (tumbling/hopping) keep SQL GROUP BY semantics:
    a null timestamp groups under a NULL window, a null key under a
    NULL key — exactly what DuckDB's date_trunc GROUP BY does.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import jschon_ray.functions.windows as W

TS = [1, 2, None, 4, 5, None, 7, 8, 2, 3]
KEY = ["a", None, "a", "b", None, "b", "a", "b", "a", "b"]
VAL = [1.0, 2.0, None, 4.0, None, 6.0, 7.0, 8.0, 2.5, 3.5]
TYP = ["x", "y", None, "x", "y", "x", None, "y", "y", "x"]


def _table() -> pa.Table:
    return pa.table({
        "k": pa.array(KEY, pa.string()),
        "ts": pa.array([None if v is None else v * 3_600_000_000
                        for v in TS], pa.timestamp("us")),
        "id": pa.array(list(range(len(TS))), pa.int64()),
        "v": pa.array(VAL, pa.float64()),
        "typ": pa.array(TYP, pa.string()),
    })


@pytest.fixture()
def nulls():
    return _table()


def _duck(t: pa.Table):
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    return con


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


# --- windowed GROUP BYs -------------------------------------------------

def test_tumbling_agg_null_groups_match_duckdb(ray_session, nulls):
    got = W.tumbling_agg(rd.from_arrow(nulls), key_cols=("typ",),
                         ts_col="ts", value_col="v").to_pandas()
    want = _duck(nulls).execute("""
        SELECT typ, date_trunc('hour', ts) AS window_start,
               CAST(count(*) AS BIGINT) AS n, sum(v) AS sum_value,
               avg(v) AS avg_value
        FROM t GROUP BY 1, 2""").df()
    for df in (got, want):
        df["window_start"] = pd.to_datetime(df["window_start"]) \
            .astype("datetime64[ns]")
    got = _sorted(got, ["typ", "window_start"])
    want = _sorted(want, ["typ", "window_start"])
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)


def test_hopping_agg_null_ts_single_null_window(ray_session, nulls):
    got = W.hopping_agg(rd.from_arrow(nulls), key_cols=("typ",),
                        ts_col="ts", value_col="v").to_pandas()
    # every non-null ts lands in exactly window_minutes/hop_minutes
    # windows; null ts rows collapse into ONE null window per key
    nullw = got[got["window_start"].isna()]
    assert set(nullw["typ"].fillna("∅")) <= {"x", "y", "∅"}
    n_null_rows = sum(1 for t_, k_ in zip(TS, TYP) if t_ is None)
    assert int(nullw["n"].sum()) == n_null_rows


# --- sessions / streaks / transitions ----------------------------------

def test_session_counts_drops_null_key_and_ts(ray_session, nulls):
    got = W.session_counts(rd.from_arrow(nulls), key_col="k",
                           ts_col="ts", tie_col="id",
                           gap_minutes=90).to_pandas()
    want = _duck(nulls).execute("""
        WITH e AS (
          SELECT k, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY k ORDER BY ts)
                      > INTERVAL 90 MINUTE OR
                      lag(ts) OVER (PARTITION BY k ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS new_s
          FROM t WHERE k IS NOT NULL AND ts IS NOT NULL)
        SELECT k, CAST(sum(new_s) AS BIGINT) AS n_sessions
        FROM e GROUP BY k""").df()
    got = _sorted(got[["k", "n_sessions"]], ["k"])
    pd.testing.assert_frame_equal(got, _sorted(want, ["k"]),
                                  check_dtype=False)


def test_session_stats_null_rows_never_open_sessions(ray_session, nulls):
    got = W.session_stats(rd.from_arrow(nulls), key_col="k",
                          ts_col="ts", tie_col="id",
                          gap_minutes=90).to_pandas()
    assert not got["k"].isna().any()
    # total events across sessions == rows with key AND ts present
    present = sum(1 for k_, t_ in zip(KEY, TS)
                  if k_ is not None and t_ is not None)
    assert int(got["n_events"].sum()) == present


def test_keyed_streaks_null_rows_dropped(ray_session, nulls):
    got = W.keyed_streaks(rd.from_arrow(nulls), key_col="k",
                          ts_col="ts", unit_s=3600).to_pandas()
    assert set(got["k"]) == {"a", "b"}
    # key a: non-null (k,ts) units = 1,7,2 -> islands {1,2},{7}
    a = got[got.k == "a"].iloc[0]
    assert a["max_streak"] == 2 and a["n_streaks"] == 2


def test_keyed_transition_counts_nulls_dropped(ray_session, nulls):
    """Null key / null ts rows never order; transitions touching a null
    STATE are excluded too (a null state is a gap, not a state)."""
    out = W.keyed_transition_counts(
        rd.from_arrow(nulls), key_col="k", ts_col="ts", tie_col="id",
        type_col="typ")
    got = out.to_pandas() if hasattr(out, "to_pandas") else out
    want = _duck(nulls).execute("""
        WITH e AS (
          SELECT k, typ AS cur_type,
                 lead(typ) OVER (PARTITION BY k ORDER BY ts, id)
                     AS next_type
          FROM t WHERE k IS NOT NULL AND ts IS NOT NULL)
        SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM e WHERE cur_type IS NOT NULL AND next_type IS NOT NULL
        GROUP BY 1, 2""").df()
    g = _sorted(got[["cur_type", "next_type", "n"]],
                ["cur_type", "next_type"])
    pd.testing.assert_frame_equal(
        g, _sorted(want, ["cur_type", "next_type"]), check_dtype=False)


# --- per-row ordered scans ---------------------------------------------

def _delta_oracle(nulls, fn):
    return _duck(nulls).execute(f"""
        SELECT id, v - {fn}(v) OVER (PARTITION BY k ORDER BY ts, id)
                   AS delta
        FROM t WHERE k IS NOT NULL AND ts IS NOT NULL""").df()


def test_keyed_lag_matches_duckdb_on_null_laden_input(ray_session, nulls):
    got = W.keyed_lag(rd.from_arrow(nulls), key_col="k", ts_col="ts",
                      tie_col="id", value_col="v").to_pandas()
    want = _delta_oracle(nulls, "lag")
    assert len(got) == len(want)          # null key/ts rows excluded
    merged = _sorted(got, ["id"]).merge(_sorted(want, ["id"]), on="id")
    assert np.allclose(merged["value_delta"].fillna(-9e9),
                       merged["delta"].fillna(-9e9))


def test_keyed_lead_matches_duckdb_on_null_laden_input(ray_session,
                                                       nulls):
    got = W.keyed_lead(rd.from_arrow(nulls), key_col="k", ts_col="ts",
                       tie_col="id", value_col="v").to_pandas()
    want = _duck(nulls).execute("""
        SELECT id, lead(v) OVER (PARTITION BY k ORDER BY ts, id) - v
                   AS delta
        FROM t WHERE k IS NOT NULL AND ts IS NOT NULL""").df()
    assert len(got) == len(want)
    merged = _sorted(got, ["id"]).merge(_sorted(want, ["id"]), on="id")
    delta_col = [c for c in got.columns
                 if "delta" in c or "next" in c][0]
    assert np.allclose(merged[delta_col].fillna(-9e9),
                       merged["delta"].fillna(-9e9))


def test_keyed_percent_rank_and_cume_dist_null_values(ray_session,
                                                      nulls):
    pr = W.keyed_percent_rank(rd.from_arrow(nulls), key_col="k",
                              value_col="v", tie_col="id").to_pandas()
    cd = W.keyed_cume_dist(rd.from_arrow(nulls), key_col="k",
                           value_col="v", tie_col="id").to_pandas()
    assert not pr["k"].isna().any() and not cd["k"].isna().any()
    # null VALUES stay (ordered last, duckdb NULLS LAST); pct bounded
    pct = [c for c in pr.columns if c in ("pct", "percent_rank")][0]
    cdc = [c for c in cd.columns if "cume" in c or c == "cd"][0]
    for df, col in ((pr, pct), (cd, cdc)):
        vals = df[col].dropna()
        assert ((vals >= 0) & (vals <= 1)).all()
    # duckdb parity for percent_rank over a null-laden value column
    want = _duck(nulls).execute("""
        SELECT id, percent_rank() OVER (PARTITION BY k ORDER BY v, id)
                   AS pr FROM t WHERE k IS NOT NULL""").df()
    merged = _sorted(pr, ["id"]).merge(_sorted(want, ["id"]), on="id")
    assert np.allclose(merged[pct], merged["pr"])


def test_keyed_window_scan_running_sums_ignore_null_values(ray_session,
                                                           nulls):
    got = W.keyed_window_scan(rd.from_arrow(nulls), key_col="k",
                              ts_col="ts", tie_col="id",
                              value_col="v").to_pandas()
    want = _duck(nulls).execute("""
        SELECT id, sum(v) OVER (PARTITION BY k ORDER BY ts, id
            ROWS UNBOUNDED PRECEDING) AS run
        FROM t WHERE k IS NOT NULL AND ts IS NOT NULL""").df()
    run_col = [c for c in got.columns if "cum" in c or "run" in c][0]
    merged = _sorted(got, ["id"]).merge(_sorted(want, ["id"]), on="id")
    assert np.allclose(merged[run_col].fillna(-9e9).astype(float),
                       merged["run"].fillna(-9e9).astype(float))


def test_keyed_rolling_and_median_null_values_na_like_sql(ray_session,
                                                          nulls):
    rl = W.keyed_rolling_stats(rd.from_arrow(nulls), key_col="k",
                               ts_col="ts", tie_col="id",
                               value_col="v", k=2).to_pandas()
    md = W.keyed_moving_median(rd.from_arrow(nulls), key_col="k",
                               ts_col="ts", tie_col="id",
                               value_col="v", k=2).to_pandas()
    assert not rl["k"].isna().any() and not md["k"].isna().any()
    assert len(rl) == len(md) == sum(
        1 for k_, t_ in zip(KEY, TS)
        if k_ is not None and t_ is not None)


def test_keyed_ewma_null_values_propagate_not_crash(ray_session, nulls):
    out = W.keyed_ewma(rd.from_arrow(nulls), key_col="k", ts_col="ts",
                       tie_col="id", value_col="v",
                       alpha=0.5).to_pandas()
    assert not out["k"].isna().any()
    # ewma over key a's present values (ordered 1.0, 2.5, 7.0)
    a = out[out.k == "a"].sort_values("id")
    ew = a[[c for c in a.columns if "ewma" in c][0]].to_numpy()
    assert abs(ew[0] - 1.0) < 1e-9


def test_keyed_throttle_latest_distinct_runs_null_safe(ray_session,
                                                       nulls):
    th = W.keyed_throttle(rd.from_arrow(nulls), key_col="k",
                          ts_col="ts", tie_col="id",
                          min_gap_us=2 * 3_600_000_000).to_pandas()
    la = W.keyed_latest(rd.from_arrow(nulls), key_cols=["k"],
                        ts_col="ts", tie_col="id").to_pandas()
    dr = W.keyed_distinct_runs(rd.from_arrow(nulls), key_col="k",
                               ts_col="ts", tie_col="id",
                               run_col="typ").to_pandas()
    for df in (th, la, dr):
        assert not df["k"].isna().any()
    # latest: one row per non-null key, the max non-null ts row
    want = _duck(nulls).execute("""
        SELECT k, max(ts) AS ts FROM t
        WHERE k IS NOT NULL AND ts IS NOT NULL GROUP BY k""").df()
    la2 = _sorted(la[["k", "ts"]], ["k"])
    la2["ts"] = pd.to_datetime(la2["ts"])
    pd.testing.assert_frame_equal(la2, _sorted(want, ["k"]),
                                  check_dtype=False)


def test_keyed_interval_coverage_null_bounds_dropped(ray_session):
    t = pa.table({
        "k": pa.array(["a", "a", None, "b", "b"], pa.string()),
        "lo": pa.array([0, 5, 1, None, 3], pa.int64()),
        "hi": pa.array([4, 9, 7, 12, None], pa.int64()),
    })
    out = W.keyed_interval_coverage(rd.from_arrow(t), key_col="k",
                                    lo_col="lo",
                                    hi_col="hi").to_pandas()
    # null key and null-bounded intervals contribute nothing
    a = out[out.k == "a"].iloc[0]
    cov = [c for c in out.columns if "cover" in c or "total" in c][0]
    assert a[cov] == 8        # [0,4) + [5,9) merged coverage
    assert "b" not in set(out[out[cov] > 0].k) or \
        out[out.k == "b"][cov].iloc[0] == 0


# --- funnels / retention / bigrams -------------------------------------

def test_funnel_conversion_null_rows_never_count(ray_session, nulls):
    out = W.funnel_conversion(rd.from_arrow(nulls), user_col="k",
                              ts_col="ts", type_col="typ", step_a="x",
                              step_b="y",
                              within=10 * 3_600_000_000).to_pandas()
    assert not out.iloc[:, 0].isna().any()


def test_retention_cohorts_and_matrix_agree_on_null_laden(ray_session,
                                                          nulls):
    def P(x):
        return x.to_pandas() if hasattr(x, "to_pandas") else x

    rc = P(W.retention_cohorts(rd.from_arrow(nulls), user_col="k",
                               ts_col="ts", unit="hour"))
    cm = P(W.cohort_retention_matrix(rd.from_arrow(nulls), key_col="k",
                                     ts_col="ts", unit_s=3600))
    # both drop null keys/timestamps; total cohort-0 membership = #keys
    assert int(rc[rc["offset"] == 0]["n_users"].sum()) == 2
    assert int(cm[cm["unit_offset"] == 0]["n_keys"].sum()) == 2
    # identical (offset -> total keys) histograms
    a = rc.groupby("offset")["n_users"].sum()
    b = cm.groupby("unit_offset")["n_keys"].sum()
    assert dict(a) == dict(b)


def test_event_bigrams_null_type_rows_excluded(ray_session, nulls):
    out = W.event_bigrams(rd.from_arrow(nulls), user_col="k",
                          ts_col="ts", tie_col="id",
                          type_col="typ").to_pandas()
    first_two = out.columns[:2]
    for c in first_two:
        assert not out[c].isna().any()


def test_all_public_functions_run_on_all_null_keys(ray_session):
    """Degenerate input: EVERY key null -> keyed scans emit typed
    empties (or null-group rows for the GROUP BY family), never raise."""
    t = pa.table({
        "k": pa.array([None, None, None], pa.string()),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us")),
        "id": pa.array([0, 1, 2], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "typ": pa.array(["x", "y", "x"], pa.string()),
    })

    def T():
        return rd.from_arrow(t)

    outs = [
        W.keyed_streaks(T(), key_col="k", ts_col="ts"),
        W.keyed_transition_counts(T(), key_col="k", ts_col="ts",
                                  tie_col="id", type_col="typ"),
        W.keyed_ewma(T(), key_col="k", ts_col="ts", tie_col="id",
                     value_col="v", alpha=0.3),
        W.keyed_lag(T(), key_col="k", ts_col="ts", tie_col="id",
                    value_col="v"),
        W.session_counts(T(), key_col="k", ts_col="ts", tie_col="id"),
        W.cohort_retention_matrix(T(), key_col="k", ts_col="ts"),
        W.retention_cohorts(T(), user_col="k", ts_col="ts"),
        W.funnel_conversion(T(), user_col="k", ts_col="ts",
                            type_col="typ", step_a="x", step_b="y",
                            within=10_000_000),
    ]
    for out in outs:
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        if len(df) and "k" in df.columns:
            assert not df["k"].notna().any()
