"""Gap-fill densification vs a pandas oracle."""

import numpy as np
import pandas as pd
import ray.data

from jschon_ray.functions.densify import time_gapfill_counts


def test_gapfill_inserts_empty_buckets(ray_session):
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:40",
                         "2024-01-01 03:05",   # hours 1,2 empty for a
                         "2024-01-01 01:00"])  # b only in hour 1
    df = pd.DataFrame({"k": ["a", "a", "a", "b"], "ts": ts})
    out = time_gapfill_counts(ray.data.from_pandas(df).repartition(3),
                              key_col="k", ts_col="ts", unit="hour")
    # grid: 2 keys x 4 hours (00..03)
    assert len(out) == 8
    a = out[out["k"] == "a"].sort_values("window_start")
    assert a["n"].tolist() == [2, 0, 0, 1]
    b = out[out["k"] == "b"].sort_values("window_start")
    assert b["n"].tolist() == [0, 1, 0, 0]


def test_gapfill_with_value_sums_and_nulls(ray_session):
    ts = pd.to_datetime(["2024-02-01 10:00", "2024-02-01 12:30", None])
    df = pd.DataFrame({"k": ["x", "x", "x"], "ts": ts,
                       "v": [1.5, 2.5, 9.0]})
    out = time_gapfill_counts(ray.data.from_pandas(df).repartition(2),
                              key_col="k", ts_col="ts", value_col="v",
                              unit="hour")
    out = out.sort_values("window_start").reset_index(drop=True)
    assert out["n"].tolist() == [1, 0, 1]          # null ts dropped
    assert out["sum_value"].tolist() == [1.5, 0.0, 2.5]


def test_gapfill_empty_input(ray_session):
    df = pd.DataFrame({"k": pd.Series([], dtype="object"),
                       "ts": pd.Series([], dtype="datetime64[us]")})
    out = time_gapfill_counts(ray.data.from_pandas(df),
                              key_col="k", ts_col="ts")
    assert len(out) == 0
    assert list(out.columns) == ["k", "window_start", "n"]
