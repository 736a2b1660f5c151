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
