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
