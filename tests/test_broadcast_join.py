"""broadcast_join + composite-key uniqueness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from jschon_ray.functions.join import broadcast_join
from jschon_ray.pipelines.validate import uniqueness_violations


def test_broadcast_join_inner_and_left(ray_session):
    fact = pd.DataFrame({"k": ["a", "b", "c", "a", "x"],
                         "v": [1, 2, 3, 4, 5]})
    dim = pa.table({"k": ["a", "b", "c"], "label": ["A", "B", "C"]})

    inner = broadcast_join(rd.from_pandas(fact).repartition(3), dim,
                           on="k").to_pandas().sort_values("v")
    assert inner["v"].tolist() == [1, 2, 3, 4]
    assert inner["label"].tolist() == ["A", "B", "C", "A"]

    left = broadcast_join(rd.from_pandas(fact).repartition(2), dim,
                          on="k", how="left").to_pandas().sort_values("v")
    assert left["v"].tolist() == [1, 2, 3, 4, 5]
    assert left["label"].fillna("-").tolist() == ["A", "B", "C", "A", "-"]


def test_broadcast_join_rejects_dup_dim_keys(ray_session):
    dim = pa.table({"k": ["a", "a"], "label": ["A", "A2"]})
    with pytest.raises(ValueError):
        broadcast_join(rd.from_items([{"k": "a"}]), dim, on="k")


def test_uniqueness_composite_key(ray_session):
    df = pd.DataFrame({"a": [1, 1, 1, 2, 2], "b": ["x", "x", "y", "x", "x"],
                       "v": range(5)})
    out = uniqueness_violations(rd.from_pandas(df).repartition(3),
                                ["a", "b"]).to_pandas()
    got = sorted(zip(out["a"], out["b"], out["n_rows"]))
    assert got == [(1, "x", 2), (2, "x", 2)]


class TestHashJoinFullOuter:
    def test_orphans_both_sides(self, ray_session):
        import duckdb
        import ray.data
        from jschon_ray.functions.join import hash_join
        lt = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
        rt = pd.DataFrame({"k": [2, 3, 4, 5], "b": ["x", "y", "z",
                                                    "w"]})
        got = hash_join(
            ray.data.from_arrow(pa.Table.from_pandas(lt)),
            ray.data.from_arrow(pa.Table.from_pandas(rt)),
            on="k", how="full").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        want = duckdb.sql("""
            SELECT COALESCE(l.k, r.k) AS k, a, b
            FROM lt l FULL JOIN rt r ON l.k = r.k
            ORDER BY k""").df()
        assert got["k"].tolist() == want["k"].tolist()
        ga = got["a"].to_numpy(dtype="float64", na_value=np.nan)
        wa = want["a"].to_numpy(dtype="float64", na_value=np.nan)
        assert np.array_equal(ga, wa, equal_nan=True)
        assert got["b"].fillna("<N>").tolist() == \
            want["b"].fillna("<N>").tolist()


class TestSaltedJoinFullRejected:
    def test_full_outer_raises(self, ray_session):
        from jschon_ray.functions.join import salted_hash_join
        ds = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                     "a": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError, match="full"):
            salted_hash_join(ds, ds, on="k", hot_keys=[1], how="full")
