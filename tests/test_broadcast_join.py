"""broadcast_join + composite-key uniqueness."""

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
