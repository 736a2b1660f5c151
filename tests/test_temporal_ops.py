"""asof_join / range_join_broadcast / top_k_per_group vs pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from jschon_ray.functions.temporal import (
    asof_join,
    range_join_broadcast,
    top_k_per_group,
)


def _mk_events(seed=7, n=400, keys=9):
    rng = np.random.default_rng(seed)
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 3_600_000_000, n).astype("timedelta64[us]"))
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "ts": ts,
        "uid": rng.integers(0, keys, n).astype(np.int64),
        "val": np.round(rng.uniform(0, 100, n), 2),
    })


def _pandas_asof(left, right, *, direction, tolerance=None):
    out = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values(["ts", "rid"], kind="stable"),
        on="ts", by="uid", direction=direction, tolerance=tolerance,
        suffixes=("", "_r"))
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(ray_session, direction):
    df = _mk_events()
    left = df[df["eid"] % 3 == 0][["eid", "ts", "uid"]].reset_index(drop=True)
    right = df[df["eid"] % 3 != 0].rename(columns={"eid": "rid"})[
        ["rid", "ts", "uid", "val"]].reset_index(drop=True)

    got = asof_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(4),
        on="ts", by="uid", direction=direction, right_tie="rid",
    ).to_pandas()

    exp = _pandas_asof(left, right, direction=direction)
    # align: pandas keeps the left ts; ours reports the RIGHT ts as ts_r
    got = got.sort_values("eid").reset_index(drop=True)
    exp = exp.sort_values("eid").reset_index(drop=True)
    assert len(got) == len(left)
    assert got["eid"].tolist() == exp["eid"].tolist()
    assert got["rid"].astype("float").where(got["rid"].notna()).equals(
        exp["rid"].astype("float").where(exp["rid"].notna())) or \
        np.allclose(got["rid"].fillna(-1).astype(float),
                    exp["rid"].fillna(-1).astype(float))
    assert np.allclose(got["val"].fillna(-1).astype(float),
                       exp["val"].fillna(-1).astype(float))


def test_asof_join_tolerance_and_inner(ray_session):
    df = _mk_events(seed=3)
    left = df[df["eid"] % 2 == 0][["eid", "ts", "uid"]].reset_index(drop=True)
    right = df[df["eid"] % 2 == 1].rename(columns={"eid": "rid"})[
        ["rid", "ts", "uid"]].reset_index(drop=True)
    tol = pd.Timedelta(minutes=5)

    got = asof_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(3),
        on="ts", by="uid", tolerance=tol, how="inner", right_tie="rid",
    ).to_pandas().sort_values("eid").reset_index(drop=True)

    exp = _pandas_asof(left, right, direction="backward", tolerance=tol)
    exp = exp[exp["rid"].notna()].sort_values("eid").reset_index(drop=True)
    assert got["eid"].tolist() == exp["eid"].tolist()
    assert got["rid"].astype(np.int64).tolist() == \
        exp["rid"].astype(np.int64).tolist()


def test_asof_join_bucketed_equals_plain(ray_session):
    """The time-bucketed (hot-key) plan is exact: identical to per-key."""
    df = _mk_events(seed=11, keys=2)          # few keys -> hot groups
    left = df[df["eid"] % 3 == 0][["eid", "ts", "uid"]].reset_index(drop=True)
    right = df[df["eid"] % 3 != 0].rename(columns={"eid": "rid"})[
        ["rid", "ts", "uid", "val"]].reset_index(drop=True)
    tol = pd.Timedelta(minutes=10)

    plain = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="ts", by="uid", tolerance=tol,
                      right_tie="rid").to_pandas()
    bucketed = asof_join(rd.from_pandas(left).repartition(6),
                         rd.from_pandas(right).repartition(5),
                         on="ts", by="uid", tolerance=tol, right_tie="rid",
                         time_bucket=pd.Timedelta(minutes=10)).to_pandas()
    for frame in (plain, bucketed):
        frame.sort_values("eid", inplace=True)
        frame.reset_index(drop=True, inplace=True)
    assert plain["eid"].tolist() == bucketed["eid"].tolist()
    assert plain["rid"].fillna(-1).astype(float).tolist() == \
        bucketed["rid"].fillna(-1).astype(float).tolist()


def test_asof_right_ts_tie_breaks_to_max_tie(ray_session):
    left = pd.DataFrame({"eid": [0], "uid": [1],
                         "ts": [np.datetime64("2024-01-01T01:00:00", "us")]})
    t = np.datetime64("2024-01-01T00:30:00", "us")
    right = pd.DataFrame({"rid": [7, 9, 8], "uid": [1, 1, 1],
                          "ts": [t, t, t]})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="ts", by="uid", right_tie="rid").to_pandas()
    assert got["rid"].tolist() == [9]


def test_range_join_nonoverlapping(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"x": np.round(rng.uniform(-10, 120, 500), 3),
                       "i": np.arange(500)})
    bands = pd.DataFrame({"band": ["a", "b", "c"],
                          "lo": [0.0, 10.0, 50.0],
                          "hi": [10.0, 50.0, 100.0]})
    got = range_join_broadcast(rd.from_pandas(df).repartition(4), bands,
                               value_col="x").to_pandas()
    exp = df.merge(bands, how="cross")
    exp = exp[(exp.x >= exp.lo) & (exp.x < exp.hi)]
    assert sorted(got["i"].tolist()) == sorted(exp["i"].tolist())
    m = got.set_index("i")["band"].to_dict()
    me = exp.set_index("i")["band"].to_dict()
    assert m == me


def test_range_join_left_and_overlapping(ray_session):
    df = pd.DataFrame({"x": [1.0, 5.0, 25.0, 99.0], "i": [0, 1, 2, 3]})
    bands = pd.DataFrame({"band": ["a", "b"], "lo": [0.0, 10.0],
                          "hi": [10.0, 50.0]})
    got = range_join_broadcast(rd.from_pandas(df), bands, value_col="x",
                               how="left").to_pandas().sort_values("i")
    assert got["band"].fillna("-").tolist() == ["a", "a", "b", "-"]

    overl = pd.DataFrame({"band": ["w", "v"], "lo": [0.0, 3.0],
                          "hi": [6.0, 30.0]})
    got2 = range_join_broadcast(rd.from_pandas(df), overl,
                                value_col="x").to_pandas()
    exp2 = df.merge(overl, how="cross")
    exp2 = exp2[(exp2.x >= exp2.lo) & (exp2.x < exp2.hi)]
    assert sorted(zip(got2["i"], got2["band"])) == \
        sorted(zip(exp2["i"], exp2["band"]))
    with pytest.raises(ValueError):
        range_join_broadcast(rd.from_pandas(df), overl, value_col="x",
                             how="left")


def test_top_k_per_group_matches_pandas(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.integers(0, 7, 1000),
        "v": rng.integers(0, 50, 1000),       # many ties -> tie_cols matter
        "id": np.arange(1000, dtype=np.int64),
    })
    got = top_k_per_group(rd.from_pandas(df).repartition(8),
                          group_cols=["g"], order_col="v", k=5,
                          tie_cols=["id"]).to_pandas()
    exp = df.sort_values(["v", "id"], ascending=[False, True],
                         kind="stable").groupby("g").head(5)
    key = lambda f: sorted(zip(f["g"], f["v"], f["id"]))
    assert key(got) == key(exp)


def test_top_k_ascending(ray_session):
    df = pd.DataFrame({"g": [0, 0, 0, 1, 1], "v": [3, 1, 2, 9, 8],
                       "id": [0, 1, 2, 3, 4]})
    got = top_k_per_group(rd.from_pandas(df), group_cols=["g"],
                          order_col="v", k=2, descending=False,
                          tie_cols=["id"]).to_pandas()
    assert sorted(got["id"].tolist()) == [1, 2, 3, 4]
