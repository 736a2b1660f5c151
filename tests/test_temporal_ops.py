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


# ---------------------------------------------------------------------------
# hypothesis fuzz: asof_join vs pandas merge_asof on adversarial shapes


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _asof_tables(draw):
    n_left = draw(st.integers(0, 40))
    n_right = draw(st.integers(0, 40))
    keys = draw(st.integers(1, 4))
    # coarse second-grained stamps force plenty of exact ts collisions
    def rows(n, id0):
        ts = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
        uid = draw(st.lists(st.integers(0, keys - 1), min_size=n,
                            max_size=n))
        return pd.DataFrame({
            "rid": np.arange(id0, id0 + n, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[s]").astype("datetime64[us]"),
            "uid": np.array(uid, dtype=np.int64),
        })
    return rows(n_left, 0), rows(n_right, 1000)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_asof_tables(), st.sampled_from(["backward", "forward"]),
       st.sampled_from([None, 10_000_000]))
def test_asof_fuzz_vs_pandas(ray_session, tables, direction, tol):
    left, right = tables
    right = right.rename(columns={"rid": "rrid"})
    got = asof_join(
        rd.from_pandas(left) if len(left) else
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_pandas(right) if len(right) else
        rd.from_arrow(pa.Table.from_pandas(right)),
        on="ts", by="uid", direction=direction,
        tolerance=tol, right_tie="rrid",
    ).to_pandas()

    if not len(left):
        assert len(got) == 0
        return
    got = got.sort_values(["rid"]).reset_index(drop=True)
    # oracle: pandas merge_asof picks the LAST right row among equal ts in
    # (ts, rrid) sort order for backward, the FIRST for forward — same
    # deterministic tie rule as ours for backward; forward differs on
    # ties, so emulate directly.
    lt = left.sort_values("ts", kind="stable")
    exp_ids = []
    for _, row in lt.iterrows():
        cand = right[right["uid"] == row["uid"]]
        if direction == "backward":
            cand = cand[cand["ts"] <= row["ts"]]
            if tol is not None:
                cand = cand[(row["ts"] - cand["ts"])
                            <= pd.Timedelta(tol, "us")]
            pick = cand.sort_values(["ts", "rrid"]).iloc[-1]["rrid"] \
                if len(cand) else None
        else:
            cand = cand[cand["ts"] >= row["ts"]]
            if tol is not None:
                cand = cand[(cand["ts"] - row["ts"])
                            <= pd.Timedelta(tol, "us")]
            if len(cand):
                first_ts = cand["ts"].min()
                # our rule: among equal ts take max rrid (stable-sort last)
                pick = cand[cand["ts"] == first_ts]["rrid"].max()
            else:
                pick = None
        exp_ids.append((int(row["rid"]), pick))
    exp = {r: p for r, p in exp_ids}
    gotmap = {int(r): (None if pd.isna(v) else int(v))
              for r, v in zip(got["rid"], got["rrid"])}
    assert gotmap == {r: (None if p is None else int(p))
                      for r, p in exp.items()}


# ---------------------------------------------------------------------------
# large-large interval overlap join


def _ij(left, right, **kw):
    import ray.data

    from jschon_ray.functions.temporal import interval_join

    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right).repartition(2)
    return interval_join(lds, rds, **kw).to_pandas()


def test_interval_join_hand_cases(ray_session):
    left = pd.DataFrame({
        "k": ["u", "u", "v"],
        "lid": [1, 2, 3],
        "lo": [0, 100, 0],
        "hi": [10, 200, 50]})
    right = pd.DataFrame({
        "k": ["u", "u", "v", "w"],
        "rid": [10, 20, 30, 40],
        "lo": [5, 300, 40, 0],
        "hi": [15, 400, 60, 100]})
    out = _ij(left, right, by="k", left_cols=["lid"],
              right_cols=["rid"], tile_us=16)
    got = sorted(zip(out["lid"], out["rid_r"], out["overlap"]))
    # u: [0,10)x[5,15) overlap 5; [100,200) no match; v: [0,50)x[40,60) 10
    assert got == [(1, 10, 5), (3, 30, 10)]
    assert str(out["lid"].dtype) == "int64"  # dtypes repaired, not float


def test_interval_join_tile_spanning_no_duplicates(ray_session):
    # interval spans many tiles; pair must appear exactly once
    left = pd.DataFrame({"k": ["a"], "lid": [1], "lo": [0], "hi": [1000]})
    right = pd.DataFrame({"k": ["a"], "rid": [2], "lo": [500],
                          "hi": [1500]})
    out = _ij(left, right, by="k", left_cols=["lid"],
              right_cols=["rid"], tile_us=64)
    assert len(out) == 1
    assert out["overlap"].iloc[0] == 500


@pytest.mark.parametrize("seed", [0, 1])
def test_interval_join_fuzz_vs_bruteforce(ray_session, seed):
    rng = np.random.default_rng(seed)
    n, m = 300, 250
    left = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "lid": np.arange(n),
        "lo": rng.integers(0, 5000, n)})
    left["hi"] = left["lo"] + rng.integers(1, 400, n)
    right = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], m),
        "rid": np.arange(m),
        "lo": rng.integers(0, 5000, m)})
    right["hi"] = right["lo"] + rng.integers(1, 400, m)
    out = _ij(left, right, by="k", left_cols=["lid"],
              right_cols=["rid"], tile_us=256)
    got = set(zip(out["lid"], out["rid_r"]))
    brute = set()
    for _, l in left.iterrows():
        for _, r in right.iterrows():
            if l["k"] == r["k"] and l["lo"] < r["hi"] \
                    and r["lo"] < l["hi"]:
                brute.add((l["lid"], r["rid"]))
    assert got == brute
    if len(out):
        llo = left.set_index("lid").loc[out["lid"], "lo"].to_numpy()
        lhi = left.set_index("lid").loc[out["lid"], "hi"].to_numpy()
        rlo = right.set_index("rid").loc[out["rid_r"], "lo"].to_numpy()
        rhi = right.set_index("rid").loc[out["rid_r"], "hi"].to_numpy()
        exp = np.minimum(lhi, rhi) - np.maximum(llo, rlo)
        assert (out["overlap"].to_numpy() == exp).all()
