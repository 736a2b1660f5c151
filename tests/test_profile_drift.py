"""Profile build (Ray partial-merge), drift verdicts, salted group stats."""

import numpy as np
import pyarrow as pa
import pytest

from jschon_ray.pipelines.stats import (
    grouped_stats,
    hist_edges_from_profile,
    profile_dataset,
)
from jschon_ray.sources.clips import generate_clips
from jschon_ray.state.profile import TableProfile, drift_report


def test_profile_local_matches_exact():
    t = generate_clips(3000, seed=42)
    tp = TableProfile().add_table(t, columns=["sr_hz", "dur_ms", "codec"])
    s = {r["column"]: r for r in (tp.stats_table().to_pylist())}
    sr = t["sr_hz"].to_pylist()
    assert s["sr_hz"]["count"] == 3000
    assert s["sr_hz"]["min"] == min(sr)
    assert s["sr_hz"]["max"] == max(sr)
    exact_distinct = len(set(sr))
    assert abs(s["sr_hz"]["distinct_approx"] - exact_distinct) <= \
        max(2, 0.05 * exact_distinct)
    # serialization roundtrip
    tp2 = TableProfile.from_bytes(tp.to_bytes())
    assert tp2.columns["sr_hz"].count == 3000


def test_profile_dataset_ray(ray_session):
    import ray.data as rd
    t = generate_clips(4000, seed=5)
    ds = rd.from_arrow(t).repartition(6)
    tp = profile_dataset(ds, columns=["sr_hz", "dur_ms", "transcript"])
    local = TableProfile().add_table(t, columns=["sr_hz", "dur_ms",
                                                 "transcript"])
    for col in ("sr_hz", "dur_ms", "transcript"):
        a, b = tp.columns[col], local.columns[col]
        assert a.count == b.count
        assert a.nulls == b.nulls
        assert a.vmin == b.vmin and a.vmax == b.vmax
        assert abs(a.hll.estimate() - b.hll.estimate()) \
            <= 0.02 * max(1, b.hll.estimate())


def test_drift_detects_shift(ray_session):
    import ray.data as rd
    clean_a = generate_clips(4000, seed=11, dirty=False)
    clean_b = generate_clips(4000, seed=12, dirty=False)

    base = profile_dataset(rd.from_arrow(clean_a), columns=["sr_hz", "dur_ms"])
    edges = hist_edges_from_profile(base)
    base = profile_dataset(rd.from_arrow(clean_a), columns=["sr_hz", "dur_ms"],
                           hist_edges=edges)

    same = profile_dataset(rd.from_arrow(clean_b), columns=["sr_hz", "dur_ms"],
                           hist_edges=edges)
    rep_same = {r["column"]: r for r in drift_report(base, same)}
    assert not rep_same["dur_ms"]["drifted"], rep_same

    # shifted distribution: dur_ms scaled 3x
    shifted = clean_b.set_column(
        clean_b.schema.get_field_index("dur_ms"), "dur_ms",
        pa.array((np.array(clean_b["dur_ms"].to_pylist()) * 3)
                 .astype(np.int32)))
    cur = profile_dataset(rd.from_arrow(shifted), columns=["sr_hz", "dur_ms"],
                          hist_edges=edges)
    rep = {r["column"]: r for r in drift_report(base, cur)}
    assert rep["dur_ms"]["drifted"]
    assert not rep_same["sr_hz"]["drifted"]


def test_grouped_stats_salted(ray_session):
    import ray.data as rd
    t = generate_clips(5000, seed=21)
    ds = rd.from_arrow(t).repartition(8)
    out = grouped_stats(ds, key="codec", value="dur_ms",
                        num_salts=8).to_pandas()
    import pandas as pd
    df = t.select(["codec", "dur_ms"]).to_pandas()
    exact = df.groupby("codec")["dur_ms"].agg(["count", "mean", "min", "max"])
    got = out.set_index("codec")
    assert set(got.index) == set(exact.index)
    for codec, row in exact.iterrows():
        g = got.loc[codec]
        assert g["n"] == row["count"]
        assert abs(g["mean"] - row["mean"]) < 1e-6
        assert g["min"] == row["min"] and g["max"] == row["max"]
        med = df[df.codec == codec]["dur_ms"].median()
        spread = max(10.0, 0.1 * abs(med))
        assert abs(g["p50"] - med) <= spread


def test_schema_diff_detects_structural_changes(ray_session):
    import pyarrow as pa

    from jschon_ray.state.profile import TableProfile, schema_diff

    rng = np.random.default_rng(3)
    base_t = pa.table({
        "a": pa.array(rng.normal(10, 2, 3000)),
        "dropped": pa.array(rng.integers(0, 5, 3000)),
        "ids": pa.array([f"k{i%50}" for i in range(3000)]),
    })
    cur_t = pa.table({
        "a": pa.array(rng.normal(40, 2, 3000)),          # mean shift
        "added": pa.array(rng.normal(0, 1, 3000)),
        "ids": pa.array([f"k{i}" for i in range(3000)]),  # distinct blowup
    })
    b = TableProfile(); b.add_table(base_t)
    c = TableProfile(); c.add_table(cur_t)
    diff = {(r["column"], r["change"]) for r in schema_diff(b, c)}
    assert ("dropped", "removed") in diff
    assert ("added", "added") in diff
    assert ("ids", "distinct_ratio") in diff
    assert ("a", "mean_shift") in diff


def test_schema_diff_kind_change_and_clean(ray_session):
    import pyarrow as pa

    from jschon_ray.state.profile import TableProfile, schema_diff

    b = TableProfile(); b.add_table(pa.table({"x": pa.array([1.0, 2.0])}))
    c = TableProfile(); c.add_table(pa.table({"x": pa.array(["p", "q"])}))
    diff = schema_diff(b, c)
    assert diff == [{"column": "x", "change": "kind_changed",
                     "detail": "numeric->string"}]
    same = TableProfile(); same.add_table(pa.table({"x": pa.array([1.0, 2.0])}))
    assert schema_diff(b, same) == []
