"""assign_split / stratified_sample: determinism + distribution checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from jschon_ray.functions.split import assign_split, stratified_sample


def test_assign_split_partition_invariant(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    fracs = {"train": 0.8, "valid": 0.1, "test": 0.1}

    def run(parts):
        return (rd.from_pandas(df).repartition(parts)
                .map_batches(lambda b: assign_split(b, id_col="doc_id",
                                                    fracs=fracs),
                             batch_format="pyarrow")
                .to_pandas().sort_values("doc_id")["split"].tolist())

    a, b = run(2), run(13)
    assert a == b                               # partitioning-independent
    counts = pd.Series(a).value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.05    # ~binomial tolerance
    assert abs(counts["valid"] - 0.1) < 0.03
    assert abs(counts["test"] - 0.1) < 0.03


def test_assign_split_rejects_bad_fracs():
    t = pa.table({"doc_id": [1]})
    with pytest.raises(ValueError):
        assign_split(t, id_col="doc_id", fracs={"a": 0.5, "b": 0.4})


def test_stratified_sample_deterministic_and_rated(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "event_id": np.arange(5000, dtype=np.int64),
        "event_type": rng.choice(["view", "click", "error"], 5000,
                                 p=[0.6, 0.3, 0.1]),
    })
    rates = {"view": 0.1, "click": 0.5, "error": 1.0}

    def run(parts):
        return (rd.from_pandas(df).repartition(parts)
                .map_batches(lambda b: stratified_sample(
                    b, id_col="event_id", group_col="event_type",
                    rates=rates), batch_format="pyarrow")
                .to_pandas().sort_values("event_id"))

    a, b = run(3), run(11)
    assert a["event_id"].tolist() == b["event_id"].tolist()
    got_rates = (a.groupby("event_type").size()
                 / df.groupby("event_type").size())
    assert got_rates["error"] == 1.0
    assert abs(got_rates["click"] - 0.5) < 0.05
    assert abs(got_rates["view"] - 0.1) < 0.03
    # unlisted groups are dropped entirely
    t = pa.table({"event_id": [1, 2], "event_type": ["other", "other"]})
    assert stratified_sample(t, id_col="event_id", group_col="event_type",
                             rates=rates).num_rows == 0


def test_mixture_resample_uniform_and_targeted(ray_session):
    import ray.data

    from jschon_ray.functions.split import _unit_hash, mixture_resample

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "id": np.arange(4000),
        "g": rng.choice(["big", "mid", "small"], 4000,
                        p=[0.7, 0.25, 0.05])})
    ds = ray.data.from_pandas(df).repartition(5)
    out = mixture_resample(ds, id_col="id", group_col="g").to_pandas()
    counts = df["g"].value_counts()
    mn = counts.min()
    # exact expected set: u < mn/count_g
    u = _unit_hash(df["id"])
    expect = df.loc[u < df["g"].map(mn / counts).to_numpy()]
    assert sorted(out["id"]) == sorted(expect["id"])
    # kept groups are near-balanced (hash noise only)
    kept = out["g"].value_counts()
    assert kept.max() <= 2.0 * kept.min()

    # targeted mixture: 'small' gets 3x weight of others
    out2 = mixture_resample(ds, id_col="id", group_col="g",
                            target={"big": 1, "mid": 1, "small": 3}) \
        .to_pandas()
    k2 = out2["g"].value_counts()
    assert k2["small"] == counts["small"]  # most-constrained keeps all
