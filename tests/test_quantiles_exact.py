"""Grouped approximate quantiles via mergeable t-digests (functions/quantiles.py)."""


def test_grouped_tdigest_close_to_exact(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from jschon_ray.functions.quantiles import grouped_tdigest_quantiles

    rng = np.random.default_rng(3)
    n = 40000
    keys = rng.choice(["a", "b", "c"], n)
    vals = np.where(keys == "a", rng.lognormal(0, 1, n),
                    rng.normal(100, 15, n))
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})) \
        .repartition(8)
    out = grouped_tdigest_quantiles(ds, key="k", value_col="v",
                                    qs=[0.5, 0.9, 0.99]).to_pandas()
    df = pd.DataFrame({"k": keys, "v": vals})
    for k, g in df.groupby("k"):
        ex = g["v"].quantile([0.5, 0.9, 0.99]).to_numpy()
        ap = out[out.k == k][["p50", "p90", "p99"]].to_numpy()[0]
        rel = np.abs(ap - ex) / np.maximum(np.abs(ex), 1e-9)
        assert rel.max() <= 0.01, (k, rel)


def test_grouped_tdigest_skips_nans(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from jschon_ray.functions.quantiles import grouped_tdigest_quantiles

    t = pa.table({"k": ["x"] * 5 + ["y"] * 2,
                  "v": [1.0, 2.0, float("nan"), 3.0, 4.0, 7.0, 7.0]})
    out = grouped_tdigest_quantiles(ray.data.from_arrow(t), key="k",
                                    value_col="v", qs=[0.5]).to_pandas()
    got = dict(zip(out["k"], out["p50"]))
    assert abs(got["x"] - 2.5) < 0.51         # median of 1,2,3,4
    assert got["y"] == 7.0
