"""TableIO format dispatch: jsonl/csv round-trips feed the same pipelines.

The reference reads documents from files/URLs/strings
(/root/reference/jschon/json.py:37-62); our table seam generalizes that to
parquet | newline-JSON | CSV sources behind one `read_table` call, so every
pipeline is source-format-agnostic.
"""

import os

import pyarrow.compute as pc
import pytest

from jschon_ray.sources.io import read_table, write_table


@pytest.fixture(scope="module")
def orders_small(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("iofmt"))
    ds = read_table("/root/testdata/sf0.001/orders.parquet",
                    columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    return ds, base


def _sorted_records(ds):
    df = ds.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    df["o_totalprice"] = df["o_totalprice"].round(2)
    return df


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_roundtrip_matches_parquet(orders_small, fmt):
    ds, base = orders_small
    out = os.path.join(base, fmt)
    write_table(ds, out, format=fmt)
    back = read_table(out, format=fmt)
    exp = _sorted_records(ds)
    got = _sorted_records(back)
    assert list(got.columns) == list(exp.columns) or \
        sorted(got.columns) == sorted(exp.columns)
    got = got[list(exp.columns)]
    assert got.equals(exp)


def test_autodetect_and_pruning(orders_small):
    ds, base = orders_small
    out = os.path.join(base, "auto")
    write_table(ds, out, format="json")
    # dir of .json parts -> detected as json without format=
    back = read_table(out, columns=["o_orderkey"])
    assert back.schema().names == ["o_orderkey"]
    assert back.count() == ds.count()


def test_filter_on_nonparquet(orders_small):
    ds, base = orders_small
    out = os.path.join(base, "filt")
    write_table(ds, out, format="csv")
    flt = pc.field("o_orderstatus") == "F"
    got = read_table(out, format="csv", filter=flt).count()
    exp = ds.map_batches(lambda t: t.filter(pc.equal(t["o_orderstatus"],
                                                     "F")),
                         batch_format="pyarrow").count()
    assert got == exp > 0


def test_validation_pipeline_over_jsonl(orders_small):
    """The per-row validation engine runs unchanged over a jsonl source."""
    from jschon_ray.pipelines.queries import ORDERS_SPEC
    from jschon_ray.pipelines.validate import validate_dataset

    ds, base = orders_small
    out = os.path.join(base, "vjson")
    write_table(ds, out, format="json")
    src = read_table(out, format="json")
    verdicts = validate_dataset(src, ORDERS_SPEC)
    df = verdicts.to_pandas()
    assert len(df) == ds.count()
    assert {"valid"} <= set(df.columns)

    ref = validate_dataset(
        read_table("/root/testdata/sf0.001/orders.parquet",
                   columns=["o_orderkey", "o_orderstatus", "o_totalprice"]),
        ORDERS_SPEC).to_pandas()
    got = df.sort_values("o_orderkey")["valid"].tolist()
    exp = ref.sort_values("o_orderkey")["valid"].tolist()
    assert got == exp


def test_partitioned_parquet_write(orders_small, tmp_path):
    """partition_cols gives a hive layout readers can prune by listing."""
    ds, _ = orders_small
    out = str(tmp_path / "by_status")
    write_table(ds, out, partition_cols=["o_orderstatus"])
    import glob
    import os as _os

    parts = sorted(p.split("=")[-1] for p in
                   glob.glob(_os.path.join(out, "o_orderstatus=*")))
    assert parts == ["F", "O", "P"]
    back = read_table(out)
    assert back.count() == ds.count()


def test_lance_detection_and_gating(tmp_path):
    """A `*.lance` directory routes to the Lance branch; without the lance
    package installed the seam raises a clear ImportError instead of
    misreading fragments as parquet parts."""
    import pytest

    from jschon_ray.sources.io import HAVE_LANCE, _detect_format, read_table

    d = tmp_path / "clips.lance"
    d.mkdir()
    assert _detect_format(str(d)) == "lance"
    if not HAVE_LANCE:
        with pytest.raises(ImportError, match="lance"):
            read_table(str(d))
