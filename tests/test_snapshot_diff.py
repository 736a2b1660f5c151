"""snapshot_diff: added/removed/changed classification, null semantics,
unique-key enforcement (functions/diff.py)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from jschon_ray.functions.diff import snapshot_diff


def _ds(rows, cols):
    return ray.data.from_arrow(pa.table(
        {c: [r[i] for r in rows] for i, c in enumerate(cols)}))


COLS = ["k", "v", "s"]


def test_diff_classifies_all_statuses(ray_session):
    old = _ds([(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"),
               (4, 40.0, "d")], COLS)
    new = _ds([(1, 10.0, "a"),            # unchanged -> no row
               (2, 21.0, "b"),            # value change
               (3, 30.0, "z"),            # string change
               (5, 50.0, "e")], COLS)     # added; 4 removed
    out = snapshot_diff(old, new, key_col="k", compare_cols=["v", "s"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(zip(out["k"], out["status"])) == [
        (2, "changed"), (3, "changed"), (4, "removed"), (5, "added")]
    row2 = out[out.k == 2].iloc[0]
    assert row2["v_old"] == 20.0 and row2["v_new"] == 21.0
    row4 = out[out.k == 4].iloc[0]
    assert row4["v_old"] == 40.0 and pd.isna(row4["v_new"])


def test_diff_null_equals_null(ray_session):
    old = _ds([(1, None, "a"), (2, None, "b")], COLS)
    new = _ds([(1, None, "a"), (2, 5.0, "b")], COLS)
    out = snapshot_diff(old, new, key_col="k",
                        compare_cols=["v", "s"]).to_pandas()
    # key 1: NULL == NULL -> unchanged; key 2: NULL vs 5.0 -> changed
    assert list(out["k"]) == [2]
    assert list(out["status"]) == ["changed"]


def test_diff_empty_delta(ray_session):
    old = _ds([(1, 1.0, "a"), (2, 2.0, "b")], COLS)
    out = snapshot_diff(old, old, key_col="k",
                        compare_cols=["v", "s"]).to_pandas()
    assert len(out) == 0


def test_diff_rejects_duplicate_keys(ray_session):
    old = _ds([(1, 1.0, "a"), (1, 2.0, "b")], COLS)
    new = _ds([(1, 1.0, "a")], COLS)
    with pytest.raises(Exception, match="duplicate key"):
        snapshot_diff(old, new, key_col="k",
                      compare_cols=["v", "s"]).to_pandas()


def test_diff_string_keys_bucketed(ray_session):
    # many keys spread over buckets; only perturbed ones surface
    n = 500
    old = _ds([(f"k{i:04d}", float(i), "s") for i in range(n)], COLS)
    new = _ds([(f"k{i:04d}", float(i) + (1.0 if i % 7 == 0 else 0.0), "s")
               for i in range(n)], COLS)
    out = snapshot_diff(old, new, key_col="k", compare_cols=["v", "s"],
                        n_buckets=16).to_pandas()
    assert set(out["status"]) == {"changed"}
    assert sorted(out["k"]) == [f"k{i:04d}" for i in range(0, n, 7)]


def test_incremental_validation_equals_full(ray_session):
    """The merged (stored + delta-revalidated) verdicts must be identical
    to validating the whole new snapshot from scratch."""
    from jschon_ray.pipelines.queries import (_INCR_ORDERS_SPEC,
                                              _perturb_orders_batch,
                                              q_incremental_validate_orders)
    from jschon_ray.pipelines.validate import validate_dataset
    from jschon_ray.sources.io import read_table, table_path

    sf = "/root/testdata/sf0.001"
    inc = q_incremental_validate_orders(sf)
    full = validate_dataset(
        read_table(table_path(sf, "orders"),
                   columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
        .map_batches(_perturb_orders_batch, batch_format="pyarrow"),
        _INCR_ORDERS_SPEC) \
        .select_columns(["o_orderkey", "valid"]).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        inc.reset_index(drop=True), full, check_dtype=False)
    assert (~full["valid"]).sum() > 0        # the delta flips verdicts
