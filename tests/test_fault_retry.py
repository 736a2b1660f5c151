"""Fault-injection: every block's first execution fails, Ray retries,
and the result is identical to a fault-free run — the task-retry
idempotency posture the resumable-output design (jobs/validate_job.py,
layout writers' deterministic filenames) depends on at cluster scale.
"""

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data


def _flaky_double(marker_dir):
    def fn(t: pa.Table) -> pa.Table:
        # fail exactly once per distinct block content: the marker file
        # is created BEFORE raising, so the retry of the same block
        # succeeds deterministically
        key = hashlib.md5(
            t["k"].to_numpy(zero_copy_only=False).tobytes()).hexdigest()
        marker = os.path.join(marker_dir, key)
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected fault (first attempt)")
        return pa.table({"k": t["k"],
                         "v2": pa.compute.multiply(t["v"], 2)})
    return fn


def test_map_batches_retry_reproduces_faultfree_result(ray_session,
                                                       tmp_path):
    n = 10000
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(np.arange(n, dtype=np.int64))})
    ds = ray.data.from_arrow(t).repartition(8)

    out = ds.map_batches(
        _flaky_double(str(tmp_path)), batch_format="pyarrow",
        max_retries=2, retry_exceptions=[RuntimeError],
    ).to_pandas().sort_values("k").reset_index(drop=True)

    # every batch faulted once (8 partitions, so >= 8 distinct
    # content-keyed markers — a single-task fusion would fail this)
    assert len(os.listdir(tmp_path)) >= 8
    # ...and the retried result is byte-identical to the expectation
    assert out.k.tolist() == list(range(n))
    assert (out.v2.to_numpy() == np.arange(n) * 2).all()


def test_hash_partition_write_idempotent_overwrite(ray_session, tmp_path):
    from jschon_ray.functions.layout import hash_partition_write

    n = 5000
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array((np.arange(n) % 7).astype(np.int64))})
    out = str(tmp_path / "layout")

    info1 = hash_partition_write(ray.data.from_arrow(t), "k", out,
                                 num_files=8)
    first = {f: open(os.path.join(out, f), "rb").read()
             for f in sorted(os.listdir(out))}
    # a retried/duplicate write lands on the SAME deterministic file
    # names with the same sorted content — byte-stable, no duplicates
    info2 = hash_partition_write(ray.data.from_arrow(t), "k", out,
                                 num_files=8)
    second = {f: open(os.path.join(out, f), "rb").read()
              for f in sorted(os.listdir(out))}
    assert info1 == info2
    assert sorted(first) == sorted(second)
    import pyarrow.parquet as pq
    total = sum(pq.read_table(os.path.join(out, f)).num_rows
                for f in sorted(second)
                if f.startswith("part-") and f.endswith(".parquet"))
    assert total == n


def test_scan_ops_empty_and_degenerate_inputs(ray_session):
    """Edge inputs that used to crash: all-invalid weights and empty
    datasets must return empty results, not ArrowInvalid/TypeError."""
    import pyarrow as pa

    from jschon_ray.functions.scan import pack_sequences, \
        weighted_sample_topk

    t = pa.table({"id": pa.array(["a", "b", "c"], pa.string()),
                  "w": pa.array([0.0, -1.0, 0.0], pa.float64())})
    out = weighted_sample_topk(ray.data.from_arrow(t), id_col="id",
                               weight_col="w", k=2)
    assert out.num_rows == 0
    assert out.schema.names == ["id", "w"]

    empty = pa.table({"id": pa.array([], pa.int64()),
                      "tok": pa.array([], pa.int64())})
    packed = pack_sequences(ray.data.from_arrow(empty), id_col="id",
                            tokens_col="tok", budget=128)
    assert packed.count() == 0
