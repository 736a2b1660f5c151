"""Z-order clustered layout + stats-pruned scan (functions/layout.py)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from jschon_ray.functions.layout import (
    interleave_bits,
    pruned_scan,
    zorder_write,
)


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_interleave_bits_matches_reference():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, 200).astype(np.uint64)
    y = rng.integers(0, 1 << 16, 200).astype(np.uint64)
    z = interleave_bits([x, y], bits=16)
    for i in range(0, 200, 17):
        assert int(z[i]) == _morton_ref(int(x[i]), int(y[i]))


def test_interleave_bits_three_cols_distinct_positions():
    one = np.array([1], np.uint64)
    zero = np.array([0], np.uint64)
    assert int(interleave_bits([one, zero, zero], bits=4)[0]) == 1
    assert int(interleave_bits([zero, one, zero], bits=4)[0]) == 2
    assert int(interleave_bits([zero, zero, one], bits=4)[0]) == 4


@pytest.fixture()
def clustered_dir(ray_session, tmp_path):
    rng = np.random.default_rng(42)
    n = 20_000
    t = pa.table({
        "a": rng.integers(0, 1000, n),
        "b": rng.integers(0, 1000, n),
        "payload": rng.normal(size=n),
    })
    out = str(tmp_path / "zorder")
    info = zorder_write(ray.data.from_arrow(t), ["a", "b"], out,
                        num_files=16, sample_per_block=2048)
    assert info["files"] == 16
    assert info["rows"] == n
    yield out, t
    shutil.rmtree(out, ignore_errors=True)


def test_zorder_box_scan_exact_and_pruned(clustered_dir):
    out, t = clustered_dir
    box = {"a": (100, 199), "b": (400, 499)}  # ~1% of the domain
    ds, stats = pruned_scan(out, box)
    got = ds.to_pandas().sort_values(["a", "b", "payload"]) \
        .reset_index(drop=True)

    df = t.to_pandas()
    exp = df[(df.a.between(*box["a"])) & (df.b.between(*box["b"]))] \
        .sort_values(["a", "b", "payload"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert (got["payload"].to_numpy() == exp["payload"].to_numpy()).all()

    # the point of the layout: a 1%-of-domain box must NOT touch most
    # files (random layout would touch all 16)
    assert stats["files_total"] == 16
    assert stats["files_read"] <= 8, stats


def test_zorder_scan_empty_box(clustered_dir):
    out, _ = clustered_dir
    ds, stats = pruned_scan(out, {"a": (5000, 6000), "b": (0, 999)})
    assert stats["files_read"] == 0
    assert ds.count() == 0


def test_zorder_nulls_cluster_low(ray_session, tmp_path):
    t = pa.table({
        "a": pa.array([None, 1, 2, None, 500, 900] * 100,
                      type=pa.float64()),
        "b": pa.array(list(range(600)), type=pa.int64()),
    })
    out = str(tmp_path / "zn")
    info = zorder_write(ray.data.from_arrow(t), ["a", "b"], out,
                        num_files=4, sample_per_block=512)
    assert info["rows"] == 600  # nulls written, not dropped
    ds, _ = pruned_scan(out, {"a": (900, 900)})
    assert ds.count() == 100


def test_bloom_point_scan_prunes_and_is_exact(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from jschon_ray.functions.layout import (bloom_index_write,
                                             bloom_point_scan,
                                             hash_partition_write)

    n = 20000
    rng = np.random.default_rng(3)
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(rng.integers(0, 100, n).astype(np.int64))})
    out = str(tmp_path / "bloomidx")
    info = hash_partition_write(ray.data.from_arrow(t), "k", out,
                                num_files=16)
    assert info["files"] == 16 and info["rows"] == n
    bloom_index_write(out, "k", num_bits=1 << 16)

    keys = [5, 777, 13000]
    ds, stats = bloom_point_scan(out, "k", keys)
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert got.k.tolist() == sorted(keys)           # no false negatives
    assert got.v.tolist() == [int(t["v"][k].as_py()) for k in sorted(keys)]
    # membership skipping must beat reading everything (3 keys live in
    # <= 3 of 16 files; bloom fp could admit a few more, never all)
    assert stats["files_read"] <= 6 < stats["files_total"] == 16

    # absent keys: every file may be bloom-skipped; result is empty but
    # the schema survives via the residual-filtered single-file read
    ds2, stats2 = bloom_point_scan(out, "k", [10 ** 9, 10 ** 9 + 1])
    assert ds2.count() == 0
    assert stats2["files_read"] <= 1


# --------------------------------------------------------------------------
# kill-mid-write / interrupted-layout posture (VERDICT r3 item 8): layout
# writes carry the same manifest + idempotent retry guarantees the
# fault-injection tests pin for shard outputs. Kills are simulated the
# same way test_resume.py does — by leaving exactly the on-disk state a
# SIGKILL at that point would leave.


def _zorder_input(n=20_000):
    rng = np.random.default_rng(42)
    return pa.table({
        "a": rng.integers(0, 1000, n),
        "b": rng.integers(0, 1000, n),
        "payload": rng.normal(size=n),
    })


def test_zorder_kill_mid_write_then_rerun_exact(ray_session, tmp_path):
    """A run killed mid-write leaves torn .inprogress files and NO
    manifest; the caller's completeness check (manifest presence — the
    gate q_zorder_pruning_lineitem uses) sees an incomplete layout, the
    rerun overwrites idempotently, and scans never read torn files."""
    from jschon_ray.functions.layout import zorder_write

    t = _zorder_input()
    out = str(tmp_path / "zkill")
    os.makedirs(out)
    # state a kill during bucket writes would leave: some finished
    # parts, one torn .inprogress, no _manifest.json
    zorder_write(ray.data.from_arrow(t.slice(0, 4_000)), ["a", "b"],
                 out, num_files=16, sample_per_block=2048)
    os.remove(os.path.join(out, "_manifest.json"))
    for junk in ("part-00003.parquet.inprogress",
                 "part-99999.parquet.inprogress"):
        with open(os.path.join(out, junk), "wb") as f:
            f.write(b"torn parquet bytes")

    assert not os.path.exists(os.path.join(out, "_manifest.json"))

    # rerun over the FULL input (what the cache gate triggers)
    info = zorder_write(ray.data.from_arrow(t), ["a", "b"], out,
                        num_files=16, sample_per_block=2048)
    assert info["files"] == 16 and info["rows"] == t.num_rows

    box = {"a": (100, 199), "b": (400, 499)}
    ds, stats = pruned_scan(out, box)
    got = ds.to_pandas().sort_values(["a", "b", "payload"]) \
        .reset_index(drop=True)
    df = t.to_pandas()
    exp = df[(df.a.between(*box["a"])) & (df.b.between(*box["b"]))] \
        .sort_values(["a", "b", "payload"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert (got["payload"].to_numpy() == exp["payload"].to_numpy()).all()
    assert stats["files_total"] == 16     # .inprogress junk never counted


def test_zorder_manifest_ignores_stale_parts(ray_session, tmp_path):
    """Scans are manifest-driven: part files from an older, LARGER
    layout left in the same directory are not read (glob would)."""
    from jschon_ray.functions.layout import zorder_write

    t = _zorder_input(8_000)
    out = str(tmp_path / "zstale")
    zorder_write(ray.data.from_arrow(t), ["a", "b"], out,
                 num_files=32, sample_per_block=2048)
    # overwrite with a SMALLER layout: files part-00008..31 are stale
    zorder_write(ray.data.from_arrow(t), ["a", "b"], out,
                 num_files=8, sample_per_block=2048)
    ds, stats = pruned_scan(out, {"a": (0, 999), "b": (0, 999)})
    assert stats["files_total"] == 8      # manifest, not glob
    assert ds.count() == t.num_rows       # every row exactly once


def test_bloom_kill_mid_index_then_rerun_exact(ray_session, tmp_path):
    """A kill during bloom_index_write leaves some sidecars missing and
    one torn .inprogress blob; the rerun (what the _INDEXED cache gate
    triggers) overwrites every sidecar idempotently and the point scan
    is exact."""
    from jschon_ray.functions.layout import (bloom_index_write,
                                             bloom_point_scan,
                                             hash_partition_write)

    n = 20_000
    rng = np.random.default_rng(3)
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(rng.integers(0, 100, n)
                                .astype(np.int64))})
    out = str(tmp_path / "bkill")
    hash_partition_write(ray.data.from_arrow(t), "k", out, num_files=16)
    bloom_index_write(out, "k", num_bits=1 << 16)

    # simulate the kill: drop half the sidecars, tear one mid-write
    sides = sorted(f for f in os.listdir(out) if f.endswith(".bloom"))
    for s in sides[:8]:
        os.remove(os.path.join(out, s))
    with open(os.path.join(out, sides[8] + ".inprogress"), "wb") as f:
        f.write(b"torn bloom")

    info = bloom_index_write(out, "k", num_bits=1 << 16)
    assert info["files"] == 16

    keys = [5, 777, 13000]
    ds, stats = bloom_point_scan(out, "k", keys)
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert got.k.tolist() == sorted(keys)
    assert stats["files_read"] <= 6 < stats["files_total"] == 16


def test_manifest_with_missing_file_raises(ray_session, tmp_path):
    """A manifest entry whose part file vanished (interrupted
    OVERWRITE of a complete layout) must fail loudly, not silently
    scan a partial layout."""
    from jschon_ray.functions.layout import zorder_write

    t = _zorder_input(4_000)
    out = str(tmp_path / "zmiss")
    zorder_write(ray.data.from_arrow(t), ["a", "b"], out,
                 num_files=8, sample_per_block=2048)
    os.remove(os.path.join(out, "part-00002.parquet"))
    with pytest.raises(FileNotFoundError, match="interrupted"):
        pruned_scan(out, {"a": (0, 999), "b": (0, 999)})
