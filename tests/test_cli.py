"""python -m jschon_ray CLI: one subprocess smoke per command family."""

import json
import os
import subprocess
import sys

import duckdb
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = {
    "$id": "https://x/orders",
    "type": "object",
    "required": ["o_orderkey", "o_orderstatus"],
    "properties": {
        "o_orderkey": {"type": "integer", "exclusiveMinimum": 0},
        "o_orderstatus": {"enum": ["O", "F", "P"]},
        "o_totalprice": {"exclusiveMinimum": 0, "maximum": 300000},
    },
}


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "jschon_ray", "--num-cpus", "2", *args],
        capture_output=True, text=True, env=env, cwd="/tmp", timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_validate_writes_verdicts_and_violations(tmp_path):
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(SPEC))
    outdir = tmp_path / "out"
    summary = _run(["validate",
                    "--input", "/root/testdata/sf0.001/orders.parquet",
                    "--spec", str(spec_path),
                    "--output", str(outdir),
                    "--key-cols", "o_orderkey"])
    con = duckdb.connect()
    n = con.execute("SELECT count(*) FROM "
                    "read_parquet('/root/testdata/sf0.001/orders.parquet')"
                    ).fetchone()[0]
    assert summary["n"] == n
    assert 0 < summary["n_valid"] < n
    verdicts = pq.read_table(str(outdir / "verdicts"))
    assert verdicts.num_rows == n
    viols = pq.read_table(str(outdir / "violations"))
    assert viols.num_rows == summary["n_violations"]
    assert set(viols.column_names) >= {"o_orderkey", "instanceLocation",
                                       "keywordLocation", "error"}


def test_cli_uniqueness_matches_sql():
    summary = _run(["uniqueness",
                    "--input", "/root/testdata/sf0.001/orders.parquet",
                    "--key", "o_custkey"])
    con = duckdb.connect()
    exp = con.execute(
        "SELECT count(*), coalesce(sum(n), 0) FROM (SELECT count(*) AS n "
        "FROM read_parquet('/root/testdata/sf0.001/orders.parquet') "
        "GROUP BY o_custkey HAVING count(*) > 1)").fetchone()
    assert summary["n_duplicate_keys"] == exp[0]
    assert summary["n_duplicate_rows"] == exp[1]


def test_cli_quantiles_matches_duckdb():
    out = _run(["quantiles",
                "--input", "/root/testdata/sf0.001/lineitem.parquet",
                "--column", "l_extendedprice", "--q", "0.5,0.9"])
    con = duckdb.connect()
    for q in ("0.5", "0.9"):
        exp = con.execute(
            "SELECT CAST(quantile_disc(l_extendedprice, ?) AS DOUBLE) "
            "FROM read_parquet("
            "'/root/testdata/sf0.001/lineitem.parquet')",
            [float(q)]).fetchone()[0]
        assert out["quantiles"][q] == exp


def test_cli_clusters(tmp_path):
    import pandas as pd
    import pyarrow as pa

    edges = pa.Table.from_pandas(pd.DataFrame(
        {"id_a": [1, 2, 10], "id_b": [2, 3, 11]}))
    path = tmp_path / "edges.parquet"
    pq.write_table(edges, str(path))
    out = _run(["clusters", "--input", str(path)])
    assert out == {"n_nodes": 5, "n_components": 2}


def test_cli_chunk(tmp_path):
    outdir = tmp_path / "chunks"
    out = _run(["chunk",
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--chunk-tokens", "32", "--overlap", "4",
                "--output", str(outdir)])
    assert out["n_chunks"] > 0
    t = pq.read_table(str(outdir))
    assert set(t.column_names) == {"doc_id", "chunk_idx",
                                   "n_chunk_tokens", "chunk_text"}


def _clips_parquet(tmp_path, n=300):
    from jschon_ray.sources.clips import generate_clips
    path = tmp_path / "clips.parquet"
    pq.write_table(generate_clips(n, seed=9), str(path))
    return str(path)


def test_cli_audio_qc(tmp_path):
    path = _clips_parquet(tmp_path)
    summary = _run(["audio-qc", "--input", path])
    assert summary["n"] == 300
    assert 0 < summary["n_pass"] <= 300


def test_cli_audio_prep_emits_wav(tmp_path):
    path = _clips_parquet(tmp_path)
    outdir = tmp_path / "prepped"
    summary = _run(["audio-prep", "--input", path,
                    "--output", str(outdir)])
    assert summary["n"] == 300
    assert 0 < summary["n_wav"] <= 300
    t = pq.read_table(str(outdir))
    ok = [r for r in t.to_pylist() if r["wav_ok"]]
    assert all(r["bytes"][:4] == b"RIFF" for r in ok)


def test_cli_audio_chunk(tmp_path):
    path = _clips_parquet(tmp_path)
    summary = _run(["audio-chunk", "--input", path,
                    "--chunk-ms", "100", "--hop-ms", "50"])
    assert summary["n_chunks"] > 300     # fan-out


def test_ray_job_entrypoint_validate_and_resume(tmp_path):
    """jobs/validate_job.py — the `ray job submit` entrypoint — runs
    standalone and a resubmission with the same --output skips every
    finished shard (manifest lineage)."""
    from jschon_ray.sources.clips import generate_clips

    shards = tmp_path / "shards"
    shards.mkdir()
    for i in range(3):
        pq.write_table(generate_clips(120, seed=100 + i),
                       str(shards / f"part-{i}.parquet"))
    out = tmp_path / "run"

    def submit():
        env = dict(os.environ, PYTHONPATH=REPO)
        env.pop("RAY_ADDRESS", None)     # standalone local session
        p = subprocess.run(
            [sys.executable, str(os.path.join(REPO, "jobs",
                                              "validate_job.py")),
             "--input", str(shards), "--output", str(out),
             "--num-cpus", "2"],
            capture_output=True, text=True, env=env, cwd="/tmp",
            timeout=300)
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    first = submit()
    assert first["n"] == 360
    assert first["shards_processed"] == 3
    assert 0 < first["n_valid"] < 360

    second = submit()                     # resubmission: all cached
    assert second["shards_processed"] == 0
    assert second["shards_skipped"] == 3
    assert second["n"] == first["n"]
    assert second["n_valid"] == first["n_valid"]
