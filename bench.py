#!/usr/bin/env python
"""Headline benchmark: one JSON line for the driver (BENCH_r{N}.json).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at num_cpus=$RAY_GRAFT_CPUS (default 32) and print
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "clips_per_sec": ...}

--scaling: run the same workload twice in FRESH processes at num_cpus=8 and
32 on identical input and print both throughputs + scaling efficiency
(sandbox evidence for the north rule's N vs 4N cluster criterion — one
physical box, so this evidences scheduler-level scaling shape).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# --scaling runs the suite at N and 4N pinned CPUs. Defaults 4 and 16
# over 4M rows: the host's measured memory-bus knee sits between 4 and
# 8 cores (scripts/membw_probe.py — per-core bandwidth 16.3 -> 12.6
# GB/s), so a 2-core leg enjoys near-full per-core bandwidth its 8-core
# partner cannot have and the 2v8 pair systematically understates
# node scaling; with BOTH legs inside the knee (4 and 16) the pair
# isolates the engine from the single-box bus artifact. The full
# ladder incl. 2v8 is published in BASELINE.md / BENCH_scaling_pin_*.
SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "16"))
ONLY = os.environ.get("RAY_GRAFT_BENCH", "")


def run_benchmarks() -> dict:
    import ray

    from jschon_ray.state.raylog import quiet_empty_schema_warnings

    # drop ray's benign once-per-operator warning for zero-yield task
    # bundles (empty shuffle partitions carry no schema); genuine
    # non-empty schema divergences still log — see state/raylog.py
    quiet_empty_schema_warnings()

    if not ray.is_initialized():
        # worker_process_setup_hook: pin the glibc allocator in EVERY
        # worker (incl. read tasks) before the first big allocation —
        # see jschon_ray/state/allocator.py for the measured kernel
        # fault-path collapse this avoids; stages also self-apply it so
        # drivers that own ray.init themselves are still covered.
        # Self-contained closure (stdlib only): the hook deserializes in
        # the worker BEFORE any sys.path setup, so it must not pickle by
        # reference to this repo's modules.
        def _tune_alloc():
            import ctypes
            try:
                libc = ctypes.CDLL("libc.so.6")
                libc.mallopt(-4, 0)        # M_MMAP_MAX = 0
                libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD high
            except Exception:
                pass
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR",
                 runtime_env={"worker_process_setup_hook": _tune_alloc})
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    import jschon_ray

    jschon_ray.register_for_pickle_by_value()

    # warm the worker pool so timings measure steady-state compute, not
    # process spawn (measured: cold 32-worker spawn adds ~30% at this scale)
    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NUM_CPUS)])

    from jschon_ray.pipelines import queries as Q
    from jschon_ray.pipelines.validate import (
        clip_validation_pipeline,
        flagship_summary,
        summarize_verdicts,
    )
    from jschon_ray.sources.clips import clips_cache_dir, fp_corpus_cache_dir

    # ---- inputs (clips synthesized once per sf, cached under /tmp) -------
    clips_n = os.environ.get("GRAFT_CLIPS_N")
    clips_dir = clips_cache_dir(SF_DIR, n=int(clips_n)) if clips_n \
        else clips_cache_dir(SF_DIR)
    fp_dir = fp_corpus_cache_dir(SF_DIR)   # build cached corpus up front

    # warm the OS page cache so we measure compute + shuffle, not first
    # read; skip the (possibly multi-GB) payload files when the scaling
    # workload prunes them at the read anyway
    import glob

    warm = glob.glob(os.path.join(SF_DIR, "*.parquet"))
    warm += glob.glob(os.path.join(fp_dir, "*.parquet"))
    if os.environ.get("GRAFT_SCALE_DECODE", "1") != "0":
        warm += glob.glob(os.path.join(clips_dir, "*.parquet"))
    for path in warm:
        with open(path, "rb") as f:
            while f.read(1 << 24):
                pass

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    if ONLY == "features":
        # compute-bound scaling leg (GRAFT_SCALE_STAGE=features): framed
        # FFT feature extraction — per-clip DSP dominates the wall, so
        # this isolates the ENGINE's scheduling/scaling behavior from
        # the single-box memory-bandwidth ceiling that caps the verdict
        # passes (one shared memory bus; a real 4N-node cluster brings
        # 4N buses). Full-suite legs stay the primary evidence.
        n_f = timed("audio_features", _features_only(clips_dir))
        extras["features_clips_per_sec"] = round(
            n_f / timings["audio_features"], 1)
        total = round(sum(timings.values()), 3)
        return {"metric": "features_only", "value": total, "unit": "sec",
                "queries": timings, "sf": SF_DIR, "num_cpus": NUM_CPUS,
                **extras}


    # 1. flagship: full constraint suite + uniqueness + referential on clips.
    # NB: measured — overlapping these executions with driver threads makes
    # them contend for the same CPU slots and is ~3x SLOWER than serial.
    def flagship():
        # three sequential executions, NOT the one-job union
        # (flagship_summary): measured 2.7 s vs 7.1 s at 16 cores — the
        # union plan denies the read->validate fusion its full worker
        # set while the shuffle branches hold slots
        out = clip_validation_pipeline(clips_dir)
        s = summarize_verdicts(out["verdicts"])
        s["n_dupe_keys"] = out["dupes"].count()
        s["n_referential"] = out["referential"].count()
        return s

    s = timed("clips_validation", flagship)
    extras["clips_rows"] = s["n"]
    extras["clips_per_sec"] = round(s["n"] / timings["clips_validation"], 1)

    if ONLY == "flagship":
        # the scaling workload is the FULL north-star suite: constraint
        # validation + uniqueness + referential (above) PLUS the
        # mergeable sketch profile over the clip metadata + transcript
        # (t-digest/HLL/count-min partials -> one tiny merge). After the
        # round-4 shuffle fixes the verdict passes alone are memory-
        # bandwidth-bound on one box (CPUs share one memory bus; the
        # 1->16 cpu ladder saturates at ~4.8x), so CPU-count scaling is
        # evidenced on the compute-bound suite a real run executes
        # anyway — same posture as the documented decode exclusion.
        def clips_profile():
            from jschon_ray.pipelines.stats import profile_dataset
            from jschon_ray.sources.io import read_table

            cols = ["sr_hz", "dur_ms", "codec", "transcript"]
            ds = read_table(clips_dir, columns=cols)
            profile_dataset(ds, columns=cols)
            return s["n"]

        timed("clips_profile", clips_profile)
        if os.environ.get("GRAFT_SCALE_DECODE", "1") != "0":
            n_dec0 = timed("clips_decode", _decode_only(clips_dir))
            extras["decode_clips_per_sec"] = round(
                n_dec0 / timings["clips_decode"], 1)
        total = round(sum(timings.values()), 3)
        extras["suite_clips_per_sec"] = round(s["n"] / total, 1)
        return {"metric": "flagship_only", "value": total, "unit": "sec",
                "queries": timings, "sf": SF_DIR, "num_cpus": NUM_CPUS,
                **extras}

    # 2. vectorized per-row suite over the biggest table
    def vlineitem():
        return Q.q_validate_lineitem(SF_DIR).count()

    n_li = timed("validate_lineitem", vlineitem)
    extras["lineitem_rows"] = n_li
    extras["lineitem_rows_per_sec"] = round(n_li /
                                            timings["validate_lineitem"], 1)

    # 3. grouped aggregate (shuffle) + top-k sort
    timed("q1_pricing_summary",
          lambda: Q.q_q1_pricing_summary(SF_DIR).to_pandas())
    timed("top_orders", lambda: Q.q_top_orders(SF_DIR).to_pandas())

    # 4. sketch profile (mergeable partials)
    timed("profile_sketches", lambda: Q.q_profile_sketches_lineitem(SF_DIR))

    # 5. dedup + similarity
    timed("dedup_docs_exact",
          lambda: Q.q_dedup_docs_exact(SF_DIR).to_pandas())
    timed("ann_topk", lambda: Q.q_ann_topk(SF_DIR))

    # 6. decode stage (bytes-heavy actor pool; bounded batches)
    n_dec = timed("clips_decode", _decode_only(clips_dir))
    extras["decode_clips_per_sec"] = round(n_dec / timings["clips_decode"], 1)

    # 7. audio feature extraction (decode + framed FFT, batched per block)
    n_feat = timed("audio_features", _features_only(clips_dir))
    extras["features_clips_per_sec"] = round(
        n_feat / timings["audio_features"], 1)

    # 8. exact n-gram Jaccard similarity join (inverted-index shuffle)
    timed("ngram_jaccard_docs",
          lambda: Q.q_ngram_jaccard_docs(SF_DIR).count())

    # 8b. resample -> VAD chained actor pools (payload-reading DSP)
    def resample_vad():
        import pyarrow as _pa

        from jschon_ray.pipelines.queries import q_audio_resample_vad_clips

        out = q_audio_resample_vad_clips(SF_DIR)
        return sum(b.num_rows
                   for b in out.iter_batches(batch_format="pyarrow"))

    n_vad = timed("audio_resample_vad", resample_vad)
    extras["vad_clips_per_sec"] = round(n_vad /
                                        timings["audio_resample_vad"], 1)

    # 8c. distributed prefix scan: seeded global shuffle rank over the
    # biggest table (two-phase scan; only bucket totals hit the driver)
    def shuffle_rank_li():
        from jschon_ray.functions.scan import global_rank
        from jschon_ray.sources.io import read_table, table_path

        ds = read_table(table_path(SF_DIR, "orders"),
                        columns=["o_orderkey"])
        return global_rank(ds, id_col="o_orderkey", seed=42,
                           num_buckets=4 * NUM_CPUS).count()

    n_rank = timed("shuffle_rank_orders", shuffle_rank_li)
    extras["shuffle_rank_rows_per_sec"] = round(
        n_rank / timings["shuffle_rank_orders"], 1)

    # 9. temporal / join operators (as-of cogroup, broadcast enrich,
    # hopping-window explode)
    timed("events_asof_click_view",
          lambda: Q.q_events_asof_click_view(SF_DIR).count())
    timed("orders_broadcast_enrich",
          lambda: Q.q_orders_broadcast_enrich(SF_DIR).to_pandas())
    timed("events_hopping_30m",
          lambda: Q.q_events_hopping_30m(SF_DIR).count())

    # 10. exact order statistics (histogram-refinement scan), near-dup
    # cluster closure (iterative narrow-row co-group shuffles; includes
    # regenerating the jaccard pair set), distributed k-means (broadcast
    # centroids + partial-sum reduce)
    timed("quantiles_lineitem", lambda: Q.q_quantiles_lineitem(SF_DIR))
    timed("dup_clusters_docs", lambda: len(Q.q_dup_clusters_docs(SF_DIR)))
    timed("kmeans_embeddings",
          lambda: Q.q_kmeans_embeddings(SF_DIR).count())

    # 11. audio content dedup at scale: constellation landmarks (one rfft
    # per batch) -> coarse-bucket hash co-pairs -> offset-consistency
    # votes; both shuffles move only small integer rows
    timed("audio_fingerprint_dedup",
          lambda: Q.q_audio_fingerprint_dedup_clips(SF_DIR).count())

    # 12. exact substring span dedup (bounded suffix-array form):
    # strided UTF-32 window hashes -> cross-doc distinct verdict ->
    # per-doc interval-union coverage; 3-int rows shuffle, text never
    timed("substring_dup_docs",
          lambda: Q.q_substring_dup_docs(SF_DIR).count())

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extras,
    }


def _decode_only(clips_dir):
    def decode():
        from jschon_ray.sources.io import read_table
        from jschon_ray.stages.decode import ClipDecoder

        ds = read_table(clips_dir, columns=["clip_id", "bytes", "sr_hz",
                                            "dur_ms", "codec"])
        return ds.map_batches(ClipDecoder, batch_format="pyarrow",
                              batch_size=1024,
                              concurrency=(1, NUM_CPUS)).count()

    return decode


def _features_only(clips_dir):
    def features():
        from jschon_ray.sources.io import read_table
        from jschon_ray.stages.features import audio_features

        ds = read_table(clips_dir, columns=["clip_id", "bytes", "sr_hz",
                                            "codec"])
        return audio_features(ds, batch_size=512,
                              concurrency=(1, NUM_CPUS)).count()

    return features


def run_scaling():
    """Flagship at N and 4N CPUs in fresh interpreters over a LARGE shared
    input (default 1M clips): after read-pruning and kernel vectorization
    the 100k-row bench input is fixed-overhead-dominated, so the scaling
    criterion is evidenced at the scale it is meant for. The decode stage
    is excluded here — it is memory-bandwidth-bound, and on one shared box
    extra CPUs add no bandwidth (distinct cluster nodes do)."""
    scale_rows = int(os.environ.get("GRAFT_SCALE_ROWS", "4000000"))
    repo = os.path.dirname(os.path.abspath(__file__))
    prep = (
        "import sys, ray\n"
        f"sys.path.insert(0, {repo!r})\n"
        f"ray.init(address='local', num_cpus={NUM_CPUS}, "
        "include_dashboard=False, logging_level='ERROR')\n"
        "from jschon_ray.sources.clips import clips_cache_dir\n"
        f"clips_cache_dir({SF_DIR!r}, n={scale_rows})\n"
        "ray.shutdown()\n")
    subprocess.run([sys.executable, "-c", prep], check=True, cwd=repo)

    def run(ncpu: int) -> dict:
        # OMP_NUM_THREADS also caps the DRIVER's arrow thread pool, so the
        # "N cpus" leg cannot borrow extra host threads for driver-side
        # kernels (ray already caps workers per task)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_BENCH=os.environ.get("GRAFT_SCALE_STAGE",
                                                  "flagship"),
                   GRAFT_CLIPS_N=str(scale_rows),
                   GRAFT_SCALE_DECODE=os.environ.get(
                       "GRAFT_SCALE_DECODE", "0"),
                   OMP_NUM_THREADS=str(ncpu))
        # taskset: pin the WHOLE process tree (driver, raylet, object
        # store, workers) to exactly ncpu cores — ray.init(num_cpus=N)
        # only caps worker slots, so without pinning the driver-side
        # runtime free-rides on every other host core and the small leg
        # reads faster than an N-core NODE ever could (the proxy is
        # emulating node sizes, and on a node the driver shares the
        # node's cores)
        cmd = ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
               os.path.abspath(__file__)]
        out = subprocess.run(cmd, env=env, capture_output=True,
                             text=True, check=True,
                             cwd=os.path.dirname(
                                 os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    reps = int(os.environ.get("GRAFT_SCALE_REPS", "5"))
    # the sandbox host is elastic (its effective CPU allocation varies over
    # minutes), so legs run INTERLEAVED and the statistic is the MEDIAN of
    # >=5 reps per leg (round-1 best-of-3 was host-noise-dominated: per-leg
    # spreads of 1.7-2.9x produced efficiencies from 0.77 to 1.27). The
    # per-leg spread (max/min) is published alongside so the number's
    # trustworthiness is visible.
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run(SCALE_LO))
        hi_runs.append(run(SCALE_HI))

    def median(runs):
        vals = sorted(r["value"] for r in runs)
        mid = len(vals) // 2
        m = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2
        return m, max(vals) / min(vals)

    lo_med, lo_spread = median(lo_runs)
    hi_med, hi_spread = median(hi_runs)
    lo = min(lo_runs, key=lambda r: abs(r["value"] - lo_med))
    hi = min(hi_runs, key=lambda r: abs(r["value"] - hi_med))
    ratio = SCALE_HI / SCALE_LO
    eff = (lo_med / hi_med) / ratio
    import os as _os
    print(json.dumps({
        "metric": f"scaling_efficiency_{SCALE_LO}_to_{SCALE_HI}",
        f"sec_{SCALE_LO}": lo_med, f"sec_{SCALE_HI}": hi_med,
        f"clips_per_sec_{SCALE_LO}": lo.get("clips_per_sec"),
        f"clips_per_sec_{SCALE_HI}": hi.get("clips_per_sec"),
        "speedup": round(lo_med / hi_med, 3),
        "scaling_efficiency": round(eff, 3),
        "statistic": f"median_of_{reps}_interleaved",
        f"spread_{SCALE_LO}": round(lo_spread, 3),
        f"spread_{SCALE_HI}": round(hi_spread, 3),
        "host_logical_cpus": len(_os.sched_getaffinity(0)),
        "scale_rows": int(os.environ.get("GRAFT_SCALE_ROWS", "4000000")),
        "reps": reps,
        f"all_sec_{SCALE_LO}": [r["value"] for r in lo_runs],
        f"all_sec_{SCALE_HI}": [r["value"] for r in hi_runs],
        f"queries_{SCALE_LO}": lo["queries"],
        f"queries_{SCALE_HI}": hi["queries"],
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        result = run_benchmarks()
        print(json.dumps(result))
        import ray

        ray.shutdown()
