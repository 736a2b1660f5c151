"""Direct evidence for the single-box memory-bandwidth ceiling
(VERDICT r4 item 1, option B).

Measures the host's aggregate streaming memory bandwidth at 1..32 pinned
cores with a pure-memory STREAM-triad-style numpy workload whose CPU
cost is negligible (one fused multiply-add per 24 bytes). Each worker is
an independent PROCESS pinned to its own core via sched_setaffinity and
touching its own >L3-sized buffers, so the only shared resource is the
memory bus — exactly the resource the pinned scaling ladder
(BENCH_scaling_pin_*.json) shares between its Ray workers.

Interpretation contract: if BW(p)/p falls with p for this workload, the
box's cores demonstrably share a saturating bus; a per-core throughput
fall of the SAME shape in the validation ladder is then explained by the
bus, not by engine coordination — and a real 4N-node cluster multiplies
buses with nodes, which a single box cannot emulate. The compute-bound
features control (BENCH_scaling_feat_*.json) completes the argument from
the other side: when per-row compute dominates, the ladder holds.

Writes one JSON line:
  {"probe": "stream_triad", "buffer_mb": ..., "per_p": {p: {"agg_gbps":
   ..., "gbps_per_core": ...}}}

Run: python scripts/membw_probe.py [--cores 1,2,4,8,16,32]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MB = int(os.environ.get("MEMBW_BUF_MB", "256"))
PASSES = int(os.environ.get("MEMBW_PASSES", "8"))


def _worker(core: int, q, start_evt):
    import numpy as np

    os.sched_setaffinity(0, {core})
    n = BUF_MB * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.full(n, 2.0)
    c = np.empty(n)
    # one warm pass faults the pages in before the timed region
    np.multiply(a, 3.0, out=c)
    c += b
    start_evt.wait()
    t0 = time.perf_counter()
    for _ in range(PASSES):
        # triad: c = 3a + b  -> reads a and b, writes c (3 streams)
        np.multiply(a, 3.0, out=c)
        c += b          # reads b and c, writes c (3 more streams)
    dt = time.perf_counter() - t0
    # bytes moved per pass: triad reads a (8n) + writes c (8n), then
    # reads b,c (16n) + writes c (8n) = 40n bytes (write-allocate RFO
    # traffic not counted — this UNDERcounts, keeping the ceiling claim
    # conservative)
    q.put((core, 40.0 * n * PASSES / dt / 1e9))


def measure(p: int) -> dict:
    cores = list(range(p))
    q = mp.Queue()
    start = mp.Event()
    procs = [mp.Process(target=_worker, args=(c, q, start))
             for c in cores]
    for pr in procs:
        pr.start()
    time.sleep(1.0 + 0.05 * p)      # allocation + warm pass
    start.set()
    vals = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    agg = sum(v for _, v in vals)
    return {"agg_gbps": round(agg, 2),
            "gbps_per_core": round(agg / p, 2)}


def main():
    arg = "1,2,4,8,16,32"
    if "--cores" in sys.argv:
        arg = sys.argv[sys.argv.index("--cores") + 1]
    ps = [int(x) for x in arg.split(",")]
    out = {"probe": "stream_triad", "buffer_mb": BUF_MB,
           "passes": PASSES,
           "host_logical_cpus": len(os.sched_getaffinity(0)),
           "per_p": {}}
    for p in ps:
        out["per_p"][str(p)] = measure(p)
    base = out["per_p"][str(ps[0])]["agg_gbps"]
    for p in ps:
        e = out["per_p"][str(p)]
        e["scaling_vs_1core"] = round(e["agg_gbps"] / base / p, 3) \
            if p else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
