"""Audio constellation fingerprinting: landmark stage + offset-vote match.

The scale path for audio near-dup (stages/fingerprint.py) — analogue of
the reference's opt-in payload `format` pass
(/root/reference/jschon/vocabulary/format.py:14-32) composed with the
MinHash-LSH bucket-match shape (functions/dedup.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from jschon_ray.sources.clips import (FP_FRAME, generate_fp_clips,
                                      synth_fp_pcm)
from jschon_ray.stages.fingerprint import (FINGERPRINT_SCHEMA,
                                           AudioFingerprinter,
                                           fingerprint_match_pairs)
from jschon_ray.stages.taskpool import stage_fn


def _table(ids, pcms, codec="pcm_s16le"):
    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array([p.tobytes() if p is not None else None
                           for p in pcms], pa.binary()),
        "codec": pa.array([codec] * len(ids), pa.string()),
    })


def test_landmarks_deterministic_across_batching():
    # landmark set must not depend on which clips share a block (per-CLIP
    # silence floor, not per-batch): one batch == two half batches
    t, _ = generate_fp_clips(24, seed=11)
    t = t.select(["clip_id", "bytes", "codec"])
    fp = AudioFingerprinter()
    whole = fp(t).to_pandas()
    halves = pa.concat_tables([fp(t.slice(0, 12)), fp(t.slice(12, 12))])
    halves = halves.to_pandas()
    key = ["clip_id", "fp_hash", "t1"]
    a = whole.sort_values(key).reset_index(drop=True)
    b = halves.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0


def test_landmarks_skip_undecodable_and_empty():
    pcm = synth_fp_pcm("ok-clip")
    t = _table(["ok", "null-payload", "short"],
               [pcm, None, np.zeros(10, "<i2")])
    # bad codec on a separate row
    bad = pa.table({"clip_id": pa.array(["bad"], pa.string()),
                    "bytes": pa.array([b"FAKEamr\0\0\0\0\0xx"], pa.binary()),
                    "codec": pa.array(["amr"], pa.string())})
    out = AudioFingerprinter()(pa.concat_tables([t, bad]))
    assert out.schema.equals(FINGERPRINT_SCHEMA)
    got = set(out["clip_id"].to_pylist())
    assert got == {"ok"}


def test_planted_duplicates_found_exactly(ray_session):
    t, truth = generate_fp_clips(300, seed=3)
    assert len(truth) >= 3
    ds = ray.data.from_arrow(
        t.select(["clip_id", "bytes", "codec"])).repartition(4)
    lm = ds.map_batches(stage_fn(AudioFingerprinter),
                        batch_format="pyarrow", batch_size=64)
    pairs = fingerprint_match_pairs(lm, min_matches=40).to_pandas()
    found = sorted(zip(pairs["id_a"], pairs["id_b"]))
    assert found == truth
    assert (pairs["matches"] >= 40).all()


def test_shifted_copy_matches_by_offset_consistency(ray_session):
    src = synth_fp_pcm("shift-src")
    shifted = np.concatenate([np.zeros(2 * FP_FRAME, "<i2"),
                              src[:-2 * FP_FRAME]])
    other = synth_fp_pcm("unrelated-clip")
    ds = ray.data.from_arrow(_table(["a", "b", "c"],
                                    [src, shifted, other]))
    lm = ds.map_batches(stage_fn(AudioFingerprinter),
                        batch_format="pyarrow", batch_size=8)
    pairs = fingerprint_match_pairs(lm, min_matches=30).to_pandas()
    assert list(zip(pairs["id_a"], pairs["id_b"])) == [("a", "b")]


def test_match_pairs_empty_on_distinct_corpus(ray_session):
    pcms = [synth_fp_pcm(f"distinct-{i}") for i in range(6)]
    ds = ray.data.from_arrow(_table([f"d{i}" for i in range(6)], pcms))
    lm = ds.map_batches(stage_fn(AudioFingerprinter),
                        batch_format="pyarrow", batch_size=8)
    pairs = fingerprint_match_pairs(lm, min_matches=40)
    assert pairs.count() == 0
    # the zero-row typed seed keeps the schema on an all-empty result
    # (Dataset.to_pandas() drops columns for empty datasets)
    assert pairs.schema().names == ["id_a", "id_b", "matches"]


def test_stop_hash_buckets_dropped(ray_session):
    # 40 clips of the SAME content: every hash bucket holds 40 unique
    # clips > max_bucket=8 -> all dropped as non-discriminative; the
    # all-identical degenerate corpus must yield pairs without quadratic
    # blowup only when buckets are small enough to be meaningful
    pcm = synth_fp_pcm("stop-src")
    ds = ray.data.from_arrow(_table([f"s{i:02d}" for i in range(40)],
                                    [pcm] * 40))
    lm = ds.map_batches(stage_fn(AudioFingerprinter),
                        batch_format="pyarrow", batch_size=8)
    pairs = fingerprint_match_pairs(lm, min_matches=10, max_bucket=8).to_pandas()
    assert len(pairs) == 0


def test_fingerprint_clusters_canonical_keep(ray_session):
    # chain: planted pairs -> connected components -> canonical = min id
    import ray.data

    from jschon_ray.functions.graph import connected_components

    t, truth = generate_fp_clips(200, seed=7)
    ds = ray.data.from_arrow(
        t.select(["clip_id", "bytes", "codec"])).repartition(4)
    lm = ds.map_batches(stage_fn(AudioFingerprinter),
                        batch_format="pyarrow", batch_size=64)
    pairs = fingerprint_match_pairs(lm, min_matches=40).to_pandas()
    assert len(pairs) == len(truth) >= 2
    eds = ray.data.from_pandas(pairs[["id_a", "id_b"]])
    cc = connected_components(eds, out_node="clip_id").to_pandas()
    # every planted pair sits in one component labelled by its min id
    comp = dict(zip(cc["clip_id"], cc["component"]))
    for a, b in truth:
        assert comp[a] == comp[b] == min(comp[a], a)


def test_partial_containment_detected(ray_session):
    # clip B embeds a stretch of clip A (prefix copy): the offset
    # histogram still concentrates on one dt, so containment is found
    # with proportionally fewer votes than a full duplicate
    src = synth_fp_pcm("contain-src")
    part = src[: len(src) * 2 // 3]          # first 2 of 3 segments
    other = synth_fp_pcm("contain-other")
    ds = ray.data.from_arrow(_table(["full", "part", "other"],
                                    [src, part, other]))
    lm = ds.map_batches(stage_fn(AudioFingerprinter),
                        batch_format="pyarrow", batch_size=8)
    pairs = fingerprint_match_pairs(lm, min_matches=30).to_pandas()
    assert ("full", "part") in set(zip(pairs["id_a"], pairs["id_b"]))
    assert not any("other" in p for pr in zip(pairs["id_a"], pairs["id_b"])
                   for p in pr)


def test_fingerprint_lookup_retrieves_planted_groups(ray_session):
    from jschon_ray.sources.clips import fp_plan, fp_truth_pairs
    from jschon_ray.stages.fingerprint import fingerprint_lookup

    n = 300
    t, truth = generate_fp_clips(n, seed=23)
    t = t.select(["clip_id", "bytes", "codec"])
    ids, dup = fp_plan(n, seed=23)
    assert dup, "plan must plant duplicates"
    groups = {}
    for a, b in truth:
        groups.setdefault(a, set()).add(b)
        groups.setdefault(b, set()).add(a)

    query_ids = [ids[i] for i in sorted(dup)[:3]]
    fp = AudioFingerprinter()
    mask = pa.compute.is_in(t["clip_id"],
                            value_set=pa.array(query_ids, pa.string()))
    q_landmarks = fp(t.filter(mask))

    corpus = ray.data.from_arrow(t).map_batches(
        stage_fn(AudioFingerprinter), batch_format="pyarrow",
        batch_size=64)
    out = fingerprint_lookup(corpus, q_landmarks,
                             min_matches=40).to_pandas()

    for q in query_ids:
        got = out[out.query_id == q]
        # self-match at offset zero, with the strongest possible score
        me = got[got.clip_id == q]
        assert len(me) == 1 and int(me.dt.iloc[0]) == 0
        # retrieved set == the planted duplicate group, nothing else
        assert set(got.clip_id) - {q} == groups.get(q, set())


def test_fingerprint_lookup_no_queries_in_corpus(ray_session):
    from jschon_ray.stages.fingerprint import fingerprint_lookup

    t, _ = generate_fp_clips(60, seed=31)
    t = t.select(["clip_id", "bytes", "codec"])
    # query clips from a DIFFERENT seed: no content overlap expected
    tq, _ = generate_fp_clips(4, seed=99)
    fp = AudioFingerprinter()
    q_landmarks = fp(tq.select(["clip_id", "bytes", "codec"]))

    corpus = ray.data.from_arrow(t).map_batches(
        stage_fn(AudioFingerprinter), batch_format="pyarrow",
        batch_size=64)
    hits = fingerprint_lookup(corpus, q_landmarks, min_matches=40)
    # the zero-row typed seed keeps the schema on an all-empty result
    assert hits.schema().names == ["query_id", "clip_id", "matches", "dt"]
    assert hits.count() == 0
