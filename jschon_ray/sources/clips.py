"""Deterministic synthetic audio-clip table (BASELINE.json input_hint shape).

Columns: (clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
codec:string, transcript:string) — FIXTURES.md F1. Everything derives from
(seed, row index): the PCM payload for a clip_id is reproducible from the
clip_id alone, so decoded-PCM parity (SNR>=30dB) can re-synthesize the
reference signal without storing ground truth.

Controlled dirty-row rates exercise every check family:
  * duplicate clip_id (~1%)            -> uniqueness shuffle
  * out-of-range sr_hz (~10%)          -> bounds
  * non-positive / huge dur_ms (~5%)   -> bounds
  * invalid codec 'amr' (~5%)          -> enum + referential
  * empty/null/overlong/bad transcript -> string checks
  * truncated payload (~2%)            -> decode-consistency (format check)

Codec payloads: 'pcm_s16le' is raw little-endian int16 frames; 'wav' is a
RIFF/WAVE container (real, stdlib-parseable). 'flac'/'opus'/'mp3' are
DETERMINISTIC FAKES — b'FAKE<codec>' magic + raw s16le PCM — because real
codec libraries are not in this container; the decode stage documents this
(stages/decode.py). The Ray-side plumbing (schema, batch sizing, actor
signatures) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CODECS = ["pcm_s16le", "wav", "flac", "opus", "mp3"]
VALID_SR = [8000, 16000, 22050, 44100, 48000]

CLIPS_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("codec", pa.string()),
    ("transcript", pa.string()),
])

_WORDS = ("the quick brown fox jumps over lazy dog speech audio clip sample "
          "hello world test data sound wave noise signal voice").split()


def clip_seed(clip_id: str) -> int:
    return int.from_bytes(hashlib.sha256(clip_id.encode()).digest()[:8], "big")


def synth_pcm(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Reference waveform for a clip: int16 sine + light noise, fully
    determined by (clip_id, sr_hz, dur_ms)."""
    h = clip_seed(clip_id)
    n = max(0, int(sr_hz * dur_ms / 1000))
    freq = 100.0 + (h % 1000)
    t = np.arange(n, dtype=np.float64) / max(sr_hz, 1)
    rng = np.random.default_rng(h & 0xFFFFFFFF)
    sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(n)
    return np.clip(sig * 32767, -32768, 32767).astype("<i2")


def wav_bytes(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + mono s16le frames."""
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
    hdr += struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def encode_clip(clip_id: str, sr_hz: int, dur_ms: int, codec: str) -> bytes:
    pcm = synth_pcm(clip_id, sr_hz, dur_ms)
    if codec == "pcm_s16le":
        return pcm.tobytes()
    if codec == "wav":
        return wav_bytes(pcm, sr_hz)
    # deterministic fake container for codecs absent from this sandbox
    return b"FAKE" + codec.encode().ljust(8, b"\0") + pcm.tobytes()


def generate_clips(n: int, seed: int = 42, *, dirty: bool = True,
                   dur_range=(20, 400)) -> pa.Table:
    """Build an n-row clips table. ``dirty=False`` gives an all-valid table
    (baseline-profile generation for drift tests)."""
    rng = np.random.default_rng(seed)
    ids = [f"clip-{rng.integers(0, 2**48):012x}" for _ in range(n)]
    if dirty and n > 1:
        for i in rng.choice(n, max(1, n // 100), replace=False):
            ids[int(i)] = ids[int(rng.integers(0, n))]

    sr = rng.choice(VALID_SR, n).astype(np.int64)
    if dirty:
        bad = rng.random(n) < 0.10
        sr[bad] = rng.choice([96000, 4000], bad.sum())
    dur = rng.integers(dur_range[0], dur_range[1], n)
    if dirty:
        bad = rng.random(n) < 0.05
        dur[bad] = rng.choice([0, -100, 900000], bad.sum())

    codec_p = np.array([0.70, 0.10, 0.08, 0.07, 0.05])
    codecs = rng.choice(CODECS, n, p=codec_p).astype(object)
    if dirty:
        bad = rng.random(n) < 0.05
        codecs[bad] = "amr"

    transcripts: list = []
    for i in range(n):
        r = rng.random()
        if dirty and r < 0.02:
            transcripts.append(None)
        elif dirty and r < 0.04:
            transcripts.append("")
        elif dirty and r < 0.05:
            transcripts.append("x" * 1200)
        else:
            k = int(rng.integers(2, 12))
            transcripts.append(" ".join(
                _WORDS[int(w)] for w in rng.integers(0, len(_WORDS), k)))

    payloads = []
    for i in range(n):
        d = int(dur[i])
        b = encode_clip(ids[i], int(sr[i]), max(d, 0) if d < 600000 else 200,
                        str(codecs[i]))
        if dirty and rng.random() < 0.02:
            b = b[:max(1, len(b) // 3)]  # truncated payload
        payloads.append(b)

    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "sr_hz": pa.array(sr, pa.int32()),
        "dur_ms": pa.array(dur, pa.int32()),
        "codec": pa.array(list(codecs), pa.string()),
        "transcript": pa.array(transcripts, pa.string()),
    })


def codecs_dim_table() -> pa.Table:
    """FIXTURES.md F2 — broadcast side of the referential semi-join."""
    return pa.table({
        "codec": CODECS,
        "container": ["raw", "wav", "flac", "ogg", "mp3"],
        "lossless": [True, True, True, False, False],
    })


def write_clips_dataset(out_dir: str, n: int, seed: int = 42, *,
                        num_shards: int = 8, dirty: bool = True) -> list:
    """Write a sharded clips dataset (one parquet per shard — the unit of
    checkpoint/resume lineage). Deterministic per (seed, shard)."""
    os.makedirs(out_dir, exist_ok=True)
    per = n // num_shards

    def build_shard(s: int) -> str:
        rows = per + (n - per * num_shards if s == num_shards - 1 else 0)
        t = generate_clips(rows, seed=seed * 1000 + s, dirty=dirty)
        p = os.path.join(out_dir, f"part-{s:04d}.parquet")
        # audio payloads are incompressible; NONE skips codec CPU on read
        # (scale note: never re-compress compressed/opaque media columns)
        pq.write_table(t, p, compression="NONE")
        return p

    # deterministic per (seed, shard) either way; fan out when a Ray
    # session exists (never init one from library code)
    import ray
    if ray.is_initialized() and num_shards > 1:
        remote_build = ray.remote(num_cpus=1)(build_shard)
        return ray.get([remote_build.remote(s) for s in range(num_shards)])
    return [build_shard(s) for s in range(num_shards)]


def clips_cache_dir(sf_dir: str, n: int | None = None, seed: int = 42) -> str:
    """Deterministic per-sf_dir clips dataset under /tmp, built on demand.

    The driver's testdata has no clips table; queries() synthesize one keyed
    by sf_dir scale (sf0.01 -> 20k rows) so repeated calls reuse the cache.
    """
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    if n is None:
        n = {"sf0.001": 2000, "sf0.01": 20000, "sf0.1": 100000}.get(tag, 2000)
    # shard count sets the read/validate parallelism floor: ~3k rows/shard,
    # capped so tiny scales don't fragment
    shards = max(8, min(64, n // 3000))
    out = f"/tmp/jschon_ray_clips/{tag}-n{n}-s{seed}-p{shards}-u1"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        write_clips_dataset(out, n, seed=seed, num_shards=shards)
        with open(done, "w") as f:
            f.write("ok")
    return out


# --------------------------------------------------------------------------
# Fingerprint corpus: high-entropy content with PLANTED duplicates.
#
# The main clips table draws each clip's content from ~1000 pure tones —
# at 100k rows every tone is shared by ~100 clips, so every constellation
# hash is a stop-hash and content fingerprinting degenerates. Audio
# dedup needs a corpus where content collisions are PLANTED, not ambient:
# each clip here is a seed-derived 3-segment tone sequence (360^3 distinct
# contents), and ~2% of rows copy an earlier clip's waveform (half of them
# time-shifted by whole frames) under a fresh clip_id.
# Same CLIPS_SCHEMA shape (input_hint), all 16 kHz / pcm_s16le.

FP_FRAME = 1024          # matches stages/fingerprint.py's default frame_len
FP_SEGMENTS = 3
FP_FRAMES_PER_SEG = 3


def synth_fp_pcm(clip_id: str, sr_hz: int = 16000) -> np.ndarray:
    """Seed-derived chord-sequence waveform: FP_SEGMENTS segments of
    FP_FRAMES_PER_SEG x FP_FRAME samples, each a TWO-tone chord.

    Two tones per segment, not one: single tones drawn from ~360 values
    birthday-collide across a corpus (two clips sharing one segment tone
    share that segment's whole stationary hash set), while an unordered
    tone PAIR has ~360^2/2 values, so cross-clip segment collisions are
    rare and planted duplicates dominate the match-score distribution."""
    h = clip_seed(clip_id)
    seg_len = FP_FRAMES_PER_SEG * FP_FRAME
    rng = np.random.default_rng(h & 0xFFFFFFFF)
    t = np.arange(seg_len, dtype=np.float64) / sr_hz
    parts = []
    for k in range(FP_SEGMENTS):
        v1 = (h >> (12 * k)) % 360
        v2 = (h >> (12 * k + 17)) % 360
        if v2 == v1:
            v2 = (v2 + 180) % 360
        f1 = 200.0 + v1 * 15.5
        f2 = 200.0 + v2 * 15.5 + 7.75
        parts.append(0.3 * np.sin(2 * np.pi * f1 * t)
                     + 0.3 * np.sin(2 * np.pi * f2 * t))
    sig = np.concatenate(parts) + 0.005 * rng.standard_normal(
        seg_len * FP_SEGMENTS)
    return np.clip(sig * 32767, -32768, 32767).astype("<i2")


def fp_plan(n: int, seed: int = 42, *, dup_rate: float = 0.02):
    """Duplicate plan: (ids, dup) where dup[i] = (root_src_idx, shift).

    CHEAP (rng bookkeeping only — no synthesis), so shard-parallel
    builders recompute it and synthesize only their own rows. Sources
    are always root clips (a chosen source that is itself a duplicate
    resolves to its root), so any row's waveform is derivable from the
    plan alone: pcm(i) = shift(synth(ids[dup[i][0]])) or synth(ids[i]).
    """
    rng = np.random.default_rng(seed)
    ids = [f"fp-{seed}-{i:06d}" for i in range(n)]
    dup: dict[int, tuple[int, int]] = {}
    if n > 4:
        n_dup = max(1, int(n * dup_rate))
        chosen = rng.choice(np.arange(1, n), n_dup, replace=False)
        for i in chosen:
            src = int(rng.integers(0, i))
            shift = (int(rng.integers(1, 3)) * FP_FRAME
                     if rng.random() < 0.5 else 0)
            dup[int(i)] = (src, shift)
    return ids, dup


def _fp_root(dup, i: int) -> int:
    """Transitive root of a copy chain (src < i always, so it
    terminates)."""
    while i in dup:
        i = dup[i][0]
    return i


def fp_truth_pairs(ids, dup) -> list:
    """All duplicate pairs implied by the plan: every pair within a
    {root + its copies} group (two shifted copies of one root are
    near-duplicates of EACH OTHER, not just of the root)."""
    groups: dict[int, list] = {}
    for i in dup:
        root = _fp_root(dup, i)
        groups.setdefault(root, [root]).append(i)
    pairs = set()
    for members in groups.values():
        ms = sorted(set(members))
        for a in range(len(ms)):
            for b in range(a + 1, len(ms)):
                pairs.add(tuple(sorted((ids[ms[a]], ids[ms[b]]))))
    return sorted(pairs)


def fp_clip_pcm(ids, dup, i: int, sr_hz: int = 16000) -> np.ndarray:
    """Waveform of row i under the plan — derivable from the plan alone:
    content = root's chord sequence shifted by the chain's total lead-in,
    CAPPED at 2 frames so every pair within a duplicate group keeps >=
    (FP_SEGMENTS*FP_FRAMES_PER_SEG - 2) frames of overlap regardless of
    chain depth (uncapped chains would drift out of detectability)."""
    shift = 0
    j = i
    while j in dup:
        src, sh = dup[j]
        shift += sh
        j = src
    shift = min(shift, 2 * FP_FRAME)
    pcm = synth_fp_pcm(ids[j], sr_hz)
    if shift:
        pcm = np.concatenate([np.zeros(shift, "<i2"), pcm[:-shift]])
    return pcm


def fp_rows_table(ids, dup, lo: int, hi: int,
                  sr_hz: int = 16000) -> pa.Table:
    dur_ms = int(FP_SEGMENTS * FP_FRAMES_PER_SEG * FP_FRAME * 1000 / sr_hz)
    m = hi - lo
    return pa.table({
        "clip_id": pa.array(ids[lo:hi], pa.string()),
        "bytes": pa.array(
            [fp_clip_pcm(ids, dup, i, sr_hz).tobytes()
             for i in range(lo, hi)], pa.binary()),
        "sr_hz": pa.array([sr_hz] * m, pa.int32()),
        "dur_ms": pa.array([dur_ms] * m, pa.int32()),
        "codec": pa.array(["pcm_s16le"] * m, pa.string()),
        "transcript": pa.array([""] * m, pa.string()),
    })


def generate_fp_clips(n: int, seed: int = 42, *, dup_rate: float = 0.02,
                      sr_hz: int = 16000):
    """(table, truth): truth is the sorted list of duplicate pairs
    (id_a, id_b), id_a < id_b, including pairs between two copies of the
    same root. Half the copies are shifted by 1-2 whole frames of
    leading silence (offset-consistency must still match them)."""
    ids, dup = fp_plan(n, seed, dup_rate=dup_rate)
    return fp_rows_table(ids, dup, 0, n, sr_hz), fp_truth_pairs(ids, dup)


def fp_corpus_cache_dir(sf_dir: str, n: int | None = None,
                        seed: int = 17) -> str:
    """Deterministic per-sf fingerprint corpus under /tmp (sharded parquet,
    ~18 KB payload per clip — counts are lower than clips_cache_dir's so
    the cache stays a few hundred MB at sf0.1)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    if n is None:
        n = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 20000}.get(tag, 500)
    shards = max(4, min(32, n // 1000))
    out = f"/tmp/jschon_ray_fpclips/{tag}-n{n}-s{seed}-p{shards}-u2"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        per = max(1, n // shards)
        bounds = [(s * per, n if s == shards - 1 else min(n, s * per + per))
                  for s in range(shards)]
        bounds = [(lo, hi) for lo, hi in bounds if hi > lo]

        def build_shard(s, lo, hi):
            # the plan (rng bookkeeping) is cheap to recompute per task;
            # each shard synthesizes ONLY its own rows — generation
            # parallelizes like the main clips writer
            ids, dup = fp_plan(n, seed)
            pq.write_table(fp_rows_table(ids, dup, lo, hi),
                           os.path.join(out, f"part-{s:04d}.parquet"),
                           compression="NONE")

        import ray
        if ray.is_initialized() and len(bounds) > 1:
            remote = ray.remote(num_cpus=1)(build_shard)
            ray.get([remote.remote(s, lo, hi)
                     for s, (lo, hi) in enumerate(bounds)])
        else:
            for s, (lo, hi) in enumerate(bounds):
                build_shard(s, lo, hi)
        with open(done, "w") as f:
            f.write("ok")
    return out
