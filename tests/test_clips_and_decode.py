"""Clip synthesis determinism + decode stage correctness (no Ray)."""

import numpy as np
import pyarrow as pa

from jschon_ray.sources.clips import (
    CLIPS_SCHEMA,
    encode_clip,
    generate_clips,
    synth_pcm,
    wav_bytes,
    write_clips_dataset,
)
from jschon_ray.stages.decode import (
    ClipDecoder,
    decode_clip,
    decode_wav,
    snr_db,
)


def test_generate_deterministic():
    a = generate_clips(200, seed=7)
    b = generate_clips(200, seed=7)
    assert a.equals(b)
    assert a.schema.equals(CLIPS_SCHEMA)


def test_dirty_rates_present():
    t = generate_clips(2000, seed=42)
    codecs = set(t["codec"].to_pylist())
    assert "amr" in codecs
    sr = t["sr_hz"].to_pylist()
    assert any(s in (96000, 4000) for s in sr)
    ids = t["clip_id"].to_pylist()
    assert len(set(ids)) < len(ids)  # injected duplicates


def test_decode_roundtrip_pcm_and_wav():
    for codec in ("pcm_s16le", "wav", "flac"):
        cid = "clip-00000000abcd"
        payload = encode_clip(cid, 16000, 100, codec)
        pcm, declared_sr = decode_clip(payload, codec)
        ref = synth_pcm(cid, 16000, 100)
        assert np.array_equal(pcm, ref)
        assert snr_db(pcm, ref) == float("inf")
        if codec == "wav":
            assert declared_sr == 16000


def test_decoded_pcm_snr_gate():
    # north-star per-row fidelity: decoded PCM vs reference >= 30 dB
    cid = "clip-00000000beef"
    payload = encode_clip(cid, 8000, 50, "pcm_s16le")
    pcm, _ = decode_clip(payload, "pcm_s16le")
    noisy = pcm + np.random.default_rng(0).integers(-500, 500, len(pcm)) \
        .astype(np.int16)
    assert snr_db(noisy, pcm) >= 30.0
    very_noisy = pcm + np.random.default_rng(0).integers(
        -20000, 20000, len(pcm)).astype(np.int16)
    assert snr_db(very_noisy, pcm) < 30.0


def test_wav_rejects_garbage():
    import pytest
    from jschon_ray.stages.decode import DecodeError
    with pytest.raises(DecodeError):
        decode_wav(b"not a wav at all" * 4)


def test_clip_decoder_batch():
    t = generate_clips(500, seed=42)
    out = ClipDecoder()(t)
    ok = np.array(out["decode_ok"].to_pylist())
    errs = [e for e in out["decode_error"].to_pylist() if e]
    assert ok.sum() > 350            # most rows decode
    assert len(errs) > 0             # dirty rows fail with messages
    assert "bytes" not in out.column_names
    # good rows have consistent measured duration
    mdur = out["measured_dur_ms"].to_pylist()
    dur = out["dur_ms"].to_pylist()
    for o, m, d in zip(ok, mdur, dur):
        if o and d and 0 < d < 600000:
            assert abs(m - d) < 2 + 1000 / 8000


def test_sharded_writer(tmp_path):
    paths = write_clips_dataset(str(tmp_path), 100, seed=1, num_shards=4)
    assert len(paths) == 4
    import pyarrow.parquet as pq
    total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    assert total == 100
    # shard determinism
    t1 = pq.read_table(paths[0])
    write_clips_dataset(str(tmp_path), 100, seed=1, num_shards=4)
    assert pq.read_table(paths[0]).equals(t1)


def test_odd_wav_data_chunk_flagged_and_siblings_uncorrupted():
    """An odd-length WAV data chunk must error THAT row only — the bulk
    packed int16 view used to misalign and silently corrupt the stats
    of subsequent valid rows in the same gather group."""
    import struct

    import numpy as np
    import pyarrow as pa

    from jschon_ray.stages.decode import ClipDecoder, DecodeError, \
        decode_wav

    def wav(pcm_bytes: bytes, sr=16000) -> bytes:
        return (b"RIFF" + struct.pack("<I", 36 + len(pcm_bytes))
                + b"WAVEfmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr,
                                            sr * 2, 2, 16)
                + b"data" + struct.pack("<I", len(pcm_bytes))
                + pcm_bytes)

    good_pcm = np.full(100, 1000, "<i2").tobytes()
    rows = [wav(b"\x01\x02\x03"),       # odd data chunk
            wav(b"\x01\x02\x03\x04\x05"),
            wav(good_pcm)]
    t = pa.table({
        "clip_id": pa.array(["odd1", "odd2", "good"], pa.string()),
        "bytes": pa.array(rows, pa.binary()),
        "codec": pa.array(["wav"] * 3, pa.string()),
        "sr_hz": pa.array([16000] * 3, pa.int32()),
        "dur_ms": pa.array([None, None, None], pa.int32())})
    out = ClipDecoder()(t).to_pylist()
    assert not out[0]["decode_ok"] and "odd data chunk" in \
        out[0]["decode_error"]
    assert not out[1]["decode_ok"]
    assert out[2]["decode_ok"]
    assert abs(out[2]["rms"] - 1000.0) < 1e-9   # siblings uncorrupted

    # the per-row decoder raises DecodeError (not a bare ValueError
    # that escapes every stage's handler)
    try:
        decode_wav(rows[0])
        raise AssertionError("expected DecodeError")
    except DecodeError:
        pass


def test_slow_row_clipping_counts_full_scale_negative():
    import numpy as np
    import pyarrow as pa

    from jschon_ray.stages.decode import ClipDecoder

    pcm = np.array([-32768, 0, 0, 0], "<i2")
    # route through the SLOW path via an unknown-structure fake header
    t = pa.table({
        "clip_id": pa.array(["c"], pa.string()),
        "bytes": pa.array([pcm.tobytes()], pa.binary()),
        "codec": pa.array(["pcm_s16le"], pa.string()),
        "sr_hz": pa.array([16000], pa.int32()),
        "dur_ms": pa.array([None], pa.int32())})
    fast = ClipDecoder()(t).to_pylist()[0]
    slow = [0.0]
    dec = ClipDecoder()
    ok = np.zeros(1, bool)
    err = [None]
    frames = np.zeros(1, np.int64)
    mdur = np.full(1, np.nan)
    rms = np.full(1, np.nan)
    clip_ratio = np.full(1, np.nan)
    dec._slow_row(pcm.tobytes(), "pcm_s16le", 16000, None, 0, ok, err,
                  frames, mdur, rms, clip_ratio)
    assert fast["clipping_ratio"] == clip_ratio[0] == 0.25
