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
