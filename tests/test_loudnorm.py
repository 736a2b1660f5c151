"""LoudnessNormalizer contract: re-measuring the EMITTED PCM with the
same gated-loudness estimator must land on the target (unless the gain
clamp engaged), lengths are preserved, and undecodable rows degrade to
loudnorm_ok=false with their payload intact."""

import numpy as np
import pyarrow as pa
import pytest

from jschon_ray.stages.analysis import \
    R128LoudnessNormalizer as LoudnessNormalizer


def make_clip(sr, dur_s, amp, freq=440.0):
    t = np.arange(int(sr * dur_s)) / sr
    s = amp * np.sin(2 * np.pi * freq * t)
    return np.clip(s * 32768.0, -32768, 32767).astype("<i2").tobytes()


def batch_of(rows):
    return pa.table({
        "clip_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "sr_hz": pa.array([r[2] for r in rows], pa.int32()),
        "codec": pa.array([r[3] for r in rows], pa.string()),
    })


def test_loudnorm_converges_to_target():
    ln = LoudnessNormalizer(target_db=-23.0)
    rows = [
        ("quiet", make_clip(16000, 1.0, 0.01), 16000, "pcm_s16le"),
        ("loud", make_clip(16000, 1.0, 0.9), 16000, "pcm_s16le"),
        ("mid", make_clip(8000, 2.0, 0.2, freq=200.0), 8000, "pcm_s16le"),
    ]
    out = ln(batch_of(rows))
    assert out["loudnorm_ok"].to_pylist() == [True, True, True]
    for i, (_, raw, sr, _) in enumerate(rows):
        pcm = np.frombuffer(out["bytes"][i].as_py(), "<i2")
        assert len(pcm) == len(raw) // 2  # length preserved
        re = ln._loudness_db(pcm.astype(np.float32) / 32768.0, sr)
        gain = out["gain_db"][i].as_py()
        if abs(gain) < ln.max_gain_db - 1e-6 and abs(gain) > 1e-6:
            # unclamped: re-measured loudness hits the target within the
            # s16 quantization + clipping tolerance
            assert re == pytest.approx(-23.0, abs=0.5), out["clip_id"][i]


def test_loudnorm_clamps_extreme_gain():
    ln = LoudnessNormalizer(target_db=-23.0, max_gain_db=10.0)
    rows = [("tiny", make_clip(16000, 1.0, 0.0005), 16000, "pcm_s16le")]
    out = ln(batch_of(rows))
    assert out["loudnorm_ok"][0].as_py() is True
    assert out["gain_db"][0].as_py() == pytest.approx(10.0)


def test_loudnorm_degrades_on_undecodable():
    ln = LoudnessNormalizer()
    rows = [("bad", b"\x00\x01\x02", 16000, "mystery_codec"),
            ("null", None, 16000, "pcm_s16le")]
    out = ln(batch_of(rows))
    assert out["loudnorm_ok"].to_pylist() == [False, False]
    assert out["bytes"][0].as_py() == b"\x00\x01\x02"
    assert out["codec"][0].as_py() == "mystery_codec"


def test_loudnorm_silence_fully_gated():
    ln = LoudnessNormalizer()
    silent = np.zeros(16000, "<i2").tobytes()
    out = ln(batch_of([("s", silent, 16000, "pcm_s16le")]))
    assert out["loudnorm_ok"][0].as_py() is False
