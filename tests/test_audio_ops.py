"""AudioResampler + VADSegments: DSP correctness and Ray integration."""

import numpy as np
import pyarrow as pa
import pytest

from jschon_ray.sources.clips import generate_clips, synth_pcm
from jschon_ray.stages.audio_ops import AudioResampler, VADSegments


def _tone(sr, ms, freq, amp=0.5):
    t = np.arange(int(sr * ms / 1000)) / sr
    return np.clip(np.sin(2 * np.pi * freq * t) * amp * 32767,
                   -32768, 32767).astype("<i2")


def _table(rows):
    return pa.table({
        "clip_id": [r[0] for r in rows],
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "sr_hz": pa.array([r[2] for r in rows], pa.int32()),
        "codec": [r[3] for r in rows],
    })


def test_resampler_preserves_tone_frequency():
    sr, target = 48000, 16000
    pcm = _tone(sr, 500, 440.0)
    t = _table([("a", pcm.tobytes(), sr, "pcm_s16le")])
    out = AudioResampler(target_sr=target)(t)
    assert out["resample_ok"][0].as_py()
    res = np.frombuffer(out["bytes"][0].as_py(), "<i2")
    assert abs(len(res) - len(pcm) * target / sr) <= 1
    spec = np.abs(np.fft.rfft(res.astype(np.float64)))
    peak_hz = np.argmax(spec) * target / len(res)
    assert abs(peak_hz - 440.0) < 4.0
    assert out["sr_hz"][0].as_py() == target
    assert out["codec"][0].as_py() == "pcm_s16le"


def test_resampler_flags_bad_rows():
    t = _table([("bad", b"\x01", 16000, "wav"),          # truncated header
                ("null", None, 16000, "pcm_s16le"),
                ("nosr", b"\x00\x00", 0, "pcm_s16le")])
    out = AudioResampler()(t)
    assert out["resample_ok"].to_pylist() == [False, False, False]
    assert all(e is not None for e in out["resample_error"].to_pylist())


def test_vad_finds_tone_between_silences():
    sr = 16000
    sil = np.zeros(int(sr * 0.3), "<i2")
    tone = _tone(sr, 400, 300.0)
    pcm = np.concatenate([sil, tone, sil])
    t = _table([("v", pcm.tobytes(), sr, "pcm_s16le"),
                ("quiet", np.zeros(sr, "<i2").tobytes(), sr, "pcm_s16le")])
    out = VADSegments(frame_ms=20)(t)
    assert out["vad_ok"].to_pylist() == [True, True]
    segs = out["segments"][0].as_py()
    assert len(segs) == 1
    s = segs[0]
    assert abs(s["start_ms"] - 300) <= 40          # one-frame tolerance
    assert abs(s["end_ms"] - 700) <= 40
    assert out["segments"][1].as_py() == []
    assert out["n_segments"].to_pylist() == [1, 0]
    assert 0.3 < out["speech_ratio"][0].as_py() < 0.5
    assert out["speech_ratio"][1].as_py() == 0.0


def test_vad_merges_close_bursts_and_drops_blips():
    sr = 16000
    sil_s = np.zeros(int(sr * 0.04), "<i2")        # 40ms gap -> merged
    sil_l = np.zeros(int(sr * 0.5), "<i2")         # 500ms gap -> split
    burst = _tone(sr, 200, 250.0)
    blip = _tone(sr, 20, 250.0)                    # 20ms < min_segment
    pcm = np.concatenate([burst, sil_s, burst, sil_l, blip])
    t = _table([("m", pcm.tobytes(), sr, "pcm_s16le")])
    out = VADSegments(frame_ms=20, merge_gap_ms=60, min_segment_ms=100)(t)
    segs = out["segments"][0].as_py()
    assert len(segs) == 1                          # bursts merged, blip gone
    assert segs[0]["start_ms"] == 0
    assert abs(segs[0]["end_ms"] - 440) <= 40


def test_stages_compose_in_ray_pipeline(ray_session):
    import ray.data as rd

    clips = generate_clips(60, seed=5, dirty=True)
    ds = rd.from_arrow(clips).repartition(4)
    # autoscaling (1, 2) pools: two FIXED 2-actor pools would reserve all
    # 4 CPUs of the test session and starve the upstream read (deadlock)
    out = ds.map_batches(AudioResampler, batch_format="pyarrow",
                         batch_size=16, concurrency=(1, 2),
                         fn_constructor_kwargs=dict(target_sr=16000)) \
            .map_batches(VADSegments, batch_format="pyarrow",
                         batch_size=16, concurrency=(1, 2))
    # consume as arrow: ray's pandas conversion tries (and fails) to cast
    # the list<struct> segments column to its tensor extension type
    df = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow")).to_pandas()
    assert len(df) == 60
    res_ok = df["resample_ok"]
    assert res_ok.sum() > 0 and (~res_ok).sum() > 0   # dirty rows flagged
    assert (df.loc[res_ok, "sr_hz"] == 16000).all()
    # resampled clips are all decodable by VAD
    assert df.loc[res_ok, "vad_ok"].all()


def test_mel_spectrogram_peak_tracks_tone():
    from jschon_ray.stages.audio_ops import MelSpectrogram, mel_filterbank

    sr = 16000
    stage = MelSpectrogram(sr=sr, frame_len=512, n_mels=40)
    low = _tone(sr, 400, 200.0)
    high = _tone(sr, 400, 3000.0)
    t = _table([("lo", low.tobytes(), sr, "pcm_s16le"),
                ("hi", high.tobytes(), sr, "pcm_s16le"),
                ("wrong_sr", low.tobytes(), 8000, "pcm_s16le")])
    out = stage(t)
    assert out["mel_ok"].to_pylist() == [True, True, False]
    m_lo = np.array(out["mel_mean"][0].as_py())
    m_hi = np.array(out["mel_mean"][1].as_py())
    assert len(m_lo) == 40
    assert np.argmax(m_lo) < np.argmax(m_hi)     # peak moves up with freq
    # the peak mel band must actually contain the tone frequency
    fb = mel_filterbank(sr, 512, 40)
    bins_hz = np.arange(fb.shape[1]) * sr / 512
    band = fb[np.argmax(m_hi)]
    lo_hz = bins_hz[np.flatnonzero(band > 0)[0]]
    hi_hz = bins_hz[np.flatnonzero(band > 0)[-1]]
    assert lo_hz <= 3000.0 <= hi_hz
    assert out["mel_mean"][2].as_py() is None


def test_resample_then_mel_pipeline(ray_session):
    import ray.data as rd

    from jschon_ray.stages.audio_ops import MelSpectrogram

    clips = generate_clips(40, seed=9, dirty=True)
    ds = rd.from_arrow(clips).repartition(3)
    out = ds.map_batches(AudioResampler, batch_format="pyarrow",
                         batch_size=16, concurrency=(1, 2),
                         fn_constructor_kwargs=dict(target_sr=16000)) \
            .map_batches(MelSpectrogram, batch_format="pyarrow",
                         batch_size=16, concurrency=(1, 2),
                         fn_constructor_kwargs=dict(sr=16000))
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert t.num_rows == 40
    ok = np.array(t["mel_ok"].to_pylist())
    res_ok = np.array(t["resample_ok"].to_pylist())
    assert (ok == res_ok).all()          # resampled rows all featurize
    assert ok.sum() > 0
    mels = [m for m in t["mel_mean"].to_pylist() if m is not None]
    assert all(len(m) == 40 for m in mels)


def test_audio_neardup_query_pairs_same_tone_clips(ray_session):
    """Content-based near-dup: found pairs are acoustically near-identical
    (tone frequencies within ~one FFT bin), ordered id_a < id_b."""
    from jschon_ray.pipelines.queries import q_audio_neardup_clips
    from jschon_ray.sources.clips import clip_seed

    pairs = q_audio_neardup_clips("/root/testdata/sf0.001")
    assert len(pairs) > 0
    assert (pairs["id_a"] < pairs["id_b"]).all()
    assert (pairs["sim"] >= 0.98).all()
    freq = lambda cid: 100.0 + (clip_seed(cid) % 1000)
    gaps = [abs(freq(a) - freq(b))
            for a, b in zip(pairs["id_a"], pairs["id_b"])]
    close = sum(1 for g in gaps if g <= 16.0)
    assert close / len(gaps) >= 0.9     # high precision on tone closeness


def test_resampler_and_vad_survive_truncated_container_magic():
    """Truncated fake-container payloads (magic cut off) raise
    NotImplementedError from the stub decoder — stages must flag the row,
    not crash the batch (hit on the sf0.1 dirty corpus)."""
    t = _table([("trunc", b"FAKEfl", 16000, "flac"),
                ("good", _tone(16000, 100, 300.0).tobytes(), 16000,
                 "pcm_s16le")])
    out = AudioResampler()(t)
    assert out["resample_ok"].to_pylist() == [False, True]
    vout = VADSegments()(t)
    assert vout["vad_ok"].to_pylist() == [False, True]
    from jschon_ray.stages.audio_ops import MelSpectrogram

    mout = MelSpectrogram(sr=16000)(t)
    assert mout["mel_ok"].to_pylist() == [False, True]


def test_segment_extractor_slices_payloads():
    from jschon_ray.stages.audio_ops import SegmentExtractor

    sr = 16000
    sil = np.zeros(int(sr * 0.3), "<i2")
    tone = _tone(sr, 400, 300.0)
    pcm = np.concatenate([sil, tone, sil, tone, sil])
    t = _table([("s", pcm.tobytes(), sr, "pcm_s16le")])
    vad = VADSegments(frame_ms=20, merge_gap_ms=40)(t)
    segs = SegmentExtractor()(vad)
    assert segs.num_rows == 2
    assert segs["seg_idx"].to_pylist() == [0, 1]
    for i in range(2):
        b = segs["bytes"][i].as_py()
        dur = segs["dur_ms"][i].as_py()
        assert abs(len(b) // 2 - sr * dur // 1000) <= 1
        seg_pcm = np.frombuffer(b, "<i2")
        # segment energy is tone-level, not silence
        assert np.sqrt(np.mean((seg_pcm / 32768.0) ** 2)) > 0.1
    # clip with no segments vanishes (flat_map semantics)
    quiet = _table([("q", np.zeros(sr, "<i2").tobytes(), sr, "pcm_s16le")])
    assert SegmentExtractor()(VADSegments()(quiet)).num_rows == 0


def test_loudness_normalizer_hits_target_rms():
    from jschon_ray.stages.audio_ops import LoudnessNormalizer

    sr = 16000
    quiet = (_tone(sr, 300, 250.0, amp=0.05))
    loud = (_tone(sr, 300, 250.0, amp=0.9))
    t = _table([("q", quiet.tobytes(), sr, "pcm_s16le"),
                ("l", loud.tobytes(), sr, "pcm_s16le"),
                ("bad", b"\x01", sr, "wav")])
    out = LoudnessNormalizer(target_db=-20.0)(t)
    assert out["norm_ok"].to_pylist() == [True, True, False]
    for i in range(2):
        f = np.frombuffer(out["bytes"][i].as_py(), "<i2") / 32768.0
        rms_db = 20 * np.log10(np.sqrt(np.mean(f * f)))
        assert abs(rms_db - (-20.0)) < 1.0
    assert out["gain_db"][0].as_py() > 0 > out["gain_db"][1].as_py()


def test_augmenter_deterministic_and_speed_changes_length():
    from jschon_ray.stages.audio_ops import AudioAugmenter

    sr = 16000
    pcm = _tone(sr, 500, 420.0)
    t = _table([("a", pcm.tobytes(), sr, "pcm_s16le")])
    aug = AudioAugmenter(variants=3, speed_range=0.1)
    o1, o2 = aug(t), aug(t)
    assert o1.num_rows == 3
    assert o1["bytes"].to_pylist() == o2["bytes"].to_pylist()  # idempotent
    assert o1["clip_id"].to_pylist() == ["a#aug0", "a#aug1", "a#aug2"]
    for i in range(3):
        sp = o1["speed"][i].as_py()
        m = len(o1["bytes"][i].as_py()) // 2
        assert abs(m - len(pcm) / sp) <= 2
        assert 0.9 <= sp <= 1.1


def test_full_audio_prep_chain(ray_session):
    """resample -> VAD -> segment-extract -> normalize -> augment,
    end-to-end over a Ray Dataset."""
    import ray.data as rd

    from jschon_ray.stages.audio_ops import (AudioAugmenter,
                                             LoudnessNormalizer,
                                             SegmentExtractor)

    clips = generate_clips(30, seed=12, dirty=True)
    ds = rd.from_arrow(clips).repartition(3)
    segs = ds.map_batches(AudioResampler, batch_format="pyarrow",
                          batch_size=16, concurrency=(1, 2),
                          fn_constructor_kwargs=dict(target_sr=16000)) \
        .map_batches(VADSegments, batch_format="pyarrow", batch_size=16,
                     concurrency=(1, 2)) \
        .map_batches(SegmentExtractor, batch_format="pyarrow",
                     batch_size=16, concurrency=(1, 2))
    segs = segs.map_batches(lambda t: t.append_column(
        "codec", pa.array(["pcm_s16le"] * t.num_rows)),
        batch_format="pyarrow")
    # five min-1 actor pools would exceed the 4-CPU test session and
    # deadlock; the last two stages are cheap-state, run them as
    # stateless task functions instead
    normed = segs.map_batches(LoudnessNormalizer().__call__,
                              batch_format="pyarrow", batch_size=64)
    final = normed.map_batches(AudioAugmenter(variants=2).__call__,
                               batch_format="pyarrow", batch_size=64)
    t = pa.concat_tables(final.iter_batches(batch_format="pyarrow"))
    assert t.num_rows > 0
    assert t.num_rows % 2 == 0                 # 2 variants per segment
    assert all(c.endswith(("#aug0", "#aug1"))
               for c in t["clip_id"].to_pylist())


def test_mfcc_matches_per_clip_reference():
    from jschon_ray.stages.audio_ops import MFCC, MelSpectrogram

    t = generate_clips(40, seed=21, dirty=False)
    res = AudioResampler(target_sr=16000)(
        t.select(["clip_id", "bytes", "sr_hz", "codec"]))
    mel = MelSpectrogram(sr=16000, frame_len=512, n_mels=40,
                         emit="frames")(res)
    out = MFCC(n_mels=40, n_mfcc=13)(mel)

    # independent per-clip reference: explicit DCT-II loop over frames
    k = np.arange(13)[:, None]
    nn = np.arange(40)[None, :]
    D = np.cos(np.pi * k * (2 * nn + 1) / 80.0) * np.sqrt(2.0 / 40)
    D[0] *= np.sqrt(0.5)
    fb = mel["mel_fbank"].to_pylist()
    oks = out["mfcc_ok"].to_pylist()
    means = out["mfcc_mean"].to_pylist()
    stds = out["mfcc_std"].to_pylist()
    checked = 0
    for i, ok in enumerate(oks):
        if not ok:
            assert means[i] is None and stds[i] is None
            continue
        m = np.asarray(fb[i], np.float64).reshape(-1, 40)
        cep = np.stack([D @ fr for fr in m])
        np.testing.assert_allclose(means[i], cep.mean(0), rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(stds[i], cep.std(0), rtol=1e-4,
                                   atol=1e-4)
        checked += 1
    assert checked >= 30
    assert "mel_fbank" not in out.column_names     # payload-class dropped


def test_mfcc_propagates_mel_failure():
    from jschon_ray.stages.audio_ops import MFCC, MelSpectrogram

    t = _table([("good", _tone(16000, 100, 440).tobytes(), 16000,
                 "pcm_s16le"),
                ("badcodec", b"FAKEamr\0\0\0\0\0xyz", 16000, "amr")])
    mel = MelSpectrogram(sr=16000, frame_len=512, n_mels=40,
                         emit="frames")(t)
    out = MFCC(n_mels=40, n_mfcc=13)(mel)
    got = dict(zip(out["clip_id"].to_pylist(), out["mfcc_ok"].to_pylist()))
    assert got == {"good": True, "badcodec": False}
    # DCT rows orthonormal -> energy of cepstra bounded by frame energy
    mm = dict(zip(out["clip_id"].to_pylist(),
                  out["mfcc_mean"].to_pylist()))
    assert mm["badcodec"] is None and mm["good"] is not None


def test_noise_reducer_improves_snr():
    from jschon_ray.stages.audio_ops import NoiseReducer

    sr = 16000
    t = np.arange(sr) / sr
    rng = np.random.default_rng(3)
    tone = 0.4 * np.sin(2 * np.pi * 440 * t)
    tone[: sr // 4] = 0.0                   # noise-only lead-in
    noisy = tone + 0.05 * rng.standard_normal(sr)
    pcm = np.clip(noisy * 32768, -32768, 32767).astype("<i2")

    def snr(ref, x):
        e = ref - x
        return 10 * np.log10(max((ref ** 2).sum(), 1e-12)
                             / max((e ** 2).sum(), 1e-12))

    tb = pa.table({"clip_id": ["a"],
                   "bytes": pa.array([pcm.tobytes()], pa.binary()),
                   "codec": ["pcm_s16le"]})
    out = NoiseReducer(noise_frac=0.2)(tb)
    assert out["denoise_ok"][0].as_py()
    den = np.frombuffer(out["bytes"][0].as_py(), "<i2") \
        .astype(np.float64) / 32768.0
    a, b = sr // 4 + 1024, sr - 1024
    before = snr(tone[a:b], noisy[a:b] / 32768.0 * 32768.0)
    after = snr(tone[a:b], den[a:b])
    assert after > before + 5, (before, after)
    # lead-in noise floor drops
    rms_b = np.sqrt((noisy[1024:sr // 4] ** 2).mean())
    rms_a = np.sqrt((den[1024:sr // 4] ** 2).mean())
    assert rms_a < rms_b * 0.5


def test_noise_reducer_identity_when_alpha_zero():
    from jschon_ray.stages.audio_ops import NoiseReducer

    pcm = _tone(16000, 200, 330)
    tb = pa.table({"clip_id": ["a"],
                   "bytes": pa.array([pcm.tobytes()], pa.binary()),
                   "codec": ["pcm_s16le"]})
    out = NoiseReducer(alpha=0.0)(tb)
    den = np.frombuffer(out["bytes"][0].as_py(), "<i2")
    # alpha=0 -> unit gain -> WOLA identity (within int16 rounding)
    assert np.abs(den.astype(int) - pcm.astype(int)).max() <= 1


def test_noise_reducer_passthrough_rows():
    from jschon_ray.stages.audio_ops import NoiseReducer

    short = np.zeros(100, "<i2")                     # < one frame
    tb = pa.table({
        "clip_id": ["short", "null", "bad"],
        "bytes": pa.array([short.tobytes(), None, b"FAKEamr\0\0\0\0\0z"],
                          pa.binary()),
        "codec": pa.array(["pcm_s16le", "pcm_s16le", "amr"]),
    })
    out = NoiseReducer()(tb)
    ok = dict(zip(out["clip_id"].to_pylist(),
                  out["denoise_ok"].to_pylist()))
    assert ok == {"short": True, "null": False, "bad": False}
    got = dict(zip(out["clip_id"].to_pylist(), out["bytes"].to_pylist()))
    assert got["short"] == short.tobytes()           # unchanged
    assert got["null"] is None
