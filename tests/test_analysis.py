"""Audio analysis stages: QC, chroma, onset/tempo, time-stretch, chunker."""

import numpy as np
import pyarrow as pa

from jschon_ray.stages.analysis import (AudioChunker, AudioQC,
                                        ChromaFeatures, OnsetTempo,
                                        TimeStretcher, chroma_pitch_class)


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


# ---------------------------------------------------------------- AudioQC

def test_qc_clean_tone_passes():
    sr = 16000
    pcm = _tone(sr, 500, 220.0, amp=0.5)
    out = AudioQC()(_table([("a", pcm.tobytes(), sr, "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert r["qc_ok"] and r["qc_pass"]
    assert r["clip_ratio"] == 0.0
    assert abs(r["dc_offset"]) < 1e-3
    # 0.5 FS sine: RMS = 0.5/sqrt(2) -> ~-9 dBFS, crest ~3 dB
    assert -10.5 < r["rms_db"] < -8.0
    assert 2.0 < r["crest_db"] < 4.0


def test_qc_flags_clipping_and_silence():
    sr = 16000
    clipped = _tone(sr, 300, 220.0, amp=2.0)          # hard-clipped sine
    silent = np.zeros(sr // 2, "<i2")
    out = AudioQC()(_table([
        ("clip", clipped.tobytes(), sr, "pcm_s16le"),
        ("sil", silent.tobytes(), sr, "pcm_s16le"),
    ]))
    rows = {r["clip_id"]: r for r in out.to_pylist()}
    assert rows["clip"]["clip_ratio"] > 0.2
    assert not rows["clip"]["qc_pass"]
    assert rows["sil"]["silence_ratio"] == 1.0
    assert not rows["sil"]["qc_pass"]


def test_qc_snr_estimate_orders_noisy_vs_clean():
    sr = 16000
    rng = np.random.default_rng(7)
    t = np.arange(sr) / sr
    sig = np.sin(2 * np.pi * 220 * t)
    gate = (np.arange(sr) // (sr // 8)) % 2 == 0      # bursty signal
    clean = np.clip((sig * gate * 0.5 + 0.001
                     * rng.standard_normal(sr)) * 32767,
                    -32768, 32767).astype("<i2")
    noisy = np.clip((sig * gate * 0.5 + 0.2
                     * rng.standard_normal(sr)) * 32767,
                    -32768, 32767).astype("<i2")
    out = AudioQC()(_table([
        ("clean", clean.tobytes(), sr, "pcm_s16le"),
        ("noisy", noisy.tobytes(), sr, "pcm_s16le"),
    ]))
    rows = {r["clip_id"]: r for r in out.to_pylist()}
    assert rows["clean"]["snr_est_db"] > rows["noisy"]["snr_est_db"] + 10


def test_qc_undecodable_row():
    out = AudioQC()(_table([("bad", b"\x00\x01", 16000, "flac")]))
    r = out.to_pylist()[0]
    assert not r["qc_ok"] and not r["qc_pass"]
    assert r["clip_ratio"] is None or np.isnan(r["clip_ratio"])


# ---------------------------------------------------------- ChromaFeatures

def test_chroma_peak_matches_tone_pitch_class():
    sr = 16000
    rows = []
    for name, freq in [("a440", 440.0), ("c523", 523.25),
                       ("e330", 329.63)]:
        rows.append((name, _tone(sr, 400, freq).tobytes(), sr,
                     "pcm_s16le"))
    # frame_len=2048 -> 7.8 Hz bins; the default 512 (31 Hz bins) smears
    # low tones across neighbouring pitch classes
    out = ChromaFeatures(sr=sr, frame_len=2048)(_table(rows))
    got = {r["clip_id"]: r for r in out.to_pylist()}
    assert got["a440"]["chroma_peak"] == chroma_pitch_class(440.0) == 0
    assert got["c523"]["chroma_peak"] == chroma_pitch_class(523.25)
    assert got["e330"]["chroma_peak"] == chroma_pitch_class(329.63)
    v = got["a440"]["chroma"]
    assert len(v) == 12 and abs(sum(v) - 1.0) < 1e-5
    assert max(v) > 0.8      # pure tone concentrates in one class


def test_chroma_skips_wrong_rate_rows():
    out = ChromaFeatures(sr=16000)(_table([
        ("x", _tone(8000, 300, 220).tobytes(), 8000, "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert not r["chroma_ok"] and r["chroma"] is None


# ------------------------------------------------------------- OnsetTempo

def _click_train(sr, ms, period_s, click_len=64, amp=0.9):
    n = int(sr * ms / 1000)
    sig = np.zeros(n)
    step = int(period_s * sr)
    for s in range(0, n - click_len, step):
        sig[s:s + click_len] = amp * np.hanning(click_len)
    return np.clip(sig * 32767, -32768, 32767).astype("<i2")


def test_onset_tempo_recovers_click_rate():
    sr = 16000
    # one click every 0.512 s (= exactly 16 frames of 512 at 16 kHz,
    # so the envelope is integer-periodic) ~= 117 BPM; 4 s ~= 8 clicks
    pcm = _click_train(sr, 4096, 0.512)
    out = OnsetTempo(sr=sr)(_table([("c", pcm.tobytes(), sr,
                                     "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert r["onset_ok"]
    assert 6 <= r["onset_count"] <= 9
    assert r["tempo_bpm"] is not None
    assert 105 <= r["tempo_bpm"] <= 130


def test_onset_stationary_tone_has_few_onsets():
    sr = 16000
    pcm = _tone(sr, 2000, 220.0)
    out = OnsetTempo(sr=sr)(_table([("t", pcm.tobytes(), sr,
                                     "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert r["onset_ok"] and r["onset_count"] <= 2


# ----------------------------------------------------------- TimeStretcher

def test_time_stretch_lengthens_and_preserves_pitch():
    sr = 16000
    freq = 440.0
    pcm = _tone(sr, 1000, freq)
    for rate in (1.5, 0.75):
        out = TimeStretcher(rate=rate)(_table(
            [("s", pcm.tobytes(), sr, "pcm_s16le")]))
        r = out.to_pylist()[0]
        assert r["stretch_ok"] and r["codec"] == "pcm_s16le"
        got = np.frombuffer(r["bytes"], "<i2")
        ratio = len(got) / len(pcm)
        assert abs(ratio - rate) < 0.08, (rate, ratio)
        # dominant frequency unchanged (pitch preserved)
        mid = got[len(got) // 4: 3 * len(got) // 4].astype(np.float64)
        spec = np.abs(np.fft.rfft(mid))
        f_dom = np.argmax(spec) * sr / len(mid)
        assert abs(f_dom - freq) < 10.0, (rate, f_dom)
        assert r["dur_ms"] == int(len(got) * 1000 / sr)


def test_time_stretch_flags_undecodable():
    out = TimeStretcher(rate=1.2)(_table(
        [("bad", b"\x00", 16000, "opus")]))
    r = out.to_pylist()[0]
    # keep-original-payload contract: a failed row is FLAGGED but its
    # audio bytes and codec survive untouched (sibling-stage rule)
    assert not r["stretch_ok"]
    assert r["bytes"] == b"\x00" and r["codec"] == "opus"


# ------------------------------------------------------------ AudioChunker

def test_chunker_counts_and_slices():
    sr = 16000
    pcm = _tone(sr, 1000, 220.0)                 # 16000 samples
    chunk, hop = 400, 200                        # ms -> 6400 / 3200 smp
    out = AudioChunker(chunk_ms=chunk, hop_ms=hop)(_table(
        [("a", pcm.tobytes(), sr, "pcm_s16le")]))
    rows = out.to_pylist()
    nch = (16000 - 6400) // 3200 + 1             # = 4
    assert len(rows) == nch
    assert [r["chunk_idx"] for r in rows] == list(range(nch))
    assert all(r["n_chunks"] == nch for r in rows)
    assert all(len(r["bytes"]) == 6400 * 2 for r in rows)
    # chunk 1 starts at hop samples
    got = np.frombuffer(rows[1]["bytes"], "<i2")
    np.testing.assert_array_equal(got, pcm[3200:3200 + 6400])
    assert rows[1]["chunk_start_ms"] == 200


def test_chunker_short_and_bad_rows_drop():
    sr = 16000
    short = _tone(sr, 100, 220.0)                # < chunk -> 0 rows
    out = AudioChunker(chunk_ms=400, hop_ms=200)(_table([
        ("short", short.tobytes(), sr, "pcm_s16le"),
        ("bad", b"xx", sr, "mp3"),
    ]))
    assert out.num_rows == 0


def test_chunker_in_ray_pipeline(ray_session):
    import ray.data

    from jschon_ray.sources.clips import generate_clips
    from jschon_ray.stages.taskpool import stage_fn

    tbl = generate_clips(200, seed=11)
    ds = ray.data.from_arrow(tbl).map_batches(
        stage_fn(AudioChunker, chunk_ms=200, hop_ms=100),
        batch_format="pyarrow", batch_size=64)
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert t.num_rows > 0
    # every chunk payload is exactly chunk_ms of its clip's rate
    df = t.to_pandas()
    assert (df["bytes"].str.len()
            == (df["sr_hz"] * 200 // 1000) * 2).all()


# ---------------------------------------------------------- SilenceTrimmer

def test_trimmer_cuts_leading_trailing_silence():
    from jschon_ray.stages.analysis import SilenceTrimmer

    sr = 16000
    sil = np.zeros(sr // 2, "<i2")                 # 500 ms silence
    tone = _tone(sr, 400, 220.0)
    pcm = np.concatenate([sil, tone, sil])
    out = SilenceTrimmer(pad_frames=0)(_table(
        [("a", pcm.tobytes(), sr, "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert r["trim_ok"]
    got = np.frombuffer(r["bytes"], "<i2")
    # kept within one frame (20ms) of the tone length
    assert abs(len(got) - len(tone)) <= 2 * (sr * 20 // 1000)
    assert r["trimmed_ms"] >= 900
    assert np.abs(got.astype(np.int32)).max() > 1000   # tone retained


def test_trimmer_all_silent_flags_false():
    from jschon_ray.stages.analysis import SilenceTrimmer

    sr = 16000
    pcm = np.zeros(sr, "<i2")
    out = SilenceTrimmer()(_table([("s", pcm.tobytes(), sr,
                                    "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert not r["trim_ok"]
    assert r["bytes"] == pcm.tobytes()     # original payload kept


# -------------------------------------------------------------- Compressor

def test_compressor_reduces_dynamic_range():
    from jschon_ray.stages.analysis import AudioQC, Compressor

    sr = 16000
    quiet = _tone(sr, 400, 220.0, amp=0.05)
    loud = _tone(sr, 400, 220.0, amp=0.9)
    pcm = np.concatenate([quiet, loud])
    t = _table([("d", pcm.tobytes(), sr, "pcm_s16le")])
    comp = Compressor(threshold_db=-20.0, ratio=8.0,
                      attack_frames=1, release_frames=1)(t)
    r = comp.to_pylist()[0]
    assert r["compress_ok"] and r["mean_gain_db"] < 0
    got = np.frombuffer(r["bytes"], "<i2").astype(np.float64) / 32768
    # loud half attenuated, quiet half ~untouched
    q_rms = np.sqrt((got[:len(quiet)] ** 2).mean())
    l_rms = np.sqrt((got[len(quiet):] ** 2).mean())
    q0 = 0.05 / np.sqrt(2)
    l0 = 0.9 / np.sqrt(2)
    assert q_rms > 0.8 * q0                  # quiet passes through
    assert l_rms < 0.55 * l0                 # loud compressed hard
    # dynamic range (ratio of halves) shrank
    assert (l_rms / q_rms) < 0.7 * (l0 / q0)


def test_compressor_below_threshold_is_identityish():
    from jschon_ray.stages.analysis import Compressor

    sr = 16000
    pcm = _tone(sr, 300, 220.0, amp=0.05)    # ~-29 dBFS < threshold
    out = Compressor(threshold_db=-20.0, ratio=4.0)(_table(
        [("q", pcm.tobytes(), sr, "pcm_s16le")]))
    r = out.to_pylist()[0]
    got = np.frombuffer(r["bytes"], "<i2")
    assert r["mean_gain_db"] == 0.0
    np.testing.assert_allclose(got, pcm, atol=1)


# --------------------------------------------------------------- WavWriter

def test_wav_writer_roundtrip():
    from jschon_ray.stages.analysis import WavWriter
    from jschon_ray.stages.decode import decode_clip

    sr = 22050
    pcm = _tone(sr, 300, 220.0)
    out = WavWriter()(_table([("w", pcm.tobytes(), sr, "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert r["wav_ok"] and r["codec"] == "wav"
    assert len(r["bytes"]) == 44 + 2 * len(pcm)
    got, got_sr = decode_clip(r["bytes"], "wav")
    assert got_sr == sr
    np.testing.assert_array_equal(got, pcm)


def test_wav_writer_flags_undecodable():
    from jschon_ray.stages.analysis import WavWriter

    out = WavWriter()(_table([("bad", b"\x01", 16000, "flac")]))
    r = out.to_pylist()[0]
    assert not r["wav_ok"] and r["codec"] == "flac"
    assert r["bytes"] == b"\x01"


# ------------------------------------------------------------- PitchShifter

def test_pitch_shift_octave_up_doubles_frequency():
    from jschon_ray.stages.analysis import PitchShifter

    sr = 16000
    freq = 440.0
    pcm = _tone(sr, 1000, freq)
    out = PitchShifter(semitones=12.0)(_table(
        [("p", pcm.tobytes(), sr, "pcm_s16le")]))
    r = out.to_pylist()[0]
    assert r["shift_ok"] and r["codec"] == "pcm_s16le"
    got = np.frombuffer(r["bytes"], "<i2")
    # duration preserved within a frame
    assert abs(len(got) - len(pcm)) < 1024
    mid = got[len(got) // 4: 3 * len(got) // 4].astype(np.float64)
    spec = np.abs(np.fft.rfft(mid))
    f_dom = np.argmax(spec) * sr / len(mid)
    assert abs(f_dom - 2 * freq) < 20.0, f_dom


def test_pitch_shift_down_and_bad_rows():
    from jschon_ray.stages.analysis import PitchShifter

    sr = 16000
    pcm = _tone(sr, 800, 440.0)
    out = PitchShifter(semitones=-12.0)(_table([
        ("d", pcm.tobytes(), sr, "pcm_s16le"),
        ("bad", b"\x00", sr, "mp3"),
    ]))
    rows = {r["clip_id"]: r for r in out.to_pylist()}
    got = np.frombuffer(rows["d"]["bytes"], "<i2")
    mid = got[len(got) // 4: 3 * len(got) // 4].astype(np.float64)
    f_dom = np.argmax(np.abs(np.fft.rfft(mid))) * sr / len(mid)
    assert abs(f_dom - 220.0) < 15.0, f_dom
    assert not rows["bad"]["shift_ok"]
    assert rows["bad"]["bytes"] == b"\x00"     # original kept
