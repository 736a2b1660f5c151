"""Audio decode stage: actor-pool map_batches over binary payloads.

The reference's ``format`` keyword concept (opt-in assertion backed by a
registered validator, /root/reference/jschon/vocabulary/format.py:14-32)
lifted to a dataset stage: decode each clip's ``bytes`` per ``codec``,
assert decodability + consistency with the declared (sr_hz, dur_ms), and
optionally emit decoded-PCM features.

Real decoders (no external libs needed):
  * pcm_s16le — raw little-endian int16 frames (numpy frombuffer)
  * wav       — RIFF/WAVE container parse (stdlib struct)
Sandbox stubs (clearly marked): flac/opus/mp3 — no codec libraries in this
container. If ``soundfile`` is importable we'd use it (import-try below);
otherwise payloads carry the deterministic FAKE container written by
sources/clips.py (b'FAKE<codec>' + s16le PCM) and we decode that, or raise
NotImplementedError for real compressed data.

Scale notes: bytes-heavy rows -> run with small batch_size (64-256) and
``concurrency`` sized to the node; PCM arrays never leave the stage (only
small per-row features do), so blocks stay bounded.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

try:  # real codec path, absent in this sandbox
    import soundfile  # noqa: F401
    HAVE_SOUNDFILE = True
except ImportError:
    HAVE_SOUNDFILE = False


class DecodeError(ValueError):
    pass


def decode_pcm_s16le(payload: bytes) -> np.ndarray:
    if len(payload) % 2:
        raise DecodeError(f"odd payload length {len(payload)}")
    return np.frombuffer(payload, dtype="<i2")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a canonical mono 16-bit RIFF/WAVE payload -> (pcm, sr)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecodeError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt ":
        raise DecodeError("missing fmt chunk")
    (_sz, fmt, ch, sr, _br, _ba, bits) = struct.unpack("<IHHIIHH",
                                                       payload[16:36])
    if fmt != 1 or ch != 1 or bits != 16:
        raise DecodeError(f"unsupported wav format fmt={fmt} ch={ch} bits={bits}")
    if payload[36:40] != b"data":
        raise DecodeError("missing data chunk")
    (dlen,) = struct.unpack("<I", payload[40:44])
    data = payload[44:44 + dlen]
    if len(data) < dlen:
        raise DecodeError(f"truncated data chunk ({len(data)} < {dlen})")
    return np.frombuffer(data, dtype="<i2"), sr


def decode_fake_container(payload: bytes, codec: str) -> np.ndarray:
    """SANDBOX STUB: deterministic fake for flac/opus/mp3 (see module doc)."""
    magic = b"FAKE" + codec.encode().ljust(8, b"\0")
    if not payload.startswith(magic):
        if HAVE_SOUNDFILE:  # pragma: no cover - not in this container
            import io
            import soundfile as sf
            data, _sr = sf.read(io.BytesIO(payload), dtype="int16")
            return np.asarray(data, dtype="<i2")
        raise NotImplementedError(
            f"real {codec} decoding requires a codec library not present "
            "in this sandbox")
    return decode_pcm_s16le(payload[len(magic):])


def decode_clip(payload: bytes, codec: str) -> tuple[np.ndarray, int | None]:
    """-> (pcm int16 array, container-declared sr or None)."""
    if codec == "pcm_s16le":
        return decode_pcm_s16le(payload), None
    if codec == "wav":
        pcm, sr = decode_wav(payload)
        return pcm, sr
    if codec in ("flac", "opus", "mp3"):
        return decode_fake_container(payload, codec), None
    raise DecodeError(f"unknown codec {codec!r}")


def snr_db(signal: np.ndarray, reference: np.ndarray) -> float:
    """SNR of `signal` vs `reference` in dB (inf when identical)."""
    n = min(len(signal), len(reference))
    if n == 0 or len(signal) != len(reference):
        return float("-inf")
    s = reference.astype(np.float64)
    e = signal.astype(np.float64) - s
    ps = float(np.mean(s * s))
    pe = float(np.mean(e * e))
    if pe == 0.0:
        return float("inf")
    if ps == 0.0:
        return float("-inf")
    return 10.0 * np.log10(ps / pe)


class ClipDecoder:
    """map_batches actor: decode + consistency features per clip.

    Output columns appended: decode_ok:bool, decode_error:string,
    n_frames:int64, measured_dur_ms:float64, rms:float64, clipping_ratio:
    float64. Duration consistency: |measured - declared| <= tol_ms.
    """

    def __init__(self, tol_ms: float = 1.5, batch_copy_columns=None):
        self.tol_ms = tol_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        codecs = batch["codec"].to_pylist()
        srs = batch["sr_hz"].to_pylist()
        durs = batch["dur_ms"].to_pylist()
        n = batch.num_rows
        ok = np.zeros(n, bool)
        err = [None] * n
        frames = np.zeros(n, np.int64)
        mdur = np.full(n, np.nan)
        rms = np.full(n, np.nan)
        clip_ratio = np.full(n, np.nan)
        for i in range(n):
            if payloads[i] is None or codecs[i] is None:
                err[i] = "missing payload or codec"
                continue
            try:
                pcm, declared_sr = decode_clip(payloads[i], codecs[i])
            except (DecodeError, NotImplementedError) as e:
                err[i] = f"{type(e).__name__}: {e}"
                continue
            frames[i] = len(pcm)
            sr = srs[i]
            if declared_sr is not None and sr is not None \
                    and declared_sr != sr:
                err[i] = (f"container sample rate {declared_sr} != declared "
                          f"sr_hz {sr}")
                continue
            if sr and sr > 0:
                mdur[i] = 1000.0 * len(pcm) / sr
                if durs[i] is not None and durs[i] > 0 and \
                        abs(mdur[i] - durs[i]) > self.tol_ms + 1000.0 / sr:
                    err[i] = (f"duration mismatch: measured {mdur[i]:.1f}ms "
                              f"!= declared {durs[i]}ms")
                    continue
            if len(pcm):
                f = pcm.astype(np.float64)
                rms[i] = float(np.sqrt(np.mean(f * f)))
                clip_ratio[i] = float(np.mean(np.abs(pcm) >= 32767))
            ok[i] = True
        out = batch.drop_columns(["bytes"])
        out = out.append_column("decode_ok", pa.array(ok))
        out = out.append_column("decode_error", pa.array(err, pa.string()))
        out = out.append_column("n_frames", pa.array(frames))
        out = out.append_column("measured_dur_ms", pa.array(mdur))
        out = out.append_column("rms", pa.array(rms))
        out = out.append_column("clipping_ratio", pa.array(clip_ratio))
        return out


def audio_decodable_format(tol_ms: float = 1.5):
    """A `format: "audio-decodable"` validator over struct instances —
    the per-row fallback path analogue of ClipDecoder for vspec specs."""

    def validate(row) -> None:
        if not isinstance(row, dict):
            raise ValueError("not a clip object")
        try:
            pcm, declared_sr = decode_clip(row.get("bytes"), row.get("codec"))
        except (DecodeError, NotImplementedError, TypeError) as e:
            raise ValueError(str(e)) from None
        sr = row.get("sr_hz")
        if declared_sr is not None and sr and declared_sr != sr:
            raise ValueError(f"container sr {declared_sr} != sr_hz {sr}")

    return validate
