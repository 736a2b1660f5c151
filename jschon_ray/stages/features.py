"""Audio feature extraction: framed-FFT spectral features as an actor stage.

The training-data-pipeline companion to `stages/decode.py`'s consistency
checks: per clip, decode PCM and compute zero-crossing rate, energy, and
spectral shape (centroid / bandwidth / rolloff / flatness) from averaged
Hann-windowed frame spectra.

Vectorization: frames from EVERY clip in the batch are stacked into one
(total_frames, frame_len) float32 matrix — a single `np.fft.rfft` call per
batch — then per-clip spectra are recovered with `np.add.reduceat` over
frame offsets. No per-frame Python loop; the only per-row work is the
payload decode (shared with ClipDecoder's semantics, decode.py:81-90).

Analogue of the reference's opt-in `format` assertion stage
(/root/reference/jschon/vocabulary/format.py:14-32): an expensive,
stateful, payload-reading check that runs as its own actor-pool
map_batches stage with a small batch size, never inside the scalar
predicate pass and never ahead of a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .decode import DecodeError, decode_clip

FEATURE_COLUMNS = ("feat_ok", "zcr", "energy_db", "spec_centroid_hz",
                   "spec_bandwidth_hz", "spec_rolloff_hz", "spec_flatness")


class AudioFeatures:
    """map_batches actor appending the FEATURE_COLUMNS.

    Clips shorter than one frame are zero-padded to a single frame;
    undecodable or empty clips get feat_ok=False and NaN features.

    Use: ds.map_batches(AudioFeatures, batch_format="pyarrow",
                        batch_size=512, concurrency=N)
    """

    def __init__(self, frame_len: int = 512, rolloff: float = 0.85,
                 keep_bytes: bool = False):
        self.frame_len = int(frame_len)
        self.rolloff = float(rolloff)
        self.keep_bytes = keep_bytes
        self.window = np.hanning(self.frame_len).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        L = self.frame_len
        ok = np.zeros(n, bool)
        zcr = np.full(n, np.nan)
        energy_db = np.full(n, np.nan)
        centroid = np.full(n, np.nan)
        bandwidth = np.full(n, np.nan)
        rolloff_hz = np.full(n, np.nan)
        flatness = np.full(n, np.nan)

        payloads = batch["bytes"].to_pylist()
        codecs = batch["codec"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)

        frames: list[np.ndarray] = []
        frame_counts: list[int] = []
        rows: list[int] = []
        for i in range(n):
            if payloads[i] is None or codecs[i] is None:
                continue
            try:
                pcm, _ = decode_clip(payloads[i], codecs[i])
            except (DecodeError, NotImplementedError):
                continue
            if not len(pcm) or not srs[i] or srs[i] <= 0:
                continue
            f = pcm.astype(np.float32) / 32768.0
            # time-domain features on the full signal
            zcr[i] = float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1]))) \
                if len(f) > 1 else 0.0
            ms = float(np.mean(f * f))
            energy_db[i] = 10.0 * np.log10(ms) if ms > 0 else -120.0
            nf = len(f) // L
            if nf == 0:
                pad = np.zeros(L, np.float32)
                pad[:len(f)] = f
                fr = pad[None, :]
                nf = 1
            else:
                fr = f[:nf * L].reshape(nf, L)
            frames.append(fr)
            frame_counts.append(nf)
            rows.append(i)
            ok[i] = True

        if rows:
            stack = np.concatenate(frames) * self.window
            mag = np.abs(np.fft.rfft(stack, axis=1))
            offsets = np.zeros(len(rows), np.int64)
            np.cumsum(frame_counts[:-1], out=offsets[1:])
            spec = np.add.reduceat(mag, offsets, axis=0) \
                / np.asarray(frame_counts, np.float64)[:, None]

            ridx = np.asarray(rows)
            nbins = spec.shape[1]
            binf = np.arange(nbins, dtype=np.float64)
            hz_per_bin = srs[ridx].astype(np.float64) / L
            tot = spec.sum(axis=1)
            tot = np.where(tot > 0, tot, 1.0)
            cbin = (spec * binf).sum(axis=1) / tot
            centroid[ridx] = cbin * hz_per_bin
            var = (spec * (binf[None, :] - cbin[:, None]) ** 2).sum(axis=1) \
                / tot
            bandwidth[ridx] = np.sqrt(var) * hz_per_bin
            cum = np.cumsum(spec, axis=1)
            roll_bin = np.argmax(
                cum >= self.rolloff * cum[:, -1:], axis=1)
            rolloff_hz[ridx] = roll_bin * hz_per_bin
            safe = np.where(spec > 0, spec, 1e-12)
            flatness[ridx] = np.exp(np.mean(np.log(safe), axis=1)) \
                / (spec.mean(axis=1) + 1e-30)

        out = batch if self.keep_bytes else batch.drop_columns(["bytes"])
        for name, arr in zip(
                FEATURE_COLUMNS,
                (ok, zcr, energy_db, centroid, bandwidth, rolloff_hz,
                 flatness)):
            out = out.append_column(name, pa.array(arr))
        return out


def audio_features(ds, *, concurrency=None, batch_size: int = 512,
                   frame_len: int = 512):
    from ..pipelines.validate import default_concurrency

    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
        fn_constructor_kwargs={"frame_len": frame_len})
