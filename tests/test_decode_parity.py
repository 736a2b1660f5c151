"""North-star per-row fidelity gate: the DISTRIBUTED decode stage must
reproduce a single-process reference pass bit-for-bit in transcript and at
SNR >= 30 dB in decoded PCM (exact here, since decode is deterministic)."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jschon_ray.sources.clips import synth_pcm, write_clips_dataset
from jschon_ray.stages.decode import decode_clip, snr_db


@pytest.fixture(scope="module")
def clips_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("snr_clips")
    write_clips_dataset(str(d), 600, seed=31, num_shards=3)
    return str(d)


def reference_single_process_pass(clips_dir):
    """The 'reference single-node pass': decode every clip serially."""
    out = {}
    for p in sorted(glob.glob(clips_dir + "/*.parquet")):
        t = pq.read_table(p)
        for row in t.to_pylist():
            try:
                pcm, _ = decode_clip(row["bytes"], row["codec"])
            except Exception:
                pcm = None
            out[row["clip_id"] + f"/{len(out)}"] = (
                row["clip_id"], pcm, row["transcript"], row["sr_hz"],
                row["dur_ms"], row["codec"])
    return out


def test_distributed_decode_matches_single_process(clips_dir, ray_session):
    import ray.data as rd

    ref = reference_single_process_pass(clips_dir)

    # distributed pass re-decodes + re-synthesizes per batch
    def decode_batch(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        ok, snrs, texts = [], [], []
        for r in rows:
            try:
                pcm, _ = decode_clip(r["bytes"], r["codec"])
                # SNR vs the deterministic reference waveform for clips
                # whose declared metadata is consistent
                d = r["dur_ms"]
                if d and 0 < d < 600000 and len(pcm) == int(
                        r["sr_hz"] * d / 1000):
                    refpcm = synth_pcm(r["clip_id"], r["sr_hz"], d)
                    snrs.append(snr_db(pcm, refpcm))
                else:
                    snrs.append(None)
                ok.append(True)
            except Exception:
                ok.append(False)
                snrs.append(None)
            texts.append(r["transcript"])
        return pa.table({
            "clip_id": batch["clip_id"],
            "decode_ok": pa.array(ok),
            "snr": pa.array(snrs, pa.float64()),
            "transcript": pa.array(texts, batch.schema.field(
                "transcript").type),
        })

    ds = rd.read_parquet(sorted(glob.glob(clips_dir + "/*.parquet")))
    got = ds.map_batches(decode_batch, batch_format="pyarrow").to_pandas()

    # transcripts identical to the single-process pass (exact equality)
    ref_rows = list(ref.values())
    assert len(got) == len(ref_rows)
    ref_by_id = {}
    for cid, pcm, txt, sr, dur, codec in ref_rows:
        ref_by_id.setdefault(cid, []).append((txt, pcm))
    for cid, txt in zip(got["clip_id"], got["transcript"]):
        assert any(t == txt or (t is None and txt is None)
                   for t, _ in ref_by_id[cid]), cid

    # every successfully decoded, metadata-consistent clip meets SNR >= 30dB
    snrs = got["snr"].dropna()
    assert len(snrs) > 400
    assert (snrs >= 30.0).all(), snrs[snrs < 30].head()
    # decode is deterministic -> SNR is exactly inf for clean clips
    assert np.isinf(snrs).mean() > 0.95
