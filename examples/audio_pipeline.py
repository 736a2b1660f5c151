"""The canonical audio chain driven standalone (no Ray session): decode ->
resample -> VAD segmentation -> log-mel features. The same callable
classes run as actor pools in pipelines (`map_batches(Cls, ...)`).

Mirrors the reference's golden-output example pattern
(/root/reference/tests/test_examples.py:9-28).
"""

import numpy as np

from jschon_ray.sources.clips import generate_clips
from jschon_ray.stages.audio_ops import (
    AudioResampler,
    MelSpectrogram,
    VADSegments,
)

clips = generate_clips(6, seed=21, dirty=False)
print("input sample rates:", [s for s in clips["sr_hz"].to_pylist()])

res = AudioResampler(target_sr=16000)(clips)
print("\nresampled to 16 kHz:")
for i in range(res.num_rows):
    print(f"  {res['clip_id'][i].as_py()}  ok={res['resample_ok'][i].as_py()}"
          f"  n_samples={res['n_samples'][i].as_py()}")

vad = VADSegments(frame_ms=20)(res)
print("\nvoice-activity segments (synthetic tones are always 'active'):")
for i in range(vad.num_rows):
    segs = vad["segments"][i].as_py()
    ratio = vad["speech_ratio"][i].as_py()
    print(f"  {vad['clip_id'][i].as_py()}  n_segments={len(segs)}"
          f"  speech_ratio={ratio:.2f}")

mel = MelSpectrogram(sr=16000, n_mels=40)(res)
print("\nlog-mel features (peak band tracks the clip's tone):")
for i in range(mel.num_rows):
    v = mel["mel_mean"][i].as_py()
    print(f"  {mel['clip_id'][i].as_py()}  ok={mel['mel_ok'][i].as_py()}"
          f"  peak_band={int(np.argmax(v))}"
          f"  frames={mel['mel_frames'][i].as_py()}")
