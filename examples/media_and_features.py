"""Multimodal stages driven directly (no Ray session needed): the same
callable-class actors that `map_batches` runs in a pool are plain
batch->batch functions, so they compose and test standalone.

Mirrors the reference's example pattern
(/root/reference/examples/*.py -> golden stdout).
"""

import numpy as np

from jschon_ray.sources.clips import generate_clips
from jschon_ray.stages.features import AudioFeatures
from jschon_ray.stages.media import (FrameSampler, ImageDecoder,
                                     ImageResizer, decode_image,
                                     synth_image_table, synth_video_table)

# --- audio: framed-FFT spectral features --------------------------------
clips = generate_clips(6, seed=21, dirty=False)
feats = AudioFeatures()(clips)
print("audio features (6 clean clips):")
for i in range(feats.num_rows):
    print(f"  {feats['clip_id'][i].as_py()}  ok={feats['feat_ok'][i].as_py()}"
          f"  zcr={feats['zcr'][i].as_py():.4f}"
          f"  centroid={feats['spec_centroid_hz'][i].as_py():.1f}Hz"
          f"  rolloff={feats['spec_rolloff_hz'][i].as_py():.1f}Hz")

# --- images: decode -> features, then resize ----------------------------
imgs = synth_image_table(4, compressed_every=3)   # rows 0 and 3 are stubs
dec = ImageDecoder()(imgs)
print("\nimage features (raw real, compressed stubbed):")
for i in range(dec.num_rows):
    err = dec["decode_error"][i].as_py()
    if dec["decode_ok"][i].as_py():
        print(f"  {dec['img_id'][i].as_py()}  px_mean="
              f"{dec['px_mean'][i].as_py():.2f}  hist8={dec['hist8'][i].as_py()}")
    else:
        print(f"  {dec['img_id'][i].as_py()}  STUB: {err.split(':')[0]}")

small = ImageResizer(8, 6)(imgs)
okrow = small.filter(small["resize_ok"].combine_chunks())
img = decode_image(okrow["bytes"][0].as_py(), "raw", 8, 6, 3)
print(f"\nresized {okrow['img_id'][0].as_py()} -> shape {img.shape},"
      f" mean {img.astype(float).mean():.2f}")

# --- video: frame sampling explodes rows --------------------------------
vids = synth_video_table(2, frames=24)
frames = FrameSampler(every_k=8)(vids)
print(f"\nframe sampling: {vids.num_rows} videos x 24 frames, every 8th ->"
      f" {frames.num_rows} rows")
print("  sampled frame_idx:", sorted(set(frames["frame_idx"].to_pylist())))
checks = np.unique(frames["format"].to_pylist())
print("  output format:", list(checks))
