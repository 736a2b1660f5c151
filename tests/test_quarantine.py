"""quarantine_split: one validate pass, two partitioned sinks."""

import glob

import pyarrow.parquet as pq

from jschon_ray.pipelines.quarantine import quarantine_split
from jschon_ray.sources.clips import generate_clips
from jschon_ray.sources.io import read_table

SPEC = {
    "$id": "https://jschon-ray.dev/specs/clips-quarantine",
    "type": "object",
    "required": ["clip_id", "codec"],
    "properties": {
        "codec": {"enum": ["pcm_s16le", "wav", "flac", "opus", "mp3"]},
        "sr_hz": {"enum": [8000, 16000, 22050, 44100, 48000]},
    },
}


def test_quarantine_split_routes_and_counts(ray_session, tmp_path):
    import ray.data

    t = generate_clips(400, seed=13, dirty=True)
    ds = ray.data.from_arrow(t).repartition(4)
    s = quarantine_split(ds, SPEC, str(tmp_path))
    assert s["n"] == 400
    assert s["n_clean"] + s["n_quarantined"] == 400
    assert s["n_quarantined"] > 0          # dirty rows exist

    clean = pq.read_table(glob.glob(s["clean_dir"] + "/*.parquet")[0]
                          .rsplit("/", 1)[0])
    quar = read_table(s["quarantine_dir"]).to_pandas()
    assert len(quar) == s["n_quarantined"]
    # clean sink: bookkeeping dropped, payload kept
    assert "valid" not in clean.column_names
    assert "violations" not in clean.column_names
    assert "bytes" in clean.column_names
    # quarantine sink: violations kept, payload dropped
    assert "violations" in quar.columns
    assert "bytes" not in quar.columns
    assert (~quar["valid"]).all()
    # re-validating the clean sink yields zero violations
    s2 = quarantine_split(read_table(s["clean_dir"]), SPEC,
                          str(tmp_path / "second"))
    assert s2["n_quarantined"] == 0 and s2["n"] == s["n_clean"]
