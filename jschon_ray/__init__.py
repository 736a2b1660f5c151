"""jschon_ray — a Ray-Data-native constraint-validation engine.

A from-scratch re-expression of the semantics of jschon
(marksparkza/jschon, the reference evaluator at /root/reference) as
vectorized Arrow-batch predicates running in Ray Data pipelines, plus the
dataset-scale capabilities a 10^12-row audio+transcript table needs
(uniqueness via shuffle, referential semi-joins, mergeable sketches,
distribution-drift tests, checkpoint/resume, dedup, similarity search).

Layout:
  vspec/      declarative validation specs (jschon-keyword-shaped) compiled
              into vectorized per-column Arrow checks; per-row Python oracle
              for parity (reference semantics: jschon/jsonschema.py:191-220)
  sources/    table IO seam (parquet now, lance-ready) + synthetic clip table
  stages/     map_batches stage callables (validators, decoders, text, dedup)
  state/      mergeable sketches (t-digest, HLL, count-min), profiles, drift,
              partition manifests for checkpoint/resume
  pipelines/  end-to-end Dataset pipelines and the driver query registry

Library code never calls ray.init()/ray.shutdown(); sessions are owned by
bench.py / test fixtures / the driver.
"""

__version__ = "0.1.0"


def register_for_pickle_by_value() -> None:
    """Ship jschon_ray code to Ray workers by value (cloudpickle).

    On a real cluster the package is installed on every node; in ad-hoc
    sessions (driver-run entrypoints, notebooks) workers may not have the
    repo on sys.path. Registering the package's modules for by-value
    pickling makes map_batches callables self-contained — the compiled
    plans they carry are small, so the overhead is negligible.
    """
    import sys

    from ray import cloudpickle

    for name, mod in list(sys.modules.items()):
        if name == __name__ or name.startswith(__name__ + "."):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass
