"""Task-pool wrappers for light-state stages.

The actor-pool recipe (callable class, ``concurrency=N``) is right when
per-worker setup is EXPENSIVE — model loads, big indexes. The audio DSP
stages hold only tiny derived state (a 512-float Hann window, a
~KB mel filterbank), and measurements showed the actor boundary itself
was the cost: an ActorPoolMapOperator cannot fuse with the upstream
read, so every payload byte takes an extra object-store hop and the
pool's transfer queue gates throughput (audio_features over 100k clips:
19-47 s as an actor pool vs 9-15 s as a task pool on the same input —
the stage's own compute is ~0.5 s).

``stage_fn(Cls, **kwargs)`` returns a picklable plain function for
``map_batches`` whose instance is constructed ONCE PER WORKER PROCESS
and cached — the task-pool analogue of actor ``__init__`` state. Use it
for stages whose construction is cheap and deterministic; keep real
actor pools for heavy-state stages.
"""

from __future__ import annotations

import functools

from ..state.allocator import tune_worker_allocator

_PROC_CACHE: dict = {}


def _apply_stage(batch, *, _cls, _kw):
    key = (_cls, _kw)
    inst = _PROC_CACHE.get(key)
    if inst is None:
        # first touch in this worker process: pin the allocator before
        # the first big decode/FFT allocation (state/allocator.py)
        tune_worker_allocator()
        inst = _PROC_CACHE[key] = _cls(**dict(_kw))
    return inst(batch)


def stage_fn(cls, **kwargs):
    """A map_batches-ready function applying ``cls(**kwargs)`` with the
    instance cached per worker process. kwargs must be hashable."""
    return functools.partial(_apply_stage, _cls=cls,
                             _kw=tuple(sorted(kwargs.items())))
