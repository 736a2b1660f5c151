"""Exact substring (character-window) cross-document duplication audit —
functions/dedup.py substring_dup_spans vs a brute-force string oracle.

The bounded form of suffix-array exact-substring dedup (Lee et al. 2022);
corpus-granularity complement of the reference's within-row uniqueItems
(/root/reference/jschon/vocabulary/validation.py:163-177)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from jschon_ray.functions.dedup import substring_dup_spans

W, S = 40, 10


def brute(docs):
    """dict doc_id -> (n_windows, n_dup_windows, dup_chars); only docs
    with >= 1 cross-doc duplicated window appear."""
    wins = {}   # window string -> set of doc ids
    per_doc = {}
    for did, text in docs:
        if len(text) < W:
            continue
        starts = range(0, len(text) - W + 1, S)
        per_doc[did] = [(p, text[p:p + W]) for p in starts]
        for _, w in per_doc[did]:
            wins.setdefault(w, set()).add(did)
    out = {}
    for did, lst in per_doc.items():
        dup_pos = [p for p, w in lst if len(wins[w]) >= 2]
        if not dup_pos:
            continue
        cover = 0
        for i, p in enumerate(dup_pos):
            nxt = dup_pos[i + 1] if i + 1 < len(dup_pos) else None
            cover += W if nxt is None else min(nxt - p, W)
        out[did] = (len(lst), len(dup_pos), cover)
    return out


def run(docs):
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs], pa.string())})
    ds = ray.data.from_arrow(t)
    got = substring_dup_spans(ds, id_col="doc_id", col="text",
                              window=W, stride=S).to_pandas()
    return {int(r.doc_id): (int(r.n_windows), int(r.n_dup_windows),
                            int(r.dup_chars))
            for r in got.itertuples()}


def test_substring_dup_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
    docs = []
    base = " ".join(rng.choice(vocab, 60))
    for i in range(30):
        body = " ".join(rng.choice(vocab, int(rng.integers(10, 80))))
        if i % 5 == 0:    # plant a shared 120-char span
            body = body[:20] + base[:120] + body[20:]
        docs.append((i, body))
    # short doc below the window size: contributes nothing
    docs.append((99, "tiny"))
    assert run(docs) == brute(docs)


def test_substring_dup_non_ascii_char_alignment(ray_session):
    # UTF-32 code-point hashing must agree with Python char slicing
    span = "naïve café – ünïcode ø " * 4
    docs = [(1, "x" * 7 + span + "y" * 33),
            (2, "z" * 13 + span + "w" * 27),
            (3, "unrelated " * 12)]
    assert run(docs) == brute(docs)


def test_substring_dup_self_repeat_not_cross_doc(ray_session):
    # a span repeated WITHIN one doc only is not cross-doc duplicated
    rep = "q" * 120
    docs = [(1, rep + "-" * 30 + rep), (2, "other " * 40)]
    assert run(docs) == brute(docs) == {}
