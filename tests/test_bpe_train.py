"""BPE merge-training parity: the distributed trainer must learn the
exact merge table a straightforward single-process Sennrich-style
implementation learns (same tie-breaks), under any block split."""

import pandas as pd
import pytest


def reference_bpe(texts, n_merges, end="▁", min_pair_count=2):
    from collections import Counter

    freq = Counter()
    for t in texts:
        for w in t.lower().split():
            freq[w] += 1
    words = {w: list(w) + [end] for w in freq}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < min_pair_count:
            break
        merges.append((len(merges) + 1, l, r, c))
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return pd.DataFrame(merges,
                        columns=["rank", "left", "right", "pair_count"])


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest",
    "widest widest the the the of of",
    "lowest lowest newest new new news",
]


@pytest.mark.parametrize("blocks", [1, 4])
def test_bpe_train_matches_reference(ray_session, blocks):
    import ray.data

    from jschon_ray.functions.text import bpe_train

    ds = ray.data.from_items([{"text": t} for t in TEXTS],
                             override_num_blocks=blocks)
    got = bpe_train(ds, n_merges=12)
    want = reference_bpe(TEXTS, 12)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_bpe_train_early_stop(ray_session):
    import ray.data

    from jschon_ray.functions.text import bpe_train

    # every word unique once: after the singleton pairs drop below the
    # floor, training stops before n_merges
    ds = ray.data.from_items([{"text": "ab cd ef"}])
    out = bpe_train(ds, n_merges=50, min_pair_count=2)
    assert len(out) < 50
