"""Training-data prep operators: normalization, repetition stats, PII,
contamination, and the distributed prefix-scan ops (global shuffle rank,
sequence packing). Scan ops are checked for partition invariance — the
defining property of the two-phase scan design (functions/scan.py)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jschon_ray.functions.text import (contamination_batch,
                                       normalize_text_batch, pii_batch,
                                       repetition_batch)


def test_normalize_basic():
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["  A\tB\n\nC ", "already clean", "", "X  Y"]})
    out = normalize_text_batch(t)
    assert out["text_norm"].to_pylist() == ["a b c", "already clean", "",
                                            "x y"]
    assert out["text_norm_chars"].to_pylist() == [5, 13, 0, 3]


def test_normalize_null_passthrough():
    t = pa.table({"doc_id": [1], "text": pa.array([None], pa.string())})
    out = normalize_text_batch(t)
    assert out["text_norm"].to_pylist() == [None]


def test_repetition_counts():
    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["a a a b", "x y z", "", "q q"]})
    out = repetition_batch(t).to_pydict()
    assert out["n_tokens"] == [4, 3, 0, 2]
    assert out["n_distinct"] == [2, 3, 0, 1]
    assert out["top_tok_count"] == [3, 1, 0, 2]


def test_repetition_null_text_is_zero():
    t = pa.table({"doc_id": [7],
                  "text": pa.array([None], pa.string())})
    out = repetition_batch(t).to_pydict()
    assert out["n_tokens"] == [0]
    assert out["top_tok_count"] == [0]


def test_pii_counts_and_redaction_order():
    t = pa.table({"doc_id": [1], "text": [
        "mail a.b+c@ex.org and d@e.io, call 555-123-4567, host 10.0.0.255"]})
    out = pii_batch(t).to_pydict()
    assert out["n_email"] == [2]
    assert out["n_phone"] == [1]
    assert out["n_ipv4"] == [1]
    assert out["redacted"][0] == \
        "mail [EMAIL] and [EMAIL], call [PHONE], host [IP]"


def test_pii_counts_are_pre_redaction():
    # a phone embedded in an email's local part is counted on the ORIGINAL
    # text, but the email redaction (first pass) swallows it
    t = pa.table({"doc_id": [1],
                  "text": ["reach 555-123-4567@example.com now"]})
    out = pii_batch(t).to_pydict()
    assert out["n_email"] == [1]
    assert out["n_phone"] == [1]         # counted pre-redaction
    assert out["redacted"] == ["reach [EMAIL] now"]


def test_contamination_hits():
    t = pa.table({"doc_id": [1, 2],
                  "text": ["the cat sat", "dogs run far"]})
    out = contamination_batch(t, ["cat sat", "run", "absent"]).to_pydict()
    assert out["n_hits"] == [1, 1]
    assert out["contaminated"] == [True, True]
    empty = contamination_batch(t, []).to_pydict()
    assert empty["n_hits"] == [0, 0]


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_global_rank_matches_md5_order_any_partitioning(ray_session, parts):
    import ray.data

    from jschon_ray.functions.scan import global_rank

    ids = [f"id-{i:03d}" for i in range(60)]
    ds = ray.data.from_arrow(pa.table({"k": ids})).repartition(parts)
    out = global_rank(ds, id_col="k", seed=7, num_buckets=16).to_pandas()
    got = out.sort_values("shuffle_rank")["k"].tolist()
    exp = sorted(ids, key=lambda v: hashlib.md5(f"{v}:7".encode())
                 .hexdigest())
    assert got == exp
    assert sorted(out["shuffle_rank"]) == list(range(60))


@pytest.mark.parametrize("parts", [1, 5])
def test_pack_sequences_exclusive_prefix_sum(ray_session, parts):
    import ray.data

    from jschon_ray.functions.scan import pack_sequences

    rng = np.random.default_rng(3)
    n = 80
    toks = rng.integers(1, 40, n)
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": np.arange(n), "n": toks})).repartition(parts)
    out = pack_sequences(ds, id_col="doc_id", tokens_col="n",
                         budget=64, num_buckets=9).to_pandas() \
        .sort_values("doc_id")
    excl = np.cumsum(toks) - toks
    assert (out["pack_id"].to_numpy() == excl // 64).all()
    assert (out["pack_pos"].to_numpy() == excl % 64).all()
    # packs are contiguous in doc order and bounded by the budget
    assert out["pack_id"].is_monotonic_increasing


def test_pack_sequences_doc_larger_than_budget(ray_session):
    import ray.data

    from jschon_ray.functions.scan import pack_sequences

    ds = ray.data.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                       "n": [10, 500, 10]}))
    out = pack_sequences(ds, id_col="doc_id", tokens_col="n",
                         budget=100).to_pandas().sort_values("doc_id")
    # doc 2 straddles packs 0..5; doc 3 starts at token 520 -> pack 5
    assert out["pack_id"].tolist() == [0, 0, 5]


def test_vocab_coverage_matches_bruteforce(ray_session):
    import ray.data

    from jschon_ray.functions.text import build_vocab, vocab_coverage

    docs = ["the cat sat", "the the the dog", "zebra qux", "", "cat dog",
            "The CAT", "dog dog dog", "  spaced   out  "]
    df = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})
    ds = ray.data.from_pandas(df).repartition(3)

    # brute force
    toks = [[t for t in d.lower().split() if t] for d in docs]
    from collections import Counter
    cnt = Counter(t for ts in toks for t in ts)
    vocab_ref = {t for t, c in cnt.items() if c >= 2}
    assert build_vocab(ds, min_count=2) == frozenset(vocab_ref)

    out = vocab_coverage(ds, min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, ts in enumerate(toks):
        assert out["n_tokens"][i] == len(ts)
        assert out["n_oov"][i] == sum(t not in vocab_ref for t in ts)


def test_unigram_logprob_hand_computed(ray_session):
    import math

    import ray.data

    from jschon_ray.functions.text import unigram_logprob

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a a b", "b c", ""]})
    out = unigram_logprob(ray.data.from_pandas(df)).to_pandas() \
        .set_index("doc_id")
    # counts: a=2 b=2 c=1, T=5
    assert out.loc[1, "n_tokens"] == 3
    assert abs(out.loc[1, "avg_logprob"] - math.log(2 / 5)) < 1e-12
    assert abs(out.loc[2, "avg_logprob"]
               - (math.log(2 / 5) + math.log(1 / 5)) / 2) < 1e-12
    assert out.loc[3, "n_tokens"] == 0
    assert pd.isna(out.loc[3, "avg_logprob"])


def test_unigram_logprob_min_count_floor(ray_session):
    import math

    import ray.data

    from jschon_ray.functions.text import unigram_logprob

    df = pd.DataFrame({"doc_id": [1], "text": ["a a rare"]})
    out = unigram_logprob(ray.data.from_pandas(df),
                          min_count=2).to_pandas()
    # 'rare' (count 1 < 2) scores at the ln(min_count/T) floor
    expect = (2 * math.log(2 / 3) + math.log(2 / 3)) / 3
    assert abs(out["avg_logprob"].iloc[0] - expect) < 1e-12


def test_tfidf_top_terms_hand_computed(ray_session):
    import math

    import ray.data

    from jschon_ray.functions.text import tfidf_top_terms

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["apple apple banana", "banana cherry", "cherry date"]})
    out = tfidf_top_terms(ray.data.from_pandas(df).repartition(2), k=2) \
        .to_pandas()
    # N=3; df: apple 1, banana 2, cherry 2, date 1
    t1 = out[out["doc_id"] == 1].sort_values("rk")
    assert t1["tok"].tolist() == ["apple", "banana"]
    assert abs(t1["score"].iloc[0] - round(2 * math.log(3 / 1), 4)) < 1e-9
    t3 = out[out["doc_id"] == 3].sort_values("rk")
    assert t3["tok"].tolist() == ["date", "cherry"]  # ln3 > ln(3/2)


def test_tfidf_min_df_drops_rare_terms(ray_session):
    import ray.data

    from jschon_ray.functions.text import tfidf_top_terms

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["common rare1", "common rare2"]})
    out = tfidf_top_terms(ray.data.from_pandas(df), k=3, min_df=2) \
        .to_pandas()
    assert set(out["tok"]) == {"common"}


def test_chunk_documents_hand_case(ray_session):
    import ray.data

    from jschon_ray.functions.text import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [toks, "a b", ""]})
    out = chunk_documents(ray.data.from_pandas(df), chunk_tokens=4,
                          overlap=1).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_idx")
    # stride 3, starts range(0, max(10-1,1), 3) = 0,3,6 -> wait 9//3: 0,3,6
    assert d1["chunk_text"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert d1["n_chunk_tokens"].tolist() == [4, 4, 4]
    d2 = out[out["doc_id"] == 2]
    assert d2["chunk_text"].tolist() == ["a b"]
    assert (out["doc_id"] != 3).all()  # empty doc -> no chunks


def test_chunk_documents_overlap_coverage(ray_session):
    import ray.data

    from jschon_ray.functions.text import chunk_documents

    rng = np.random.default_rng(6)
    for nt in [1, 5, 63, 64, 65, 100, 129]:
        text = " ".join(f"w{i}" for i in range(nt))
        df = pd.DataFrame({"doc_id": [0], "text": [text]})
        out = chunk_documents(ray.data.from_pandas(df), chunk_tokens=64,
                              overlap=8).to_pandas() \
            .sort_values("chunk_idx")
        seen = []
        for t in out["chunk_text"]:
            seen.extend(t.split())
        # every token covered, in order, with duplicates only at seams
        assert sorted(set(seen)) == sorted(f"w{i}" for i in range(nt))
        starts = list(range(0, max(nt - 8, 1), 56))
        assert len(out) == len(starts)


def test_global_value_rank_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from jschon_ray.functions.scan import global_value_rank

    rng = np.random.default_rng(19)
    df = pd.DataFrame({"id": np.arange(5000),
                       "v": np.round(rng.normal(0, 10, 5000), 3)})
    df.loc[::13, "v"] = 7.7     # heavy ties
    df.loc[::31, "v"] = np.nan  # nulls dropped
    ds = ray.data.from_pandas(df).repartition(6)
    out = global_value_rank(ds, value_col="v", tie_cols=("id",),
                            num_buckets=32).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT id, v, row_number() OVER (ORDER BY v, id) AS rank, "
        "percent_rank() OVER (ORDER BY v, id) AS pct "
        "FROM t WHERE v IS NOT NULL").df() \
        .sort_values("id").reset_index(drop=True)
    assert (out["id"].to_numpy() == exp["id"].to_numpy()).all()
    assert (out["rank"].to_numpy() == exp["rank"].to_numpy()).all()
    assert np.allclose(out["pct"], exp["pct"], atol=0)


def test_lexical_diversity_hand_computed(ray_session):
    """Hand-checked entropy/hapax on tiny docs; empty and null docs
    emit nothing."""
    import math

    import ray.data as rd
    from jschon_ray.functions.text import lexical_diversity_batch

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array(["a a b c", "x x x x", "", None])})
    out = rd.from_arrow(t).map_batches(
        lexical_diversity_batch, batch_format="pyarrow") \
        .to_pandas().set_index("doc_id")
    assert set(out.index) == {0, 1}
    # doc 0: counts {a:2, b:1, c:1}; H = 2 - (2*1)/4 = 1.5
    assert out.loc[0, "n_tokens"] == 4
    assert out.loc[0, "n_distinct"] == 3
    assert out.loc[0, "n_hapax"] == 2
    assert out.loc[0, "token_entropy"] == 1.5
    # doc 1: single repeated token -> zero entropy, zero hapax
    assert out.loc[1, "n_distinct"] == 1
    assert out.loc[1, "n_hapax"] == 0
    assert out.loc[1, "token_entropy"] == 0.0
    assert math.isclose(out.loc[0, "token_entropy"],
                        -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25)))


def test_bpe_token_count_matches_reference_segmentation():
    import pyarrow as pa

    from jschon_ray.functions.text import bpe_token_count_batch

    t = pa.table({"text": pa.array([
        "Hello world, it's 2026!",      # 8 segments
        "",                              # 0
        None,                            # null in -> 0 out (RE2 count)
        "a-b c_d 3.14",                  # 9
    ])})
    out = bpe_token_count_batch(t)
    assert out["n_bpe_tokens"].to_pylist() == [8, 0, None, 9]


def test_compression_ratio_orders_repetitive_below_random():
    import pyarrow as pa

    from jschon_ray.functions.text import compression_ratio_batch

    rep = "spam and eggs " * 50
    import numpy as np
    rng = np.random.default_rng(5)
    rand = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 700))
    t = pa.table({"text": pa.array([rep, rand, "tiny", None])})
    out = compression_ratio_batch(t)
    r = out["zlib_ratio"].to_pylist()
    assert r[0] < 0.1 < r[1]            # repetition crushes, noise doesn't
    assert r[2] is None and r[3] is None


def test_dsir_logratio_vs_bruteforce(ray_session):
    """DSIR hashed importance weights match a pure-Python model built
    over the same {unigram,bigram} features, and docs drawn from the
    target distribution outscore off-target docs."""
    import hashlib
    import math

    import ray.data as rd

    from jschon_ray.functions.text import dsir_logratio

    B = 64
    tgt_words = ["alpha", "beta", "gamma", "delta"]
    off_words = ["uno", "dos", "tres", "quatro"]
    rng = np.random.default_rng(3)
    docs, langs = [], []
    for i in range(30):
        on_target = i % 2 == 0
        pool = tgt_words if on_target else off_words
        docs.append(" ".join(rng.choice(pool, int(rng.integers(3, 12)))))
        langs.append("en" if on_target else "xx")

    # brute force: identical features, hashing, smoothing
    def feats(d):
        ws = [w for w in d.lower().split(" ") if w]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B

    c_raw, c_tgt = [0] * B, [0] * B
    for d, lg in zip(docs, langs):
        for f in feats(d):
            h = bucket(f)
            c_raw[h] += 1
            if lg == "en":
                c_tgt[h] += 1
    t_raw, t_tgt = sum(c_raw), sum(c_tgt)
    want = []
    for d in docs:
        lr = sum(math.log((c_tgt[bucket(f)] + 1.0) / (t_tgt + B))
                 - math.log((c_raw[bucket(f)] + 1.0) / (t_raw + B))
                 for f in feats(d))
        want.append(round(lr, 4))

    ds = rd.from_items([
        {"doc_id": i, "text": d, "lang": lg}
        for i, (d, lg) in enumerate(zip(docs, langs))]).repartition(4)
    got = dsir_logratio(ds, num_buckets=B).to_pandas() \
        .set_index("doc_id").sort_index()
    assert len(got) == len(docs)
    for i in range(len(docs)):
        assert abs(got.loc[i, "log_ratio"] - want[i]) < 1e-9, i
    # separation: every on-target doc outscores every off-target doc
    on = [got.loc[i, "log_ratio"] for i in range(0, 30, 2)]
    off = [got.loc[i, "log_ratio"] for i in range(1, 30, 2)]
    assert min(on) > max(off)


def test_gopher_filter_rules_hand_computed():
    from jschon_ray.functions.text import gopher_filter_batch

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # 50 words incl. "the" and "of": all rules pass
            " ".join(["word"] * 48 + ["the", "of"]),
            # too short (3 words)
            "the of and",
            # mean word length too long (>10)
            " ".join(["extraordinarily"] * 48 + ["the", "of"]),
            # alpha fraction below 0.8 (30 of 52 words numeric)
            " ".join(["123"] * 30 + ["word"] * 20 + ["the", "of"]),
        ]),
    })
    out = gopher_filter_batch(docs)
    assert out["n_words"].to_pylist() == [50, 3, 50, 52]
    assert out["n_stop_hits"].to_pylist() == [2, 3, 2, 2]
    assert out["kept"].to_pylist() == [True, False, False, False]
    # relaxed stop-word threshold flips nothing here but exercises arg
    out1 = gopher_filter_batch(docs, min_stop_hits=1)
    assert out1["kept"].to_pylist() == [True, False, False, False]


def test_gopher_filter_empty_and_no_stopwords():
    from jschon_ray.functions.text import gopher_filter_batch

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["", " ".join(["word"] * 60)]),
    })
    out = gopher_filter_batch(docs)
    assert out["n_words"].to_pylist() == [0, 60]
    assert out["mean_word_len"].to_pylist()[0] == 0.0
    assert out["n_stop_hits"].to_pylist() == [0, 0]
    assert out["kept"].to_pylist() == [False, False]
