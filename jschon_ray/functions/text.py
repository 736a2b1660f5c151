"""Text analysis stages for large-scale training-data pipelines.

All hot paths are vectorized pyarrow.compute kernels (RE2 regexes — the same
engine DuckDB uses, so the SQL oracles in __ray_entry__ compute identically).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# marker vocabularies for the n-gram/stopword language heuristic; scored via
# \b-anchored RE2 alternations (portable to the DuckDB oracle verbatim)
LANG_MARKERS = {
    "en": r"\b(the|and|of|a|to|row|data|is)\b",
    "de": r"\b(der|die|das|und|nicht|ist)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
    "es": r"\b(el|los|las|es|una|y)\b",
    "zh": r"[一-鿿]",
}
LANG_ORDER = list(LANG_MARKERS)


def token_count_batch(batch: pa.Table, col: str = "text",
                      out: str = "n_tokens") -> pa.Table:
    """Whitespace token count: number of \\S+ runs (0 for empty/null)."""
    n = pc.count_substring_regex(batch[col], r"\S+")
    return batch.append_column(out, n.cast(pa.int64()))


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality-score features: lengths, alpha/digit/space ratios, avg word
    length. Ratios are plain double divisions — bit-identical to SQL."""
    text = batch[col]
    n_chars = pc.utf8_length(text).cast(pa.float64())
    n_alpha = pc.count_substring_regex(text, "[A-Za-z]").cast(pa.float64())
    n_digit = pc.count_substring_regex(text, "[0-9]").cast(pa.float64())
    n_tok = pc.count_substring_regex(text, r"\S+").cast(pa.float64())
    safe = pc.if_else(pc.greater(n_chars, 0), n_chars,
                      pa.scalar(1.0))
    out = batch.append_column("n_tokens", n_tok.cast(pa.int64()))
    out = out.append_column("alpha_ratio", pc.divide(n_alpha, safe))
    out = out.append_column("digit_ratio", pc.divide(n_digit, safe))
    out = out.append_column(
        "avg_token_len",
        pc.if_else(pc.greater(n_tok, 0),
                   pc.divide(pc.count_substring_regex(
                       text, r"\S").cast(pa.float64()), n_tok),
                   pa.scalar(0.0)))
    return out


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter_batch(batch: pa.Table, col: str = "text",
                        min_stop_hits: int = 2) -> pa.Table:
    """Gopher-style document quality rules (Rae et al. 2021, publicly
    described repetition/quality heuristics), the composed keep/drop
    filter web-scale pipelines apply before training:

      R1  50 <= word count <= 100,000
      R2  3 <= mean word length <= 10
      R3  >= 80% of words contain at least one alphabetic character
      R4  at least `min_stop_hits` distinct stop words present (of 8;
          the published default is 2 — callers on narrow-vocabulary
          corpora may lower it)

    kept = R1 & R2 & R3 & R4. Everything is Arrow regex counting over the
    raw string — the word list is never materialized, so the stage is one
    RE2 scan per feature. Doubles are plain int/int divisions,
    bit-identical to the DuckDB oracle's.

    Spec-engine kinship: this is an `allOf` of range assertions
    (/root/reference/jschon/vocabulary/applicator.py:28-40 over
    validation.py bounds), lifted to derived text features.
    """
    text = batch[col]
    n_words = pc.count_substring_regex(text, r"\S+").cast(pa.int64())
    nonspace = pc.count_substring_regex(text, r"\S").cast(pa.float64())
    n_alpha_words = pc.count_substring_regex(
        text, r"\S*[A-Za-z]\S*").cast(pa.float64())
    nw_f = n_words.cast(pa.float64())
    pos = pc.greater(n_words, 0)
    mean_word_len = pc.if_else(pos, pc.divide(nonspace, nw_f),
                               pa.scalar(0.0))
    frac_alpha_words = pc.if_else(pos, pc.divide(n_alpha_words, nw_f),
                                  pa.scalar(0.0))
    hits = None
    for w in GOPHER_STOPWORDS:
        h = pc.match_substring_regex(
            text, rf"(?:^|\s){w}(?:\s|$)").cast(pa.int64())
        hits = h if hits is None else pc.add(hits, h)
    n_stop_hits = hits.cast(pa.int64())
    kept = pc.and_(
        pc.and_(
            pc.and_(pc.greater_equal(n_words, 50),
                    pc.less_equal(n_words, 100_000)),
            pc.and_(pc.greater_equal(mean_word_len, 3.0),
                    pc.less_equal(mean_word_len, 10.0))),
        pc.and_(pc.greater_equal(frac_alpha_words, 0.8),
                pc.greater_equal(n_stop_hits, min_stop_hits)))
    out = batch.append_column("n_words", n_words)
    out = out.append_column("mean_word_len", mean_word_len)
    out = out.append_column("frac_alpha_words", frac_alpha_words)
    out = out.append_column("n_stop_hits", n_stop_hits)
    out = out.append_column("kept", kept)
    return out


def lang_id_batch(batch: pa.Table, col: str = "text",
                  out: str = "lang_pred") -> pa.Table:
    """Heuristic language ID: argmax of marker-pattern hit counts
    (first-wins tie-break in LANG_ORDER). Patterns compile once per actor
    via Arrow's RE2; the DuckDB oracle runs the same regexes."""
    scores = np.stack([
        pc.count_substring_regex(batch[col], rx).cast(pa.int64())
        .to_numpy(zero_copy_only=False)
        for rx in LANG_MARKERS.values()
    ])
    best = np.argmax(scores, axis=0)  # first max wins, matching SQL CASE
    langs = np.array(LANG_ORDER, dtype=object)[best]
    langs[scores.max(axis=0) == 0] = "unknown"
    # null text: every count is null->NaN, argmax picks index 0 and the
    # ==0 sentinel never fires — label it unknown explicitly
    null_rows = pc.is_null(batch[col]).to_numpy(zero_copy_only=False)
    if null_rows.any():
        langs[null_rows] = "unknown"
    return batch.append_column(out, pa.array(langs, pa.string()))


def fingerprint_md5_batch(batch: pa.Table, col: str = "text",
                          out: str = "fingerprint") -> pa.Table:
    """Content fingerprint = hex md5 (oracle-comparable via DuckDB md5()).

    Per-row hashlib loop — fine for fingerprinting stages where the hash
    choice must match an external system; use state.sketches.hash_array for
    engine-internal keys (vectorized, 10x faster)."""
    vals = batch[col].to_pylist()
    fp = [hashlib.md5(v.encode()).hexdigest() if v is not None else None
          for v in vals]
    return batch.append_column(out, pa.array(fp, pa.string()))


def rolling_fingerprints(text: str, k: int = 8, window: int = 16,
                         base: int = 257, mod: int = (1 << 61) - 1) -> list:
    """Winnowing document fingerprints: Rabin-Karp rolling hashes of k-grams,
    minimum per sliding window (standard winnowing; engine-only, no SQL)."""
    if text is None or len(text) < k:
        return []
    data = text.encode("utf-8", "ignore")
    n = len(data)
    h = 0
    pw = pow(base, k - 1, mod)
    hashes = np.empty(n - k + 1, np.uint64)
    for i in range(k):
        h = (h * base + data[i]) % mod
    hashes[0] = h
    for i in range(1, n - k + 1):
        h = ((h - data[i - 1] * pw) * base + data[i + k - 1]) % mod
        hashes[i] = h
    if len(hashes) <= window:
        return [int(hashes.min())]
    from numpy.lib.stride_tricks import sliding_window_view
    mins = sliding_window_view(hashes, window).min(axis=1)
    return sorted(set(int(x) for x in np.unique(mins)))


def parse_json_column(batch: pa.Table, col: str, *,
                      out: str | None = None) -> pa.Table:
    """Decode a JSON-string column into an Arrow struct column, vectorized.

    The reference materializes documents via a per-node Python tree
    (/root/reference/jschon/json.py:120-151); here a whole batch of JSON
    strings is parsed in ONE pyarrow C++ NDJSON read (the strings are
    newline-joined into an in-memory buffer), yielding a struct column the
    vectorized validator can fan out over. Null input rows stay null.
    Whitespace-normalized inputs only: embedded newlines inside one JSON
    document are not supported (NDJSON framing).
    """
    import io

    from pyarrow import json as pajson

    arr = batch[col]
    if arr.num_chunks == 0:
        arr = pa.array([], pa.string())
    else:
        arr = arr.combine_chunks()
    arr = arr.cast(pa.string())
    null_mask = pc.is_null(arr)
    arr = pc.fill_null(arr, "{}")
    # the NDJSON reader silently SKIPS blank lines, desyncing the parsed
    # row count from the batch: blank rows parse as the null struct too
    blank = pc.equal(pc.utf8_trim_whitespace(arr), "")
    if pc.any(blank).as_py():
        arr = pc.if_else(blank, pa.scalar("{}"), arr)
        null_mask = pc.or_(null_mask, blank)
    n_nulls = int(pc.sum(null_mask.cast(pa.int64())).as_py() or 0)
    payload = "\n".join(arr.to_pylist()).encode()
    if not batch.num_rows:
        parsed = pa.table({})
    else:
        parsed = pajson.read_json(io.BytesIO(payload))
    if parsed.num_columns == 0:
        struct = pa.nulls(batch.num_rows, pa.struct([]))
    else:
        parsed = parsed.combine_chunks()
        struct = pa.StructArray.from_arrays(
            [parsed.column(i).chunk(0) if parsed.column(i).num_chunks
             else pa.nulls(batch.num_rows, parsed.schema.types[i])
             for i in range(parsed.num_columns)],
            names=parsed.column_names,
            mask=null_mask if n_nulls else None)
    name = out or col
    if name in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(name), name,
                                struct)
    return batch.append_column(name, struct)


# ---------------------------------------------------------------------------
# cleaning / filtering / safety stages (training-data prep)


def normalize_text_batch(batch: pa.Table, col: str = "text",
                         out: str = "text_norm") -> pa.Table:
    """Canonical text normalization: lowercase, collapse all whitespace
    runs to single spaces, trim. One pass of Arrow C++ kernels per batch;
    the DuckDB oracle runs lower/regexp_replace/trim with the same RE2
    pattern, so outputs are byte-identical."""
    t = pc.utf8_lower(batch[col])
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    out_t = batch.append_column(out, t)
    return out_t.append_column(
        out + "_chars", pc.utf8_length(t).cast(pa.int64()))


def repetition_batch(batch: pa.Table, col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition stats per document, fully vectorized:
    n_tokens, n_distinct tokens, and the count of the most frequent token
    (top_tok_count / n_tokens is the classic repetition-filter ratio).

    One split_pattern_regex per batch -> flatten + parent indices ->
    a single np.unique over (doc, token-code) pairs; no per-row Python.
    Exact integers, so the SQL oracle (unnest + GROUP BY) matches bit-wise.
    """
    n = batch.num_rows
    toks = pc.split_pattern_regex(batch[col], r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents.filter(keep).to_numpy(zero_copy_only=False)
    n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
    import pandas as pd
    codes, uniques = pd.factorize(flat.to_numpy(zero_copy_only=False))
    k = max(len(uniques), 1)
    pair = parents.astype(np.int64) * k + codes
    upair, pcounts = np.unique(pair, return_counts=True)
    doc_of = (upair // k).astype(np.int64)
    n_distinct = np.bincount(doc_of, minlength=n).astype(np.int64)
    top = np.zeros(n, np.int64)
    np.maximum.at(top, doc_of, pcounts)
    out = batch.select([id_col])
    out = out.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("n_distinct", pa.array(n_distinct))
    return out.append_column("top_tok_count", pa.array(top))


# PII patterns (RE2 — identical engine in Arrow and DuckDB). Redaction
# order matters and is fixed: email, then phone, then IPv4 (the
# placeholders contain no digits, so later passes cannot re-match).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_batch(batch: pa.Table, col: str = "text",
              redact: bool = True) -> pa.Table:
    """Detect (and optionally redact) common PII: emails, NANP-style
    phone numbers, IPv4 addresses. Appends one count column per pattern
    plus a `redacted` text column. Vectorized RE2 kernels; patterns are
    module constants so the DuckDB oracle uses the same strings."""
    t = batch[col]
    out = batch
    red = t
    for name, rx, token in PII_PATTERNS:
        out = out.append_column(
            f"n_{name}", pc.count_substring_regex(t, rx).cast(pa.int64()))
        if redact:
            red = pc.replace_substring_regex(red, rx, token)
    if redact:
        out = out.append_column("redacted", red)
    return out


def contamination_batch(batch: pa.Table, phrases, col: str = "text") -> \
        pa.Table:
    """Benchmark-contamination check: flag documents containing any of the
    given literal phrases (e.g. eval-set n-grams). `phrases` is the
    broadcast small side — at scale, ship it once via ray.put and pass it
    through fn_constructor_args to an actor pool; for very large phrase
    sets switch to the inverted-index n-gram join (functions/dedup.py).
    Appends n_hits (count of distinct phrases present, substring
    semantics) and a `contaminated` bool."""
    t = batch[col]
    hits = None
    for p in phrases:
        m = pc.match_substring(t, p).cast(pa.int64())
        hits = m if hits is None else pc.add(hits, m)
    if hits is None:
        hits = pa.array(np.zeros(batch.num_rows, np.int64))
    out = batch.append_column("n_hits", hits)
    return out.append_column("contaminated", pc.greater(hits, 0))


# ---------------------------------------------------------------------------
# corpus vocabulary + out-of-vocabulary coverage


def vocab_count_partial(batch: pa.Table, *, col: str = "text",
                        lowercase: bool = True) -> pa.Table:
    """Per-block token counts: one RE2 split + one np.unique per batch.
    Only (token, n) partial rows shuffle — the classic word-count
    pre-aggregation."""
    s = pc.utf8_lower(batch[col]) if lowercase else batch[col]
    toks = pc.list_flatten(pc.split_pattern_regex(s, r"\s+"))
    arr = toks.to_numpy(zero_copy_only=False)
    arr = arr[arr != ""]
    u, c = np.unique(arr, return_counts=True)
    return pa.table({"tok": pa.array(u, pa.string()),
                     "n": pa.array(c.astype(np.int64))})


def build_vocab(ds, *, col: str = "text", min_count: int = 5,
                lowercase: bool = True) -> frozenset:
    """Corpus vocabulary: tokens appearing >= min_count times.

    Distributed word count (per-block partials -> one (token) groupby
    of partial rows), then the SURVIVING vocab flows to the driver.
    `min_count` bounds the driver-side set: at corpus scale raise it (or
    cap with a count-min sketch pass) so the broadcast stays node-sized;
    the shuffle itself never depends on the threshold.
    """
    import functools

    counts = ds.map_batches(
        functools.partial(vocab_count_partial, col=col,
                          lowercase=lowercase),
        batch_format="pyarrow").groupby("tok").sum("n")

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["sum(n)"], min_count)) \
            .select(["tok"])

    vocab = set()
    for b in counts.map_batches(keep, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        vocab.update(b["tok"].to_pylist())
    return frozenset(vocab)


def vocab_coverage_batch(batch: pa.Table, *, vocab: frozenset,
                         col: str = "text", id_col: str = "doc_id",
                         lowercase: bool = True) -> pa.Table:
    """Per-doc token/OOV counts against a broadcast vocabulary: exact
    integers (n_tokens, n_oov), vectorized membership via one hashed
    isin over the flattened token array."""
    import pandas as pd

    s = pc.utf8_lower(batch[col]) if lowercase else batch[col]
    lists = pc.split_pattern_regex(s, r"\s+")
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = flat != ""
    n = batch.num_rows
    n_tokens = np.bincount(parents[keep], minlength=n).astype(np.int64)
    in_vocab = pd.Series(flat[keep]).isin(vocab).to_numpy()
    n_oov = np.bincount(parents[keep][~in_vocab],
                        minlength=n).astype(np.int64)
    return pa.table({id_col: batch[id_col],
                     "n_tokens": pa.array(n_tokens),
                     "n_oov": pa.array(n_oov)})


def vocab_coverage(ds, *, col: str = "text", id_col: str = "doc_id",
                   min_count: int = 5, lowercase: bool = True):
    """Two-phase OOV scoring: distributed vocab build, then a broadcast
    per-batch coverage pass (the `$ref`-style small-side lookup)."""
    import functools

    vocab = build_vocab(ds, col=col, min_count=min_count,
                        lowercase=lowercase)
    return ds.map_batches(
        functools.partial(vocab_coverage_batch, vocab=vocab, col=col,
                          id_col=id_col, lowercase=lowercase),
        batch_format="pyarrow")


def unigram_logprob(ds, *, col: str = "text", id_col: str = "doc_id",
                    lowercase: bool = True, min_count: int = 1):
    """Per-document mean unigram log-probability — the classic cheap
    LM-based quality-filter signal (docs of improbable tokens score low).

    Two-phase like `vocab_coverage`: (1) distributed word count (only
    (token, n) partial rows shuffle) with the corpus total computed from
    the same pass; (2) broadcast the count table, score each doc batch
    vectorized: logprob(tok) = ln(count(tok) / total), doc score = mean
    over its tokens.

    With `min_count` = 1 the score is exact (every doc token is in the
    corpus count by construction). At corpus scale raise `min_count` to
    bound the broadcast table; rarer tokens then fall back to
    ln(min_count / total) (a documented floor, no longer bit-exact
    against a full-count oracle).

    Emits (id_col, n_tokens, avg_logprob); empty docs get null.
    """
    import functools

    counts = ds.map_batches(
        functools.partial(vocab_count_partial, col=col,
                          lowercase=lowercase),
        batch_format="pyarrow").groupby("tok").sum("n")

    total = 0
    table = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        ns = b["sum(n)"].to_numpy(zero_copy_only=False)
        total += int(ns.sum())
        keep = ns >= min_count
        toks = b["tok"].to_numpy(zero_copy_only=False)[keep]
        for t, c in zip(toks, ns[keep]):
            table[t] = int(c)
    logp = {t: float(np.log(c / total)) for t, c in table.items()}
    floor = float(np.log(min_count / total)) if total else 0.0

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pc.utf8_lower(batch[col]) if lowercase else batch[col]
        lists = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        keep = flat != ""
        n = batch.num_rows
        n_tokens = np.bincount(parents[keep], minlength=n) \
            .astype(np.int64)
        lp = pd.Series(flat[keep]).map(logp).fillna(floor).to_numpy()
        sums = np.bincount(parents[keep], weights=lp, minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(n_tokens > 0, sums / np.maximum(n_tokens, 1),
                           np.nan)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens),
            "avg_logprob": pa.array(avg, pa.float64(), from_pandas=True)})

    return ds.map_batches(score, batch_format="pyarrow")


def top_tokens(ds, *, col: str = "text", k: int = 20,
               lowercase: bool = True):
    """Corpus heavy hitters, exact: distributed word count (per-block
    partial rows are all that shuffle) then a distributed
    sort-by-(count desc, token) + limit — the deterministic tie order
    makes the result reproducible and oracle-comparable. The exact
    complement of the count-min sketch in `state/sketches.py`.

    Emits (tok, n) — the k most frequent tokens.
    """
    import functools

    counts = ds.map_batches(
        functools.partial(vocab_count_partial, col=col,
                          lowercase=lowercase),
        batch_format="pyarrow").groupby("tok").sum("n")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"tok": t["tok"],
                         "n": t["sum(n)"].cast(pa.int64())})

    return counts.map_batches(finish, batch_format="pyarrow") \
        .sort(key=["n", "tok"], descending=[True, False]).limit(k)


def tfidf_top_terms(ds, *, col: str = "text", id_col: str = "doc_id",
                    k: int = 3, lowercase: bool = True,
                    min_df: int = 1):
    """Top-k characteristic terms per document by tf-idf (keyword
    extraction for corpus curation): score = tf * ln(N / df) with raw
    term counts, N = docs containing >= 1 token, ties broken by term
    (deterministic, oracle-comparable).

    Document frequency is EXACT with only (token, partial-count) rows
    shuffling: a document is one row, so per-block distinct (doc, token)
    pairs collapse to per-block df partials before the groupby. The idf
    table broadcasts (cap it with `min_df` at corpus scale — rarer terms
    then drop out of scoring, documented). Emits (id_col, tok, score,
    rk).
    """
    import functools

    import pandas as pd

    def df_partial(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(batch[col]) if lowercase else batch[col]
        lists = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        keep = flat != ""
        dfp = pd.DataFrame({"p": parents[keep], "tok": flat[keep]}) \
            .drop_duplicates()
        agg = dfp.groupby("tok", sort=False).size().reset_index(name="n")
        n_docs = int(dfp["p"].nunique())
        agg = pd.concat([agg, pd.DataFrame({"tok": [""], "n": [n_docs]})],
                        ignore_index=True)  # "" carries the N partial
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    merged = ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("tok").sum("n")
    idf = {}
    n_total = 0
    rows = []
    for b in merged.iter_batches(batch_format="pyarrow"):
        toks = b["tok"].to_pylist()
        ns = b["sum(n)"].to_numpy(zero_copy_only=False)
        for t, c in zip(toks, ns):
            if t == "":
                n_total += int(c)
            elif c >= min_df:
                rows.append((t, int(c)))
    idf = {t: float(np.log(n_total / c)) for t, c in rows}

    def score(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(batch[col]) if lowercase else batch[col]
        lists = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        keep = flat != ""
        tf = pd.DataFrame({"p": parents[keep], "tok": flat[keep]}) \
            .groupby(["p", "tok"], sort=False).size() \
            .reset_index(name="tf")
        tf["idf"] = tf["tok"].map(idf)
        tf = tf.dropna(subset=["idf"])
        tf["score"] = tf["tf"].to_numpy(np.float64) \
            * tf["idf"].to_numpy(np.float64)
        tf = tf.sort_values(["p", "score", "tok"],
                            ascending=[True, False, True],
                            kind="mergesort")
        tf["rk"] = tf.groupby("p", sort=False).cumcount() + 1
        tf = tf[tf["rk"] <= k]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[tf["p"].to_numpy()]),
            "tok": pa.array(tf["tok"], pa.string()),
            "score": pa.array(np.round(tf["score"].to_numpy(), 4)),
            "rk": pa.array(tf["rk"].to_numpy(np.int64))})

    return ds.map_batches(score, batch_format="pyarrow")


def chunk_documents(ds, *, col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 64, overlap: int = 8):
    """Split documents into fixed-token-budget training chunks with
    overlap — the standard LLM pretraining prep step (the windowed
    complement of `scan.pack_sequences`, which concatenates instead).

    Chunk starts are `range(0, max(n_tokens - overlap, 1), stride)` with
    stride = chunk_tokens - overlap, so every token lands in >= 1 chunk,
    consecutive chunks share `overlap` tokens, and no trailing chunk is
    a pure suffix of the previous one. Whitespace tokenization (the
    corpus-wide convention shared with the SQL oracles).

    Row-count-changing map_batches: one split per batch; per-doc chunk
    assembly slices the flattened token array (docs are short relative
    to batches, so the per-doc loop is bounded by rows-per-batch, not
    corpus size). Empty docs emit zero chunks. Emits
    (id_col, chunk_idx, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def explode(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(batch[col], r"\s+")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        keep = flat != ""
        flat, parents = flat[keep], parents[keep]
        n = batch.num_rows
        counts = np.bincount(parents, minlength=n)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        ids = batch[id_col].to_numpy(zero_copy_only=False)

        out_ids, out_idx, out_n, out_text = [], [], [], []
        for i in range(n):
            toks = flat[offsets[i]:offsets[i + 1]]
            nt = len(toks)
            if nt == 0:
                continue
            for ci, start in enumerate(
                    range(0, max(nt - overlap, 1), stride)):
                piece = toks[start:start + chunk_tokens]
                out_ids.append(ids[i])
                out_idx.append(ci)
                out_n.append(len(piece))
                out_text.append(" ".join(piece))
        return pa.table({
            id_col: pa.array(out_ids,
                             type=batch.schema.field(id_col).type),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "n_chunk_tokens": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


def lexical_diversity_batch(batch: pa.Table, col: str = "text",
                            id_col: str = "doc_id") -> pa.Table:
    """Lexical-diversity quality metrics per document, one vectorized
    pass: token count, distinct-token count, hapax count (tokens seen
    exactly once in the doc — hapax/n_tokens is a standard
    machine-generated-text signal), and Shannon token entropy (base 2,
    H = log2(n) - Σ c·log2 c / n over the doc's token counts — the
    identity keeps it one reduceat, matching DuckDB's `entropy()`).
    Docs with zero tokens (null/empty/whitespace) emit nothing, mirroring
    the oracle's unnest semantics. Same segmented np.unique skeleton as
    `repetition_batch`; stateless, fuses with the read."""
    n = batch.num_rows
    toks = pc.split_pattern_regex(batch[col], r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents.filter(keep).to_numpy(zero_copy_only=False)
    n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
    codes, uniques = pd.factorize(flat.to_numpy(zero_copy_only=False))
    k = max(len(uniques), 1)
    pair = parents.astype(np.int64) * k + codes
    upair, counts = np.unique(pair, return_counts=True)
    doc_of = (upair // k).astype(np.int64)
    n_distinct = np.bincount(doc_of, minlength=n).astype(np.int64)
    n_hapax = np.bincount(doc_of[counts == 1], minlength=n).astype(np.int64)
    clogc = np.zeros(n, np.float64)
    np.add.at(clogc, doc_of, counts * np.log2(counts))
    nz = n_tokens > 0
    ent = np.zeros(n, np.float64)
    ent[nz] = np.log2(n_tokens[nz]) - clogc[nz] / n_tokens[nz]
    ids = batch[id_col].to_numpy(zero_copy_only=False)[nz]
    return pa.table({id_col: pa.array(ids),
                     "n_tokens": pa.array(n_tokens[nz]),
                     "n_distinct": pa.array(n_distinct[nz]),
                     "n_hapax": pa.array(n_hapax[nz]),
                     "token_entropy": pa.array(np.round(ent[nz], 4))})


# GPT-2-style pre-tokenizer, RE2-compatible (no lookahead, so the
# trailing-space variant of the original is folded into plain \s+).
# Arrow's count_substring_regex and DuckDB's regexp_extract_all both run
# RE2, so counts are bit-identical between engine and oracle.
BPE_PRETOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table, col: str = "text",
                          out: str = "n_bpe_tokens") -> pa.Table:
    """Pre-tokenizer segment count — the standard proxy for LM token
    budgets when the real BPE merges are not available (merges only
    split segments further, so this lower-bounds the true count with a
    stable ratio). One RE2 scan per batch."""
    import pyarrow.compute as pc

    n = pc.count_substring_regex(batch[col], BPE_PRETOKEN_RE)
    return batch.append_column(out, n.cast(pa.int64()))


def compression_ratio_batch(batch: pa.Table, col: str = "text",
                            out: str = "zlib_ratio",
                            level: int = 6) -> pa.Table:
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    classic redundancy quality signal (Gopher/RedPajama filters):
    boilerplate and repetition compress far below ~0.4, high-entropy
    junk sits near 1. Per-row C calls (zlib), no Python parsing; docs
    shorter than 32 bytes get null (ratio dominated by the zlib
    header)."""
    import zlib

    vals = []
    for t in batch[col].to_pylist():
        if t is None:
            vals.append(None)
            continue
        raw = t.encode("utf-8", "replace")
        if len(raw) < 32:
            vals.append(None)
            continue
        vals.append(round(len(zlib.compress(raw, level)) / len(raw), 6))
    return batch.append_column(out, pa.array(vals, pa.float64()))


def bigram_pairs_batch(batch: pa.Table, *, col: str = "text",
                       lowercase: bool = True):
    """(batch-local row indices, w1 array, w2 array) of consecutive
    within-row token pairs — one RE2 split, pair build by shifted
    compare of the flat token array against its parent indices. The
    first return value indexes ROWS OF THIS BATCH (join it to id
    columns yourself), not document ids."""
    s = pc.utf8_lower(batch[col]) if lowercase else batch[col]
    lists = pc.split_pattern_regex(s, r"\s+")
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False)
    keep = flat != ""
    flat, parents = flat[keep], parents[keep]
    if len(flat) < 2:
        z = np.array([], dtype=object)
        return np.array([], np.int64), z, z
    same = parents[1:] == parents[:-1]
    return parents[:-1][same], flat[:-1][same], flat[1:][same]


def bigram_logprob(ds, *, col: str = "text", id_col: str = "doc_id",
                   lowercase: bool = True, sep: str = " "):
    """Per-document mean conditional bigram log-probability
    (avg over the doc's pairs of ln(c(w1,w2) / c(w1 as context))) — the
    next-step-up LM quality signal over `unigram_logprob`.

    Same two-phase shape: (1) distributed bigram count — pairs are
    encoded into ONE string key (w1+sep+w2; sep defaults to a space,
    which cannot occur inside a token after the whitespace split —
    NUL would silently vanish inside numpy U-string ops) so the
    shuffle is a single-key groupby of per-block partials; (2) the count table
    broadcasts and each doc batch scores vectorized. Context counts
    c(w1) derive from the bigram table itself (sum over w2), so the
    model is exact with no smoothing: every doc pair exists in the
    counts by construction.

    Broadcast posture: the table is distinct-bigram-sized; at corpus
    scale prune with a min-count (as `build_vocab` does) and fall back
    to a floor logprob — documented trade, same as unigram_logprob.

    Emits (id_col, n_bigrams, avg_logprob); docs with < 2 tokens get
    n_bigrams = 0 and null score.
    """
    import functools

    def pair_partial(batch: pa.Table) -> pa.Table:
        _, w1, w2 = bigram_pairs_batch(batch, col=col,
                                       lowercase=lowercase)
        if not len(w1):
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        key = np.char.add(np.char.add(w1.astype(str), sep),
                          w2.astype(str))
        u, c = np.unique(key, return_counts=True)
        return pa.table({"pair": pa.array(u, pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("pair").sum("n")

    # vectorized model build: ONE str.split over the pair column, a
    # groupby-sum for contexts, np.log on aligned arrays — no per-pair
    # Python (the distinct-bigram table is corpus-vocab-sized)
    import pandas as pd

    frames = [b.to_pandas()
              for b in counts.iter_batches(batch_format="pyarrow")]
    model = pd.concat(frames, ignore_index=True) if frames \
        else pd.DataFrame({"pair": [], "sum(n)": []})
    pairs = model["pair"].astype(str)
    n_arr = model["sum(n)"].to_numpy(np.float64)
    # str.partition treats sep LITERALLY (str.split regex-interprets
    # multi-char separators and would collapse contexts onto '')
    w1s = pairs.str.partition(sep)[0]
    ctx = n_arr if not len(model) else \
        pd.Series(n_arr).groupby(w1s.to_numpy()).transform("sum") \
        .to_numpy()
    logp = dict(zip(pairs, np.log(n_arr / np.maximum(ctx, 1e-300))))

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch[id_col]
        parents, w1, w2 = bigram_pairs_batch(
            batch, col=col, lowercase=lowercase)
        nb = np.zeros(batch.num_rows, np.int64)
        alp = np.full(batch.num_rows, np.nan)
        if len(w1):
            key = np.char.add(np.char.add(w1.astype(str), sep),
                              w2.astype(str))
            lp = pd.Series(key).map(logp).to_numpy(np.float64)
            df = pd.DataFrame({"p": parents, "lp": lp})
            g = df.groupby("p")["lp"].agg(["size", "mean"])
            nb[g.index.to_numpy()] = g["size"].to_numpy(np.int64)
            alp[g.index.to_numpy()] = g["mean"].to_numpy()
        return pa.table({
            id_col: ids,
            "n_bigrams": pa.array(nb),
            "avg_logprob": pa.array(np.round(alp, 4),
                                    mask=np.isnan(alp))})

    return ds.map_batches(score, batch_format="pyarrow")


def _hashed_feature_buckets(batch: pa.Table, *, col: str,
                            num_buckets: int, lowercase: bool = True):
    """Shared DSIR feature extractor: bag of {unigram, bigram} word
    features hashed into `num_buckets` via md5 (reproducible in ANSI
    SQL: CAST(concat('0x', substr(md5(f), 1, 15)) AS UBIGINT) % B).

    Returns (buckets, parents): one int64 bucket per feature OCCURRENCE
    and the owning row index. The md5 loop runs over the batch's UNIQUE
    feature strings (vocabulary-bounded), never per occurrence."""
    s = pc.utf8_lower(batch[col]) if lowercase else batch[col]
    lists = pc.split_pattern_regex(s, r"\s+")
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = flat != ""
    toks, tpar = flat[keep], parents[keep]
    # bigrams: consecutive kept tokens within the same row
    if len(toks) > 1:
        same = tpar[:-1] == tpar[1:]
        big = np.char.add(np.char.add(toks[:-1][same].astype(str), " "),
                          toks[1:][same].astype(str))
        bpar = tpar[:-1][same]
    else:
        big = np.array([], dtype=str)
        bpar = np.array([], dtype=np.int64)
    feats = np.concatenate([toks.astype(str), big])
    fpar = np.concatenate([tpar, bpar]).astype(np.int64)
    if len(feats) == 0:
        return np.array([], np.int64), fpar
    uniq, inv = np.unique(feats, return_inverse=True)
    ub = np.array([int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                   % num_buckets for u in uniq], np.int64)
    return ub[inv], fpar


def dsir_logratio(ds, *, id_col: str = "doc_id", col: str = "text",
                  target_col: str = "lang", target_value: str = "en",
                  num_buckets: int = 4096, lowercase: bool = True,
                  decimals: int = 4):
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): hashed bag of {unigram, bigram} features; per doc,
    log w(x) = sum_f [ln p_target(bucket(f)) - ln p_raw(bucket(f))]
    over its feature occurrences, with Laplace-smoothed bucket
    probabilities p(h) = (c_h + 1) / (T + B). Docs resembling the
    target subset (rows where `target_col == target_value`) score high;
    downstream selection samples proportionally to exp(log w).

    100 TB posture: the model is TWO fixed-size arrays of B floats
    (hash-bucketed, vocabulary-independent — unlike the unigram /
    bigram LM scorers whose broadcast tables grow with the corpus
    vocabulary). One count pass (only nonzero (bucket, n_raw, n_tgt)
    partial rows shuffle, ≤ B per block), one broadcast, one
    vectorized scoring pass.

    Emits (id_col, n_feats, log_ratio) with log_ratio rounded to
    `decimals`; docs with no tokens get n_feats = 0 and null.
    """
    import functools

    B = int(num_buckets)

    def count_partial(t: pa.Table) -> pa.Table:
        h, par = _hashed_feature_buckets(t, col=col, num_buckets=B,
                                         lowercase=lowercase)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n_raw": pa.array([], pa.int64()),
                             "n_tgt": pa.array([], pa.int64())})
        is_tgt = pc.equal(t[target_col], target_value) \
            .to_numpy(zero_copy_only=False)
        raw = np.bincount(h, minlength=B)
        tgt = np.bincount(h[is_tgt[par]], minlength=B)
        nz = np.flatnonzero(raw)
        return pa.table({"h": pa.array(nz.astype(np.int64)),
                         "n_raw": pa.array(raw[nz].astype(np.int64)),
                         "n_tgt": pa.array(tgt[nz].astype(np.int64))})

    counts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("h").sum(["n_raw", "n_tgt"])

    c_raw = np.zeros(B, np.int64)
    c_tgt = np.zeros(B, np.int64)
    for b in counts.iter_batches(batch_format="pyarrow"):
        hh = b["h"].to_numpy(zero_copy_only=False)
        c_raw[hh] = b["sum(n_raw)"].to_numpy(zero_copy_only=False)
        c_tgt[hh] = b["sum(n_tgt)"].to_numpy(zero_copy_only=False)
    t_raw, t_tgt = int(c_raw.sum()), int(c_tgt.sum())
    delta = (np.log((c_tgt + 1.0) / (t_tgt + B))
             - np.log((c_raw + 1.0) / (t_raw + B)))

    def score(t: pa.Table) -> pa.Table:
        h, par = _hashed_feature_buckets(t, col=col, num_buckets=B,
                                         lowercase=lowercase)
        n = t.num_rows
        n_feats = np.bincount(par, minlength=n).astype(np.int64)
        sums = np.bincount(par, weights=delta[h], minlength=n) \
            if len(h) else np.zeros(n)
        lr = np.round(sums, decimals)
        return pa.table({
            id_col: t[id_col],
            "n_feats": pa.array(n_feats),
            "log_ratio": pa.array(lr, mask=n_feats == 0)})

    return ds.map_batches(score, batch_format="pyarrow")


def source_kl_divergence(ds, *, group_col: str = "source",
                         col: str = "text", num_buckets: int = 2048,
                         lowercase: bool = True, decimals: int = 6):
    """Per-group token-distribution drift: KL(P_group || P_corpus) over
    md5-hash-bucketed unigram tokens — the corpus-mix diagnostic a
    training-data pipeline runs per crawl source / shard before fixing
    sampling weights (cf. the DSIR importance model above, which is the
    per-DOC complement).

    Reference analogy: jschon's per-document `enum`/`const` membership
    checks (vocabulary/validation.py:49-63) generalize to a
    distributional check over the whole corpus; no per-row analogue
    exists, so this is a SURVEY §2.9-class distributed op.

    100 TB posture: one count pass emits <= n_groups x B narrow rows
    per block (bucket counts, vocabulary-independent); one bounded
    groupby over a combined (group, bucket) key merges them; the final
    KL math runs over the <= n_groups x B merged rows on the driver.
    Tokens and text never shuffle.

    Emits (group_col, n_tokens, kl) with kl rounded to `decimals`;
    P_group is absolutely continuous wrt P_corpus by construction
    (every group bucket is a corpus bucket), so no smoothing is needed.
    """
    B = int(num_buckets)
    sep = "\x1f"  # unit separator: cannot occur in the bucket digits

    def count_partial(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t[col]) if lowercase else t[col]
        lists = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = flat != ""
        toks, tpar = flat[keep].astype(str), par[keep]
        if len(toks) == 0:
            return pa.table({"k": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        uniq, inv = np.unique(toks, return_inverse=True)
        ub = np.array([int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                       % B for u in uniq], np.int64)
        h = ub[inv]
        grp = t[group_col].to_numpy(zero_copy_only=False)[tpar]
        codes, labels = pd.factorize(grp)
        combined = codes.astype(np.int64) * B + h
        cnt = np.bincount(combined, minlength=len(labels) * B)
        nz = np.flatnonzero(cnt)
        keys = [f"{labels[i // B]}{sep}{i % B}" for i in nz]
        return pa.table({"k": pa.array(keys, pa.string()),
                         "c": pa.array(cnt[nz].astype(np.int64))})

    merged = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("k").sum("c")

    rows = []
    for b in merged.iter_batches(batch_format="pyarrow"):
        ks = b["k"].to_pylist()
        cs = b["sum(c)"].to_numpy(zero_copy_only=False)
        for k, c in zip(ks, cs):
            g, _, hs = k.rpartition(sep)
            rows.append((g, int(hs), int(c)))
    df = pd.DataFrame(rows, columns=[group_col, "h", "c"])
    total = float(df["c"].sum())
    corpus = df.groupby("h")["c"].sum()
    out = []
    for g, sub in sorted(df.groupby(group_col), key=lambda kv: kv[0]):
        sub = sub.sort_values("h")
        n_g = float(sub["c"].sum())
        p = sub["c"].to_numpy(np.float64) / n_g
        q = corpus.loc[sub["h"]].to_numpy(np.float64) / total
        kl = float(np.sum(p * np.log(p / q)))
        out.append((g, int(n_g), round(kl, decimals)))
    return pd.DataFrame(out, columns=[group_col, "n_tokens", "kl"])


def bpe_train(ds, *, col: str = "text", n_merges: int = 20,
              lowercase: bool = True, end_of_word: str = "▁",
              min_pair_count: int = 2, min_word_count: int = 1):
    """Distributed BPE merge training (Sennrich-style tokenizer
    learning) — the iterative op a tokenizer-building pipeline runs
    before token counting can use real merges (bpe_token_count_batch
    above is the budget-estimate fallback for exactly this gap).

    Scale shape (the classic two-level reduction): ONE corpus-scale
    pass builds the word-frequency table as a Dataset (per-block token
    count partials -> one bounded groupby) — after that the corpus is
    never touched again; every merge round runs over the |vocab|-row
    table, where each block re-derives its words' symbol sequences
    (characters + end marker, then the merges learned so far), emits
    adjacent-pair count partials weighted by word frequency, and one
    groupby + driver top-1 picks the round's merge. Driver state is the
    O(n_merges) merge list; re-deriving symbols from scratch each round
    costs O(n_merges) per word per round on the SMALL vocab table and
    keeps every round stateless (resume-friendly, no materialized
    intermediate to invalidate).

    Per-word symbol work is a Python loop over RAGGED symbol sequences
    — deliberate: it runs once per UNIQUE word per round (not per
    corpus occurrence), which is the standard word-frequency
    optimization that makes BPE training tractable.

    Ties break on (count desc, pair asc) so the learned table is
    deterministic under any block order. Returns a DataFrame
    (rank, left, right, pair_count); stops early when no pair reaches
    ``min_pair_count``.

    Reference analogy: an iterative whole-corpus fixpoint like the
    reference catalog's metaschema bootstrap (catalog/__init__.py) —
    no per-row analogue exists; registered rows-only (not
    SQL-expressible: the rounds are sequentially dependent).
    """
    import functools

    freq = ds.map_batches(
        functools.partial(vocab_count_partial, col=col,
                          lowercase=lowercase),
        batch_format="pyarrow").groupby("tok").sum("n")
    if int(min_word_count) > 1:
        # web-scale control: the unique-word table is hapax-dominated;
        # pruning rare words bounds the per-round table at a quantified
        # cost (a word below the floor can contribute at most
        # min_word_count-1 to any pair count)
        floor = int(min_word_count)

        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["sum(n)"], floor))

        freq = freq.map_batches(prune, batch_format="pyarrow")
    freq = freq.materialize()

    def apply_merges(word: str, merges: tuple) -> list:
        syms = list(word) + [end_of_word]
        for left, right in merges:
            i, out = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    merges: list = []
    rows = []
    for _ in range(int(n_merges)):
        mtuple = tuple(merges)

        def pair_partial(t: pa.Table) -> pa.Table:
            counts: dict = {}
            toks = t["tok"].to_pylist()
            ns = t["sum(n)"].to_numpy(zero_copy_only=False)
            for w, n in zip(toks, ns):
                syms = apply_merges(w, mtuple)
                for a, b in zip(syms, syms[1:]):
                    k = (a, b)
                    counts[k] = counts.get(k, 0) + int(n)
            if not counts:
                return pa.table({"l": pa.array([], pa.string()),
                                 "r": pa.array([], pa.string()),
                                 "c": pa.array([], pa.int64())})
            ls, rs = zip(*counts.keys())
            return pa.table({"l": pa.array(list(ls), pa.string()),
                             "r": pa.array(list(rs), pa.string()),
                             "c": pa.array(list(counts.values()),
                                           pa.int64())})

        best = None  # (count, left, right)
        agg = freq.map_batches(pair_partial, batch_format="pyarrow") \
            .groupby(["l", "r"]).sum("c")
        for b in agg.iter_batches(batch_format="pyarrow"):
            ls = b["l"].to_pylist()
            rs = b["r"].to_pylist()
            cs = b["sum(c)"].to_numpy(zero_copy_only=False)
            for lv, rv, cv in zip(ls, rs, cs):
                cand = (-int(cv), lv, rv)
                if best is None or cand < best:
                    best = cand
        if best is None or -best[0] < int(min_pair_count):
            break
        cnt, left, right = -best[0], best[1], best[2]
        merges.append((left, right))
        rows.append((len(merges), left, right, cnt))

    return pd.DataFrame(rows, columns=["rank", "left", "right",
                                       "pair_count"])
