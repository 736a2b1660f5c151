"""Text analysis stages for large-scale training-data pipelines.

All hot paths are vectorized pyarrow.compute kernels (RE2 regexes — the same
engine DuckDB uses, so the SQL oracles in __ray_entry__ compute identically).
"""

from __future__ import annotations

import hashlib

import numpy as np
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
    n_nulls = arr.null_count
    if n_nulls:
        arr = pc.fill_null(arr, "{}")
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
