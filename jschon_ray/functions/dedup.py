"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Shuffle shapes (ray_guide "Aggregation at scale"):
  * exact: content-hash column in map_batches -> groupby(hash) -> first.
    Only (hash, id) columns shuffle, never payloads.
  * MinHash-LSH: shingle->minhash per batch (vectorized reduceat) ->
    explode to (band, band_hash, id) rows -> groupby bands -> candidate
    pairs -> exact-Jaccard verify. Partitioning assumption: band buckets
    fit a group (hot buckets capped at `max_bucket`).
  * SimHash: 64-bit signature per doc; near-dup = signature XOR popcount
    <= hamming threshold within LSH buckets of the signature's bands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.sketches import hash_array
from .graph import _bucket_of

# ---------------------------------------------------------------------------
# exact dedup


def add_content_hash(batch: pa.Table, col: str, out: str = "content_hash",
                     normalize: bool = False) -> pa.Table:
    vals = batch[col]
    if normalize:
        vals = pc.utf8_lower(pc.utf8_trim_whitespace(vals))
    h = hash_array(vals.to_pandas()).astype(np.int64)
    return batch.append_column(out, pa.array(h))


def exact_dedup(ds, id_col: str, content_col: str, *, normalize=False):
    """Keep the min-id row key per distinct content value. Returns a lazy
    Dataset of (id_col,). The uniqueItems analogue across a table
    (/root/reference/jschon/vocabulary/validation.py:163-177)."""
    import functools

    hashed = ds.select_columns([id_col, content_col]).map_batches(
        functools.partial(add_content_hash, col=content_col,
                          normalize=normalize),
        batch_format="pyarrow",
    ).select_columns([id_col, "content_hash"])
    kept = hashed.groupby("content_hash").min(id_col)
    return kept.select_columns([f"min({id_col})"]) \
        .rename_columns([id_col])


def duplicate_groups(ds, id_col: str, key_expr_batch):
    """Groups with >1 member under a derived key.

    key_expr_batch(batch) -> pa.Table with [id_col, 'dup_key'].
    Returns (dup_key group stats): group_id = min id, n = member count.
    """
    from ray.data.aggregate import Count, Min

    keyed = ds.map_batches(key_expr_batch, batch_format="pyarrow")
    agg = keyed.groupby("dup_key").aggregate(
        Min(id_col, alias_name="group_id"), Count(alias_name="n"))

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n"], 1))
        return t.select(["group_id", "n"])

    return agg.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles + minhash (vectorized)


def _word_shingles(text: str, k: int) -> list:
    if not text:
        return []
    w = text.split()
    if len(w) < k:
        return [" ".join(w)] if w else []
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Vectorized minhash: P permutations over 64-bit shingle hashes.

    Per batch: flatten all docs' shingle hashes, one multiply-add per
    permutation, segmented min via np.minimum.reduceat — no per-doc loop.
    """

    def __init__(self, num_perm: int = 64, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, 2**61 - 1, num_perm, dtype=np.int64) \
            .astype(np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61 - 1, num_perm, dtype=np.int64) \
            .astype(np.uint64)

    def signatures(self, shingle_lists: list) -> np.ndarray:
        """[-> (n_docs, num_perm) uint64; empty docs get all-max sentinel."""
        n = len(shingle_lists)
        sig = np.full((n, self.num_perm), np.iinfo(np.uint64).max, np.uint64)
        lens = np.array([len(s) for s in shingle_lists])
        nonempty = np.nonzero(lens > 0)[0]
        if not len(nonempty):
            return sig
        flat = hash_array([s for sl in shingle_lists for s in sl])
        offsets = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
        for p in range(self.num_perm):
            v = (flat * self.a[p] + self.b[p]) & _MERSENNE
            sig[nonempty, p] = np.minimum.reduceat(v, offsets)
        return sig


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 bucket hashes, rows = num_perm/bands values."""
    n, p = sig.shape
    r = p // bands
    mix = np.uint64(0x9E3779B97F4A7C15)
    out = np.empty((n, bands), np.uint64)
    for b in range(bands):
        acc = np.zeros(n, np.uint64)
        for j in range(r):
            acc = (acc ^ sig[:, b * r + j]) * mix
        out[:, b] = acc
    return out.astype(np.int64)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def minhash_lsh_pairs(ds, id_col: str, text_col: str, *,
                      threshold: float = 0.5, shingle_k: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      max_bucket: int = 50, n_buckets: int = 64):
    """Near-duplicate pairs via MinHash-LSH + exact-Jaccard verification.

    Returns a LAZY Dataset (id_a, id_b, jaccard) with id_a < id_b —
    matched pairs never materialize on the driver; at scale consume
    with write_parquet or feed `connected_components` directly.

    Fully distributed, five bounded stages:
      1. map_batches: minhash signatures -> (id, band, bucket-hash) rows,
         routed by a COARSE bucket = band_hash % n_buckets (per-group
         Python overhead is O(n_buckets), not O(distinct LSH buckets)).
      2. groupby(route).map_groups: inside each route one vectorized
         segment expansion (sorted by (band, bucket, id); per out-degree
         class one triu grid — same trick as triangle_count's wedges)
         emits candidate pairs; LSH buckets with more than `max_bucket`
         members are truncated (non-discriminative boilerplate buckets).
      3. groupby(pair_bucket).map_groups: cross-band candidate dedup.
      4. exact-|A∩B| verification WITHOUT touching the driver: postings
         (shingle-hash, id, set-size) from the corpus are SEMI-JOINED to
         the candidate id set via one id-bucket co-group (no broadcast,
         no data-dependent driver state), then the surviving postings
         run the same inverted-index co-pair count as
         `ngram_jaccard_pairs`.
      5. groupby(pair_bucket).map_groups: restrict exact counts to LSH
         candidates, J = inter / (|A| + |B| - inter) >= threshold.

    Semantics note: docs with ZERO shingles (null/empty text) never
    pair. (The round-2 driver-verified implementation gave two empty
    docs jaccard 1.0 by the empty-set convention; empty payloads are
    not meaningful duplicates and carry no postings.)
    """
    hasher = MinHasher(num_perm)
    id_type = _col_type(ds, id_col)

    def emit_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = [_word_shingles(t, shingle_k) for t in texts]
        nonempty = np.fromiter((len(s) > 0 for s in sh), bool, len(sh))
        sig = hasher.signatures(sh)
        bh = band_hashes(sig, bands)[nonempty]
        ids = ids[nonempty]
        n = len(ids)
        route = (bh.reshape(-1).view(np.uint64)
                 % np.uint64(n_buckets)).view(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
            "bucket": pa.array(bh.reshape(-1)),
            "route": pa.array(route),
        })

    banded = ds.select_columns([id_col, text_col]).map_batches(
        emit_bands, batch_format="pyarrow")

    def _empty_pairs():
        return _empty_pair_table(id_type, [("pair_bucket", pa.int64())])

    def route_pairs(g: pd.DataFrame):
        g = g.drop_duplicates(["band", "bucket", id_col])
        g = g.sort_values(["band", "bucket", id_col], kind="mergesort")
        g = g[g.groupby(["band", "bucket"]).cumcount() < max_bucket]
        n = len(g)
        if n < 2:
            return _empty_pairs()
        ids = g[id_col].to_numpy()
        codes = g.groupby(["band", "bucket"], sort=False).ngroup() \
            .to_numpy()
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        out_a, out_b = [], []
        for k in np.unique(sizes):
            if k < 2:
                continue
            segs = starts[sizes == k]
            block = ids[segs[:, None] + np.arange(int(k))[None, :]]
            iu, ju = np.triu_indices(int(k), 1)
            out_a.append(block[:, iu].ravel())  # ids sorted in-segment,
            out_b.append(block[:, ju].ravel())  # so id_a < id_b holds
        if not out_a:
            return _empty_pairs()
        d = pd.DataFrame({"id_a": np.concatenate(out_a),
                          "id_b": np.concatenate(out_b)}).drop_duplicates()
        pb = (hash_array(d["id_a"])
              ^ (hash_array(d["id_b"]) * np.uint64(0x9E3779B97F4A7C15)))
        d["pair_bucket"] = (pb % np.uint64(n_buckets)).view(np.int64)
        # always Arrow out: a map_groups fn must return ONE block type
        # (Ray's builder asserts on mixed Arrow/pandas group outputs)
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    cand = banded.groupby("route").map_groups(
        route_pairs, batch_format="pandas")
    cand = cand.groupby("pair_bucket").map_groups(
        lambda g: pa.Table.from_pandas(
            g.drop_duplicates(["id_a", "id_b"]), preserve_index=False).replace_schema_metadata(None),
        batch_format="pandas").materialize()

    # --- stage 4: exact intersection counts, candidates only ----------
    # tagged id-bucket semi-join: candidate ids (is_cand=1) co-grouped
    # with corpus postings (is_cand=0); postings whose id has no
    # candidate row are dropped before the co-pair expansion. All
    # columns non-null (dtype invariant, see functions/graph.py).
    def cand_id_rows(t: pa.Table) -> pa.Table:
        ids = pd.concat([t["id_a"].to_pandas(), t["id_b"].to_pandas()],
                        ignore_index=True)
        nb = _bucket_of(ids, n_buckets)
        z = np.zeros(len(ids), np.int64)
        return pa.table({
            id_col: pa.Array.from_pandas(ids),
            "sh": pa.array(z), "sz": pa.array(z.astype(np.int32)),
            "is_cand": pa.array(np.ones(len(ids), np.int8)),
            "ibucket": pa.array(nb)})

    def emit_postings(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        p_sh, p_id, p_sz = [], [], []
        for i, t in zip(ids, texts):
            s = set(_word_shingles(t, shingle_k))
            if not s:
                continue
            p_sh.append(hash_array(sorted(s)).view(np.int64))
            p_id.append(np.full(len(s), i))
            p_sz.append(np.full(len(s), len(s), np.int32))
        if not p_sh:
            return pa.table({
                id_col: batch[id_col].slice(0, 0),
                "sh": pa.array([], pa.int64()),
                "sz": pa.array([], pa.int32()),
                "is_cand": pa.array([], pa.int8()),
                "ibucket": pa.array([], pa.int64())})
        pid = np.concatenate(p_id)
        return pa.table({
            id_col: pa.array(pid),
            "sh": pa.array(np.concatenate(p_sh)),
            "sz": pa.array(np.concatenate(p_sz)),
            "is_cand": pa.array(np.zeros(len(pid), np.int8)),
            "ibucket": pa.array(_bucket_of(pd.Series(pid), n_buckets))})

    postings = ds.select_columns([id_col, text_col]).map_batches(
        emit_postings, batch_format="pyarrow")
    tagged = postings.union(cand.map_batches(
        cand_id_rows, batch_format="pyarrow"))

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        is_c = g["is_cand"] == 1
        have = g.loc[is_c, id_col].unique()
        p = g.loc[~is_c & g[id_col].isin(have), [id_col, "sh", "sz"]]
        p = p.assign(bucket=(p["sh"].to_numpy().view(np.uint64)
                             % np.uint64(n_buckets)).view(np.int64))
        return p

    cand_postings = tagged.groupby("ibucket").map_groups(
        semi, batch_format="pandas")

    def bucket_copairs(g: pd.DataFrame):
        g = g.drop_duplicates(["sh", id_col])
        if len(g) < 2:
            return _empty_pair_table(id_type, [
                ("n", pa.int64()), ("sz_a", pa.int32()),
                ("sz_b", pa.int32()), ("is_cand", pa.int8()),
                ("pair_bucket", pa.int64())])
        m = g.merge(g, on="sh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        part = m.groupby([f"{id_col}_a", f"{id_col}_b"], sort=False) \
            .agg(n=("sh", "size"), sz_a=("sz_a", "first"),
                 sz_b=("sz_b", "first")).reset_index()
        part = part.rename(columns={f"{id_col}_a": "id_a",
                                    f"{id_col}_b": "id_b"})
        part["is_cand"] = np.zeros(len(part), np.int8)
        pb = (hash_array(part["id_a"])
              ^ (hash_array(part["id_b"]) * np.uint64(0x9E3779B97F4A7C15)))
        part["pair_bucket"] = (pb % np.uint64(n_buckets)).view(np.int64)
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    partials = cand_postings.groupby("bucket").map_groups(
        bucket_copairs, batch_format="pandas")

    def cand_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = np.zeros(n, np.int64)
        return pa.table({
            "id_a": t["id_a"], "id_b": t["id_b"],
            "n": pa.array(z), "sz_a": pa.array(z.astype(np.int32)),
            "sz_b": pa.array(z.astype(np.int32)),
            "is_cand": pa.array(np.ones(n, np.int8)),
            "pair_bucket": t["pair_bucket"]})

    final_in = partials.union(cand.map_batches(
        cand_tag, batch_format="pyarrow"))

    def finish(g: pd.DataFrame):
        is_c = g["is_cand"] == 1
        want = g.loc[is_c, ["id_a", "id_b"]].drop_duplicates()
        agg = g.loc[~is_c].groupby(["id_a", "id_b"], sort=False).agg(
            inter=("n", "sum"), sz_a=("sz_a", "first"),
            sz_b=("sz_b", "first")).reset_index()
        agg = agg.merge(want, on=["id_a", "id_b"], how="inner")
        if not len(agg):
            return _empty_pair_table(id_type,
                                     [("jaccard", pa.float64())])
        inter = agg["inter"].to_numpy().astype(np.int64)
        uni = agg["sz_a"].to_numpy().astype(np.int64) \
            + agg["sz_b"].to_numpy().astype(np.int64) - inter
        agg["jaccard"] = inter / uni
        agg = agg[agg["jaccard"] >= threshold]
        return pa.Table.from_pandas(agg[["id_a", "id_b", "jaccard"]],
                                    preserve_index=False).replace_schema_metadata(None)

    out = final_in.groupby("pair_bucket").map_groups(
        finish, batch_format="pandas")
    return _with_schema_seed(
        out, _empty_pair_table(id_type, [("jaccard", pa.float64())]))


def _with_schema_seed(out, table: pa.Table):
    """Union one zero-row TYPED block into a pair-generator's output so
    an all-empty result still carries the pair schema (an empty groupby
    produces zero groups -> zero blocks -> a schema-less Dataset whose
    to_pandas() has no columns)."""
    import ray.data

    return ray.data.from_arrow(table).union(out)


def _col_type(ds, col: str) -> pa.DataType:
    """Arrow type of `col` in a Dataset (ray Schema wraps names/types,
    not a pyarrow schema)."""
    sch = ds.schema()
    return dict(zip(sch.names, sch.types))[col]


def _filter_ids(batch: pa.Table, id_col, wanted):
    mask = pc.is_in(batch[id_col], value_set=pa.array(wanted))
    return batch.filter(mask)


def _empty_pair_table(id_type: pa.DataType, extra=()) -> pa.Table:
    """TYPED empty pair block. Empty pandas frames decay to object/
    float64 columns, which (a) trip Ray's size estimator ("cannot call
    `vectorize` on size 0 inputs") and (b) can poison downstream Arrow
    schema unification (null-typed columns). Every empty partial in the
    pair generators goes through here instead."""
    cols = {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type)}
    for name, tp in extra:
        cols[name] = pa.array([], tp)
    return pa.table(cols)


# ---------------------------------------------------------------------------
# simhash


def simhash_signatures(texts: list) -> np.ndarray:
    """64-bit SimHash per text (token-hash bit voting), vectorized via
    per-bit segmented sums."""
    toks = [t.split() if t else [] for t in texts]
    lens = np.array([len(t) for t in toks])
    n = len(texts)
    sig = np.zeros(n, np.uint64)
    nonempty = np.nonzero(lens > 0)[0]
    if not len(nonempty):
        return sig
    flat = hash_array([w for ts in toks for w in ts])
    offsets = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
    votes = np.zeros((len(nonempty), 64), np.int64)
    for b in range(64):
        bit = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
        votes[:, b] = np.add.reduceat(bit, offsets)
    bits = (votes > 0).astype(np.uint64)
    val = np.zeros(len(nonempty), np.uint64)
    for b in range(64):
        val |= bits[:, b] << np.uint64(b)
    sig[nonempty] = val
    return sig


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(len(x) if x.ndim else 1, np.int64)
    x = np.atleast_1d(x).copy()
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_pairs(ds, id_col: str, text_col: str, *, max_hamming: int = 3,
                  bands: int = 4, n_buckets: int = 64,
                  max_bucket: int = 200):
    """Near-dup pairs by SimHash: band the 64-bit signature into `bands`
    16-bit chunks (two equal chunks guarantee candidates for hamming<=3),
    groupby chunk buckets, verify exact hamming distance in-bucket.

    Returns a LAZY Dataset (id_a, id_b, hamming), id_a < id_b — matched
    pairs never materialize on the driver (cross-band dedup happens in a
    pair_bucket groupby, the same coarse-bucket trick as
    `ngram_jaccard_pairs` stage 3)."""
    id_type = _col_type(ds, id_col)

    from .graph import pair_bucket_of

    def emit(batch: pa.Table) -> pa.Table:
        # empty/null docs all hash to signature 0 and would pairwise
        # match each other — like minhash_lsh_pairs, they never pair
        texts = batch[text_col].to_pylist()
        keep = np.array([bool(t) and bool(t.split()) for t in texts])
        batch = batch.filter(pa.array(keep))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = simhash_signatures(batch[text_col].to_pylist())
        width = 64 // bands
        rows_id, rows_band, rows_bucket, rows_sig = [], [], [], []
        for b in range(bands):
            chunk = (sig >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            rows_id.append(ids)
            rows_band.append(np.full(len(ids), b, np.int64))
            rows_bucket.append(chunk.astype(np.int64))
            rows_sig.append(sig.astype(np.int64))
        band_arr = np.concatenate(rows_band)
        bucket_arr = np.concatenate(rows_bucket)
        # COARSE route (shared pair mixer): per-group Python overhead is
        # O(n_buckets), not O(distinct 16-bit chunk buckets)
        route = pair_bucket_of(band_arr, bucket_arr, n_buckets)
        return pa.table({
            id_col: pa.array(np.concatenate(rows_id)),
            "band": pa.array(band_arr),
            "bucket": pa.array(bucket_arr),
            "sig": pa.array(np.concatenate(rows_sig)),
            "route": pa.array(route),
        })

    banded = ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow")

    def route_pairs(g: pd.DataFrame):
        g = g.drop_duplicates(["band", "bucket", id_col])
        g = g.sort_values(["band", "bucket", id_col], kind="mergesort")
        n = len(g)
        if n < 2:
            return _empty_pair_table(id_type, [("hamming", pa.int64()),
                                               ("pair_bucket", pa.int64())])
        ids = g[id_col].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.uint64)
        codes = g.groupby(["band", "bucket"], sort=False).ngroup() \
            .to_numpy()
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        out_a, out_b, out_h = [], [], []
        for k in np.unique(sizes):          # one triu grid per size class
            if k < 2:
                continue
            if k > max_bucket:
                # a chunk shared by many docs is non-discriminative (the
                # stop-word of simhash banding): DROP it — same rule as
                # minhash_lsh_pairs — to keep pair fan-out linear
                continue
            segs = starts[sizes == k]
            grid = segs[:, None] + np.arange(int(k))[None, :]
            iu, ju = np.triu_indices(int(k), 1)
            ia = grid[:, iu].ravel()
            ib = grid[:, ju].ravel()
            hd = hamming64(sigs[ia], sigs[ib])
            ok = hd <= max_hamming          # verify in-bucket: only
            out_a.append(ids[ia[ok]])       # surviving pairs shuffle
            out_b.append(ids[ib[ok]])
            out_h.append(hd[ok])
        if not out_a:
            return _empty_pair_table(id_type, [("hamming", pa.int64()),
                                               ("pair_bucket", pa.int64())])
        d = pd.DataFrame({"id_a": np.concatenate(out_a),
                          "id_b": np.concatenate(out_b),
                          "hamming": np.concatenate(out_h)})
        pb = (hash_array(d["id_a"])
              ^ (hash_array(d["id_b"]) * np.uint64(0x9E3779B97F4A7C15)))
        d["pair_bucket"] = (pb % np.uint64(n_buckets)).view(np.int64)
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    pairs = banded.groupby("route").map_groups(
        route_pairs, batch_format="pandas")

    def dedup_bucket(g: pd.DataFrame):
        out = g.drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(out[["id_a", "id_b", "hamming"]],
                                    preserve_index=False).replace_schema_metadata(None)

    out = pairs.groupby("pair_bucket").map_groups(
        dedup_bucket, batch_format="pandas")
    return _with_schema_seed(
        out, _empty_pair_table(id_type, [("hamming", pa.int64())]))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (inverted-index shuffle)


def ngram_jaccard_pairs(ds, id_col: str, text_col: str, *,
                        threshold: float = 0.5, shingle_k: int = 3,
                        max_df: int | None = None, n_buckets: int = 64):
    """EXACT all-pairs n-gram Jaccard similarity join, fully distributed.

    Unlike `minhash_lsh_pairs` (approximate candidates, then verify), this
    computes exact |A ∩ B| via the classic inverted-index shuffle:

      1. map_batches: per doc, distinct word-`shingle_k`-shingles hashed to
         64-bit keys; emit posting rows (shingle, id, set_size) tagged
         with a coarse bucket = shingle % n_buckets.
      2. groupby(bucket) — only `n_buckets` groups, so the per-group
         Python overhead is O(n_buckets), not O(distinct shingles) — and
         inside each bucket one vectorized pandas self-merge on the
         shingle key yields co-occurrence rows; a groupby within the
         bucket pre-aggregates them to per-pair partial counts.
         Since any pair with J >= threshold > 0 shares a shingle, no
         qualifying pair is missed.
      3. the same coarse-bucket trick again for the final combine: each
         partial-count row is tagged pair_bucket = mix(id_a, id_b) %
         n_buckets; groupby(pair_bucket).map_groups sums partials and
         applies the threshold with ONE vectorized pandas groupby per
         bucket. (A naive groupby(id_a, id_b).aggregate() is correct but
         pays per-group overhead on millions of candidate pairs —
         measured 239s vs 2s at 1.1M pairs.) |A ∩ B| sums exactly
         because shingles are distinct per doc and partitioned
         disjointly by shingle bucket; J = inter / (|A| + |B| - inter).

    Scale notes: only (int64 key, id, int32 size) rows shuffle — never
    text. Size `n_buckets` so one bucket's postings fit a worker
    (postings/bucket ~ total_postings/n_buckets). Hot shingles
    (document-frequency df) emit O(df^2) co-occurrence rows; pass
    `max_df` to drop shingles with df > max_df (prefix-filter style). With
    max_df set the join is no longer exact for pairs whose ONLY shared
    shingles are ultra-common — at web scale those are noise pairs anyway;
    leave None for oracle-exact semantics. Shingle identity uses 64-bit
    hashes (collision odds ~n_shingles^2 / 2^64 — negligible).

    Seeds: reference `uniqueItems` pairwise deep-equality
    (/root/reference/jschon/vocabulary/validation.py:163-177) lifted
    across rows; tokenization matches `_word_shingles`.

    Returns a LAZY Dataset (id_a, id_b, inter, uni, jaccard) — matched
    pairs never materialize on the driver; feed `connected_components`
    directly or write_parquet, and `.to_pandas()` only at test scale.
    """
    id_type = _col_type(ds, id_col)

    def emit_postings(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        p_sh, p_id, p_sz = [], [], []
        for i, t in zip(ids, texts):
            s = set(_word_shingles(t, shingle_k))
            if not s:
                continue
            p_sh.append(hash_array(sorted(s)).view(np.int64))
            p_id.append(np.full(len(s), i))
            p_sz.append(np.full(len(s), len(s), np.int32))
        if not p_sh:
            return pa.table({"sh": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             id_col: batch[id_col].slice(0, 0),
                             "sz": pa.array([], pa.int32())})
        sh = np.concatenate(p_sh)
        return pa.table({"sh": pa.array(sh),
                         "bucket": pa.array(
                             (sh.view(np.uint64) % n_buckets)
                             .view(np.int64)),
                         id_col: pa.array(np.concatenate(p_id)),
                         "sz": pa.array(np.concatenate(p_sz))})

    postings = ds.select_columns([id_col, text_col]).map_batches(
        emit_postings, batch_format="pyarrow")

    def bucket_copairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["sh", id_col])
        if max_df is not None:
            df_counts = g.groupby("sh")["sh"].transform("size")
            g = g[df_counts <= max_df]
        if len(g) < 2:
            return _empty_pair_table(id_type, [
                ("n", pa.int64()), ("sz_a", pa.int32()),
                ("sz_b", pa.int32()), ("pair_bucket", pa.int64())])
        m = g.merge(g, on="sh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        part = m.groupby([f"{id_col}_a", f"{id_col}_b"], sort=False) \
            .agg(n=("sh", "size"), sz_a=("sz_a", "first"),
                 sz_b=("sz_b", "first")).reset_index()
        part = part.rename(columns={f"{id_col}_a": "id_a",
                                    f"{id_col}_b": "id_b"})
        pb = (hash_array(part["id_a"])
              ^ (hash_array(part["id_b"]) * np.uint64(0x9E3779B97F4A7C15)))
        part["pair_bucket"] = (pb % np.uint64(n_buckets)).view(np.int64)
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    copairs = postings.groupby("bucket").map_groups(
        bucket_copairs, batch_format="pandas")

    def combine_pairs(g: pd.DataFrame):
        agg = g.groupby(["id_a", "id_b"], sort=False).agg(
            inter=("n", "sum"), sz_a=("sz_a", "first"),
            sz_b=("sz_b", "first")).reset_index()
        inter = agg["inter"].to_numpy().astype(np.int64)
        uni = agg["sz_a"].to_numpy().astype(np.int64) \
            + agg["sz_b"].to_numpy().astype(np.int64) - inter
        agg["inter"] = inter
        agg["uni"] = uni
        agg["jaccard"] = inter / uni
        agg = agg[agg["jaccard"] >= threshold]
        if not len(agg):
            return _empty_pair_table(id_type, [
                ("inter", pa.int64()), ("uni", pa.int64()),
                ("jaccard", pa.float64())])
        return pa.Table.from_pandas(
            agg[["id_a", "id_b", "inter", "uni", "jaccard"]],
            preserve_index=False).replace_schema_metadata(None)

    out = copairs.groupby("pair_bucket").map_groups(
        combine_pairs, batch_format="pandas")
    return _with_schema_seed(
        out, _empty_pair_table(id_type, [
            ("inter", pa.int64()), ("uni", pa.int64()),
            ("jaccard", pa.float64())]))


def exact_distinct_counts(ds, cols):
    """Exact per-column distinct count (the exact complement of the HLL
    sketch in state/sketches.py).

    Scale shape: per-block `pc.unique` first, so only each block's
    distinct (col, value) pairs enter the shuffle — for low-cardinality
    columns the exchange carries ~n_distinct rows per block regardless of
    block size. Nulls are excluded (SQL count(DISTINCT ...) semantics).
    Values are compared as strings (injective for scalar columns).
    """
    cols = list(cols)
    num_buckets = 64

    from ..state.sketches import hash_array

    def block_unique(t: pa.Table) -> pa.Table:
        # vectorized: per-block unique values + an int64 value-hash
        # bucket, no per-value Python (the old plan's to_pylist + a
        # sort-based two-level groupby on raw strings was the profile
        # conversion's bench pig: 5-6 s at sf0.1 vs ~0.5 s here)
        import pandas as pd
        frames = []
        for ci, c in enumerate(cols):
            u = pc.unique(t[c])
            u = u.drop_null().cast(pa.string())
            if len(u) == 0:
                continue
            h = hash_array(pd.Series(u.to_numpy(zero_copy_only=False)))
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            frames.append(pa.table({
                "ci": pa.array(np.full(len(u), ci, np.int32)),
                "value": u,
                "_b": pa.array(b)}))
        if not frames:
            return pa.table({"ci": pa.array([], pa.int32()),
                             "value": pa.array([], pa.string()),
                             "_b": pa.array([], pa.int64())})
        return pa.concat_tables(frames)

    def bucket_count(g: pa.Table) -> pa.Table:
        # a (col, value) pair lands wholly in one bucket (bucket = value
        # hash), so per-bucket distinct-pair counts sum globally
        agg = g.group_by(["ci", "value"]).aggregate([])
        c2 = agg.group_by("ci").aggregate([([], "count_all")])
        return pa.table({"ci": c2["ci"],
                         "n": c2["count_all"].cast(pa.int64())})

    parts = ds.select_columns(cols) \
        .map_batches(block_unique, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_count,
                                  batch_format="pyarrow") \
        .to_pandas()              # <= num_buckets x n_cols tiny rows
    totals = parts.groupby("ci")["n"].sum() if len(parts) else {}
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "col": pa.array(cols, pa.string()),
        "n_distinct": pa.array(
            [int(totals.get(ci, 0)) for ci in range(len(cols))],
            pa.int64())}))


def _lev_vec(a: str, b: str, cap: int) -> int | None:
    """Levenshtein distance with a cap: returns the distance if <= cap,
    else None. Row-wise numpy DP; the in-row left-to-right insertion
    dependency is resolved with the prefix-min identity
    cur[j] = min(base[j], min_{l<j}(base[l] + (j-l))) so every row is
    a handful of vector ops, not a Python cell loop. Early-exits when a
    whole DP row exceeds the cap (band argument)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return None
    if la == 0 or lb == 0:
        d = max(la, lb)
        return d if d <= cap else None
    av = np.fromiter(map(ord, a), np.int32, la)
    bv = np.fromiter(map(ord, b), np.int32, lb)
    idx = np.arange(1, lb + 1, dtype=np.int64)
    prev = np.arange(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cost = (bv != av[i - 1]).astype(np.int64)
        base = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        run = np.minimum.accumulate(base - idx) + idx
        cur = np.empty(lb + 1, np.int64)
        cur[0] = i
        cur[1:] = np.minimum(np.minimum(base, run), i + idx)
        if cur.min() > cap:
            return None
        prev = cur
    d = int(prev[lb])
    return d if d <= cap else None


def _bag_bound(texts, alphabet_size: int = 128) -> np.ndarray:
    """Per-text character-count vectors (the multiset 'bag'). The bag
    distance max(Σ surplus_a, Σ surplus_b) between two bags is a lower
    bound on Levenshtein distance (each edit changes at most one
    character occurrence), so candidate pairs can be pruned with one
    vectorized counts-difference before any DP."""
    m = len(texts)
    out = np.zeros((m, alphabet_size), np.int32)
    for r, s in enumerate(texts):
        if s:
            v = np.fromiter(map(ord, s), np.int64, len(s))
            np.clip(v, 0, alphabet_size - 1, out=v)
            out[r] = np.bincount(v, minlength=alphabet_size)
    return out


def _lev_pairs(A_texts, B_texts, cap: int | None = None) -> np.ndarray:
    """Levenshtein distance for P string pairs in ONE batched DP: pad
    both sides to their max length and run the row-wise DP with every
    vector op spanning all P pairs at once (the same prefix-min identity
    as `_lev_vec` resolves the in-row dependency). Pairs whose left
    string is shorter freeze at their final row via a mask, so padding
    never corrupts a finished distance. O(Lmax) numpy row steps total
    instead of O(P) Python DP calls — the per-block verify cost is a few
    hundred vector ops regardless of candidate count.

    With `cap`, pairs whose DP row minimum exceeds cap retire from the
    loop (band early-exit, vectorized); their result is reported as
    cap + 1 ("too far"), never the true distance."""
    p = len(A_texts)
    if p == 0:
        return np.empty(0, np.int64)
    la = np.fromiter((len(s) for s in A_texts), np.int64, p)
    lb = np.fromiter((len(s) for s in B_texts), np.int64, p)
    lmax_a, lmax_b = int(la.max()), int(lb.max())
    A = np.zeros((p, max(lmax_a, 1)), np.int32)
    B = np.zeros((p, max(lmax_b, 1)), np.int32)
    for r, s in enumerate(A_texts):
        if s:
            A[r, :len(s)] = np.fromiter(map(ord, s), np.int32, len(s))
    for r, s in enumerate(B_texts):
        if s:
            B[r, :len(s)] = np.fromiter(map(ord, s), np.int32, len(s))
    idx = np.arange(1, lmax_b + 1, dtype=np.int64)
    prev = np.broadcast_to(np.arange(lmax_b + 1, dtype=np.int64),
                           (p, lmax_b + 1)).copy()
    out = np.empty(p, np.int64)
    done0 = la == 0
    out[done0] = lb[done0]
    if lmax_b == 0:
        out = la.copy()
        if cap is not None:
            out[out > cap] = cap + 1
        return out
    alive = la >= 1
    for i in range(1, lmax_a + 1):
        if not alive.any():
            break
        cost = (B[alive] != A[alive, i - 1:i]).astype(np.int64)
        pv = prev[alive]
        base = np.minimum(pv[:, 1:] + 1, pv[:, :-1] + cost)
        run = np.minimum.accumulate(base - idx, axis=1) + idx
        cur = np.empty_like(pv)
        cur[:, 0] = i
        cur[:, 1:] = np.minimum(np.minimum(base, run), i + idx)
        prev[alive] = cur
        ai = np.nonzero(alive)[0]
        fin = la[ai] == i
        if fin.any():
            fi = ai[fin]
            out[fi] = prev[fi, lb[fi]]
        alive[ai[fin]] = False
        if cap is not None:
            over = cur.min(axis=1) > cap
            if over.any():
                oi = ai[over & ~fin]
                out[oi] = cap + 1
                alive[oi] = False
    if cap is not None:
        out[out > cap] = cap + 1
    return out


def editdist_blocked_pairs(ds, id_col: str, text_col: str, *,
                           max_dist: int = 4, out_a: str = "id_a",
                           out_b: str = "id_b", out_dist: str = "dist"):
    """Blocked edit-distance near-dup join: pairs of rows in the same
    block whose Levenshtein distance is <= max_dist. Block key =
    (word count, first word) — the standard entity-resolution blocking
    tradeoff (declared semantics: candidates share the block key; the
    oracle mirrors the same key). Null/empty texts are excluded; equal
    ids never pair; a pair reachable through two blocks (duplicate ids
    with different texts) keeps its MIN distance.

    Scale shape: one narrow shuffle of (id, text, block); each block
    co-groups and verifies locally. Inside a block the verify is
    distinct-text-deduped (identical texts — e.g. a hot boilerplate
    value — cost ZERO DP calls and expand combinatorially only in the
    output), length-pruned by |len(a)-len(b)| <= max_dist, and
    cap-banded, so the quadratic only touches genuinely close distinct
    strings. Skewed hot blocks are bounded by key granularity; a hotter
    corpus would extend the key (first+last word) the same way.
    """
    id_type = _col_type(ds, id_col)

    def keyed(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        keep = pc.and_(pc.is_valid(txt), pc.not_equal(txt, ""))
        t = t.filter(pc.fill_null(keep, False))
        txt = t[text_col]
        words = pc.split_pattern(txt, " ")
        n_words = pc.list_value_length(words).cast(pa.int64())
        w1 = pc.list_element(words, 0)
        block = pc.binary_join_element_wise(
            pc.cast(n_words, pa.string()), w1, "|")
        return pa.table({out_a: t[id_col], "_text": txt, "_block": block})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    def verify_block(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[out_a].to_numpy()
        texts = g["_text"].to_numpy()
        # distinct-text dedup: DP once per distinct text pair, batched
        uniq, inv = np.unique(texts, return_inverse=True)
        m = len(uniq)
        groups = [np.nonzero(inv == u)[0] for u in range(m)]
        lens = np.fromiter((len(u) for u in uniq), np.int64, m)

        # candidate distinct pairs: upper triangle, length-pruned, then
        # bag-distance-pruned (both lossless lower bounds of Levenshtein)
        iu, iv = np.triu_indices(m, 1)
        keep = np.abs(lens[iu] - lens[iv]) <= max_dist
        iu, iv = iu[keep], iv[keep]
        if len(iu):
            bags = _bag_bound(uniq)
            diff = bags[iu].astype(np.int64) - bags[iv]
            bound = np.maximum(np.where(diff > 0, diff, 0).sum(axis=1),
                               np.where(diff < 0, -diff, 0).sum(axis=1))
            keep = bound <= max_dist
            iu, iv = iu[keep], iv[keep]
        d = _lev_pairs(uniq[iu], uniq[iv], cap=max_dist)
        ok = d <= max_dist
        iu, iv, d = iu[ok], iv[ok], d[ok]

        ra, rb, rd = [], [], []
        for u in range(m):                   # identical texts: dist 0
            g_u = groups[u]
            if len(g_u) > 1:
                ii, jj = np.triu_indices(len(g_u), 1)
                ra.append(ids[g_u[ii]])
                rb.append(ids[g_u[jj]])
                rd.append(np.zeros(len(ii), np.int64))
        for u, v, dist in zip(iu, iv, d):    # close distinct texts
            g_u, g_v = groups[u], groups[v]
            ra.append(np.repeat(ids[g_u], len(g_v)))
            rb.append(np.tile(ids[g_v], len(g_u)))
            rd.append(np.full(len(g_u) * len(g_v), dist, np.int64))
        if not ra:
            return pa.table({out_a: pa.array([], id_type),
                             out_b: pa.array([], id_type),
                             out_dist: pa.array([], pa.int64())})
        a = np.concatenate(ra)
        b = np.concatenate(rb)
        dist = np.concatenate(rd)
        neq = a != b                         # duplicate ids never self-pair
        a, b, dist = a[neq], b[neq], dist[neq]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        # arrow out, id-typed: never pandas object blocks (Ray's
        # block-size estimation degrades badly on object dtype)
        return pa.table({out_a: pa.array(a2).cast(id_type),
                         out_b: pa.array(b2).cast(id_type),
                         out_dist: pa.array(dist, pa.int64())})

    pairs = keyed_ds.groupby("_block").map_groups(
        verify_block, batch_format="pandas")
    merged = pairs.groupby([out_a, out_b]).min(out_dist)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([out_a, out_b, out_dist])

    return merged.map_batches(rename, batch_format="pyarrow")


def cross_doc_dup_ngrams(ds, id_col: str, text_col: str, *, k: int = 5,
                         n_buckets: int = 64,
                         out_total: str = "n_grams",
                         out_dup: str = "n_dup_grams"):
    """Cross-document duplicated n-gram detection — the core measurement
    of exact-substring dedup (count, per doc, how many of its distinct
    word k-grams also occur in at least one OTHER document). Docs with
    fewer than k words emit nothing.

    Three-stage shape (seeds: `uniqueItems` pairwise equality lifted
    across rows, /root/reference/jschon/vocabulary/validation.py:163-177,
    same inverted-index skeleton as `ngram_jaccard_pairs`):
      1. map_batches: per doc the DISTINCT k-gram set, hashed to 64-bit
         keys (collision odds ~n^2/2^64 — negligible); emit
         (bucket, gram_hash, doc_id) posting rows. Distinctness per doc
         is established here (a doc is one row), so postings are
         globally distinct (gram, doc) pairs — document frequency is a
         plain count downstream.
      2. groupby(coarse bucket = hash % n_buckets): inside each bucket
         ONE vectorized pandas transform('size') marks grams with
         df >= 2, then a per-doc partial (n_grams, n_dup) pre-aggregate.
         Per-group Python overhead is O(n_buckets), not O(grams).
      3. tiny groupby(doc_id).sum of the per-bucket partials.

    Scale notes: only (int64, int64, id) posting rows shuffle — text
    never moves; no doc-frequency table is ever broadcast or collected.
    Unlike the Jaccard join nothing here is quadratic in df — a
    boilerplate gram shared by a million docs is one transform('size')
    bucket row per doc, so hot grams cost O(df), not O(df^2).
    """
    def emit(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        hs, di = [], []
        for i, txt in zip(ids, texts):
            w = txt.split() if txt else []
            if len(w) < k:
                continue
            grams = {" ".join(w[j:j + k]) for j in range(len(w) - k + 1)}
            hs.append(hash_array(sorted(grams)).view(np.int64))
            di.append(np.full(len(grams), i))
        if not hs:
            return pa.table({"gh": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             id_col: t[id_col].slice(0, 0)})
        gh = np.concatenate(hs)
        return pa.table({"gh": pa.array(gh),
                         "bucket": pa.array(
                             (gh.view(np.uint64) % n_buckets)
                             .view(np.int64)),
                         id_col: pa.array(np.concatenate(di))})

    postings = ds.map_batches(emit, batch_format="pyarrow")

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        df_ge2 = g.groupby("gh")["gh"].transform("size") >= 2
        out = g.assign(_dup=df_ge2.astype(np.int64)) \
            .groupby(id_col, as_index=False) \
            .agg(_n=("gh", "size"), _d=("_dup", "sum"))
        return out

    partials = postings.groupby("bucket").map_groups(
        bucket_partials, batch_format="pandas")
    merged = partials.groupby(id_col).sum(["_n", "_d"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([id_col, out_total, out_dup])

    return merged.map_batches(rename, batch_format="pyarrow")


def segment_dedup_counts(ds, *, id_col: str = "doc_id", col: str = "text",
                         seg_words: int = 10, num_buckets: int = 64):
    """Line/segment-level exact dedup audit (RefinedWeb-style line dedup
    generalized to whitespace corpora): split each document into
    consecutive non-overlapping `seg_words`-word segments and report, per
    document, how many of its segments occur 2+ times ANYWHERE in the
    corpus (including elsewhere in the same document).

    The uniqueItems-across-a-corpus analogue at sub-document granularity
    (/root/reference/jschon/vocabulary/validation.py:163-177 checks
    within-row uniqueness; this is the corpus-wide member-level form).

    Plan (all narrow rows after the split; payload text never shuffles):
      1. map_batches: vectorized order-sensitive polynomial hash of each
         segment's word-hash run (one reduceat per batch — segment
         strings are never materialized), emitting
         (seg_hash, doc_id, _b = mix(seg_hash) % num_buckets).
      2. groupby(_b).map_groups: every occurrence of a segment lands in
         one bucket, so within-bucket value_counts are GLOBAL occurrence
         counts; emit per-doc partials (n_segs, n_dup_segs).
      3. groupby(doc_id).sum — O(docs) result.

    Segment equality is by 64-bit hash (same convention as exact_dedup's
    content_hash); equal word sequences <=> equal joined strings here
    because words are whitespace-free.
    """
    P = np.uint64(0x100000001B3)           # FNV-ish odd multiplier
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def emit_segments(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[col]))   # null text carries no segments
        texts = t[col].to_pandas()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(texts) == 0:
            return pa.table({"seg_hash": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        words = texts.str.split(" ")
        n_words = words.str.len().to_numpy().astype(np.int64)
        flat = pd.Series(np.concatenate(words.to_numpy()))
        h = hash_array(flat).astype(np.uint64)
        n_segs = -(-n_words // seg_words)            # ceil, >=1 per doc
        # global word positions -> position within the owning doc
        doc_start = np.concatenate(([0], np.cumsum(n_words)[:-1]))
        pos_in_doc = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(doc_start, n_words)
        w = P ** (pos_in_doc % seg_words).astype(np.uint64)
        seg_first = np.concatenate(([0], np.cumsum(n_segs)[:-1]))
        total_segs = int(n_segs.sum())
        seg_local = np.arange(total_segs, dtype=np.int64) - \
            np.repeat(seg_first, n_segs)
        seg_start = np.repeat(doc_start, n_segs) + seg_local * seg_words
        vals = h * w
        seg_hash = np.add.reduceat(vals, seg_start) if len(vals) else \
            np.array([], np.uint64)
        # distinguish short tail segments of equal weighted sum
        seg_len = np.minimum(
            seg_words,
            np.repeat(n_words, n_segs) -
            (seg_start - np.repeat(doc_start, n_segs)))
        seg_hash = (seg_hash ^ (seg_len.astype(np.uint64) << np.uint64(1))) \
            * MIX
        bucket = ((seg_hash * MIX) >> np.uint64(40)) % \
            np.uint64(num_buckets)
        return pa.table({
            "seg_hash": pa.array(seg_hash.view(np.int64)),
            id_col: pa.array(np.repeat(ids, n_segs)),
            "_b": pa.array(bucket.astype(np.int64)),
        })

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({id_col: pd.array([], "int64"),
                                 "n_segs": pd.array([], "int64"),
                                 "n_dup_segs": pd.array([], "int64")})
        occ = g.groupby("seg_hash")["seg_hash"].transform("size")
        out = g.assign(_dup=(occ >= 2).astype(np.int64)) \
            .groupby(id_col, as_index=False) \
            .agg(n_segs=("seg_hash", "size"), n_dup_segs=("_dup", "sum"))
        return out.astype({id_col: np.int64, "n_segs": np.int64,
                           "n_dup_segs": np.int64})

    segs = ds.map_batches(emit_segments, batch_format="pyarrow")
    partials = segs.groupby("_b").map_groups(bucket_counts,
                                             batch_format="pandas")
    final = partials.groupby(id_col).sum(["n_segs", "n_dup_segs"])
    return final.map_batches(
        lambda t: t.rename_columns([id_col, "n_segs", "n_dup_segs"]),
        batch_format="pyarrow")


def dedup_keep_canonical(ds, cc, id_col: str, *, node_col: str = "node",
                         comp_col: str = "component",
                         mode: str = "broadcast", num_buckets: int = 64):
    """Apply near-dup clusters to the corpus: keep every unpaired row
    plus, per cluster, only the canonical member (the min-id
    `component`). `cc` is the (node, component) output of
    `dup_clusters` / `connected_components`.

    ``mode="broadcast"`` (default): the removal set {node != component}
    is at most (cluster members - clusters) ids — tiny relative to the
    corpus (dup pairs are the rare case), so it broadcasts via ray.put
    into a stateless semi-join mask; no corpus shuffle.

    ``mode="shuffle"``: the scale complement for a removal set too large
    to broadcast — a hash-bucketed anti-join with NO driver or
    whole-worker materialization of the removal set. Removal ids are
    tagged and unioned with the corpus, both sides bucketed by
    hash(id) % num_buckets, and each bucket group filters its corpus
    rows against only the removal ids that hashed to the same bucket.
    The full corpus shuffles once (payload moves), so prefer broadcast
    whenever the removal set fits a worker heap.
    """
    if mode == "shuffle":
        return _keep_canonical_shuffle(ds, cc, id_col, node_col=node_col,
                                       comp_col=comp_col,
                                       num_buckets=num_buckets)
    if mode != "broadcast":
        raise ValueError(f"mode must be 'broadcast' or 'shuffle': {mode!r}")
    import ray

    removed = cc.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t[node_col], t[comp_col])))
                   .select([node_col]),
        batch_format="pyarrow").to_pandas()
    removed_ref = ray.put(np.sort(removed[node_col].to_numpy()))

    def keep(t: pa.Table, rem_ref) -> pa.Table:
        rem = ray.get(rem_ref)    # zero-copy read from the local store
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rem, ids)
        pos = np.clip(pos, 0, max(len(rem) - 1, 0))
        hit = (len(rem) > 0) & (rem[pos] == ids) if len(rem) else \
            np.zeros(len(ids), bool)
        return t.filter(pa.array(~hit))

    return ds.map_batches(keep, fn_args=(removed_ref,),
                          batch_format="pyarrow")


def _keep_canonical_shuffle(ds, cc, id_col: str, *, node_col: str,
                            comp_col: str, num_buckets: int):
    """Bucketed anti-join body of dedup_keep_canonical(mode="shuffle").

    Both sides get `_b = hash(id) % num_buckets`; removal rows carry the
    corpus schema with null payloads (`_rm = 1`) so the union is
    schema-stable; groupby(_b).map_groups filters each bucket's corpus
    rows against its removal ids with one vectorized is_in. State per
    group is O(bucket), never O(removal set).
    """
    corpus_schema = ds.schema().base_schema

    def tag_corpus(t: pa.Table) -> pa.Table:
        b = _bucket_of(pd.Series(t[id_col].to_pandas()), num_buckets)
        return t.append_column("_rm", pa.array(
            np.zeros(len(t), np.int8))).append_column("_b", pa.array(b))

    def tag_removed(t: pa.Table) -> pa.Table:
        rm = t.filter(pc.invert(pc.equal(t[node_col], t[comp_col])))
        ids = rm[node_col]
        cols = {}
        for field in corpus_schema:
            if field.name == id_col:
                cols[field.name] = ids.cast(field.type)
            else:
                cols[field.name] = pa.nulls(len(ids), field.type)
        out = pa.table(cols)
        b = _bucket_of(pd.Series(ids.to_pandas()), num_buckets)
        return out.append_column("_rm", pa.array(
            np.ones(len(ids), np.int8))).append_column("_b", pa.array(b))

    def bucket_filter(t: pa.Table) -> pa.Table:
        rm_ids = t.filter(pc.equal(t["_rm"], 1))[id_col]
        keep = t.filter(pc.equal(t["_rm"], 0))
        if len(rm_ids):
            mask = pc.invert(pc.is_in(
                keep[id_col], value_set=rm_ids.combine_chunks().unique()))
            keep = keep.filter(mask)
        return keep.drop_columns(["_rm", "_b"])

    tagged = ds.map_batches(tag_corpus, batch_format="pyarrow").union(
        cc.map_batches(tag_removed, batch_format="pyarrow"))
    return tagged.groupby("_b").map_groups(bucket_filter,
                                           batch_format="pyarrow")


def substring_dup_spans(ds, *, id_col: str = "doc_id", col: str = "text",
                        window: int = 40, stride: int = 10,
                        num_buckets: int = 64):
    """Exact substring (character-window) cross-document duplication
    audit — the bounded, shuffle-friendly form of suffix-array exact
    substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): every length-`window` character
    span starting at a multiple of `stride` is hashed; a span is
    DUPLICATED if its exact content occurs in >= 2 DISTINCT documents.
    Per document (only documents owning >= 1 duplicated span):

      n_windows     strided spans the doc contributes,
      n_dup_windows how many are cross-doc duplicated,
      dup_chars     characters covered by the union of its duplicated
                    spans (overlapping spans merged exactly).

    Distinct from segment_dedup_counts twofold: character granularity
    with OVERLAPPING spans (catches duplication at any alignment up to
    the stride), and cross-document occurrence (self-repeats inside
    one doc do not count).

    Plan (payload text never shuffles; all exchanged rows are 3-int):
      1. map_batches: each batch's texts concatenate into ONE UTF-32
         code-point buffer; every span hash is a vectorized weighted
         sum over a sliding window view (chunked so the temp matrix
         stays bounded) — no per-row Python loop, no span strings.
         Emits (w_hash, doc_id, pos, n_windows, _b=mix(w_hash)%B).
      2. groupby(_b).map_groups: all global occurrences of a span hash
         share a bucket, so a within-bucket distinct-doc count >= 2 is
         the GLOBAL cross-doc verdict; only duplicated rows survive,
         re-keyed _db=mix(doc_id)%B.
      3. groupby(_db).map_groups: per doc, sort positions once and
         merge intervals with one vectorized diff (union coverage =
         sum(min(gap, window)) + window).

    Span equality is by 64-bit polynomial hash over code points (same
    convention as segment_dedup_counts / exact_dedup); the oracle
    compares true substrings.
    """
    P = np.uint64(0x100000001B3)
    MIX = np.uint64(0x9E3779B97F4A7C15)
    weights = P ** np.arange(window, dtype=np.uint64)
    W, S = int(window), int(stride)

    def emit_windows(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "w_hash": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "n_windows": pa.array([], pa.int64()),
            "_b": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        texts = [x if x is not None else "" for x in t[col].to_pylist()]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buf = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32)
        lens = np.array([len(s) for s in texts], dtype=np.int64)
        nw = np.where(lens >= W, (lens - W) // S + 1, 0)
        total = int(nw.sum())
        if total == 0 or len(buf) < W:
            return empty
        doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        win_first = np.concatenate(([0], np.cumsum(nw)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(win_first, nw)
        pos = local * S
        starts = np.repeat(doc_off, nw) + pos
        view = np.lib.stride_tricks.sliding_window_view(buf, W)
        h = np.empty(total, dtype=np.uint64)
        CHUNK = 1 << 16
        for i in range(0, total, CHUNK):
            sl = starts[i:i + CHUNK]
            h[i:i + CHUNK] = (view[sl].astype(np.uint64)
                              * weights).sum(axis=1)
        h = (h ^ (h >> np.uint64(29))) * MIX
        bucket = ((h * MIX) >> np.uint64(40)) % np.uint64(num_buckets)
        return pa.table({
            "w_hash": pa.array(h.view(np.int64)),
            id_col: pa.array(np.repeat(ids, nw)),
            "pos": pa.array(pos),
            "n_windows": pa.array(np.repeat(nw, nw).astype(np.int64)),
            "_b": pa.array(bucket.astype(np.int64))})

    def bucket_dups(g: pd.DataFrame) -> pa.Table:
        # always Arrow out with a pinned schema — empty pandas partials
        # produce nameless PandasBlockSchema RefBundles that trip the
        # streaming executor's schema-unification warning
        cols = [id_col, "pos", "n_windows", "_db"]
        empty = pa.table({c: pa.array([], pa.int64()) for c in cols})
        if len(g) == 0:
            return empty
        ndoc = g.groupby("w_hash")[id_col].transform("nunique")
        g = g[ndoc >= 2]
        if len(g) == 0:
            return empty
        db = (_bucket_of(g[id_col], num_buckets)).astype(np.int64)
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(), pa.int64()),
            "pos": pa.array(g["pos"].to_numpy(), pa.int64()),
            "n_windows": pa.array(g["n_windows"].to_numpy(), pa.int64()),
            "_db": pa.array(db)})

    def doc_coverage(g: pd.DataFrame) -> pa.Table:
        cols = [id_col, "n_windows", "n_dup_windows", "dup_chars"]
        if len(g) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = g.sort_values([id_col, "pos"])
        ids = g[id_col].to_numpy()
        pos = g["pos"].to_numpy()
        new_doc = np.concatenate(([True], ids[1:] != ids[:-1]))
        gap = np.empty(len(g), dtype=np.int64)
        gap[:-1] = np.minimum(pos[1:] - pos[:-1], W)
        gap[-1] = W
        gap[np.concatenate((new_doc[1:], [True]))] = W   # last of each doc
        out = pd.DataFrame({id_col: ids, "_c": gap}) \
            .groupby(id_col, as_index=False) \
            .agg(n_dup_windows=("_c", "size"), dup_chars=("_c", "sum"))
        nwin = g.iloc[np.flatnonzero(new_doc)][[id_col, "n_windows"]]
        out = out.merge(nwin, on=id_col)
        out = out[cols].astype({c: np.int64 for c in cols})
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    wins = ds.map_batches(emit_windows, batch_format="pyarrow")
    dups = wins.groupby("_b").map_groups(bucket_dups,
                                         batch_format="pandas")
    per_doc = dups.groupby("_db").map_groups(doc_coverage,
                                             batch_format="pandas")
    return per_doc.map_batches(
        lambda t: t.select([id_col, "n_windows", "n_dup_windows",
                            "dup_chars"]),
        batch_format="pyarrow")
