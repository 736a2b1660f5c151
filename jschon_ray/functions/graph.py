"""Distributed connected components — duplicate-cluster formation.

Near-dup pair generators (MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine — ``functions/dedup.py`` / ``functions/similarity.py``)
emit candidate EDGES (id_a, id_b). Turning edges into dedup decisions
("keep one doc per cluster") needs the transitive closure: connected
components over the pair graph. jschon has no analogue (its uniqueItems,
/root/reference/jschon/vocabulary/validation.py:163-177, is within-row);
this is a SURVEY §2.9-style dataset-scale capability.

Algorithm: iterative min-label propagation (the "hash-to-min" family,
Rastogi et al., ICDE'13). Round 0 needs no labels relation (each endpoint
proposes itself + its partner straight from the edge blocks). Each later
round does two bounded shuffles:

  1. attach: co-group (edges keyed by endpoint) with (labels keyed by
     node) via ONE hash-bucketed groupby; inside each bucket a vectorized
     pandas hash-join emits `label(u) -> v` messages for every edge
     direction, plus a flagged self-message carrying the node's own label.
  2. combine: groupby over the messages' destination bucket; per node the
     new label is min(messages); `changed = new != own` is summed into a
     driver-side scalar for the convergence test.

Scale shape: shuffle volume per round is O(|E| + |V|) NARROW rows (node +
label only — payloads never enter); group count is `num_buckets`
(bounded, skew-balanced by hashing) regardless of key cardinality, and
all per-bucket work is vectorized (np/pandas groupby-min + merge), no
per-node Python dispatch. Rounds needed = graph diameter of the largest
component; near-dup clusters are short-diameter in practice, so the loop
typically runs 2-4 rounds. The tagged edge relation is materialized once
(reused every round); the labels relation ((node, label), the frontier
state) is materialized per round.

Dtype invariant (hard-won): NO column in the iterated relations is ever
nullable. A typed all-null Arrow column decays to float64/NaN when a
shuffle stage converts the block to pandas, after which int64 keys hash
into DIFFERENT buckets than their materialized edge counterparts and the
co-group silently drops messages. Role tags are therefore explicit int8
flag columns (`is_lab`, `is_self`) and never-read slots carry a same-type
dummy value instead of null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket_of(series: pd.Series, num_buckets: int) -> np.ndarray:
    """Deterministic vectorized hash bucket for int or string keys."""
    if pd.api.types.is_integer_dtype(series.dtype):
        v = series.to_numpy().astype(np.uint64)
        return (((v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40))
                % np.uint64(num_buckets)).astype(np.int64)
    h = pd.util.hash_pandas_object(series.astype(str), index=False)
    return (h.to_numpy() % np.uint64(num_buckets)).astype(np.int64)


def pair_bucket_of(a: np.ndarray, b: np.ndarray,
                   num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket for an int PAIR key — the one shared
    implementation (BASELINE.md records a real bug from an unmixed
    structured hash; keep every pair-keyed operator on this mixer)."""
    a = a.astype(np.uint64)
    b = b.astype(np.uint64)
    h = ((a << np.uint64(32)) ^ (b * np.uint64(0xC2B2AE3D27D4EB4F)))
    h = (h ^ (h >> np.uint64(29))) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(32)) % np.uint64(num_buckets)) \
        .astype(np.int64)


def _cc_local(a: np.ndarray, b: np.ndarray) -> tuple:
    """Vectorized min-label propagation with pointer doubling over an
    in-memory edge list. Returns (nodes, components) with component =
    min node id, matching the distributed path exactly.

    Nodes are factorized and the codes RANKED by node value so that
    min-code == min-node-id; each round is two np.minimum.at scatters
    plus a `lab[lab]` shortcut — O((N+E) log N) total."""
    codes, uniques = pd.factorize(np.concatenate([a, b]))
    uniques = np.asarray(uniques)
    order = np.argsort(uniques, kind="mergesort")
    rank = np.empty(len(uniques), np.int64)
    rank[order] = np.arange(len(uniques), dtype=np.int64)
    codes = rank[codes]
    by_rank = uniques[order]
    n = len(uniques)
    ca, cb = codes[:len(a)], codes[len(a):]
    lab = np.arange(n, dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, ca, lab[cb])
        np.minimum.at(new, cb, lab[ca])
        new = np.minimum(new, new[new])
        if np.array_equal(new, lab):
            break
        lab = new
    return by_rank, by_rank[lab]


def connected_components(edges, *, src: str = "id_a", dst: str = "id_b",
                         out_node: str = "node",
                         out_comp: str = "component",
                         num_buckets: int = 64, max_rounds: int = 50,
                         small_edge_limit: int = 2_000_000):
    """Connected components of the undirected graph given by an edge
    Dataset. Returns a Dataset (out_node, out_comp) covering every node
    that appears in any edge; `out_comp` is the component's MINIMUM node
    id (lexicographic for strings) — a deterministic canonical
    representative, so results are partition-invariant.

    Partitioning assumption (documented per the custom-operator rule):
    none on the input — edges may arrive in any order/partitioning; the
    hash-bucket co-group re-keys everything. The driver loop holds only
    one scalar (changed-count) per round.

    Scale split: the edge relation is the ALREADY-THRESHOLDED pair set —
    usually orders of magnitude smaller than the corpus — and each
    distributed round costs two shuffles of it. When the edge count is
    at most `small_edge_limit` (default 2M edges ≈ 32 MB of int64 pairs,
    a bounded driver-side footprint like a broadcast-join build side),
    the loop runs as ONE vectorized in-memory pass instead, saving the
    per-round scheduling floor that dominates small graphs. Above the
    bound — or with `small_edge_limit=None` — the distributed
    pointer-doubling loop (10M-edge evidence in BASELINE.md) takes over.
    """
    # project with map_batches, not select_columns: ray 2.49's Project
    # operator passes ZERO-ROW blocks through UNPROJECTED, so a
    # union-seeded pair Dataset (typed empty seed + empty group partials,
    # dedup._with_schema_seed) would emit mixed-width bundles and trip
    # the executor's schema-divergence warning with two non-empty-looking
    # schemas. Empty blocks mapped here lose their schema entirely, which
    # downstream unification ignores.
    def project(t: pa.Table) -> pa.Table:
        # drop edges with a NULL endpoint in BOTH paths: the local
        # fast path would otherwise factorize None to code -1 and remap
        # it onto the LAST-ranked real node (fabricating edges), while
        # the distributed loop's pandas groupby silently drops NaN keys
        # — the same convention, now explicit and path-identical
        t = t.select([src, dst])
        import pyarrow.compute as _pc
        return t.filter(_pc.and_(_pc.is_valid(t[src]),
                                 _pc.is_valid(t[dst])))

    narrow = edges.map_batches(project,
                               batch_format="pyarrow").materialize()

    if small_edge_limit is not None \
            and narrow.count() <= small_edge_limit:
        import ray.data

        df = narrow.to_pandas()
        if len(df) == 0:
            # an all-empty projected Dataset may carry no schema; the
            # pre-projection input still does
            sch = narrow.schema() or edges.schema()
            try:
                node_t = sch.types[sch.names.index(src)]
            except (AttributeError, ValueError):
                node_t = pa.int64()
            return ray.data.from_arrow(pa.table({
                out_node: pa.array([], node_t),
                out_comp: pa.array([], node_t)}))
        nodes, comps = _cc_local(df[src].to_numpy(), df[dst].to_numpy())
        return ray.data.from_arrow(pa.table({
            out_node: pa.array(nodes), out_comp: pa.array(comps)}))

    def init_msgs(t: pa.Table) -> pa.Table:
        a = t[src].to_pandas()
        b = t[dst].to_pandas()
        node = pd.concat([a, b, a, b], ignore_index=True)
        label = pd.concat([b, a, a, b], ignore_index=True)
        n2 = 2 * len(a)
        is_self = np.r_[np.zeros(n2, np.int8), np.ones(n2, np.int8)]
        return pa.table({
            "node": pa.Array.from_pandas(node),
            "label": pa.Array.from_pandas(label),
            "is_self": pa.array(is_self),
            "_bucket": pa.array(_bucket_of(node, num_buckets))})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("node", sort=False)["label"].min()
        own = g.loc[g["is_self"] == 1] \
            .groupby("node", sort=False)["label"].min()
        own = own.reindex(new.index)
        return pd.DataFrame({
            "node": new.index.to_numpy(),
            "label": new.to_numpy(),
            "changed": (new.to_numpy() != own.to_numpy())
            .astype(np.int64)})

    def tag_edges(t: pa.Table) -> pa.Table:
        a, b = t[src].to_pandas(), t[dst].to_pandas()
        key = pd.concat([a, b], ignore_index=True)
        partner = pd.concat([b, a], ignore_index=True)
        return pa.table({
            "key": pa.Array.from_pandas(key),
            "partner": pa.Array.from_pandas(partner),
            "label": pa.Array.from_pandas(key),  # dummy, is_lab=0
            "is_lab": pa.array(np.zeros(2 * len(a), np.int8)),
            "_bucket": pa.array(_bucket_of(key, num_buckets))})

    def tag_labels(t: pa.Table) -> pa.Table:
        """Label rows PLUS shortcut edges node<->label (pointer doubling:
        each round the graph gains an edge to the current representative,
        so the hop distance to the component minimum roughly halves —
        O(log diameter) rounds instead of O(diameter))."""
        node = t["node"].to_pandas()
        label = t["label"].to_pandas()
        cut = node[node != label]
        cut_lab = label[node != label]
        key = pd.concat([node, cut, cut_lab], ignore_index=True)
        partner = pd.concat([node, cut_lab, cut], ignore_index=True)
        lab_col = pd.concat([label, cut, cut_lab], ignore_index=True)
        is_lab = np.r_[np.ones(len(node), np.int8),
                       np.zeros(2 * len(cut), np.int8)]
        return pa.table({
            "key": pa.Array.from_pandas(key),
            "partner": pa.Array.from_pandas(partner),
            "label": pa.Array.from_pandas(lab_col),  # dummy on shortcuts
            "is_lab": pa.array(is_lab),
            "_bucket": pa.array(_bucket_of(key, num_buckets))})

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_lab = g["is_lab"] == 1
        lab_g = g.loc[is_lab, ["key", "label"]] \
            .groupby("key", sort=False)["label"].min().reset_index()
        edge_g = g.loc[~is_lab, ["key", "partner"]]
        joined = edge_g.merge(lab_g, on="key", how="inner")
        node = pd.concat([joined["partner"], lab_g["key"]],
                         ignore_index=True)
        label = pd.concat([joined["label"], lab_g["label"]],
                          ignore_index=True)
        is_self = np.r_[np.zeros(len(joined), np.int8),
                        np.ones(len(lab_g), np.int8)]
        return pd.DataFrame({
            "node": node.to_numpy(), "label": label.to_numpy(),
            "is_self": is_self,
            "_bucket": _bucket_of(node, num_buckets)})

    msgs = narrow.map_batches(init_msgs, batch_format="pyarrow")
    labels = msgs.groupby("_bucket").map_groups(
        combine, batch_format="pandas").materialize()
    tagged_edges = narrow.map_batches(
        tag_edges, batch_format="pyarrow").materialize()

    rounds = 0
    while (labels.sum("changed") or 0) != 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} "
                "rounds (component diameter exceeds the round budget)")
        lab = labels.drop_columns(["changed"])
        tagged = tagged_edges.union(
            lab.map_batches(tag_labels, batch_format="pyarrow"))
        msgs = tagged.groupby("_bucket").map_groups(
            attach, batch_format="pandas")
        labels = msgs.groupby("_bucket").map_groups(
            combine, batch_format="pandas").materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({out_node: t["node"], out_comp: t["label"]})

    return labels.map_batches(finish, batch_format="pyarrow")


def dup_clusters(pairs, *, src: str = "id_a", dst: str = "id_b",
                 id_name: str = "node", comp_name: str = "component",
                 num_buckets: int = 64):
    """Duplicate clusters from a candidate-pair Dataset: every paired id
    mapped to its cluster representative (min id in the component). The
    dedup decision downstream is `keep rows where node == component`."""
    return connected_components(pairs, src=src, dst=dst, out_node=id_name,
                                out_comp=comp_name,
                                num_buckets=num_buckets)


def triangle_count(edges, *, src: str = "id_a", dst: str = "id_b",
                   num_buckets: int = 64,
                   degree_mode: str = "broadcast"):
    """Exact global triangle count via degree-ordered wedge checking
    (the standard MapReduce "node-iterator++" plan): orient each edge
    low-rank -> high-rank where rank = (degree, node), generate each
    node's out-neighbor pairs (wedges), and count wedges whose closing
    (v, w) is itself an edge.

    Scale shape: orientation bounds every out-degree by O(sqrt(2|E|)),
    so wedge volume is O(|E|^1.5) worst-case and near-linear on sparse
    graphs; wedges and edges co-group through ONE hash-bucket shuffle
    keyed on the closing pair — per bucket the match is a vectorized
    pandas merge.

    degree_mode picks how each edge learns its endpoint degrees:
      * "broadcast" (default): the degree map (|V| ints) is ray.put
        once and read zero-copy in every orient task — right while the
        node table fits a worker heap.
      * "join": two extra hash-bucket co-groups attach deg(u) then
        deg(v) as NARROW rows — no driver/worker O(|V|) state at all;
        the scale path past broadcast-size |V|. Identical output.

    Returns one row: n_nodes, n_edges, n_wedges, n_triangles.
    """
    import ray

    if degree_mode not in ("broadcast", "join"):
        raise ValueError(f"degree_mode must be 'broadcast' or 'join', "
                         f"got {degree_mode!r}")

    # 1) normalized distinct undirected edges (u < v), keys-only
    def norm(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        d = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    # distinct via a bucketed map_groups (multi-key ray groupby pays a
    # per-block shuffle cost that dominates on many-tiny-block inputs)
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        b = pair_bucket_of(
            t["u"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False), num_buckets)
        return t.append_column("_b", pa.array(b))

    e = edges.map_batches(norm, batch_format="pyarrow") \
        .map_batches(add_pair_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(
            lambda g: g.drop(columns=["_b"]).drop_duplicates(),
            batch_format="pandas").materialize()
    n_edges = e.count()

    # 2) degrees -> broadcast rank map
    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.concat_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()])})

    deg_ds = e.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("n").count()

    if degree_mode == "broadcast":
        deg = deg_ds.to_pandas()
        if deg.empty:  # empty edge set loses its schema through pandas
            return pd.DataFrame({"n_nodes": [0], "n_edges": [0],
                                 "n_wedges": [0], "n_triangles": [0]})
        deg = deg.sort_values("n")
        nodes = deg["n"].to_numpy(np.int64)
        counts = deg["count()"].to_numpy(np.int64)
        n_nodes = len(nodes)
        deg_ref = ray.put((nodes, counts))

        # 3) orient + wedge generation per out-node bucket
        def orient(t: pa.Table) -> pa.Table:
            dnodes, dcounts = ray.get(deg_ref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            # sorted-array lookup (every endpoint is present by
            # construction)
            du = dcounts[np.searchsorted(dnodes, u)]
            dv = dcounts[np.searchsorted(dnodes, v)]
            fwd = (du < dv) | ((du == dv) & (u < v))
            s = np.where(fwd, u, v)
            d = np.where(fwd, v, u)
            return pa.table({"s": pa.array(s), "d": pa.array(d)})

        oriented = e.map_batches(orient, batch_format="pyarrow")
    else:
        # join mode: attach deg(u) then deg(v) via two tagged-union
        # co-groups of narrow all-int rows; no O(|V|) state anywhere.
        n_nodes = deg_ds.count()
        if n_nodes == 0:
            return pd.DataFrame({"n_nodes": [0], "n_edges": [0],
                                 "n_wedges": [0], "n_triangles": [0]})

        def deg_rows(t: pa.Table) -> pa.Table:
            n = t["n"].to_numpy(zero_copy_only=False)
            c = t["count()"].to_numpy(zero_copy_only=False)
            z = np.zeros(len(n), np.int64)
            return pa.table({
                "key": pa.array(n), "other": pa.array(n),  # dummy
                "du": pa.array(z), "deg": pa.array(c.astype(np.int64)),
                "is_deg": pa.array(np.ones(len(n), np.int8)),
                "_b": pa.array(_bucket_of(pd.Series(n), num_buckets))})

        def edge_rows_u(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            z = np.zeros(len(u), np.int64)
            return pa.table({
                "key": pa.array(u), "other": t["v"],
                "du": pa.array(z), "deg": pa.array(z),
                "is_deg": pa.array(np.zeros(len(u), np.int8)),
                "_b": pa.array(_bucket_of(pd.Series(u), num_buckets))})

        def attach_u(g: pd.DataFrame):
            is_d = g["is_deg"] == 1
            dd = g.loc[is_d, ["key", "deg"]]
            ed = g.loc[~is_d, ["key", "other"]]
            j = ed.merge(dd, on="key", how="inner")
            out = pd.DataFrame({
                "key": j["other"].to_numpy(),       # next round: key = v
                "other": j["key"].to_numpy(),       # u rides along
                "du": j["deg"].to_numpy(),
                "deg": np.zeros(len(j), np.int64),
                "is_deg": np.zeros(len(j), np.int8)})
            out["_b"] = _bucket_of(out["key"], num_buckets)
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

        with_du = e.map_batches(edge_rows_u, batch_format="pyarrow") \
            .union(deg_ds.map_batches(deg_rows, batch_format="pyarrow")) \
            .groupby("_b").map_groups(attach_u, batch_format="pandas")

        def attach_v(g: pd.DataFrame):
            is_d = g["is_deg"] == 1
            dd = g.loc[is_d, ["key", "deg"]]
            ed = g.loc[~is_d, ["key", "other", "du"]]
            j = ed.merge(dd, on="key", how="inner")
            u = j["other"].to_numpy()
            v = j["key"].to_numpy()
            du = j["du"].to_numpy()
            dv = j["deg"].to_numpy()
            fwd = (du < dv) | ((du == dv) & (u < v))
            return pa.table({"s": pa.array(np.where(fwd, u, v)),
                             "d": pa.array(np.where(fwd, v, u))})

        oriented = with_du.union(
            deg_ds.map_batches(deg_rows, batch_format="pyarrow")) \
            .groupby("_b").map_groups(attach_v, batch_format="pandas")

    def wedges_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["s", "d"], kind="mergesort")
        s = g["s"].to_numpy()
        d = g["d"].to_numpy()
        n = len(g)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        out_v, out_w = [], []
        # vectorized pair expansion per out-degree class: all segments
        # of length k expand with one index grid (k is bounded by the
        # orientation at O(sqrt(2E)))
        for k in np.unique(sizes):
            if k < 2:
                continue
            segs = starts[sizes == k]
            block = d[(segs[:, None] + np.arange(k)[None, :])]
            iu, ju = np.triu_indices(int(k), 1)
            out_v.append(block[:, iu].ravel())
            out_w.append(block[:, ju].ravel())
        if not out_v:
            return pd.DataFrame({"v": np.array([], np.int64),
                                 "w": np.array([], np.int64)})
        return pd.DataFrame({"v": np.concatenate(out_v),
                             "w": np.concatenate(out_w)})

    def add_sbucket(t: pa.Table) -> pa.Table:
        b = _bucket_of(pd.Series(t["s"].to_numpy(zero_copy_only=False)),
                       num_buckets)
        return t.append_column("_b", pa.array(b))

    wedge_ds = oriented.map_batches(add_sbucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(
            lambda g: wedges_of(g.drop(columns=["_b"])),
            batch_format="pandas")

    # 4) close wedges against the oriented edge set: tagged-union
    # co-group on the (lo, hi) closing pair, one shuffle
    def tag_wedge(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        lo = np.minimum(v, w)
        hi = np.maximum(v, w)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "is_edge": pa.array(
                             np.zeros(len(lo), np.int8))})

    def tag_edge(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array(u), "hi": pa.array(v),
                         "is_edge": pa.array(
                             np.ones(len(u), np.int8))})

    tagged = wedge_ds.map_batches(tag_wedge, batch_format="pyarrow") \
        .union(e.map_batches(tag_edge, batch_format="pyarrow"))

    def pair_bucket(t: pa.Table) -> pa.Table:
        b = pair_bucket_of(
            t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False), num_buckets)
        return t.append_column("_b", pa.array(b))

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["is_edge"].to_numpy() == 1
        ed = g[is_e][["lo", "hi"]].assign(_hit=1)
        wd = g[~is_e][["lo", "hi"]]
        n_w = len(wd)
        if not n_w or not len(ed):
            tri = 0
        else:
            m = wd.merge(ed, on=["lo", "hi"], how="inner")
            tri = int(len(m))
        return pd.DataFrame({"n_wedges": [int(n_w)],
                             "n_triangles": [tri]})

    parts = tagged.map_batches(pair_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(close_bucket, batch_format="pandas") \
        .to_pandas()
    return pd.DataFrame({
        "n_nodes": [int(n_nodes)], "n_edges": [int(n_edges)],
        "n_wedges": [int(parts["n_wedges"].sum())],
        "n_triangles": [int(parts["n_triangles"].sum())]})


def pagerank(edges, *, src: str = "id_a", dst: str = "id_b",
             damping: float = 0.85, iters: int = 10,
             decimals: int = 8):
    """PageRank over a directed edge Dataset by distributed power
    iteration: each round, one map_batches pass over the (never
    reshuffled) edge blocks computes per-block contribution partials
    against the BROADCAST rank vector (ray.put once per round), and one
    bounded groupby(dst-bucket) merge plus the driver's O(|V|) update
    closes the round. Dangling mass is redistributed uniformly.

    Posture: the rank/out-degree vectors are |V| floats on the driver —
    right while the node table is orders of magnitude smaller than the
    edge table (the usual catalog-vs-interactions shape). Beyond
    driver-heap |V| use `pagerank_dataset` (ranks live as a Dataset,
    bucket co-group per round, driver memory O(1)).

    MULTIGRAPH semantics (differs from triangle_count's norm, which
    dedupes): duplicate edge rows each carry a contribution — an edge
    repeated k times gives its destination k shares — and a self-loop
    feeds rank back to its own node. Dedup/drop-self-loops upstream if
    simple-graph semantics are wanted; `pagerank_dataset` matches this
    convention exactly.

    Returns a DataFrame (node, rank) with ranks rounded to `decimals`
    (sum ~= 1).
    """
    import ray

    def norm(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": pa.array(a), "d": pa.array(b)})

    # few fat blocks: the edge relation is re-read every iteration and
    # per-block scheduling overhead would otherwise dominate the rounds
    e = edges.map_batches(norm, batch_format="pyarrow") \
        .repartition(16).materialize()

    # node universe + out-degrees (keys-only aggregates)
    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.concat_arrays(
            [t["s"].combine_chunks(), t["d"].combine_chunks()])})

    node_df = e.map_batches(ends, batch_format="pyarrow") \
        .groupby("n").count().to_pandas()
    if node_df.empty:    # empty edge set: nothing to rank
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})
    nodes = np.sort(node_df["n"].to_numpy(np.int64))
    nv = len(nodes)
    outdeg = np.zeros(nv, np.int64)
    od = e.groupby("s").count().to_pandas()
    outdeg[np.searchsorted(nodes, od["s"].to_numpy(np.int64))] = \
        od["count()"].to_numpy(np.int64)

    rank = np.full(nv, 1.0 / nv)
    idx_ref = ray.put(nodes)

    for _ in range(int(iters)):
        share = np.zeros(nv)
        nz = outdeg > 0
        share[nz] = rank[nz] / outdeg[nz]
        share_ref = ray.put(share)

        def contrib(t: pa.Table) -> pa.Table:
            nd = ray.get(idx_ref)
            sh = ray.get(share_ref)
            s = t["s"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(nd, s)
            di = np.searchsorted(nd, d)
            # per-block partial: aggregate by destination before the
            # shuffle so at most |V| rows leave a block
            dsum = np.zeros(len(sh))
            np.add.at(dsum, di, sh[si])
            hit = np.flatnonzero(dsum)
            return pa.table({"di": pa.array(hit.astype(np.int64)),
                             "c": pa.array(dsum[hit])})

        from ray.data.aggregate import Sum
        agg = e.map_batches(contrib, batch_format="pyarrow") \
            .groupby("di").aggregate(Sum("c", alias_name="c")) \
            .to_pandas()
        incoming = np.zeros(nv)
        incoming[agg["di"].to_numpy(np.int64)] = agg["c"].to_numpy()
        dangling = float(rank[~nz].sum()) if (~nz).any() else 0.0
        rank = ((1.0 - damping) / nv
                + damping * (incoming + dangling / nv))

    return pd.DataFrame({"node": nodes,
                         "rank": np.round(rank, decimals)})


def pagerank_dataset(edges, *, src: str = "id_a", dst: str = "id_b",
                     damping: float = 0.85, iters: int = 10,
                     decimals: int = 8, num_buckets: int = 64):
    """Dataset-resident PageRank — the scale path past broadcast-size
    |V| that `pagerank`'s docstring promises. The rank/out-degree state
    lives AS a Dataset (node, outdeg, rank, _b) the whole run; the
    driver holds only two scalars per round (node count, dangling
    mass). Identical semantics to `pagerank` (multigraph contributions,
    self-loops allowed, uniform dangling redistribution).

    Per round, two bounded hash-bucket co-groups of NARROW rows (same
    shape as `connected_components`):
      1. attach: edges keyed by source + state rows keyed by node meet
         in one groupby(_b); a vectorized pandas join emits (dst,
         contribution) rows PRE-AGGREGATED by destination within the
         bucket, so at most |V| rows per bucket enter the next shuffle.
      2. update: contribution partials + state rows co-group on the
         destination's bucket; per node
         rank' = (1-d)/|V| + d * (sum(contrib) + dangling/|V|).
    The dangling scalar is a keys-only aggregate over the state (one
    float to the driver per round). Edge relation is materialized once
    (re-read every round); state is materialized per round.

    Dtype invariant: no nullable columns in the iterated relations
    (see module docstring) — dummy same-type values, int8 role flags.

    Returns a LAZY Dataset (node, rank), rank rounded to `decimals`.
    """
    def norm(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(a), "d": pa.array(b),
            "share": pa.array(np.zeros(len(a))),       # dummy, is_state=0
            "is_state": pa.array(np.zeros(len(a), np.int8)),
            "_b": pa.array(_bucket_of(pd.Series(a), num_buckets))})

    # few fat blocks: re-read every round, don't pay per-tiny-block
    # scheduling each iteration
    e = edges.map_batches(norm, batch_format="pyarrow") \
        .repartition(16).materialize()

    # ---- initial state: node universe with out-degrees ----------------
    def ends(t: pa.Table) -> pa.Table:
        n = np.concatenate([t["key"].to_numpy(zero_copy_only=False),
                            t["d"].to_numpy(zero_copy_only=False)])
        is_src = np.r_[np.ones(t.num_rows, np.int64),
                       np.zeros(t.num_rows, np.int64)]
        return pa.table({"node": pa.array(n), "odeg": pa.array(is_src)})

    from ray.data.aggregate import Sum
    node_ds = e.map_batches(ends, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("odeg", alias_name="outdeg"))
    nv = node_ds.count()
    if nv == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))

    def init_state(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(node),
            "outdeg": t["outdeg"],
            "rank": pa.array(np.full(len(node), 1.0 / nv)),
            "_b": pa.array(_bucket_of(pd.Series(node), num_buckets))})

    state = node_ds.map_batches(init_state,
                                batch_format="pyarrow").materialize()
    base = (1.0 - damping) / nv

    def _dangling(st) -> float:
        def part(t: pa.Table) -> pa.Table:
            od = t["outdeg"].to_numpy(zero_copy_only=False)
            r = t["rank"].to_numpy(zero_copy_only=False)
            return pa.table({"dm": pa.array([float(r[od == 0].sum())])})
        return float(st.map_batches(part, batch_format="pyarrow")
                     .sum("dm") or 0.0)

    def as_msgs(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        od = t["outdeg"].to_numpy(zero_copy_only=False)
        r = t["rank"].to_numpy(zero_copy_only=False)
        share = np.where(od > 0, r / np.maximum(od, 1), 0.0)
        return pa.table({
            "key": pa.array(node), "d": pa.array(node),  # d dummy
            "share": pa.array(share),
            "is_state": pa.array(np.ones(len(node), np.int8)),
            "_b": t["_b"]})

    def attach(g: pd.DataFrame):
        is_s = g["is_state"] == 1
        sh = g.loc[is_s & (g["share"] > 0.0), ["key", "share"]]
        ed = g.loc[~is_s, ["key", "d"]]
        j = ed.merge(sh, on="key", how="inner")
        if not len(j):
            return pa.table({"node": pa.array([], pa.int64()),
                             "c": pa.array([], pa.float64()),
                             "_b": pa.array([], pa.int64())})
        part = j.groupby("d", sort=False)["share"].sum().reset_index()
        part.columns = ["node", "c"]
        part["_b"] = _bucket_of(part["node"], num_buckets)
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    for _ in range(int(iters)):
        dang_share = damping * _dangling(state) / nv

        contrib = e.union(state.map_batches(
            as_msgs, batch_format="pyarrow")) \
            .groupby("_b").map_groups(attach, batch_format="pandas")

        def as_upd(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "node": t["node"],
                "c": pa.array(np.zeros(n)),              # dummy
                "outdeg": t["outdeg"],
                "is_state": pa.array(np.ones(n, np.int8)),
                "_b": t["_b"]})

        def tag_contrib(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "node": t["node"], "c": t["c"],
                "outdeg": pa.array(np.zeros(n, np.int64)),  # dummy
                "is_state": pa.array(np.zeros(n, np.int8)),
                "_b": t["_b"]})

        def update(g: pd.DataFrame, _ds=dang_share):
            is_s = g["is_state"] == 1
            st = g.loc[is_s, ["node", "outdeg"]]
            inc = g.loc[~is_s].groupby("node", sort=False)["c"].sum()
            inc = inc.reindex(st["node"]).fillna(0.0).to_numpy()
            out = pd.DataFrame({
                "node": st["node"].to_numpy(),
                "outdeg": st["outdeg"].to_numpy(),
                "rank": base + damping * inc + _ds})
            out["_b"] = _bucket_of(out["node"], num_buckets)
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

        # repartition caps the state's block count: the sort-based
        # groupby emits ~as many blocks as it receives, and the union
        # feeds each round's output back in — without the cap the block
        # count (and with it scheduling cost) compounds ~2x per round
        state = contrib.map_batches(tag_contrib, batch_format="pyarrow") \
            .union(state.map_batches(as_upd, batch_format="pyarrow")) \
            .groupby("_b").map_groups(update, batch_format="pandas") \
            .repartition(16).materialize()

    def finish(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["node"],
                         "rank": pa.array(np.round(r, decimals))})

    return state.map_batches(finish, batch_format="pyarrow")
