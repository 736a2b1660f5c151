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


def connected_components(edges, *, src: str = "id_a", dst: str = "id_b",
                         out_node: str = "node",
                         out_comp: str = "component",
                         num_buckets: int = 64, max_rounds: int = 50):
    """Connected components of the undirected graph given by an edge
    Dataset. Returns a Dataset (out_node, out_comp) covering every node
    that appears in any edge; `out_comp` is the component's MINIMUM node
    id (lexicographic for strings) — a deterministic canonical
    representative, so results are partition-invariant.

    Partitioning assumption (documented per the custom-operator rule):
    none on the input — edges may arrive in any order/partitioning; the
    hash-bucket co-group re-keys everything. The driver loop holds only
    one scalar (changed-count) per round.
    """
    narrow = edges.select_columns([src, dst])

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
