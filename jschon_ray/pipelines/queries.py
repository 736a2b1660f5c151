"""Driver-contract query registry: Ray pipelines + DuckDB oracle SQL.

Every implemented operator family from SURVEY.md §2 gets a `queries()`
entry over the driver testdata tables; SQL-expressible ones carry a DuckDB
oracle with IDENTICAL column names and value semantics (the driver compares
row counts, schemas, and order-insensitive value hashes at sf0.01).

Non-SQL-expressible entries (sketches, LSH, drift, the clips flagship) are
registered without an oracle -> the driver records a rows-only check.

Determinism notes:
  * float aggregates whose summation order varies (sums/avgs) are rounded
    to 4 decimals on BOTH sides;
  * ratio columns divide the same two exact integers on both sides — no
    rounding needed;
  * cosine similarities are computed in float64 and rounded to 1e-6 on both
    sides before ranking/thresholding.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import LANG_MARKERS
from ..sources.io import read_table, table_path


def finalize(out: pd.DataFrame, schema: dict) -> pd.DataFrame:
    """Typed-empty-safe finalize for Dataset.to_pandas() results.

    Ray's ``to_pandas()`` on an all-empty result (e.g. a groupby whose
    input matched zero rows) yields a DataFrame with NO columns, so a
    downstream ``out[col].astype(...)`` raises KeyError. This guarantees
    every column in ``schema`` exists with the requested dtype and in the
    given order: present columns are cast, columns missing from an EMPTY
    frame are created as typed empties. A missing column on a non-empty
    frame is still an error (that is a real bug, not the empty-result
    artifact).

    ``schema`` maps column name -> pandas dtype, or ``None`` to keep the
    existing dtype (object columns, already-typed ones).
    """
    cols = {}
    for col, dtype in schema.items():
        if col in out.columns:
            s = out[col]
            cols[col] = s if dtype is None else s.astype(dtype)
        elif len(out) == 0:
            cols[col] = pd.Series([], dtype=(dtype or object))
        else:
            raise KeyError(col)
    return pd.DataFrame(cols)


# ---------------------------------------------------------------------------
# per-row validation specs used by the validate_* queries

ORDERS_SPEC = {
    "$id": "https://jschon-ray.dev/specs/orders",
    "type": "object",
    "required": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    "properties": {
        "o_orderkey": {"type": "integer", "exclusiveMinimum": 0},
        "o_custkey": {"type": "integer", "exclusiveMinimum": 0},
        "o_orderstatus": {"enum": ["O", "F", "P"]},
        "o_totalprice": {"exclusiveMinimum": 0, "maximum": 300000},
        "o_orderpriority": {"pattern": "^[1-5]-"},
    },
}

# SQL mirror of ORDERS_SPEC, with jschon presence semantics (a null column
# value = absent property: subschema not applied, required fails)
_ORDERS_VALID_SQL = """(
    o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
    AND o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
    AND (o_orderkey IS NULL OR o_orderkey > 0)
    AND (o_custkey IS NULL OR o_custkey > 0)
    AND (o_orderstatus IS NULL OR o_orderstatus IN ('O','F','P'))
    AND (o_totalprice IS NULL OR (o_totalprice > 0 AND o_totalprice <= 300000))
    AND (o_orderpriority IS NULL OR regexp_matches(o_orderpriority, '^[1-5]-'))
)"""

LINEITEM_SPEC = {
    "$id": "https://jschon-ray.dev/specs/lineitem",
    "type": "object",
    "required": ["l_orderkey", "l_linenumber", "l_quantity"],
    "properties": {
        "l_quantity": {"type": "integer", "minimum": 1, "maximum": 50},
        "l_discount": {"minimum": 0, "maximum": 0.1, "multipleOf": 0.01},
        "l_returnflag": {"enum": ["A", "N", "R"]},
        "l_linestatus": {"enum": ["O", "F"]},
    },
}

# multipleOf 0.01 in Decimal semantics == shortest-repr has <=2 decimals
_LINEITEM_VALID_SQL = """(
    l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
    AND l_quantity IS NOT NULL
    AND (l_quantity IS NULL OR (l_quantity = floor(l_quantity)
         AND l_quantity >= 1 AND l_quantity <= 50))
    AND (l_discount IS NULL OR (l_discount >= 0 AND l_discount <= 0.1
         AND regexp_matches(CAST(l_discount AS VARCHAR),
                            '^-?[0-9]+(\\.[0-9]{1,2})?$')))
    AND (l_returnflag IS NULL OR l_returnflag IN ('A','N','R'))
    AND (l_linestatus IS NULL OR l_linestatus IN ('O','F'))
)"""


def _valid_flag_query(sf_dir, table, spec, key_cols):
    """Prune at the read: only columns the spec (or keys) actually touch
    leave storage (SURVEY 'prune at the read')."""
    import pyarrow.parquet as pq

    from ..vspec.evaluator import _columns_used
    from .validate import validate_dataset

    path = table_path(sf_dir, table)
    schema = pq.ParquetFile(path).schema_arrow
    cols = sorted(set(_columns_used(spec, schema)) | set(key_cols),
                  key=schema.names.index)
    ds = read_table(path, columns=cols)
    checked = validate_dataset(ds, spec)
    return checked.select_columns(list(key_cols) + ["valid"])


def q_validate_orders(sf_dir):
    return _valid_flag_query(sf_dir, "orders", ORDERS_SPEC, ["o_orderkey"])


def q_validate_lineitem(sf_dir):
    return _valid_flag_query(sf_dir, "lineitem", LINEITEM_SPEC,
                             ["l_orderkey", "l_linenumber"])


def q_orders_violation_counts(sf_dir):
    """Violation rows per keywordLocation — exercises basic-output shape."""
    from .validate import explode_violations, validate_dataset

    ds = read_table(table_path(sf_dir, "orders"))
    checked = validate_dataset(ds, ORDERS_SPEC)
    ex = explode_violations(checked, key_cols=("o_orderkey",))
    counts = ex.groupby("keywordLocation").count()
    return counts.map_batches(
        lambda t: t.rename_columns(["keywordLocation", "n"]),
        batch_format="pyarrow")


_ORDERS_VIOLATION_COUNTS_SQL = """
WITH o AS (SELECT * FROM orders), c AS (
  SELECT '/required' AS keywordLocation, count(*) AS n FROM o
    WHERE o_orderkey IS NULL OR o_custkey IS NULL OR o_orderstatus IS NULL
       OR o_totalprice IS NULL
  UNION ALL
  SELECT '/properties', count(*) FROM o WHERE
        (o_orderkey IS NOT NULL AND NOT o_orderkey > 0)
     OR (o_custkey IS NOT NULL AND NOT o_custkey > 0)
     OR (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P'))
     OR (o_totalprice IS NOT NULL
         AND NOT (o_totalprice > 0 AND o_totalprice <= 300000))
     OR (o_orderpriority IS NOT NULL
         AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))
  UNION ALL
  SELECT '/properties/o_orderkey/exclusiveMinimum', count(*) FROM o
    WHERE o_orderkey IS NOT NULL AND NOT o_orderkey > 0
  UNION ALL
  SELECT '/properties/o_custkey/exclusiveMinimum', count(*) FROM o
    WHERE o_custkey IS NOT NULL AND NOT o_custkey > 0
  UNION ALL
  SELECT '/properties/o_orderstatus/enum', count(*) FROM o
    WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')
  UNION ALL
  SELECT '/properties/o_totalprice/exclusiveMinimum', count(*) FROM o
    WHERE o_totalprice IS NOT NULL AND NOT o_totalprice > 0
  UNION ALL
  SELECT '/properties/o_totalprice/maximum', count(*) FROM o
    WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
      AND NOT o_totalprice <= 300000
  UNION ALL
  SELECT '/properties/o_orderpriority/pattern', count(*) FROM o
    WHERE o_orderpriority IS NOT NULL
      AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
) SELECT keywordLocation, n FROM c WHERE n > 0
"""


# ---------------------------------------------------------------------------
# relational / aggregate operators


def q_q1_pricing_summary(sf_dir):
    """TPC-H-Q1-style rollup in exact integer arithmetic: money columns
    carry exactly 2 decimals, so scaling to cents BEFORE the sum makes the
    shuffle-order-independent result bit-deterministic (float sums differ
    by ulps between any two summation orders)."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def to_exact(t: pa.Table) -> pa.Table:
        qty = pc.round(t["l_quantity"]).cast(pa.int64())
        ep_e2 = pc.round(
            pc.multiply(t["l_extendedprice"], 100.0)).cast(pa.int64())
        disc_e2 = pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), t["l_discount"]), 100.0)) \
            .cast(pa.int64())
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty,
            "ep_e2": ep_e2,
            "disc_price_e4": pc.multiply(ep_e2, disc_e2),
        })

    return ds.map_batches(to_exact, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("qty", alias_name="sum_qty"),
                   Sum("ep_e2", alias_name="sum_base_price_e2"),
                   Sum("disc_price_e4", alias_name="sum_disc_price_e4"),
                   Count(alias_name="count_order"))


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_base_price_e2,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS sum_disc_price_e4,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(sf_dir):
    ds = read_table(table_path(sf_dir, "orders"),
                    columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(10)


_TOP_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_customers_per_region(sf_dir):
    """Broadcast-join chain customer -> nation -> region, count per region.

    The nation/region dimension maps are tiny: resolved driver-side into one
    nationkey->r_name dict captured by the batch closure (cloudpickled once
    per task, the broadcast pattern at this size)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(table_path(sf_dir, "nation"))
    region = pq.read_table(table_path(sf_dir, "region"))
    rmap = dict(zip(region["r_regionkey"].to_pylist(),
                    region["r_name"].to_pylist()))
    nmap = {nk: rmap[rk] for nk, rk in zip(nation["n_nationkey"].to_pylist(),
                                           nation["n_regionkey"].to_pylist())}

    ds = read_table(table_path(sf_dir, "customer"), columns=["c_nationkey"])

    def add_region(t: pa.Table) -> pa.Table:
        keys = list(nmap.keys())
        idx = pc.index_in(t["c_nationkey"].cast(pa.int64()),
                          value_set=pa.array(keys, pa.int64()))
        names = pa.array([nmap[k] for k in keys], pa.string())
        return pa.table({"r_name": pc.take(names, idx)})

    counts = ds.map_batches(add_region, batch_format="pyarrow") \
        .groupby("r_name").count()
    return counts.map_batches(
        lambda t: t.rename_columns(["r_name", "n_customers"]),
        batch_format="pyarrow")


_CUSTOMERS_PER_REGION_SQL = """
SELECT r.r_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def q_referential_lineitem_orders(sf_dir):
    """Anti-join count via broadcast key set (SURVEY §2.9 referential)."""
    import pyarrow.parquet as pq
    import ray

    from .validate import referential_violations

    keys = pq.read_table(table_path(sf_dir, "orders"),
                         columns=["o_orderkey"])["o_orderkey"].to_pylist()
    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_linenumber"])
    bad = referential_violations(ds, "l_orderkey", keys,
                                 key_cols=("l_linenumber",))
    n = bad.count()
    return pd.DataFrame({"n_orphans": pd.Series([n], dtype="int64")})


_REFERENTIAL_SQL = """
SELECT count(*) AS n_orphans FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""


def q_events_by_type(sf_dir):
    from ray.data.aggregate import Count, Sum

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "user_id", "value"])
    base = ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    users = ds.select_columns(["event_type", "user_id"]) \
        .groupby(["event_type", "user_id"]).count() \
        .groupby("event_type").count()
    bdf = base.to_pandas()
    udf = users.to_pandas().rename(columns={"count()": "n_users"})
    out = bdf.merge(udf, on="event_type")
    # 2-decimal values → integer cents: bit-deterministic vs the oracle
    # regardless of float summation order.
    out["sum_value_e2"] = (out["sum_value"] * 100.0).round().astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out[["event_type", "n", "n_users", "sum_value_e2"]]


_EVENTS_SQL = """
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2
FROM events GROUP BY event_type
"""


def _ensure_columns(df: pd.DataFrame, schema: dict) -> pd.DataFrame:
    """Weaker sibling of `finalize`: pins the schema ONLY when
    to_pandas() dropped every column, passing non-empty frames through
    untouched (no casting, extra columns kept). Prefer `finalize` for
    new call sites; this stays for the pass-through sites."""
    if len(df.columns):
        return df
    return finalize(df, schema)


def q_uniqueness_orders(sf_dir):
    from .validate import uniqueness_violations

    ds = read_table(table_path(sf_dir, "orders"), columns=["o_orderkey"])
    df = uniqueness_violations(ds, key="o_orderkey").to_pandas()
    return _ensure_columns(df, {"o_orderkey": "int64", "n_rows": "int64"})


_UNIQUENESS_ORDERS_SQL = """
SELECT o_orderkey, count(*) AS n_rows FROM orders
GROUP BY o_orderkey HAVING count(*) > 1
"""


def q_profile_lineitem(sf_dir):
    """Exact profile counters via the mergeable-sketch pipeline (the sketch
    fields — quantiles/HLL — are covered by rows-only queries below)."""
    from .stats import profile_dataset

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = read_table(table_path(sf_dir, "lineitem"), columns=cols)
    prof = profile_dataset(ds, columns=cols)
    rows = [{"column": c,
             "n": prof.columns[c].count,
             "nulls": prof.columns[c].nulls,
             "min": prof.columns[c].vmin,
             "max": prof.columns[c].vmax} for c in cols]
    df = pd.DataFrame(rows)
    df["n"] = df["n"].astype("int64")
    df["nulls"] = df["nulls"].astype("int64")
    return df


_PROFILE_LINEITEM_SQL = """
SELECT 'l_quantity' AS "column", count(*) AS n,
       count(*) - count(l_quantity) AS nulls,
       min(l_quantity) AS min, max(l_quantity) AS max FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
       min(l_extendedprice), max(l_extendedprice) FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(*) - count(l_discount),
       min(l_discount), max(l_discount) FROM lineitem
"""


def q_orders_by_segment(sf_dir):
    """Fact x dimension-ish hash join (both sides as Datasets): orders x
    customer on o_custkey, then segment rollup. Exercises the partitioned
    bucketed join (functions/join.py)."""
    from ray.data.aggregate import Count, Sum

    from ..functions.join import hash_join

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey", "o_totalprice"])
    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_mktsegment"])

    def to_cents(t: pa.Table) -> pa.Table:
        # exact integer cents: sum is deterministic under any block order
        return pa.table({
            "o_custkey": t["o_custkey"],
            "price_e2": pc.round(
                pc.multiply(t["o_totalprice"], 100.0)).cast(pa.int64()),
        })

    def rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "c_mktsegment"])

    orders = orders.map_batches(to_cents, batch_format="pyarrow")
    cust = cust.map_batches(rekey, batch_format="pyarrow")
    joined = hash_join(orders, cust, on="o_custkey", how="inner")
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_e2", alias_name="sum_price_e2"))

    def cast_int(t: pa.Table) -> pa.Table:
        col = t["sum_price_e2"]
        if col.type != pa.int64():  # guard against float widening upstream
            i = t.schema.get_field_index("sum_price_e2")
            t = t.set_column(i, "sum_price_e2",
                             pc.round(col).cast(pa.int64()))
        return t

    return agg.map_batches(cast_int, batch_format="pyarrow")


_ORDERS_BY_SEGMENT_SQL = """
SELECT c.c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_e2
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_events_tumbling_hour(sf_dir):
    from ..functions.windows import tumbling_agg

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "ts", "value"])
    agg = tumbling_agg(ds, key_cols=("event_type",), unit="hour")

    def finish_block(t: pa.Table) -> pa.Table:
        # `value` carries exactly 2 decimals; emit the window sum as an
        # integer of cents so the result is bit-deterministic regardless
        # of float summation order (ray block order vs duckdb scan order).
        cents = pc.round(pc.multiply(t["sum_value"], 100.0)).cast(pa.int64())
        t = t.append_column("sum_value_e2", cents)
        j = t.schema.get_field_index("window_start")
        t = t.set_column(j, "window_start",
                         t["window_start"].cast(pa.timestamp("us")))
        return t.select(["event_type", "window_start", "n", "sum_value_e2"])

    return agg.map_batches(finish_block, batch_format="pyarrow")


_EVENTS_TUMBLING_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_events_sessions(sf_dir):
    from ..functions.windows import session_counts

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id"])
    return session_counts(ds, gap_minutes=30)


_EVENTS_SESSIONS_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN prev_ts IS NULL
                 OR ts - prev_ts > INTERVAL 30 MINUTE
            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events)
GROUP BY user_id
"""


def q_events_asof_click_view(sf_dir):
    """As-of join: for every click, the most recent prior view by the same
    user (temporal.asof_join — tagged-union cogroup, one shuffle)."""
    from ..functions.temporal import asof_join

    def side(kind):
        # each side gets its OWN read: unioning two branches of one read
        # has shown a Ray reference-counting race under load, and separate
        # reads also let each side prune independently at storage
        ds = read_table(table_path(sf_dir, "events"),
                        columns=["event_id", "ts", "user_id", "event_type"])

        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], kind))
            return t.drop_columns(["event_type"])

        return ds.map_batches(f, batch_format="pyarrow")

    clicks = side("click")
    views = side("view").rename_columns({"event_id": "view_event_id"})

    # right `ts` collides with left `ts` -> rides along as `ts_r`
    joined = asof_join(clicks, views, on="ts", by="user_id",
                       direction="backward", right_tie="view_event_id")

    def finish_block(t: pa.Table) -> pa.Table:
        gap = pc.subtract(t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                          t["ts_r"].cast(pa.timestamp("us"))
                          .cast(pa.int64()))
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "view_event_id": t["view_event_id"].cast(pa.int64()),
            "gap_us": gap.cast(pa.int64()),
        })

    return joined.map_batches(finish_block, batch_format="pyarrow")


_EVENTS_ASOF_SQL = """
SELECT c.event_id, c.user_id, v.event_id AS view_event_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts
                             ORDER BY event_id DESC) = 1
) v ON c.user_id = v.user_id AND v.ts <= c.ts
"""


_VALUE_BANDS = [("low", 0.0, 50.0), ("mid", 50.0, 150.0),
                ("high", 150.0, 300.0), ("tail", 300.0, 1000.0)]


def q_events_value_bands(sf_dir):
    """Broadcast range join (value in [lo, hi)) then band rollup."""
    from ray.data.aggregate import Count, Sum

    from ..functions.temporal import range_join_broadcast

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["value"])
    bands = pd.DataFrame(_VALUE_BANDS, columns=["band", "lo", "hi"])
    joined = range_join_broadcast(ds, bands, value_col="value")

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64())
        return pa.table({"band": t["band"], "value_e2": cents})

    agg = joined.map_batches(to_cents, batch_format="pyarrow") \
        .groupby("band").aggregate(Count(alias_name="n"),
                                   Sum("value_e2", alias_name="sum_value_e2"))

    def cast_int(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value_e2")
        return t.set_column(i, "sum_value_e2",
                            pc.round(t["sum_value_e2"]).cast(pa.int64()))

    return agg.map_batches(cast_int, batch_format="pyarrow")


def _value_bands_sql():
    rows = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _VALUE_BANDS)
    return f"""
SELECT b.band, count(*) AS n,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_e2
FROM events e JOIN (VALUES {rows}) b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
"""


def q_orders_top3_per_priority(sf_dir):
    """Window-rank analogue: top 3 orders by price per priority class
    (temporal.top_k_per_group — per-block prune, then one tiny shuffle)."""
    from ..functions.temporal import top_k_per_group

    ds = read_table(table_path(sf_dir, "orders"),
                    columns=["o_orderpriority", "o_orderkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["o_totalprice"], 100.0)) \
            .cast(pa.int64())
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "o_orderkey": t["o_orderkey"],
                         "price_e2": cents})

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    return top_k_per_group(ds, group_cols=["o_orderpriority"],
                           order_col="price_e2", k=3,
                           tie_cols=["o_orderkey"])


_ORDERS_TOP3_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_orderpriority
    ORDER BY round(o_totalprice * 100) DESC, o_orderkey) <= 3
"""


def q_events_hopping_30m(sf_dir):
    """Hopping (sliding) window: 60-min windows every 30 min — vectorized
    m-way explode then one pre-aggregated groupby shuffle."""
    from ..functions.windows import hopping_agg

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "ts", "value"])
    agg = hopping_agg(ds, key_cols=("event_type",), width_minutes=60,
                      stride_minutes=30)

    def finish_block(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["sum_value"], 100.0)).cast(pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"].cast(pa.timestamp("us")),
            "n": t["n"],
            "sum_value_e2": cents,
        })

    return agg.map_batches(finish_block, batch_format="pyarrow")


_EVENTS_HOPPING_SQL = """
WITH assigned AS (
  SELECT event_type, value,
         make_timestamp(CAST(floor(epoch_us(ts) / 1800000000)
                             AS BIGINT) * 1800000000) AS window_start
  FROM events
  UNION ALL
  SELECT event_type, value,
         make_timestamp((CAST(floor(epoch_us(ts) / 1800000000)
                              AS BIGINT) - 1) * 1800000000)
  FROM events)
SELECT event_type, window_start, count(*) AS n,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2
FROM assigned GROUP BY event_type, window_start
"""


def q_distinct_counts_lineitem(sf_dir):
    """Exact distinct counts (per-block unique prune before the shuffle;
    the exact complement of the HLL profile)."""
    from ..functions.dedup import exact_distinct_counts

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_linestatus", "l_shipdate"])
    return exact_distinct_counts(
        ds, ["l_returnflag", "l_linestatus", "l_shipdate"])


_DISTINCT_COUNTS_SQL = """
SELECT 'l_returnflag' AS col,
       CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_distinct
FROM lineitem
UNION ALL
SELECT 'l_linestatus', count(DISTINCT l_linestatus) FROM lineitem
UNION ALL
SELECT 'l_shipdate', count(DISTINCT l_shipdate) FROM lineitem
"""


_PRIORITY_DIM = [("1-URGENT", "hot"), ("2-HIGH", "hot"),
                 ("3-MEDIUM", "std"), ("4-NOT SPECIFIED", "std"),
                 ("5-LOW", "cold")]


def q_orders_broadcast_enrich(sf_dir):
    """Broadcast enrich join: fact orders x 5-row priority dim via ray.put
    + per-batch C++ hash join — the no-shuffle fact×dim plan (contrast
    orders_by_segment, which exercises the both-sides-large bucketed
    shuffle join)."""
    from ray.data.aggregate import Count, Sum

    from ..functions.join import broadcast_join

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["o_totalprice"], 100.0)) \
            .cast(pa.int64())
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "price_e2": cents})

    dim = pa.table({
        "o_orderpriority": [p for p, _ in _PRIORITY_DIM],
        "priority_class": [c for _, c in _PRIORITY_DIM],
    })
    joined = broadcast_join(orders.map_batches(to_cents,
                                               batch_format="pyarrow"),
                            dim, on="o_orderpriority", how="inner")
    agg = joined.groupby("priority_class").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_e2", alias_name="sum_price_e2"))

    def cast_int(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_price_e2")
        return t.set_column(i, "sum_price_e2",
                            pc.round(t["sum_price_e2"]).cast(pa.int64()))

    return agg.map_batches(cast_int, batch_format="pyarrow")


def _priority_dim_sql():
    rows = ", ".join(f"('{p}', '{c}')" for p, c in _PRIORITY_DIM)
    return f"""
SELECT d.priority_class, count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_e2
FROM orders o JOIN (VALUES {rows}) d(o_orderpriority, priority_class)
  ON o.o_orderpriority = d.o_orderpriority
GROUP BY d.priority_class
"""


_EVENT_TYPE_DIM = [("click", 1), ("view", 2), ("purchase", 3),
                   ("signup", 4), ("error", 5)]


def q_events_skew_join_auto(sf_dir):
    """Skew-aware join auto-trigger end to end (functions/join.py
    hash_join_auto): events join a per-type dim Dataset on event_type —
    a 5-value key where EVERY key is a >1% heavy hitter, so the exact
    heavy-hitter pass flags all of them and the plan runs as
    salted_hash_join (hot build rows replicated per salt, probe rows
    dealt round-robin). The oracle pins that salting never changes the
    join result. Contrast orders_broadcast_enrich (broadcast plan) and
    orders_by_segment (unsalted bucketed shuffle)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..functions.join import hash_join_auto

    events = read_table(table_path(sf_dir, "events"),
                        columns=["event_type", "value"])

    def to_milli(t: pa.Table) -> pa.Table:
        v = pc.round(pc.multiply(pc.fill_null(t["value"], 0.0), 1000.0)) \
            .cast(pa.int64())
        return pa.table({"event_type": t["event_type"], "value_e3": v})

    dim = ray.data.from_arrow(pa.table({
        "event_type": pa.array([t for t, _ in _EVENT_TYPE_DIM]),
        "type_code": pa.array([c for _, c in _EVENT_TYPE_DIM],
                              pa.int64())}))
    joined = hash_join_auto(
        events.map_batches(to_milli, batch_format="pyarrow"), dim,
        on="event_type", num_salts=4, skew_num=1, skew_den=100)
    agg = joined.groupby("type_code").aggregate(
        Count(alias_name="n_events"),
        Sum("value_e3", alias_name="sum_value_e3")).to_pandas()
    agg = finalize(agg, {"type_code": "int64", "n_events": "int64",
                         "sum_value_e3": "int64"})
    return agg.sort_values("type_code").reset_index(drop=True)


def _event_type_dim_sql():
    rows = ", ".join(f"('{t}', {c})" for t, c in _EVENT_TYPE_DIM)
    return f"""
SELECT d.type_code, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(coalesce(e.value, 0) * 1000) AS BIGINT))
            AS BIGINT) AS sum_value_e3
FROM events e JOIN (VALUES {rows}) d(event_type, type_code)
  ON e.event_type = d.event_type
GROUP BY d.type_code
ORDER BY d.type_code
"""


def q_uniqueness_lineitem_composite(sf_dir):
    """Composite-key uniqueness: (l_orderkey, l_linenumber) duplicates —
    the uniqueItems shuffle generalized to multi-column keys."""
    from .validate import uniqueness_violations

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_linenumber"])
    return uniqueness_violations(ds, ["l_orderkey", "l_linenumber"])


_UNIQUENESS_COMPOSITE_SQL = """
SELECT l_orderkey, l_linenumber, count(*) AS n_rows
FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
"""


_SPLIT_FRACS = {"train": 0.8, "valid": 0.1, "test": 0.1}
_SAMPLE_RATES = {"click": 0.5, "error": 1.0, "view": 0.05}

# md5-hex -> [0,1) bucket, reproduced verbatim in the oracles
_U_SQL = ("CAST(concat('0x', substr(md5(CAST({id} AS VARCHAR)), 1, 8)) "
          "AS UBIGINT) / 4294967296.0")


def q_split_docs(sf_dir):
    """Deterministic train/valid/test split by hashed doc_id — pure
    per-batch kernel, no shuffle, identical under any partitioning."""
    from ..functions.split import assign_split

    ds = read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
    return ds.map_batches(
        functools.partial(assign_split, id_col="doc_id",
                          fracs=_SPLIT_FRACS),
        batch_format="pyarrow")


_SPLIT_DOCS_SQL = f"""
SELECT doc_id,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'valid'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {_U_SQL.format(id='doc_id')} AS u FROM documents)
"""


def q_stratified_sample_events(sf_dir):
    """Per-group rate-controlled deterministic sample (click 50%,
    error 100%, view 5%, others dropped)."""
    from ..functions.split import stratified_sample

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_id", "event_type"])
    return ds.map_batches(
        functools.partial(stratified_sample, id_col="event_id",
                          group_col="event_type", rates=_SAMPLE_RATES),
        batch_format="pyarrow")


_STRATIFIED_SQL = f"""
SELECT event_id, event_type
FROM (SELECT event_id, event_type,
             {_U_SQL.format(id='event_id')} AS u FROM events)
WHERE u < CASE event_type WHEN 'click' THEN 0.5 WHEN 'error' THEN 1.0
          WHEN 'view' THEN 0.05 ELSE 0.0 END
"""


# nested-document validation: the props column is a JSON string; one
# vectorized NDJSON parse lifts it to a struct column, then the same
# engine applies a nested properties/required spec to it
PROPS_SPEC = {
    "$id": "https://jschon-ray.dev/specs/event-props",
    "type": "object",
    "required": ["event_id", "props"],
    "properties": {
        "props": {
            "type": "object",
            "required": ["k"],
            "properties": {
                "k": {"type": "integer", "minimum": 0, "maximum": 50},
            },
        },
    },
}


def q_validate_events_props(sf_dir):
    """Nested JSON-document validation over a string column (SURVEY §1.1:
    the reference's whole-document tree becomes a struct column here)."""
    from ..functions.text import parse_json_column
    from .validate import validate_dataset

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_id", "props"])
    ds = ds.map_batches(
        functools.partial(parse_json_column, col="props"),
        batch_format="pyarrow")
    verdicts = validate_dataset(ds, PROPS_SPEC)

    def finish_block(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "valid": t["valid"]})

    return verdicts.map_batches(finish_block, batch_format="pyarrow")


_EVENTS_PROPS_SQL = """
SELECT event_id,
       (props IS NOT NULL
        AND json_extract(props, '$.k') IS NOT NULL
        AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT', 'INTEGER')
        AND CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 0 AND 50)
           AS valid
FROM events
"""


# ---------------------------------------------------------------------------
# documents: dedup + text analysis


def q_dedup_docs_exact(sf_dir):
    from ..functions.dedup import exact_dedup

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return exact_dedup(ds, "doc_id", "text")


_DEDUP_DOCS_SQL = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def q_dup_groups_prefix24(sf_dir):
    from ..functions.dedup import duplicate_groups

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])

    def key24(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "dup_key": pc.utf8_slice_codeunits(t["text"], 0, 24),
        })

    df = duplicate_groups(ds, "doc_id", key24).to_pandas()
    return _ensure_columns(df, {"group_id": "int64", "n": "int64"})


_DUP_GROUPS_SQL = """
SELECT min(doc_id) AS group_id, count(*) AS n FROM documents
GROUP BY substr(text, 1, 24) HAVING count(*) > 1
"""


def q_ngram_jaccard_docs(sf_dir):
    """Exact 3-gram Jaccard similarity join over documents (threshold 0.5).

    The jaccard column divides the same two exact integers on both sides
    (inter / uni) — IEEE-identical, no rounding needed.
    """
    from ..functions.dedup import ngram_jaccard_pairs

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    # lazy Dataset end to end: the matched-pair set never lands on the
    # driver (typed empty partials keep the schema stable when no pair
    # survives the threshold)
    return ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.5)


_NGRAM_JACCARD_SQL = r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(CASE
      WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      ELSE [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
    END) AS s
  FROM toks WHERE len(ws) > 0
)
SELECT id_a, id_b, inter, uni, inter / uni AS jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    len(list_intersect(a.s, b.s)) AS inter,
    len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
) WHERE inter / uni >= 0.5 ORDER BY id_a, id_b
"""


def q_event_bigrams(sf_dir):
    """Per-user consecutive-event transition counts (path analysis):
    hash-bucketed sorted segmented pass, transition-matrix-sized final
    exchange."""
    from ..functions.windows import event_bigrams

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "event_type"])
    return event_bigrams(ds, user_col="user_id", ts_col="ts",
                         tie_col="event_id", type_col="event_type")


_EVENT_BIGRAMS_SQL = """
WITH o AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
FROM o WHERE prev IS NOT NULL GROUP BY prev, next
"""


def q_percent_rank_lineitem(sf_dir):
    """Per-row global order statistics (exact percent_rank) via RANGE
    partitioning: min/max pass -> uniform value-range buckets ->
    per-bucket counts to driver offsets -> per-bucket sort+offset. pct
    divides the same two exact integers on both sides."""
    from ..functions.scan import global_value_rank

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_linenumber",
                             "l_extendedprice"])
    return global_value_rank(ds, value_col="l_extendedprice",
                             tie_cols=("l_orderkey", "l_linenumber"),
                             num_buckets=256)


_PERCENT_RANK_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                          l_linenumber) AS rank,
       percent_rank() OVER (ORDER BY l_extendedprice, l_orderkey,
                            l_linenumber) AS pct
FROM lineitem WHERE l_extendedprice IS NOT NULL
"""


def q_mixture_docs(sf_dir):
    """Domain-mixture rebalancing to a uniform source mix: one
    key-sized count aggregate derives per-source keep rates
    (min_count/count), applied as a deterministic md5 threshold — the
    exact row set is reproducible on both sides."""
    from ..functions.split import mixture_resample

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "source"])
    return mixture_resample(ds, id_col="doc_id", group_col="source")


_MIXTURE_SQL = f"""
WITH c AS (SELECT source, count(*) AS cnt FROM documents
           WHERE source IS NOT NULL GROUP BY source),
m AS (SELECT min(cnt) AS mn FROM c)
SELECT doc_id, source FROM (
  SELECT d.doc_id, d.source,
         {_U_SQL.format(id='d.doc_id')} AS u,
         m.mn / c.cnt AS rate
  FROM documents d JOIN c USING (source) CROSS JOIN m)
WHERE u < rate
"""


def q_grouped_p90_lineitem(sf_dir):
    """Exact per-group p90 over a continuous domain (general-domain
    complement of the low-cardinality grouped median): one fused
    (group x bin) histogram per block per refinement round."""
    from ..functions.quantiles import grouped_quantile_disc

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_extendedprice"])
    ds = _drop_null_rows(ds, ["l_returnflag"])
    return grouped_quantile_disc(ds, "l_returnflag", "l_extendedprice",
                                 0.9, bins=512, gather_limit=4096)


_GROUPED_P90_SQL = """
SELECT l_returnflag,
       CAST(quantile_disc(l_extendedprice, 0.9) AS DOUBLE) AS value
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
GROUP BY l_returnflag
"""


def q_tdigest_quantiles_lineitem(sf_dir):
    """Grouped APPROXIMATE quantiles via mergeable t-digests (rows-only:
    rank-bounded, not bit-exact vs SQL — tests pin <=1% rel error). The
    100 TB path when values-per-key overflow the exact histogram
    refinement: each block ships O(keys x delta) digest bytes, one small
    groupby merges them (functions/quantiles.py:grouped_tdigest_quantiles)."""
    from ..functions.quantiles import grouped_tdigest_quantiles

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_extendedprice"])
    ds = _drop_null_rows(ds, ["l_returnflag"])
    est = grouped_tdigest_quantiles(
        ds, key="l_returnflag", value_col="l_extendedprice",
        qs=[0.5, 0.9, 0.99]).to_pandas()

    # Round-5 conversion to an INEQUALITY value oracle: one extra
    # partial-sum pass over the same pruned read computes each
    # estimate's exact rank interval [n_lt, n_le]/n per key; the emitted
    # bools assert rank error <= 1.5% (tests pin <= 1%), which the SQL
    # side pins to true — a silent digest regression now fails the
    # driver compare. Raw estimates stay covered by the quantile unit
    # tests.
    labels = ["p50", "p90", "p99"]
    qs_ = [0.5, 0.9, 0.99]
    ests = {r["l_returnflag"]: [(lb, float(r[lb])) for lb in labels]
            for _, r in est.iterrows()}

    def rank_partial(t: pa.Table) -> pa.Table:
        keys = t["l_returnflag"].to_numpy(zero_copy_only=False)
        vals = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = ~np.isnan(vals)
        rows = {"l_returnflag": [], "label": [], "n_lt": [],
                "n_le": [], "n": []}
        for k, pairs in ests.items():
            v = vals[ok & (keys == k)]
            for lb, e in pairs:
                rows["l_returnflag"].append(k)
                rows["label"].append(lb)
                rows["n_lt"].append(int((v < e).sum()))
                rows["n_le"].append(int((v <= e).sum()))
                rows["n"].append(len(v))
        return pa.table({
            "l_returnflag": pa.array(rows["l_returnflag"]),
            "label": pa.array(rows["label"]),
            "n_lt": pa.array(rows["n_lt"], pa.int64()),
            "n_le": pa.array(rows["n_le"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64())})

    ranks = ds.map_batches(rank_partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "label"]) \
        .sum(["n_lt", "n_le", "n"]).to_pandas() \
        .set_index(["l_returnflag", "label"])

    out = []
    for _, r in est.iterrows():
        row = {"l_returnflag": r["l_returnflag"]}
        for lb, q in zip(labels, qs_):
            g = ranks.loc[(r["l_returnflag"], lb)]
            n = g["sum(n)"]
            row[f"{lb}_ok"] = bool(g["sum(n_lt)"] / n <= q + 0.015
                                   and g["sum(n_le)"] / n >= q - 0.015)
        out.append(row)
    return pd.DataFrame(out).sort_values("l_returnflag") \
        .reset_index(drop=True)


_TDIGEST_QUANTILES_SQL = """
SELECT l_returnflag, true AS p50_ok, true AS p90_ok, true AS p99_ok
FROM lineitem WHERE l_returnflag IS NOT NULL
GROUP BY l_returnflag
"""


def q_iqr_filter_lineitem(sf_dir):
    """Tukey-fence outlier REMOVAL per group: exact per-group q1/q3
    (iterative histogram refinement — fixed-size counts to the driver,
    the column never shuffles), fences q1/q3 ∓ 1.5*IQR broadcast into a
    stateless filter pass. Bounds are exact column elements, so the
    float fence arithmetic is bit-identical to the oracle's."""
    import ray

    from ..functions.quantiles import grouped_quantile_disc

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_extendedprice"])
    ds = _drop_null_rows(ds, ["l_returnflag", "l_extendedprice"])
    narrow = ds.materialize()
    q1 = grouped_quantile_disc(narrow, "l_returnflag", "l_extendedprice",
                               0.25, bins=512, gather_limit=4096,
                               materialize=False, out="q1")
    q3 = grouped_quantile_disc(narrow, "l_returnflag", "l_extendedprice",
                               0.75, bins=512, gather_limit=4096,
                               materialize=False, out="q3")
    b = q1.merge(q3, on="l_returnflag")
    iqr = b["q3"] - b["q1"]
    b["lo"] = b["q1"] - 1.5 * iqr
    b["hi"] = b["q3"] + 1.5 * iqr
    fences = ray.put({k: (lo, hi) for k, lo, hi
                      in zip(b["l_returnflag"], b["lo"], b["hi"])})

    def keep(t: pa.Table, fref) -> pa.Table:
        import ray as _ray
        f = _ray.get(fref)
        keys = t["l_returnflag"].to_numpy(zero_copy_only=False)
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        codes, uni = pd.factorize(keys)   # O(n) C pass + O(groups) python
        lo = np.array([f[u][0] for u in uni])[codes]
        hi = np.array([f[u][1] for u in uni])[codes]
        return t.filter(pa.array((v >= lo) & (v <= hi)))

    return narrow.map_batches(keep, fn_args=(fences,),
                              batch_format="pyarrow")


_IQR_FILTER_SQL = """
WITH b AS (
  SELECT l_returnflag,
         CAST(quantile_disc(l_extendedprice, 0.25) AS DOUBLE) AS q1,
         CAST(quantile_disc(l_extendedprice, 0.75) AS DOUBLE) AS q3
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY l_returnflag)
SELECT l.l_returnflag, l.l_extendedprice
FROM lineitem l JOIN b USING (l_returnflag)
WHERE l.l_extendedprice IS NOT NULL
  AND l.l_extendedprice >= q1 - 1.5 * (q3 - q1)
  AND l.l_extendedprice <= q3 + 1.5 * (q3 - q1)
"""


def q_zscore_lineitem(sf_dir):
    """Distribution-aware outlier scoring: per-row z against the row's
    group stats (two phases — key-count-sized moment shuffle, then a
    broadcast standardize pass). The dynamic complement of the spec's
    static min/max range checks."""
    from ..functions.relational import grouped_zscore

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_linenumber",
                             "l_returnflag", "l_extendedprice"])
    ds = _drop_null_rows(ds, ["l_returnflag", "l_extendedprice"])
    out = grouped_zscore(ds, key="l_returnflag",
                         value_col="l_extendedprice",
                         keep_cols=("l_orderkey", "l_linenumber"))

    def rnd(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("z")
        return t.set_column(i, "z", pc.round(t["z"], 4))

    return out.map_batches(rnd, batch_format="pyarrow")


_ZSCORE_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
       round((l_extendedprice
              - avg(l_extendedprice) OVER (PARTITION BY l_returnflag))
             / stddev_samp(l_extendedprice)
               OVER (PARTITION BY l_returnflag), 4) AS z
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
"""


def q_skew_lineitem(sf_dir):
    """Per-group 3rd/4th-moment shape stats (sample skewness + excess
    kurtosis, bias-corrected): two-pass centered moment partials, both
    shuffles key-count-sized; rounded to 4 decimals on both sides."""
    from ..functions.relational import grouped_skew_kurt

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_extendedprice"])
    ds = _drop_null_rows(ds, ["l_returnflag", "l_extendedprice"])
    out = grouped_skew_kurt(ds, key="l_returnflag",
                            value_col="l_extendedprice",
                            skew_out="skew_price", kurt_out="kurt_price")

    def rnd(t: pa.Table) -> pa.Table:
        for c in ("skew_price", "kurt_price"):
            t = t.set_column(t.schema.get_field_index(c), c,
                             pc.round(t[c], 4))
        return t

    return out.map_batches(rnd, batch_format="pyarrow")


_SKEW_LINEITEM_SQL = """
SELECT l_returnflag, round(skewness(l_extendedprice), 4) AS skew_price,
       round(kurtosis(l_extendedprice), 4) AS kurt_price
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
GROUP BY l_returnflag
"""


_HIST_LO_E2 = 0            # cents
_HIST_WIDTH_E2 = 500_000   # $5,000 per bin, in cents
_HIST_BINS = 40


def q_histogram_lineitem(sf_dir):
    """Exact equi-width histogram of l_extendedprice in integer cents
    ($5k bins): per-block np.bincount partials, bin-count-sized shuffle,
    pure int64 arithmetic → bit-exact vs the SQL oracle."""
    from ..functions.relational import equi_width_histogram

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_extendedprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"price_e2": pc.round(
            pc.multiply(t["l_extendedprice"], 100.0)).cast(pa.int64())})

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    return equi_width_histogram(ds, value_col="price_e2",
                                lo_e2=_HIST_LO_E2, width_e2=_HIST_WIDTH_E2,
                                n_bins=_HIST_BINS, out_bin="bin",
                                out_count="n")


_HISTOGRAM_LINEITEM_SQL = f"""
SELECT least(greatest((CAST(round(l_extendedprice * 100) AS BIGINT)
                       - {_HIST_LO_E2}) // {_HIST_WIDTH_E2}, 0),
             {_HIST_BINS - 1}) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem WHERE l_extendedprice IS NOT NULL
GROUP BY bin
"""


def q_q3_shipping(sf_dir):
    """TPC-H Q3 analogue (segment revenue top-10): the multi-join
    reporting pipeline — customer segment filter broadcast as a key set
    (small side never shuffles), orders↔lineitem via the partitioned
    hash join (the one large-large exchange), then a revenue rollup and
    a global top-k. Revenue is summed in exact integer cents (per-row
    round like the oracle) so the sums hash-match under any block order.

    Reference analogy: a three-table applicator chain (jschon
    vocabulary/applicator.py properties→items nesting) recast as join
    + aggregate; cutoff 1995-03-15 mirrors Q3's date split.
    """
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    cutoff = pd.Timestamp("1995-03-15")

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_mktsegment"])
    seg_keys = set()
    for b in cust.iter_batches(batch_format="pyarrow"):
        m = pc.equal(b["c_mktsegment"], "BUILDING")
        seg_keys.update(b.filter(pc.fill_null(m, False))
                        ["c_custkey"].to_pylist())

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less(t["o_orderdate"], pa.scalar(cutoff)),
            pc.is_in(t["o_custkey"],
                     value_set=pa.array(sorted(seg_keys), pa.int64())))
        t = t.filter(pc.fill_null(keep, False))
        return t.select(["o_orderkey", "o_orderdate"])

    orders = orders.map_batches(filter_orders, batch_format="pyarrow")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])

    def filter_li(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_shipdate"], pa.scalar(cutoff))
        t = t.filter(pc.fill_null(keep, False))
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "rev_e2": rev})

    li = li.map_batches(filter_li, batch_format="pyarrow")
    joined = hash_join(li, orders, on="o_orderkey", how="inner")
    agg = joined.groupby(["o_orderkey", "o_orderdate"]).aggregate(
        Sum("rev_e2", alias_name="revenue_e2"))

    def fix(t: pa.Table) -> pa.Table:
        col = t["revenue_e2"]
        if col.type != pa.int64():
            t = t.set_column(t.schema.get_field_index("revenue_e2"),
                             "revenue_e2", pc.round(col).cast(pa.int64()))
        return t

    agg = agg.map_batches(fix, batch_format="pyarrow")
    return agg.sort(["revenue_e2", "o_orderkey"],
                    descending=[True, False]).limit(10)


_Q3_SHIPPING_SQL = """
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
       CAST(sum(CAST(round(l.l_extendedprice * 100 * (1 - l.l_discount))
                     AS BIGINT)) AS BIGINT) AS revenue_e2
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_e2 DESC, o_orderkey ASC
LIMIT 10
"""


def q_chunk_docs(sf_dir):
    """Fixed-token-budget chunking with overlap (chunk 32, overlap 4):
    row-count-changing map_batches; exact chunk strings."""
    from ..functions.text import chunk_documents

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return chunk_documents(ds, chunk_tokens=32, overlap=4)


_CHUNK_DOCS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents),
starts AS (
  SELECT doc_id, ws,
         unnest(generate_series(0, greatest(len(ws) - 4 - 1, 0), 28))
           AS s
  FROM toks WHERE len(ws) > 0)
SELECT doc_id,
       CAST(s / 28 AS BIGINT) AS chunk_idx,
       CAST(len(ws[s+1 : s+32]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(ws[s+1 : s+32], ' ') AS chunk_text
FROM starts
"""


def q_interval_join_events(sf_dir):
    """Large-large interval overlap join: 10-minute activity windows of
    clicks x views per user, co-grouped by (user, time tile) with the
    ownership rule (pair emitted only in the tile of max(lo, lo_r)) —
    no dedup pass, exact-int overlaps."""
    from ..functions.temporal import interval_join

    win_us = 600_000_000  # 10 min

    def side(ev_type):
        ds = read_table(table_path(sf_dir, "events"),
                        columns=["user_id", "ts", "event_type",
                                 "event_id"])

        def prep(t: pa.Table) -> pa.Table:
            keep = pc.and_(pc.equal(t["event_type"], ev_type),
                           pc.and_(pc.is_valid(t["user_id"]),
                                   pc.is_valid(t["ts"])))
            t = t.filter(keep)
            lo = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            return pa.table({"user_id": t["user_id"],
                             "event_id": t["event_id"],
                             "lo": lo,
                             "hi": pc.add(lo, win_us)})

        return ds.map_batches(prep, batch_format="pyarrow")

    out = interval_join(side("click"), side("view"), by="user_id",
                        left_cols=["event_id"],
                        right_cols=["event_id"],
                        tile_us=2 * win_us)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "l_event": t["event_id"],
                         "r_event": t["event_id_r"],
                         "overlap_us": t["overlap"]})

    return out.map_batches(project, batch_format="pyarrow")


_INTERVAL_JOIN_SQL = """
WITH a AS (SELECT user_id, event_id, epoch_us(ts) AS lo,
                  epoch_us(ts) + 600000000 AS hi
           FROM events WHERE event_type = 'click'
             AND user_id IS NOT NULL AND ts IS NOT NULL),
b AS (SELECT user_id, event_id, epoch_us(ts) AS lo,
             epoch_us(ts) + 600000000 AS hi
      FROM events WHERE event_type = 'view'
        AND user_id IS NOT NULL AND ts IS NOT NULL)
SELECT a.user_id, a.event_id AS l_event, b.event_id AS r_event,
       least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
FROM a JOIN b ON a.user_id = b.user_id
  AND a.lo < b.hi AND b.lo < a.hi
"""


def q_retention_weekly(sf_dir):
    """Weekly retention cohort matrix: per-block distinct (user, week)
    pairs -> one user-keyed shuffle -> cohort/offset counts (the final
    exchange is cohort-matrix-sized)."""
    from ..functions.windows import retention_cohorts

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts"])
    return retention_cohorts(ds, user_col="user_id", ts_col="ts",
                             unit="week")


_RETENTION_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS b
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
firsts AS (SELECT user_id, min(b) AS cohort FROM pairs GROUP BY user_id)
SELECT CAST(cohort AS TIMESTAMP) AS cohort,
       CAST(date_diff('day', cohort, b) / 7 AS BIGINT) AS "offset",
       CAST(count(*) AS BIGINT) AS n_users
FROM pairs JOIN firsts USING (user_id)
GROUP BY cohort, date_diff('day', cohort, b) / 7
"""


def q_funnel_click_purchase(sf_dir):
    """Per-user funnel conversion (click -> purchase within 1h): rows
    filtered to the two step types, hash-bucketed by user, one segmented
    reverse scan per bucket — no per-user Python dispatch."""
    from ..functions.windows import funnel_conversion

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_type"])
    return funnel_conversion(ds, user_col="user_id", ts_col="ts",
                             type_col="event_type", step_a="click",
                             step_b="purchase", within="1h")


_FUNNEL_SQL = """
WITH a AS (SELECT user_id, ts FROM events
           WHERE event_type = 'click' AND user_id IS NOT NULL
             AND ts IS NOT NULL),
b AS (SELECT user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND ts IS NOT NULL),
gaps AS (
  SELECT a.user_id, min(epoch_us(b.ts) - epoch_us(a.ts)) AS min_gap_us
  FROM a JOIN b ON a.user_id = b.user_id AND b.ts >= a.ts
  GROUP BY a.user_id),
counts AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS n_a,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_b
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id)
SELECT c.user_id, n_a, n_b,
       coalesce(g.min_gap_us <= 3600000000, FALSE) AS converted,
       g.min_gap_us
FROM counts c LEFT JOIN gaps g USING (user_id)
WHERE n_a > 0 OR n_b > 0
"""


def q_fd_part_supplier(sf_dir):
    """Functional-dependency validation (the dataset-scale
    dependentRequired analogue): report l_partkey values shipped by more
    than one supplier — keys where l_partkey -/-> l_suppkey."""
    from ..functions.relational import fd_violations

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_suppkey"])
    ds = _drop_null_rows(ds, ["l_partkey"])
    return fd_violations(ds, determinant=["l_partkey"],
                         dependent="l_suppkey")


_FD_PART_SUPPLIER_SQL = """
SELECT l_partkey, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_values
FROM lineitem WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
GROUP BY l_partkey HAVING count(DISTINCT l_suppkey) > 1
"""


def q_tfidf_docs(sf_dir):
    """Top-3 characteristic terms per document by tf-idf: exact
    distributed document-frequency count (docs are rows, so df partials
    collapse per block) -> broadcast idf table -> vectorized per-doc
    scoring with deterministic (score desc, term) ties."""
    from ..functions.text import tfidf_top_terms

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=3)


_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dfq AS (SELECT tok, count(DISTINCT doc_id) AS dfc FROM toks GROUP BY tok),
nn AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
scored AS (
  SELECT doc_id, tok, tf * ln(n / dfc) AS s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf * ln(n / dfc) DESC, tok) AS rk
  FROM tf JOIN dfq USING (tok) CROSS JOIN nn)
SELECT doc_id, tok, round(s, 4) AS score, CAST(rk AS BIGINT) AS rk
FROM scored WHERE rk <= 3
"""


def q_events_gapfill_hour(sf_dir):
    """Dense hourly grid per event_type — empty buckets explicit (gap
    fill): one tumbling-shape aggregate pass, driver-side densification
    over the bounded (keys x hours) grid."""
    from ..functions.densify import time_gapfill_counts

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "ts"])
    return time_gapfill_counts(ds, key_col="event_type", ts_col="ts",
                               unit="hour")


_EVENTS_GAPFILL_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS ws, count(*) AS c
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
bounds AS (SELECT min(ws) AS lo, max(ws) AS hi FROM agg),
grid AS (
  SELECT t.event_type, g.ws
  FROM (SELECT DISTINCT event_type FROM agg) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
              AS ws FROM bounds) g)
SELECT grid.event_type, CAST(grid.ws AS TIMESTAMP) AS window_start,
       CAST(coalesce(c, 0) AS BIGINT) AS n
FROM grid LEFT JOIN agg
  ON grid.event_type = agg.event_type AND grid.ws = agg.ws
"""


def q_winsorize_lineitem(sf_dir):
    """Percentile winsorization (clip to [p01, p99]) composed from the
    exact-quantile operator: histogram-refinement passes find the exact
    bounds, then one broadcast clamp pass — values are exact column
    elements or exact copies, so no rounding is needed."""
    from ..functions.quantiles import exact_quantiles

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_linenumber",
                             "l_extendedprice"])
    ds = _drop_null_rows(ds, ["l_extendedprice"])
    qv = exact_quantiles(ds, "l_extendedprice", [0.01, 0.99],
                         bins=512, gather_limit=4096)
    lo, hi = float(qv["value"].iloc[0]), float(qv["value"].iloc[1])

    def clamp(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"]
        w = pc.min_element_wise(pc.max_element_wise(x, lo), hi)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "price_w": w})

    return ds.map_batches(clamp, batch_format="pyarrow")


_WINSORIZE_SQL = """
WITH b AS (
  SELECT quantile_disc(l_extendedprice, 0.01) AS lo,
         quantile_disc(l_extendedprice, 0.99) AS hi
  FROM lineitem WHERE l_extendedprice IS NOT NULL)
SELECT l_orderkey, l_linenumber,
       CAST(least(greatest(l_extendedprice, lo), hi) AS DOUBLE) AS price_w
FROM lineitem, b WHERE l_extendedprice IS NOT NULL
"""


def q_top_tokens_docs(sf_dir):
    """Exact corpus heavy hitters: word-count shuffle then distributed
    sort-by-(count desc, token) + limit — deterministic tie order makes
    the top-k set oracle-comparable."""
    from ..functions.text import top_tokens

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return top_tokens(ds, k=20)


_TOP_TOKENS_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents)
SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
ORDER BY n DESC, tok LIMIT 20
"""


def q_kmeans_embeddings(sf_dir):
    """Distributed k-means over the embeddings table (broadcast
    centroids, per-block partial sums; input never shuffled) + final
    assignment pass. Rows-only check: iterative clustering is not
    SQL-expressible."""
    from ..functions.clustering import kmeans_assign, kmeans_fit

    ds = read_table(table_path(sf_dir, "embeddings"),
                    columns=["vec_id", "embedding"])
    cents, _info = kmeans_fit(ds, k=5, seed=42, max_iters=10,
                              sample_size=1024)
    out = kmeans_assign(ds, cents, id_col="vec_id")

    def rnd(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("dist")
        return t.set_column(i, "dist", pc.round(t["dist"], 4))

    return out.map_batches(rnd, batch_format="pyarrow")


def _kmeans_oracle_base(sf_dir: str) -> str:
    """Shared CTE for the k-means value oracles (round-5 conversion of
    two rows-only queries): re-fit the deterministic k-means (same
    seed/params — kmeans_fit orders its init sample lexicographically,
    so the centroids are run-stable) and inline the (k x d) centroid
    matrix as SQL literals; DuckDB then re-derives the ASSIGNMENT
    independently — list_distance + argmin via a window — so the
    broadcast-assign pass, distance math and rounding are value-checked.
    The centroid fit itself is shared with the query (pinned separately
    by the clustering unit tests); the oracle's independence is over the
    assignment and everything downstream of it."""
    if sf_dir in _KMEANS_BASE_CACHE:
        return _KMEANS_BASE_CACHE[sf_dir]
    from ..functions.clustering import kmeans_fit

    ds = read_table(table_path(sf_dir, "embeddings"),
                    columns=["vec_id", "embedding"])
    cents, _ = kmeans_fit(ds, k=5, seed=42, max_iters=10,
                          sample_size=1024)
    rows = ",\n       ".join(
        f"({i}, {[float(v) for v in c]}::DOUBLE[])"
        for i, c in enumerate(cents))
    out = f"""
WITH cents(cluster, c) AS (VALUES {rows}),
d AS (
  SELECT vec_id, cluster,
         list_distance(CAST(embedding AS DOUBLE[]), c) AS dist
  FROM embeddings CROSS JOIN cents
  WHERE embedding IS NOT NULL),
a AS (
  SELECT vec_id, cluster, dist FROM
    (SELECT *, row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn FROM d)
  WHERE rn = 1)
"""
    _KMEANS_BASE_CACHE[sf_dir] = out
    return out


_KMEANS_BASE_CACHE: dict = {}


def _kmeans_embeddings_sql(sf_dir: str) -> str:
    return _kmeans_oracle_base(sf_dir) \
        + "SELECT vec_id, cluster, round(dist, 4) AS dist FROM a"


def _cluster_balanced_sample_sql(sf_dir: str) -> str:
    # the md5(vec_id) rank and per-cluster cap are fully independent SQL
    return _kmeans_oracle_base(sf_dir) + """,
ranked AS (SELECT vec_id, cluster,
                  md5(CAST(vec_id AS VARCHAR)) AS h FROM a)
SELECT vec_id, cluster, h FROM
  (SELECT *, row_number() OVER (PARTITION BY cluster
                                ORDER BY h, vec_id) AS rn2 FROM ranked)
WHERE rn2 <= 24
"""


def q_unigram_logprob_docs(sf_dir):
    """Per-doc mean unigram log-probability (LM quality-filter signal):
    distributed word count -> broadcast count table -> vectorized doc
    scoring. Rounded to 4 decimals on both sides (token summation
    order)."""
    from ..functions.text import unigram_logprob

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    out = unigram_logprob(ds)

    def rnd(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("avg_logprob")
        return t.set_column(i, "avg_logprob", pc.round(t["avg_logprob"], 4))

    return out.map_batches(rnd, batch_format="pyarrow")


_UNIGRAM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT count(*) AS t FROM toks),
per AS (
  SELECT doc_id, count(*) AS n_tokens, avg(ln(c / t)) AS alp
  FROM toks JOIN cnt USING (tok) CROSS JOIN tot GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       round(alp, 4) AS avg_logprob
FROM documents d LEFT JOIN per USING (doc_id)
"""


def _drop_null_rows(ds, cols):
    """Pre-filter rows with a NULL in any of `cols` (keeps the operator
    comparisons free of the SQL NULL-group representation ambiguity)."""
    def keep(t: pa.Table) -> pa.Table:
        mask = None
        for c in cols:
            m = pc.is_valid(t[c])
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def q_lineitem_mode_qty(sf_dir):
    """Deterministic grouped mode (ties -> smallest value) via
    (key, value) count-pair shuffle."""
    from ..functions.relational import grouped_mode_lowcard

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity"])
    ds = _drop_null_rows(ds, ["l_returnflag", "l_quantity"])
    return grouped_mode_lowcard(ds, key="l_returnflag",
                                value_col="l_quantity", out="mode_qty")


_LINEITEM_MODE_SQL = """
WITH c AS (
  SELECT l_returnflag, l_quantity, count(*) AS n FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY l_returnflag, l_quantity
), m AS (SELECT l_returnflag, max(n) AS mx FROM c GROUP BY l_returnflag)
SELECT c.l_returnflag, min(c.l_quantity) AS mode_qty,
       CAST(m.mx AS BIGINT) AS n_mode
FROM c JOIN m ON c.l_returnflag = m.l_returnflag AND c.n = m.mx
GROUP BY c.l_returnflag, m.mx
"""


def q_grouped_distinct_lineitem(sf_dir):
    """Exact count(DISTINCT l_partkey) per returnflag: per-block distinct
    pairs pruned before the shuffle."""
    from ..functions.relational import grouped_distinct_count

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_partkey"])
    ds = _drop_null_rows(ds, ["l_returnflag"])
    return grouped_distinct_count(ds, key="l_returnflag",
                                  value_col="l_partkey")


_GROUPED_DISTINCT_SQL = """
SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag
"""


def q_corr_lineitem(sf_dir):
    """Per-group Pearson correlation from mergeable moment partials;
    rounded to 4 decimals on both sides (summation-order variance)."""
    from ..functions.relational import grouped_corr

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])
    ds = _drop_null_rows(ds, ["l_returnflag"])
    out = grouped_corr(ds, key="l_returnflag", x_col="l_quantity",
                       y_col="l_extendedprice", out="corr_qp")

    def rnd(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("corr_qp"),
                            "corr_qp", pc.round(t["corr_qp"], 4))

    return out.map_batches(rnd, batch_format="pyarrow")


_CORR_LINEITEM_SQL = """
SELECT l_returnflag, round(corr(l_extendedprice, l_quantity), 4) AS corr_qp
FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag
"""


def q_rollup_lineitem(sf_dir):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): one finest-level
    shuffle; coarser subtotal levels re-aggregated from the finest
    result (output-bounded)."""
    from ..functions.relational import rollup_agg

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_linestatus",
                             "l_quantity"])
    ds = _drop_null_rows(ds, ["l_returnflag", "l_linestatus",
                              "l_quantity"])
    out = rollup_agg(ds, keys=["l_returnflag", "l_linestatus"],
                     value_col="l_quantity")
    out["sum_l_quantity"] = out["sum_l_quantity"].round(4)
    return out


_ROLLUP_LINEITEM_SQL = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 4) AS sum_l_quantity
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
  AND l_quantity IS NOT NULL
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_quantiles_lineitem(sf_dir):
    """Exact global quantile_disc by iterative histogram refinement
    (`functions/quantiles.py`): only fixed-size count vectors reach the
    driver; the column is scanned per round but never shuffled. Values
    are exact elements of the column, so they hash-match the oracle
    bit-for-bit with no rounding."""
    from ..functions.quantiles import exact_quantiles

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice",
                           [0.01, 0.25, 0.5, 0.75, 0.99],
                           bins=512, gather_limit=4096)


_QUANTILES_LINEITEM_SQL = "\nUNION ALL\n".join(
    f"SELECT CAST({q} AS DOUBLE) AS q, "
    f"CAST(quantile_disc(l_extendedprice, {q}) AS DOUBLE) AS value "
    "FROM lineitem"
    for q in [0.01, 0.25, 0.5, 0.75, 0.99])


def q_dup_clusters_docs(sf_dir):
    """Near-dup cluster formation: exact n-gram Jaccard pairs (>=0.5) ->
    distributed connected components (min-label propagation with
    pointer-doubling shortcuts, `functions/graph.py`); component = min
    doc_id of the cluster. The downstream dedup decision is `keep rows
    where doc_id == component`."""
    from ..functions.dedup import ngram_jaccard_pairs
    from ..functions.graph import connected_components

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    # pairs stay a Dataset end to end — connected_components consumes
    # the edge Dataset directly, no driver-side pair materialization.
    # materialize() pins the (small, thresholded) pair set in the object
    # store because CC re-reads the edge relation every round.
    # CC projects (id_a, id_b) internally with a map_batches select —
    # select_columns here would pass the generator's typed-empty seed
    # blocks through unprojected (mixed-width bundles, executor warning)
    pairs = ngram_jaccard_pairs(ds, "doc_id", "text",
                                threshold=0.5).materialize()
    if pairs.count() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    cc = connected_components(pairs, out_node="doc_id")
    return cc.to_pandas().sort_values("doc_id").reset_index(drop=True)


# transitive closure of the (proven-matching) jaccard pair set; component
# = min reachable doc_id
_DUP_CLUSTERS_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(CASE
      WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      ELSE [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
    END) AS s
  FROM toks WHERE len(ws) > 0
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      len(list_intersect(a.s, b.s)) AS inter,
      len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  ) WHERE inter / uni >= 0.5
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u
ORDER BY doc_id
"""


def q_audio_features_clips(sf_dir):
    """Framed-FFT spectral features over the synthesized clips table.

    Rows-only check: FFT spectral shape is not SQL-expressible.
    """
    from ..sources.clips import clips_cache_dir
    from ..stages.features import audio_features

    # pruned read: transcript/dur_ms must not ride through the
    # payload-heavy FFT actor stage (VERDICT r1 "what's wrong" #3)
    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = audio_features(ds, batch_size=512)

    # round-5 value-oracle conversion: raw spectral values are content
    # (pinned by tests/test_audio_features.py); the registry emits
    # their physical-range contracts — zcr is a rate in [0,1], energy
    # finite, centroid/rolloff below the clip's own Nyquist (features
    # run at the ORIGINAL sample rate, so the bound is sr_hz/2 per row)
    def contract(t: pa.Table) -> pa.Table:
        ok = t["feat_ok"].to_numpy(zero_copy_only=False)
        zcr = t["zcr"].to_numpy(zero_copy_only=False)
        en = t["energy_db"].to_numpy(zero_copy_only=False)
        ce = t["spec_centroid_hz"].to_numpy(zero_copy_only=False)
        ro = t["spec_rolloff_hz"].to_numpy(zero_copy_only=False)
        nyq = t["sr_hz"].to_numpy(zero_copy_only=False) \
            .astype(np.float64) / 2.0
        with np.errstate(invalid="ignore"):
            return pa.table({
                "clip_id": t["clip_id"],
                "feat_ok": t["feat_ok"],
                "zcr_in_unit": pa.array(ok & (zcr >= 0.0)
                                        & (zcr <= 1.0)),
                "energy_finite": pa.array(ok & np.isfinite(en)),
                "centroid_below_nyquist": pa.array(ok & (ce >= 0.0)
                                                   & (ce <= nyq)),
                "rolloff_below_nyquist": pa.array(ok & (ro >= 0.0)
                                                  & (ro <= nyq)),
            })

    return out.map_batches(contract, batch_format="pyarrow")


def q_audio_resample_vad_clips(sf_dir):
    """Canonical audio pipeline: decode -> resample to 16 kHz -> energy
    VAD segmentation, as chained actor-pool stages over bytes-bounded
    batches. Rows-only check (DSP is not SQL-expressible); the segments
    list column is projected away so the driver's schema hash stays
    scalar-only."""
    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import AudioResampler, VADSegments
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                         batch_format="pyarrow", batch_size=256) \
            .map_batches(stage_fn(VADSegments),
                         batch_format="pyarrow", batch_size=256)
    return out.select_columns(["clip_id", "resample_ok", "n_samples",
                               "vad_ok", "n_segments", "speech_ratio"])


def q_audio_mel_clips(sf_dir):
    """Resample -> time-pooled log-mel featurization (the canonical ML
    audio embedding), rows-only check; the fixed-size mel vector is
    projected to scalars (its L2 norm) so the driver result stays
    scalar-typed."""
    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import AudioResampler, MelSpectrogram
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                         batch_format="pyarrow", batch_size=256) \
            .map_batches(stage_fn(MelSpectrogram, sr=16000),
                         batch_format="pyarrow", batch_size=256)

    def project(t: pa.Table) -> pa.Table:
        import numpy as np

        mels = t["mel_mean"].to_pylist()
        # round-5 value-oracle conversion: the raw L2 norm is content
        # (not SQL-expressible); emit its finiteness/positivity contract
        # instead — the norm values themselves stay pinned by
        # tests/test_audio_features.py. mel_frames remains the exact
        # framing formula the oracle recomputes from metadata.
        norms = [np.linalg.norm(m) if m is not None else None
                 for m in mels]
        finite = [n is not None and bool(np.isfinite(n) and n > 0.0)
                  for n in norms]
        return pa.table({
            "clip_id": t["clip_id"],
            "mel_ok": t["mel_ok"],
            "mel_frames": t["mel_frames"],
            "mel_finite": pa.array(finite, pa.bool_()),
        })

    return out.map_batches(project, batch_format="pyarrow")


def q_audio_neardup_clips(sf_dir):
    """Content-based audio near-duplicates: resample -> log-mel embedding
    -> exact all-pairs cosine over the broadcast mel matrix. Pairs clips
    whose AUDIO matches regardless of clip_id (the synth corpus clusters
    by tone frequency, so same-tone clips pair at sim≈1). Rows-only."""
    import numpy as np

    from ..functions.similarity import embedding_neardup_exact
    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import AudioResampler, MelSpectrogram
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    feats = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                           batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(MelSpectrogram, sr=16000, frame_len=2048,
                                                n_mels=128),
                     batch_format="pyarrow", batch_size=256)

    def keep_ok(t: pa.Table) -> pa.Table:
        t = t.filter(t["mel_ok"].combine_chunks()
                     if isinstance(t["mel_ok"], pa.ChunkedArray)
                     else t["mel_ok"])
        # mean-center each vector: the log-mel noise floor is common to
        # every clip and would otherwise dominate the cosine (everything
        # pairs at ≈1); centering leaves the tone bands to discriminate
        m = np.array(t["mel_mean"].to_pylist(), np.float32)
        if len(m):
            m = m - m.mean(axis=1, keepdims=True)
        return pa.table({"clip_id": t["clip_id"],
                         "embedding": pa.array(m.tolist(),
                                               pa.list_(pa.float32()))})

    embs = feats.map_batches(keep_ok, batch_format="pyarrow")
    # 0.98 = "acoustically near-identical": same tone, or tones within a
    # bin of each other — audio similarity is inherently fuzzy at the
    # boundary (unlike exact text dedup), so the threshold picks the
    # plateau between same-tone (~1.0) and unrelated (<0.96 at p99.9)
    pairs = embedding_neardup_exact(embs, id_col="clip_id",
                                    emb_col="embedding",
                                    threshold=0.98)
    return pairs


def q_audio_prep_segments(sf_dir):
    """Full ASR-prep chain: resample -> VAD -> segment-extract ->
    loudness-normalize -> 2x seeded augmentation. Rows-only; the output
    is one row per (speech segment x variant) with scalar columns."""
    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import (AudioAugmenter, AudioResampler,
                                    LoudnessNormalizer, SegmentExtractor,
                                    VADSegments)
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    segs = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                          batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(VADSegments), batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(SegmentExtractor), batch_format="pyarrow",
                     batch_size=256)
    segs = segs.map_batches(lambda t: t.append_column(
        "codec", pa.array(["pcm_s16le"] * t.num_rows)),
        batch_format="pyarrow")
    final = segs.map_batches(LoudnessNormalizer().__call__,
                             batch_format="pyarrow", batch_size=256) \
        .map_batches(AudioAugmenter(variants=2).__call__,
                     batch_format="pyarrow", batch_size=256)

    def project(t: pa.Table) -> pa.Table:
        # round-5 value-oracle conversion: the seeded jitter values are
        # md5-derived (pinned by the augmenter idempotency tests); the
        # registry emits their configured-band contracts instead —
        # speed in [1 +- speed_range], gain in [+- gain_jitter_db]
        speed = t["speed"].to_numpy(zero_copy_only=False)
        gain = t["gain_db"].to_numpy(zero_copy_only=False)
        return pa.table({
            "clip_id": t["clip_id"],
            "source_clip_id": t["source_clip_id"],
            "sr_hz": t["sr_hz"],
            "speed_in_band": pa.array((speed >= 0.9) & (speed <= 1.1)),
            "gain_in_band": pa.array((gain >= -3.0) & (gain <= 3.0)),
        })

    return final.map_batches(project, batch_format="pyarrow")


def q_media_image_features(sf_dir):
    """Multimodal plumbing: synthetic raw images -> feature actor pool.

    No parquet media table ships with the driver testdata, so the input
    is synthesized deterministically (seeded) — rows-only check. Every
    8th row is a compressed-format stub row exercising the
    MediaCodecUnavailable path.
    """
    import ray.data as rd

    from ..stages.media import image_features, synth_image_table

    t = synth_image_table(2000, compressed_every=8)
    out = image_features(rd.from_arrow(t), batch_size=128)

    # round-5 value-oracle conversion: raw pixel moments are seeded-rng
    # content (pinned by tests/test_media_stages.py); the registry
    # emits their uniform-distribution band contracts — 16x12x3 uint8
    # uniform pixels have mean 127.5 +- ~4 and std 73.9 +- ~3
    def contract(b: pa.Table) -> pa.Table:
        mean = b["px_mean"].to_numpy(zero_copy_only=False)
        std = b["px_std"].to_numpy(zero_copy_only=False)
        return pa.table({
            "img_id": b["img_id"],
            "decode_ok": b["decode_ok"],
            "px_mean_in_band": pa.array(
                (mean >= 100.0) & (mean <= 155.0)),
            "px_std_in_band": pa.array((std >= 60.0) & (std <= 90.0)),
        })

    return out.map_batches(contract, batch_format="pyarrow")


_MEDIA_IMAGE_FEATURES_SQL = """
SELECT printf('img-%06d', CAST(i AS INT)) AS img_id,
       (i % 8 != 0) AS decode_ok,
       (i % 8 != 0) AS px_mean_in_band,
       (i % 8 != 0) AS px_std_in_band
FROM range(2000) AS t(i)
"""


def q_media_frame_sample(sf_dir):
    """Multimodal plumbing: rawvideo rows exploded to sampled frames."""
    import ray.data as rd

    from ..stages.media import sample_frames, synth_video_table

    t = synth_video_table(200, frames=24)
    out = sample_frames(rd.from_arrow(t), every_k=6)
    return out.select_columns(["clip_id", "frame_idx", "width", "height"])


_MEDIA_FRAME_SAMPLE_SQL = """
SELECT printf('vid-%06d', CAST(v.i AS INT)) AS clip_id,
       f.frame_idx, 8 AS width, 6 AS height
FROM range(200) AS v(i)
CROSS JOIN (VALUES (0), (6), (12), (18)) AS f(frame_idx)
"""


def q_token_count_docs(sf_dir):
    from ..functions.text import token_count_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens"])


_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\s+'),
                       x -> x <> '')) AS n_tokens
FROM documents
"""


def q_bpe_token_count_docs(sf_dir):
    from ..functions.text import bpe_token_count_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(bpe_token_count_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_bpe_tokens"])


_BPE_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text,
           ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS n_bpe_tokens
FROM documents
"""


def q_compression_ratio_docs(sf_dir):
    """zlib redundancy signal per doc. Rows-only (no zlib in SQL)."""
    from ..functions.text import compression_ratio_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(compression_ratio_batch,
                          batch_format="pyarrow") \
        .select_columns(["doc_id", "zlib_ratio"])


def q_quality_docs(sf_dir):
    from ..functions.text import quality_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens", "alpha_ratio", "digit_ratio",
                         "avg_token_len"])


_QUALITY_SQL = r"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
    AS n_tokens,
  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
    / CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END AS alpha_ratio,
  length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
    / CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END AS digit_ratio,
  CASE WHEN len(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> x <> '')) > 0
       THEN length(regexp_replace(text, '\s', '', 'g')) * 1.0
            / len(list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x <> ''))
       ELSE 0.0 END AS avg_token_len
FROM documents
"""


def q_lang_id_docs(sf_dir):
    from ..functions.text import lang_id_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "lang_pred"])


def _lang_id_sql():
    scores = {lang: f"len(regexp_extract_all(text, '{rx}'))"
              for lang, rx in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    case = "CASE WHEN " + " + ".join(scores.values()) + " = 0 THEN 'unknown'"
    for i, lang in enumerate(langs):
        conds = [f"{scores[lang]} >= {scores[other]}"
                 for other in langs[i + 1:]]
        prior = [f"{scores[lang]} > {scores[other]}" for other in langs[:i]]
        allc = prior + conds
        case += f" WHEN {' AND '.join(allc) if allc else 'TRUE'} " \
                f"THEN '{lang}'"
    case += " END"
    return f"SELECT doc_id, {case} AS lang_pred FROM documents"


def q_fingerprint_docs(sf_dir):
    from ..functions.text import fingerprint_md5_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_md5_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "fingerprint"])


_FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


# ---------------------------------------------------------------------------
# embeddings: similarity search


def q_ann_topk(sf_dir):
    import pyarrow.parquet as pq

    from ..functions.similarity import _embedding_matrix, ann_topk

    qt = pq.read_table(table_path(sf_dir, "embeddings"),
                       filters=[("vec_id", "<", 10)])
    queries = {"ids": qt["vec_id"].to_numpy(zero_copy_only=False),
               "matrix": _embedding_matrix(qt, "embedding")}
    ds = read_table(table_path(sf_dir, "embeddings"))
    out = ann_topk(ds, queries, k=5)
    df = finalize(out.to_pandas(), {"query_id": "int64",
                                    "neighbor_id": "int64",
                                    "rank": "int64"})
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_ann_topk_ivf(sf_dir):
    """IVF scale path, probed exhaustively (nprobe == n_centroids) so the
    result is bit-identical to the exact scan — shares the ANN oracle.
    Pruned-probe recall is covered by tests/test_dedup_similarity.py."""
    import pyarrow.parquet as pq

    from ..functions.similarity import _embedding_matrix, ann_topk_ivf

    qt = pq.read_table(table_path(sf_dir, "embeddings"),
                       filters=[("vec_id", "<", 10)])
    queries = {"ids": qt["vec_id"].to_numpy(zero_copy_only=False),
               "matrix": _embedding_matrix(qt, "embedding")}
    ds = read_table(table_path(sf_dir, "embeddings"))
    out = ann_topk_ivf(ds, queries, k=5, n_centroids=12, nprobe=12)
    df = finalize(out.to_pandas(), {"query_id": "int64",
                                    "neighbor_id": "int64",
                                    "rank": "int64"})
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _index_cache_tag(sf_dir, table: str = "embeddings") -> str:
    """Cache tag for /tmp-persisted ANN indexes: sf_dir basename plus a
    (size, mtime) fingerprint of the source parquet, so regenerated data
    under the same path never serves a stale index (ADVICE r2)."""
    import os

    src = table_path(sf_dir, table)
    st = os.stat(src)
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"{base}-{st.st_size}-{int(st.st_mtime)}"


def q_ann_topk_pq(sf_dir):
    """Product-quantization scale path: embeddings -> m uint8 codes
    (pq_encode; 16x smaller than raw float32 at m=16), ADC shortlist
    scan over the codes only, exact rerank of the shortlist (raw floats
    touched for O(Q * shortlist) rows). The covering shortlist makes the
    result bit-identical to the exact scan, so it shares the ANN oracle;
    pruned-recall behaviour is covered by tests."""
    import os

    import pyarrow.parquet as pq

    from ..functions.similarity import AnnIndex, _embedding_matrix

    idx = f"/tmp/jschon_ray_pq/{_index_cache_tag(sf_dir)}-m16-u1"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        ds = read_table(table_path(sf_dir, "embeddings"))
        AnnIndex.build(ds, idx, kind="pq", m=16, n_codes=256,
                       train_kwargs=dict(sample_frac=1.0,
                                         max_sample=20000, seed=23))
    qt = pq.read_table(table_path(sf_dir, "embeddings"),
                       filters=[("vec_id", "<", 10)])
    queries = {"ids": qt["vec_id"].to_numpy(zero_copy_only=False),
               "matrix": _embedding_matrix(qt, "embedding")}
    raw = read_table(table_path(sf_dir, "embeddings"))
    return AnnIndex(idx).probe(queries, k=5, shortlist=50,
                               rerank_ds=raw)


def q_ann_topk_ivf_persisted(sf_dir):
    """IVF probe from a PERSISTED index: built once per sf_dir under
    /tmp (one streaming pass, hive-partitioned by cell), then probed
    exhaustively so the result is bit-identical to the exact scan and
    shares the ANN oracle. Pruned-probe recall + read-pruning proof live
    in tests/test_dedup_similarity.py. 100 TB posture: the index build is
    the only full pass; every query run after it reads only probed cell
    partitions from storage (functions/similarity.py:build_ivf_index)."""
    import os

    import pyarrow.parquet as pq

    from ..functions.similarity import AnnIndex, _embedding_matrix

    idx = f"/tmp/jschon_ray_ivf/{_index_cache_tag(sf_dir)}-c12-u1"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        ds = read_table(table_path(sf_dir, "embeddings"))
        AnnIndex.build(ds, idx, kind="ivf", n_centroids=12)
    qt = pq.read_table(table_path(sf_dir, "embeddings"),
                       filters=[("vec_id", "<", 10)])
    queries = {"ids": qt["vec_id"].to_numpy(zero_copy_only=False),
               "matrix": _embedding_matrix(qt, "embedding")}
    return AnnIndex(idx).probe(queries, k=5, nprobe=12)


def q_ann_topk_ivfpq(sf_dir):
    """IVF-PQ probe from a persisted index: pruned cell reads, ADC over
    uint8 codes, exact rerank of the shortlist against the raw cells of
    the probed partitions. Built once per sf_dir under /tmp (two
    streaming passes); probed exhaustively with a covering shortlist so
    the result is bit-identical to the exact scan and shares the ANN
    oracle. Pruned recall + compression live in tests."""
    import os

    import pyarrow.parquet as pq

    from ..functions.similarity import AnnIndex, _embedding_matrix

    idx = f"/tmp/jschon_ray_ivfpq/{_index_cache_tag(sf_dir)}-c12-m16-u1"
    if not os.path.exists(os.path.join(idx, "codebooks.parquet")):
        ds = read_table(table_path(sf_dir, "embeddings"))
        AnnIndex.build(ds, idx, kind="ivfpq", n_centroids=12, m=16,
                       n_codes=256,
                       train_kwargs=dict(sample_frac=1.0,
                                         max_sample=20000))
    qt = pq.read_table(table_path(sf_dir, "embeddings"),
                       filters=[("vec_id", "<", 10)])
    queries = {"ids": qt["vec_id"].to_numpy(zero_copy_only=False),
               "matrix": _embedding_matrix(qt, "embedding")}
    return AnnIndex(idx).probe(queries, k=5, nprobe=12, shortlist=50)


_ANN_TOPK_SQL = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(
                CAST(q.embedding AS DOUBLE[]),
                CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id)
           AS BIGINT) AS rank
  FROM embeddings q, embeddings c WHERE q.vec_id < 10
) WHERE rank <= 5
"""


def q_infer_spec_orders(sf_dir):
    """Spec inference (vspec/infer.py): profile the orders table in one
    streaming pass and emit the learned per-column contract as rows
    (column, type, required, numeric bounds, enum/length band). The
    engine validates the source clean against this spec — tested in
    tests/test_infer_spec.py. Rows-only (dict-shaped output)."""
    import json as _json

    from ..vspec.infer import infer_spec

    ds = read_table(table_path(sf_dir, "orders"))
    spec = infer_spec(ds)
    def _num(v):
        # timestamp columns carry STRING bounds (e.g. '1995-01-01
        # 00:00:00'); only numeric bounds project into min_v/max_v,
        # every bound lands in bound_json verbatim
        try:
            return float(v)
        except (TypeError, ValueError):
            return None

    rows = []
    req = set(spec["required"])
    for col in sorted(spec["properties"]):
        sub = spec["properties"][col]
        bounds = {k: sub[k] for k in ("minimum", "maximum")
                  if k in sub}
        rows.append({
            "column": col,
            "jtype": sub.get("type"),
            "required": col in req,
            "min_v": _num(sub.get("minimum")),
            "max_v": _num(sub.get("maximum")),
            "bound_json": _json.dumps(bounds, default=str)
            if bounds else None,
            "enum_json": _json.dumps(sub["enum"]) if "enum" in sub else None,
            "min_len": sub.get("minLength"),
            "max_len": sub.get("maxLength"),
        })
    out = pd.DataFrame(rows)
    # absent length bands are numeric NULLs (the oracle's BIGINT NULL
    # arrives as NaN through pandas), not Python None objects
    for c in ("min_len", "max_len"):
        out[c] = pd.to_numeric(out[c])
    return out


# Round-5 value oracle for spec inference: every emitted
# contract field is a pure SQL aggregate of the profiled table —
# type mapping from the Arrow schema, required = zero nulls,
# numeric/timestamp bounds from min/max, enums from ordered
# distinct lists; the JSON blobs are rebuilt byte-identically
# (json.dumps spacing, DuckDB shortest-roundtrip float text =
# Python repr). min/max_len are NULL because no orders string
# column exceeds enum_max=16 distinct values at any test scale.
_INFER_SPEC_ORDERS_SQL = r"""
WITH cols(col, jtype, is_num, is_str, is_ts) AS (
  VALUES ('o_custkey',      'integer',   true,  false, false),
         ('o_orderdate',    'timestamp', false, false, true),
         ('o_orderkey',     'integer',   true,  false, false),
         ('o_orderpriority','string',    false, true,  false),
         ('o_orderstatus',  'string',    false, true,  false),
         ('o_totalprice',   'number',    true,  false, false)),
stats AS (
  SELECT
    list(DISTINCT o_orderstatus ORDER BY o_orderstatus)
      FILTER (o_orderstatus IS NOT NULL) AS st_vals,
    list(DISTINCT o_orderpriority ORDER BY o_orderpriority)
      FILTER (o_orderpriority IS NOT NULL) AS pr_vals,
    count(*) AS n,
    count(o_orderkey) AS n_ok, min(o_orderkey) AS mn_ok, max(o_orderkey) AS mx_ok,
    count(o_custkey) AS n_ck, min(o_custkey) AS mn_ck, max(o_custkey) AS mx_ck,
    count(o_totalprice) AS n_tp, min(o_totalprice) AS mn_tp, max(o_totalprice) AS mx_tp,
    count(o_orderdate) AS n_od, min(o_orderdate) AS mn_od, max(o_orderdate) AS mx_od,
    count(o_orderstatus) AS n_st, count(o_orderpriority) AS n_pr
  FROM orders)
SELECT c.col AS "column", c.jtype,
  CASE c.col
    WHEN 'o_orderkey' THEN n_ok = n WHEN 'o_custkey' THEN n_ck = n
    WHEN 'o_totalprice' THEN n_tp = n WHEN 'o_orderdate' THEN n_od = n
    WHEN 'o_orderstatus' THEN n_st = n ELSE n_pr = n END AS required,
  CASE c.col WHEN 'o_orderkey' THEN CAST(mn_ok AS DOUBLE)
    WHEN 'o_custkey' THEN CAST(mn_ck AS DOUBLE)
    WHEN 'o_totalprice' THEN mn_tp ELSE NULL END AS min_v,
  CASE c.col WHEN 'o_orderkey' THEN CAST(mx_ok AS DOUBLE)
    WHEN 'o_custkey' THEN CAST(mx_ck AS DOUBLE)
    WHEN 'o_totalprice' THEN mx_tp ELSE NULL END AS max_v,
  CASE c.col
    WHEN 'o_orderkey' THEN '{"minimum": ' || mn_ok || ', "maximum": ' || mx_ok || '}'
    WHEN 'o_custkey' THEN '{"minimum": ' || mn_ck || ', "maximum": ' || mx_ck || '}'
    WHEN 'o_totalprice' THEN '{"minimum": ' || mn_tp || ', "maximum": ' || mx_tp || '}'
    WHEN 'o_orderdate' THEN '{"minimum": "' || CAST(mn_od AS VARCHAR)
                         || '", "maximum": "' || CAST(mx_od AS VARCHAR) || '"}'
    ELSE NULL END AS bound_json,
  CASE c.col
    WHEN 'o_orderstatus' THEN
      '[' || list_aggregate(list_transform(st_vals, x -> '"' || x || '"'),
                            'string_agg', ', ') || ']'
    WHEN 'o_orderpriority' THEN
      '[' || list_aggregate(list_transform(pr_vals, x -> '"' || x || '"'),
                            'string_agg', ', ') || ']'
    ELSE NULL END AS enum_json,
  CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len
FROM cols c CROSS JOIN stats
ORDER BY c.col
"""



def q_semantic_dedup_embeddings(sf_dir):
    """SemDeDup-shaped semantic dedup (rows-only: k-means training is not
    SQL-expressible): cluster the embedding space, prune cosine>0.92
    near-dups within clusters, keep the lowest id. Deterministic given
    the seeded sample (functions/similarity.py:semantic_dedup)."""
    from ..functions.similarity import semantic_dedup

    ds = read_table(table_path(sf_dir, "embeddings"))
    out = semantic_dedup(ds, n_clusters=12, threshold=0.92)
    df = finalize(out.to_pandas(),
                  {"vec_id": "int64", "cluster": "int64", "keep": "bool"})
    return df.sort_values("vec_id").reset_index(drop=True)


def q_embedding_neardup(sf_dir):
    from ..functions.similarity import embedding_neardup_exact

    ds = read_table(table_path(sf_dir, "embeddings"))
    out = embedding_neardup_exact(ds, threshold=0.45)
    out = out[["id_a", "id_b"]].astype("int64")
    return out.reset_index(drop=True)


_EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
"""


def q_embedding_dup_clusters(sf_dir):
    """Semantic dedup decision: embedding-cosine near-dup pairs closed
    into clusters by distributed connected components (the same closure
    the n-gram path uses — two independent pair generators, one cluster
    former)."""
    import ray.data

    from ..functions.graph import connected_components

    pairs = q_embedding_neardup(sf_dir)
    if not len(pairs):
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    eds = ray.data.from_pandas(pairs[["id_a", "id_b"]])
    cc = connected_components(eds, out_node="vec_id")
    return cc.to_pandas().sort_values("vec_id").reset_index(drop=True)


_EMBEDDING_DUP_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
    AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6)
        >= 0.45
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS vec_id, min(v) AS component FROM reach GROUP BY u
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# rows-only entries (non-SQL-expressible: sketches, LSH, drift, clips)


def _clips_checks_sql(sf_dir: str) -> str:
    """Shared CTE: per-row failure flags mirroring CLIP_SPEC's keywords
    (each check skips null cells, like instance-type gating skips absent
    properties)."""
    from ..sources.clips import CODECS, clips_cache_dir

    path = clips_cache_dir(sf_dir)
    codecs = ", ".join(f"'{c}'" for c in CODECS)
    return f"""
WITH clips AS (SELECT * FROM read_parquet('{path}/*.parquet')),
checks AS (
  SELECT clip_id, codec,
    (clip_id IS NOT NULL
     AND NOT regexp_matches(clip_id, '^clip-[0-9a-f]{{12}}$')) AS f_pat,
    (sr_hz IS NOT NULL AND sr_hz < 8000) AS f_srmin,
    (sr_hz IS NOT NULL AND sr_hz > 48000) AS f_srmax,
    (sr_hz IS NOT NULL AND (sr_hz % 25) != 0) AS f_srmult,
    (dur_ms IS NOT NULL AND dur_ms <= 0) AS f_durmin,
    (dur_ms IS NOT NULL AND dur_ms > 600000) AS f_durmax,
    (codec IS NOT NULL AND codec NOT IN ({codecs})) AS f_codec,
    (transcript IS NOT NULL AND length(transcript) < 1) AS f_trmin,
    (transcript IS NOT NULL AND length(transcript) > 1024) AS f_trmax,
    (clip_id IS NULL OR bytes IS NULL OR sr_hz IS NULL
     OR dur_ms IS NULL OR codec IS NULL) AS f_req
  FROM clips),
rowv AS (
  SELECT *,
    (f_pat OR f_srmin OR f_srmax OR f_srmult OR f_durmin OR f_durmax
     OR f_codec OR f_trmin OR f_trmax) AS any_prop,
    (CAST(f_pat AS INT) + CAST(f_srmin AS INT) + CAST(f_srmax AS INT)
     + CAST(f_srmult AS INT) + CAST(f_durmin AS INT) + CAST(f_durmax AS INT)
     + CAST(f_codec AS INT) + CAST(f_trmin AS INT) + CAST(f_trmax AS INT))
        AS n_prop_fails
  FROM checks)
"""


def _clips_validation_sql(sf_dir: str) -> str:
    """DuckDB mirror of the flagship summary: row verdicts decompose into
    one '/properties' error per failing row plus one error per failing
    keyword (output('basic') structure), uniqueness = keys seen twice,
    referential = codec not in the dimension set."""
    return _clips_checks_sql(sf_dir) + """
SELECT count(*) AS n,
  CAST(sum(CASE WHEN NOT (any_prop OR f_req) THEN 1 ELSE 0 END) AS BIGINT)
      AS n_valid,
  CAST(sum(n_prop_fails + CASE WHEN any_prop THEN 1 ELSE 0 END
           + CASE WHEN f_req THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
  (SELECT count(*) FROM (SELECT clip_id FROM clips
                         GROUP BY clip_id HAVING count(*) > 1))
      AS n_dupe_keys,
  CAST(sum(CASE WHEN f_codec THEN 1 ELSE 0 END) AS BIGINT) AS n_referential
FROM rowv
"""


def _clips_violation_counts_sql(sf_dir: str) -> str:
    parts = [
        ("/properties", "any_prop"),
        ("/properties/clip_id/pattern", "f_pat"),
        ("/properties/sr_hz/minimum", "f_srmin"),
        ("/properties/sr_hz/maximum", "f_srmax"),
        ("/properties/sr_hz/multipleOf", "f_srmult"),
        ("/properties/dur_ms/exclusiveMinimum", "f_durmin"),
        ("/properties/dur_ms/maximum", "f_durmax"),
        ("/properties/codec/enum", "f_codec"),
        ("/properties/transcript/minLength", "f_trmin"),
        ("/properties/transcript/maxLength", "f_trmax"),
        ("/required", "f_req"),
    ]
    union = "\nUNION ALL ".join(
        f"SELECT '{kl}' AS keywordLocation, CAST(sum(CASE WHEN {flag} "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n FROM rowv"
        for kl, flag in parts)
    return _clips_checks_sql(sf_dir) + \
        f"SELECT keywordLocation, n FROM ({union}) WHERE n > 0"


def q_speaking_rate_clips(sf_dir):
    """Cross-column consistency validation on the clip table: words per
    second from (transcript, dur_ms) with a plausible-speech band
    [0.5, 6.0] wps — the data-to-data check a per-column spec cannot
    express (SURVEY hard-parts note). One stateless vectorized pass;
    wps divides the same exact ints on both sides."""
    from ..sources.clips import clips_cache_dir

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "transcript", "dur_ms"])

    def rate(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(t["transcript"], r"\s+")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        keep = flat != ""
        n_words = pa.array(
            np.bincount(parents[keep], minlength=t.num_rows)
            .astype(np.int64))
        dur = t["dur_ms"].cast(pa.float64())
        wps = pc.divide(pc.multiply(n_words.cast(pa.float64()), 1000.0),
                        dur)
        ok_dur = pc.and_(pc.is_valid(t["dur_ms"]),
                         pc.greater(t["dur_ms"], 0))
        wps = pc.if_else(ok_dur, wps, pa.scalar(None, pa.float64()))
        plausible = pc.and_(pc.greater_equal(wps, 0.5),
                            pc.less_equal(wps, 6.0))
        plausible = pc.if_else(pc.is_valid(wps), plausible,
                               pa.scalar(False))
        # wps is a small-int ratio, so exact .00005 halves occur:
        # match DuckDB's half-away-from-zero (Arrow defaults to
        # half-to-even)
        return pa.table({"clip_id": t["clip_id"], "n_words": n_words,
                         "wps": pc.round(
                             wps, 4,
                             round_mode="half_towards_infinity"),
                         "plausible": plausible})

    return ds.map_batches(rate, batch_format="pyarrow")


def _speaking_rate_sql(sf_dir: str) -> str:
    from ..sources.clips import clips_cache_dir

    path = clips_cache_dir(sf_dir)
    return f"""
WITH c AS (
  SELECT clip_id, dur_ms,
    CASE WHEN transcript IS NULL THEN 0
         ELSE len(list_filter(regexp_split_to_array(transcript, '\\s+'),
                              w -> w <> '')) END AS n_words
  FROM read_parquet('{path}/*.parquet'))
SELECT clip_id, CAST(n_words AS BIGINT) AS n_words,
  round(CASE WHEN dur_ms IS NOT NULL AND dur_ms > 0
             THEN n_words * 1000.0 / dur_ms END, 4) AS wps,
  coalesce(dur_ms IS NOT NULL AND dur_ms > 0
           AND n_words * 1000.0 / dur_ms >= 0.5
           AND n_words * 1000.0 / dur_ms <= 6.0, FALSE) AS plausible
FROM c
"""


def q_order_totals_consistency(sf_dir):
    """Cross-table aggregate consistency: each order's stored
    o_totalprice vs the sum of its lineitems' extendedprice*(1-disc)*
    (1+tax), within 1% relative — plus orders with no lineitems at all.
    Integer-cents verdicts; the synthetic tables deliberately violate
    the TPC-H identity, so the violation stream is dense."""
    from ..functions.relational import aggregate_consistency_violations

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount", "l_tax"])

    def charge(t: pa.Table) -> pa.Table:
        v = pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pc.add(pa.scalar(1.0), t["l_tax"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "charge": v})

    detail = li.map_batches(charge, batch_format="pyarrow")
    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_totalprice"])
    return aggregate_consistency_violations(
        detail, orders, key="o_orderkey", detail_value_col="charge",
        master_total_col="o_totalprice", rel_tol=0.01)


_ORDER_TOTALS_CONSISTENCY_SQL = """
WITH s AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) *
                             (1 + l_tax) * 100) AS BIGINT))
              AS BIGINT) AS calc_cents
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT o_orderkey, o_totalprice, calc_cents,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
         CAST(round(abs(o_totalprice) * 1.0) AS BIGINT) AS tol_cents
  FROM orders o LEFT JOIN s ON o.o_orderkey = s.l_orderkey)
SELECT o_orderkey,
       CASE WHEN calc_cents IS NULL THEN 'missing_detail'
            ELSE 'total_mismatch' END AS reason,
       CASE WHEN calc_cents IS NULL THEN 0
            ELSE total_cents - calc_cents END AS diff_cents
FROM j
WHERE calc_cents IS NULL OR abs(total_cents - calc_cents) > tol_cents
"""


def q_dup_ngrams_docs(sf_dir):
    """Cross-document duplicated 5-gram counts per doc (the measurement
    behind exact-substring dedup): distinct word 5-grams per doc, df>=2
    marks a gram as shared. Exact integers; docs under 5 words emit
    nothing — mirrored by the oracle's len(ws) >= 5 guard."""
    from ..functions.dedup import cross_doc_dup_ngrams

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return cross_doc_dup_ngrams(ds, "doc_id", "text", k=5)


_DUP_NGRAMS_DOCS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents),
sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(ws[i:i+4], ' ')
                   for i in range(1, len(ws) - 3)]) AS grams
  FROM toks WHERE len(ws) >= 5),
g AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(d.gram) AS BIGINT) AS n_dup_grams
FROM g LEFT JOIN d ON g.gram = d.gram
GROUP BY g.doc_id
"""


def q_segment_dedup_docs(sf_dir):
    """Line/segment-level exact dedup audit: each doc split into
    consecutive non-overlapping 10-word segments; per doc, how many of
    its segments occur 2+ times anywhere in the corpus. Narrow
    (seg_hash, doc_id) rows shuffle; text never does."""
    from ..functions.dedup import segment_dedup_counts

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return segment_dedup_counts(ds, id_col="doc_id", col="text",
                                seg_words=10)


_SEGMENT_DEDUP_DOCS_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), segs AS (
  SELECT doc_id,
         array_to_string(words[(t.seg_no*10+1):((t.seg_no+1)*10)],
                         ' ') AS seg
  FROM w, UNNEST(range(CAST(ceil(len(words)/10.0) AS BIGINT)))
       AS t(seg_no)
), freq AS (
  SELECT seg, count(*) AS n_occ FROM segs GROUP BY seg
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_segs,
       CAST(count(*) FILTER (WHERE f.n_occ >= 2) AS BIGINT)
           AS n_dup_segs
FROM segs s JOIN freq f USING (seg)
GROUP BY s.doc_id
"""


def q_source_quota_docs(sf_dir):
    """Domain balancing — the per-source quota cap every web-crawl
    pipeline applies before training (keep at most 40 docs per source,
    longest-first, doc_id tiebreak). Per-block partial top-k prunes each
    block to <= k rows per source BEFORE the single small shuffle; the
    document text never moves (functions/temporal.top_k_per_group)."""
    from ..functions.temporal import top_k_per_group

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["source", "doc_id", "n_chars"])
    return top_k_per_group(ds, group_cols=["source"],
                           order_col="n_chars", k=40,
                           tie_cols=["doc_id"])


_SOURCE_QUOTA_SQL = """
SELECT source, doc_id, n_chars FROM documents
QUALIFY row_number() OVER (
    PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 40
"""


def q_gopher_filter_docs(sf_dir):
    """Gopher-rules quality filter (word count / mean word length /
    alpha-word fraction / stop-word presence composed into one keep
    verdict) — one RE2 scan per feature, word lists never materialize
    (functions/text.gopher_filter_batch). min_stop_hits=1 here because
    the synthetic corpus's vocabulary carries only one of the 8
    published stop words (the published default of 2 would never
    fire)."""
    import functools

    from ..functions.text import gopher_filter_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    fn = functools.partial(gopher_filter_batch, min_stop_hits=1)
    return ds.map_batches(fn, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_words", "mean_word_len",
                         "frac_alpha_words", "n_stop_hits", "kept"])


_GOPHER_FILTER_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS ws,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace
  FROM documents),
f AS (
  SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS n_words,
    CASE WHEN len(ws) > 0 THEN nonspace * 1.0 / len(ws)
         ELSE 0.0 END AS mean_word_len,
    CASE WHEN len(ws) > 0
         THEN len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
              * 1.0 / len(ws)
         ELSE 0.0 END AS frac_alpha_words,
    CAST(len(list_intersect(list_distinct(ws),
         ['the','be','to','of','and','that','have','with']))
         AS BIGINT) AS n_stop_hits
  FROM w)
SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stop_hits,
       (n_words BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3.0 AND 10.0)
       AND (frac_alpha_words >= 0.8)
       AND (n_stop_hits >= 1) AS kept
FROM f
"""


def q_dsir_logratio_docs(sf_dir):
    """DSIR importance weights (hashed {uni,bi}gram bag; target = docs
    with lang='en'): fixed-size two-array model (4096 buckets) broadcast
    to a vectorized scoring pass — the data-SELECTION complement of the
    LM quality scorers (functions/text.py dsir_logratio). The md5 bucket
    hash is reproduced exactly in the DuckDB oracle."""
    from ..functions.text import dsir_logratio

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text", "lang"])
    ds = _drop_null_rows(ds, ["text"])
    return dsir_logratio(ds, id_col="doc_id", col="text",
                         target_col="lang", target_value="en",
                         num_buckets=4096)


_DSIR_LOGRATIO_SQL = r"""
WITH arrs AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS a
  FROM documents WHERE text IS NOT NULL),
uni AS (SELECT doc_id, lang, unnest(a) AS f FROM arrs),
big AS (
  SELECT doc_id, lang, z[1] || ' ' || z[2] AS f
  FROM (SELECT doc_id, lang, unnest(list_zip(a[:-2], a[2:])) AS z
        FROM arrs)
  WHERE z[1] IS NOT NULL AND z[2] IS NOT NULL),
feats AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(f), 1, 15)) AS UBIGINT) % 4096 AS h
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
cnt AS (
  SELECT h, count(*) AS c_raw,
         count(*) FILTER (WHERE lang = 'en') AS c_tgt
  FROM feats GROUP BY h),
tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM cnt),
per AS (
  SELECT doc_id, count(*) AS n_feats,
         sum(ln((c_tgt + 1.0) / (t_tgt + 4096))
             - ln((c_raw + 1.0) / (t_raw + 4096))) AS lr
  FROM feats JOIN cnt USING (h) CROSS JOIN tot GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
       round(lr, 4) AS log_ratio
FROM documents d LEFT JOIN per USING (doc_id)
WHERE d.text IS NOT NULL
"""


def q_dedup_corpus_docs(sf_dir):
    """End-to-end near-dup dedup APPLIED: jaccard pairs (>=0.5) ->
    connected components -> keep unpaired docs plus each cluster's
    min-id canonical. The surviving corpus (doc_id, n_chars)."""
    from ..functions.dedup import dedup_keep_canonical, ngram_jaccard_pairs
    from ..functions.graph import connected_components

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text", "n_chars"])
    # edge Dataset straight into CC (no driver pair materialization;
    # materialize() pins the small thresholded pair set for CC's
    # per-round edge re-reads)
    pairs = ngram_jaccard_pairs(ds, "doc_id", "text",
                                threshold=0.5).materialize()
    survivors = ds.select_columns(["doc_id", "n_chars"])
    if pairs.count():
        cc = connected_components(pairs)
        survivors = dedup_keep_canonical(survivors, cc, "doc_id")
    return survivors


# survivors = docs minus non-canonical cluster members (reach CTE shared
# with _DUP_CLUSTERS_SQL)
_DEDUP_CORPUS_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(CASE
      WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      ELSE [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
    END) AS s
  FROM toks WHERE len(ws) > 0
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      len(list_intersect(a.s, b.s)) AS inter,
      len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  ) WHERE inter / uni >= 0.5
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), removed AS (
  SELECT u AS doc_id FROM reach GROUP BY u HAVING u <> min(v)
)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
"""


def q_editdist_clips(sf_dir):
    """Blocked edit-distance near-dup join over clip transcripts
    (block = word-count|first-word, Levenshtein <= 4, min-dist per id
    pair): the typo-level dedup family that n-gram Jaccard misses.
    Exact-integer distances hash-match the DuckDB levenshtein oracle."""
    from ..functions.dedup import editdist_blocked_pairs
    from ..sources.clips import clips_cache_dir

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "transcript"])
    return editdist_blocked_pairs(ds, "clip_id", "transcript",
                                  max_dist=4)


def _editdist_clips_sql(sf_dir: str) -> str:
    from ..sources.clips import clips_cache_dir

    path = clips_cache_dir(sf_dir)
    return f"""
WITH c AS (
  SELECT clip_id, transcript,
         len(string_split(transcript, ' ')) AS n_words,
         string_split(transcript, ' ')[1] AS w1,
         len(transcript) AS tlen
  FROM read_parquet('{path}/*.parquet')
  WHERE transcript IS NOT NULL AND transcript <> ''),
p AS (
  SELECT a.clip_id AS id_a, b.clip_id AS id_b,
         CASE WHEN a.transcript = b.transcript THEN 0
              ELSE levenshtein(a.transcript, b.transcript) END AS d
  FROM c a JOIN c b
    ON a.n_words = b.n_words AND a.w1 = b.w1 AND a.clip_id < b.clip_id
  WHERE abs(a.tlen - b.tlen) <= 4)
SELECT id_a, id_b, CAST(min(d) AS BIGINT) AS dist
FROM p WHERE d <= 4 GROUP BY id_a, id_b
"""


def q_clips_validation(sf_dir):
    """Flagship constraint suite over the synthesized clips table."""
    from ..sources.clips import clips_cache_dir
    from .validate import clip_validation_pipeline, summarize_verdicts

    d = clips_cache_dir(sf_dir)
    out = clip_validation_pipeline(d)
    s = summarize_verdicts(out["verdicts"])
    s["n_dupe_keys"] = out["dupes"].count()
    s["n_referential"] = out["referential"].count()
    return pd.DataFrame([s])


def q_clips_violations(sf_dir):
    from ..sources.clips import clips_cache_dir
    from .validate import clip_validation_pipeline

    d = clips_cache_dir(sf_dir)
    out = clip_validation_pipeline(d)
    counts = out["violations"].groupby("keywordLocation").count()
    return counts.map_batches(
        lambda t: t.rename_columns(["keywordLocation", "n"]),
        batch_format="pyarrow")


def q_clips_decode(sf_dir):
    from ..sources.clips import clips_cache_dir
    from .validate import clip_validation_pipeline

    d = clips_cache_dir(sf_dir)
    out = clip_validation_pipeline(d, decode=True)
    # aggregate IN Ray (per-block partial counts -> tiny groupby); only
    # the <=4-row result lands on the driver — never O(rows)
    counts = out["verdicts"].select_columns(["valid", "decode_ok"]) \
        .map_batches(
            lambda t: t.group_by(["valid", "decode_ok"])
                       .aggregate([([], "count_all")]),
            batch_format="pyarrow") \
        .groupby(["valid", "decode_ok"]).sum("count_all")
    agg = counts.to_pandas().rename(columns={"sum(count_all)": "n"})
    agg = finalize(agg, {"valid": None, "decode_ok": None, "n": "int64"})
    return agg.sort_values(["valid", "decode_ok"]).reset_index(drop=True)


def _clips_decode_sql(sf_dir: str) -> str:
    """Round-5 value oracle for the decode-enabled verdict summary: the
    decoder's success rules are byte-level deterministic, so SQL mirrors
    them from octet_length + metadata alone — pcm needs an even payload,
    wav needs the exact 44 + 2*n RIFF length its header declares (n from
    the generator's clamped-duration formula; any truncation breaks the
    equality), fake containers need the 12-byte magic plus even frames,
    and decode_ok additionally requires the measured duration
    (1000*frames/sr) to sit within the decoder's 1.5ms + one-sample
    tolerance of the declared dur_ms (stages/decode.py ClipDecoder).
    Exact across both test scales including every dirty-row class."""
    from ..sources.clips import CODECS, clips_cache_dir

    path = clips_cache_dir(sf_dir)
    codecs = ", ".join(f"'{c}'" for c in CODECS)
    return f"""
WITH clips AS (SELECT * FROM read_parquet('{path}/*.parquet')),
checks AS (
  SELECT sr_hz, dur_ms, codec, octet_length(bytes) AS L,
    (bytes IS NULL) AS no_bytes,
    ((clip_id IS NOT NULL
      AND NOT regexp_matches(clip_id, '^clip-[0-9a-f]{{12}}$'))
     OR (sr_hz IS NOT NULL AND (sr_hz < 8000 OR sr_hz > 48000
                                OR (sr_hz % 25) != 0))
     OR (dur_ms IS NOT NULL AND (dur_ms <= 0 OR dur_ms > 600000))
     OR (codec IS NOT NULL AND codec NOT IN ({codecs}))
     OR (transcript IS NOT NULL AND (length(transcript) < 1
                                     OR length(transcript) > 1024))
     OR clip_id IS NULL OR bytes IS NULL OR sr_hz IS NULL
     OR dur_ms IS NULL OR codec IS NULL) AS invalid
  FROM clips),
d2 AS (
  SELECT NOT invalid AS valid,
    CASE
      WHEN no_bytes THEN false
      WHEN codec = 'pcm_s16le' THEN L % 2 = 0
      WHEN codec = 'wav' THEN
        L = 44 + 2 * CAST(sr_hz * (CASE WHEN dur_ms >= 600000 THEN 200
                                        WHEN dur_ms < 0 OR dur_ms IS NULL
                                          THEN 0
                                        ELSE dur_ms END) // 1000 AS BIGINT)
      WHEN codec IN ('flac','opus','mp3')
        THEN L >= 12 AND (L - 12) % 2 = 0
      ELSE false END AS decodable,
    CASE
      WHEN codec = 'pcm_s16le' THEN L // 2
      WHEN codec = 'wav' THEN (L - 44) // 2
      ELSE (L - 12) // 2 END AS frames,
    sr_hz, dur_ms
  FROM checks)
SELECT valid,
  (decodable AND NOT (
     sr_hz IS NOT NULL AND sr_hz > 0 AND dur_ms IS NOT NULL AND dur_ms > 0
     AND abs(1000.0 * frames / sr_hz - dur_ms) > 1.5 + 1000.0 / sr_hz))
    AS decode_ok,
  CAST(count(*) AS BIGINT) AS n
FROM d2 GROUP BY 1, 2 ORDER BY 1, 2
"""


#: banker's-rounding SQL fragment over a scalar x (Python round()
#: semantics — the resampler computes round(len*16000/sr) with float64
#: half-to-even, which SQL round() would get wrong at exact halves)
_BANKERS_ROUND = """CAST(floor(x) AS BIGINT)
    + CASE WHEN x - floor(x) > 0.5 THEN 1
           WHEN x - floor(x) < 0.5 THEN 0
           ELSE CAST(floor(x) AS BIGINT) % 2 END"""


def _audio_r2_sql(sf_dir: str) -> str:
    """Shared CTE for the audio-DSP value oracles: per clip, raw-decode
    success by the byte rules (see _clips_decode_sql), resample success
    (decodable + positive sr), and the 16 kHz resampled sample count via
    banker's-rounded rate scaling — everything downstream framing
    formulas need, derived purely from (octet_length, sr_hz, dur_ms,
    codec)."""
    from ..sources.clips import clips_cache_dir

    path = clips_cache_dir(sf_dir)
    BR = _BANKERS_ROUND
    return f"""
WITH clips AS (SELECT * FROM read_parquet('{path}/*.parquet')),
base AS (
  SELECT clip_id, sr_hz, dur_ms, codec, octet_length(bytes) AS L,
    (bytes IS NOT NULL AND CASE
      WHEN codec = 'pcm_s16le' THEN octet_length(bytes) % 2 = 0
      WHEN codec = 'wav' THEN octet_length(bytes) =
        44 + 2 * CAST(sr_hz * (CASE WHEN dur_ms >= 600000 THEN 200
                                    WHEN dur_ms < 0 OR dur_ms IS NULL THEN 0
                                    ELSE dur_ms END) // 1000 AS BIGINT)
      WHEN codec IN ('flac','opus','mp3')
        THEN octet_length(bytes) >= 12 AND (octet_length(bytes)-12) % 2 = 0
      ELSE false END) AS dec_raw
  FROM clips),
r1 AS (
  SELECT clip_id, (dec_raw AND sr_hz IS NOT NULL AND sr_hz > 0)
           AS resample_ok,
    CASE WHEN codec = 'pcm_s16le' THEN L // 2
         WHEN codec = 'wav' THEN (L - 44) // 2
         ELSE (L - 12) // 2 END AS fr_raw, sr_hz
  FROM base),
r2 AS (
  SELECT clip_id, resample_ok,
    CASE WHEN resample_ok THEN
      (SELECT {BR} FROM (SELECT CAST(fr_raw AS DOUBLE) * 16000 / sr_hz AS x))
    ELSE 0 END AS n_samples
  FROM r1)
"""


def _audio_resample_vad_sql(sf_dir: str) -> str:
    """Round-5 value oracle (no query reshape needed): every emitted
    column of the resample+VAD pass is a deterministic function of
    (octet_length, sr_hz, dur_ms, codec) — decodability by the byte
    rules, resampled length by banker's-rounded rate scaling, and the
    VAD verdicts collapse on the synthetic tone corpus (all full frames
    active, one run; n_segments = 1 iff >= 5 frames of 20ms, ratio 1.0
    / 0.0-short / NULL-failed). Verified per-row at both test scales."""
    return _audio_r2_sql(sf_dir) + """
SELECT clip_id, resample_ok, n_samples,
  resample_ok AS vad_ok,
  CASE WHEN resample_ok AND n_samples // 320 >= 5
       THEN 1 ELSE 0 END AS n_segments,
  CASE WHEN NOT resample_ok THEN NULL
       WHEN n_samples >= 320 THEN 1.0 ELSE 0.0 END AS speech_ratio
FROM r2
"""


def _audio_mel_sql(sf_dir: str) -> str:
    """Round-5 value oracle: mel framing is 512-sample tumbling windows
    over the 16 kHz resample (zero-padded to one frame when shorter);
    the L2-norm content value became a finiteness contract in the query
    (raw norms pinned by tests/test_audio_features.py)."""
    return _audio_r2_sql(sf_dir) + """
SELECT clip_id, resample_ok AS mel_ok,
  CAST(CASE WHEN resample_ok THEN greatest(1, n_samples // 512)
            ELSE 0 END AS INT) AS mel_frames,
  resample_ok AS mel_finite
FROM r2
"""


def _audio_specaugment_sql(sf_dir: str) -> str:
    """Round-5 value oracle: SpecAugment expands each mel-ok clip to 2
    deterministic variants (clip_id#sa0/#sa1) and passes failed rows
    through once; frames carry over from the mel formula. The masked
    content value became a finiteness contract (mask math pinned by the
    SpecAugment unit tests)."""
    return _audio_r2_sql(sf_dir) + """
SELECT clip_id || '#sa' || v.k AS clip_id, clip_id AS source_clip_id,
  CAST(greatest(1, n_samples // 512) AS INT) AS mel_frames,
  true AS mel_ok, true AS sa_finite
FROM r2 CROSS JOIN (VALUES (0), (1)) AS v(k) WHERE resample_ok
UNION ALL
SELECT clip_id, clip_id, 0, false, false FROM r2 WHERE NOT resample_ok
"""


def _audio_trim_sql(sf_dir: str) -> str:
    """Round-5 value oracle (no query reshape): on the synthetic tone
    corpus the trimmer cuts NOTHING (every frame of a nonempty clip sits
    far above -50 dBFS), so kept samples = the decoded frame count and
    trimmed ms = 0 exactly; empty-pcm clips (dur<=0 dirty rows, fully
    truncated payloads) are the 'entirely silent' trim_ok=false class.
    A trimmer regression that starts cutting real audio (or passing
    silence) breaks the mean/total equalities. Verified exact at both
    test scales."""
    return _audio_r2_sql(sf_dir) + """
, t AS (
  SELECT (resample_ok AND fr_raw > 0) AS trim_ok,
    CASE WHEN resample_ok AND fr_raw > 0 THEN fr_raw ELSE 0 END AS kept
  FROM r1)
SELECT trim_ok, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(kept) AS BIGINT) AS total_kept_samples,
       0.0 AS mean_trimmed_ms
FROM t GROUP BY trim_ok
"""


def _audio_denoise_sql(sf_dir: str) -> str:
    """Round-5 value oracle: denoise success mirrors resample success,
    and the no-added-energy contract holds for every nonempty denoised
    clip (the query computes it against the real RMS values; the SQL
    pins which rows must satisfy it)."""
    return _audio_r2_sql(sf_dir) + """
SELECT clip_id, resample_ok AS denoise_ok,
       (resample_ok AND n_samples > 0) AS rms_not_increased
FROM r2
"""


def _audio_cmvn_sql(sf_dir: str) -> str:
    """Round-5 value oracle: CMVN applies to exactly the mel-ok rows
    and its normalized vectors are finite (per-clip moments stay pinned
    by the CMVN unit tests)."""
    return _audio_r2_sql(sf_dir) + """
SELECT clip_id, resample_ok AS mel_ok, resample_ok AS cmvn_finite
FROM r2
"""


def _audio_features_sql(sf_dir: str) -> str:
    """Round-5 value oracle: spectral features exist for exactly the
    decodable nonempty clips and satisfy their physical-range contracts
    (zcr in [0,1], finite energy, centroid/rolloff under the clip's own
    Nyquist — the query computes the bounds against the real values,
    the SQL pins which rows must satisfy them)."""
    return _audio_r2_sql(sf_dir) + """
, f AS (SELECT clip_id, (resample_ok AND n_samples > 0) AS ok FROM r2)
SELECT clip_id, ok AS feat_ok, ok AS zcr_in_unit, ok AS energy_finite,
       ok AS centroid_below_nyquist, ok AS rolloff_below_nyquist
FROM f
"""


def _audio_qc_sql(sf_dir: str) -> str:
    """Round-5 value oracle: on the tone corpus the QC gates partition
    rows into exactly (decodable nonempty -> pass) vs everything else,
    with no clipping, no silence, and corpus-mean RMS/crest inside the
    synth band; the query computes the contracts against the real
    means."""
    return _audio_r2_sql(sf_dir) + """
, q AS (SELECT (resample_ok AND fr_raw > 0) AS g FROM r1)
SELECT g AS qc_ok, g AS qc_pass, CAST(count(*) AS BIGINT) AS n,
       g AS no_clipping, g AS no_silence, g AS rms_in_band,
       g AS crest_in_band
FROM q GROUP BY g
"""


def _audio_prep_segments_sql(sf_dir: str) -> str:
    """Round-5 value oracle: the ASR-prep chain's row structure is fully
    metadata-determined on the tone corpus — one speech segment per
    clip with >= 5 active 20ms frames (see _audio_resample_vad_sql),
    expanded to 2 deterministic augmentation variants; jitter values
    became configured-band contracts in the query."""
    return _audio_r2_sql(sf_dir) + """
SELECT clip_id || '#aug' || v.k AS clip_id, clip_id AS source_clip_id,
       CAST(16000 AS INT) AS sr_hz,
       true AS speed_in_band, true AS gain_in_band
FROM r2 CROSS JOIN (VALUES (0), (1)) AS v(k)
WHERE resample_ok AND n_samples // 320 >= 5
"""


def q_grouped_stats_codec(sf_dir):
    """Salted grouped stats over the hot codec key; the oracle checks the
    exact fields (n/n_null/mean/min/max — integer dur_ms sums are exact in
    float64, so mean is bit-deterministic); the t-digest quantiles stay in
    grouped_stats' full output and are unit-tested for accuracy."""
    from ..sources.clips import clips_cache_dir
    from .stats import grouped_stats

    # a 2-column key/value read needs ~1 block per CPU, not the payload-
    # sized default split (ray's SplitBlocks gave 200 hundred-row blocks
    # here and every downstream stage paid 200x task overhead)
    ds = read_table(clips_cache_dir(sf_dir), columns=["codec", "dur_ms"],
                    override_num_blocks=32)
    out = grouped_stats(ds, "codec", "dur_ms")
    return out.map_batches(
        lambda t: t.select(["codec", "n", "n_null", "mean", "min", "max"]),
        batch_format="pyarrow")


def _grouped_stats_codec_sql(sf_dir: str) -> str:
    from ..sources.clips import clips_cache_dir

    path = clips_cache_dir(sf_dir)
    return f"""
SELECT codec, count(*) AS n,
  CAST(sum(CASE WHEN dur_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  avg(dur_ms) AS mean,
  CAST(min(dur_ms) AS DOUBLE) AS "min",
  CAST(max(dur_ms) AS DOUBLE) AS "max"
FROM read_parquet('{path}/*.parquet')
WHERE codec IS NOT NULL GROUP BY codec
"""


def q_profile_sketches_lineitem(sf_dir):
    """Mergeable-sketch column profile — round-5 conversion from
    rows-only to a VALUE oracle. Exact profile fields (count / nulls /
    min / max) compare bit-exactly to SQL; the sketch estimates become
    INEQUALITY oracles: the query computes the exact complement itself
    (distributed exact distinct; one partial-sum rank pass over the same
    pruned read for the t-digest estimates) and emits pass/fail bools
    the SQL pins to true — a silent sketch regression now breaks the
    driver compare instead of passing rows-only. The float ``sum``
    field is excluded from the comparable output (per-block addition
    order makes its low bits nondeterministic vs SQL); it stays covered
    by the sketch unit tests.

    Bounds: HLL distinct within 3% of exact (unit tests pin ~2% at
    2^12 registers); t-digest rank error within 1.5% (tests pin <=1%).
    """
    from ..functions.dedup import exact_distinct_counts
    from .stats import profile_dataset

    cols = ["l_quantity", "l_extendedprice"]
    ds = read_table(table_path(sf_dir, "lineitem"), columns=cols)
    prof = profile_dataset(ds, columns=cols)
    st = prof.stats_table().to_pandas()

    exact = exact_distinct_counts(ds, cols).to_pandas()
    exact_d = dict(zip(exact["col"], exact["n_distinct"]))

    plabels = ["p01", "p25", "p50", "p75", "p99"]
    pq_ = [0.01, 0.25, 0.50, 0.75, 0.99]
    ests = {r["column"]: [(lb, float(r[lb])) for lb in plabels]
            for _, r in st.iterrows()}

    def rank_partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "label": [], "n_lt": [], "n_le": [],
                "n": []}
        for col, pairs in ests.items():
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            for label, e in pairs:
                rows["column"].append(col)
                rows["label"].append(label)
                rows["n_lt"].append(int((v < e).sum()))
                rows["n_le"].append(int((v <= e).sum()))
                rows["n"].append(len(v))
        return pa.table({"column": pa.array(rows["column"]),
                         "label": pa.array(rows["label"]),
                         "n_lt": pa.array(rows["n_lt"], pa.int64()),
                         "n_le": pa.array(rows["n_le"], pa.int64()),
                         "n": pa.array(rows["n"], pa.int64())})

    ranks = ds.map_batches(rank_partial, batch_format="pyarrow") \
        .groupby(["column", "label"]) \
        .sum(["n_lt", "n_le", "n"]).to_pandas()
    ranks = ranks.set_index(["column", "label"])

    out_rows = []
    for _, r in st.iterrows():
        col = r["column"]
        row = {"column": col, "kind": r["kind"],
               "count": int(r["count"]), "nulls": int(r["nulls"]),
               "min": float(r["min"]), "max": float(r["max"]),
               "distinct_ok": abs(r["distinct_approx"] - exact_d[col])
               <= 0.03 * exact_d[col]}
        for lb, q in zip(plabels, pq_):
            g = ranks.loc[(col, lb)]
            n = g["sum(n)"]
            row[f"{lb}_ok"] = bool(
                g["sum(n_lt)"] / n <= q + 0.015
                and g["sum(n_le)"] / n >= q - 0.015)
        out_rows.append(row)
    return pd.DataFrame(out_rows).sort_values("column") \
        .reset_index(drop=True)


_PROFILE_SKETCHES_SQL = """
SELECT 'l_quantity' AS "column", 'numeric' AS kind,
       CAST(count(*) AS BIGINT) AS count,
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS nulls,
       CAST(min(l_quantity) AS DOUBLE) AS "min",
       CAST(max(l_quantity) AS DOUBLE) AS "max",
       true AS distinct_ok, true AS p01_ok, true AS p25_ok,
       true AS p50_ok, true AS p75_ok, true AS p99_ok
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'numeric', count(*),
       sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
       min(l_extendedprice), max(l_extendedprice),
       true, true, true, true, true, true
FROM lineitem
"""


def q_drift_lineitem_halves(sf_dir):
    """Drift between two halves of lineitem (should NOT drift) plus a
    scaled copy (SHOULD drift) — returns the verdict rows."""
    from ..state.profile import drift_report
    from .stats import hist_edges_from_profile, profile_dataset

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_quantity"])

    def half(t: pa.Table, rem: int) -> pa.Table:
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keys % 2 == rem))

    a = ds.map_batches(functools.partial(half, rem=0), batch_format="pyarrow")
    b = ds.map_batches(functools.partial(half, rem=1), batch_format="pyarrow")
    pa_ = profile_dataset(a, columns=["l_quantity"])
    edges = hist_edges_from_profile(pa_)
    pa_ = profile_dataset(a, columns=["l_quantity"], hist_edges=edges)
    pb = profile_dataset(b, columns=["l_quantity"], hist_edges=edges)

    def scale(t: pa.Table) -> pa.Table:
        return pa.table({"l_quantity": pc.multiply(t["l_quantity"], 3.0)})

    pc_ = profile_dataset(b.map_batches(scale, batch_format="pyarrow"),
                          columns=["l_quantity"], hist_edges=edges)
    rows = []
    for tag, rep in (("same", drift_report(pa_, pb)),
                     ("scaled", drift_report(pa_, pc_))):
        for r in rep:
            rows.append({"case": tag, "column": r["column"],
                         "drifted": r["drifted"]})
    return pd.DataFrame(rows)


# Round-5 value oracle for the drift verdicts: the construction makes
# the expected output a theorem — identical halves of one table must
# not drift (KS between two samples of the same distribution is far
# under the 0.1 threshold at these row counts) and a 3x-scaled copy
# must (KS -> ~0.96). The SQL pins those verdict booleans, so a drift
# detector that goes blind (or trigger-happy) fails the compare.
_DRIFT_LINEITEM_SQL = """
SELECT * FROM (VALUES ('same', 'l_quantity', false),
                      ('scaled', 'l_quantity', true))
  AS t("case", "column", drifted)
"""


def q_minhash_docs(sf_dir):
    from ..functions.dedup import minhash_lsh_pairs

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    out = minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.2)
    return out.select_columns(["id_a", "id_b"])


def q_simhash_docs(sf_dir):
    from ..functions.dedup import simhash_pairs

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    out = simhash_pairs(ds, "doc_id", "text", max_hamming=8)
    return out.select_columns(["id_a", "id_b"])


def q_embedding_neardup_lsh(sf_dir):
    from ..functions.similarity import embedding_neardup_pairs

    ds = read_table(table_path(sf_dir, "embeddings"))
    out = embedding_neardup_pairs(ds, threshold=0.45, bands=8,
                                  planes_per_band=4)
    return out[["id_a", "id_b"]] if len(out) else \
        pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                      "id_b": pd.Series([], dtype="int64")})


# ---------------------------------------------------------------------------
# training-data prep: cleaning, safety, contamination, packing, shuffle order


def q_normalize_docs(sf_dir):
    from ..functions.text import normalize_text_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "text_norm", "text_norm_chars"])


_NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm,
       length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
         AS text_norm_chars
FROM documents
"""


def q_repetition_docs(sf_dir):
    from ..functions.text import repetition_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
agg AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
per AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
               max(c) AS top_tok_count
        FROM agg GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(coalesce(top_tok_count, 0) AS BIGINT) AS top_tok_count
FROM documents d LEFT JOIN per USING (doc_id)
"""


def q_lexdiv_docs(sf_dir):
    """Lexical-diversity quality metrics (token/distinct/hapax counts +
    Shannon token entropy): the standard repetitive/generated-text
    filters. Stateless batch kernel fused with the read."""
    from ..functions.text import lexical_diversity_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(lexical_diversity_batch, batch_format="pyarrow")


_LEXDIV_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
agg AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
ent AS (SELECT doc_id, round(entropy(tok), 4) AS token_entropy
        FROM toks GROUP BY doc_id)
SELECT a.doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       any_value(token_entropy) AS token_entropy
FROM agg a JOIN ent USING (doc_id)
GROUP BY a.doc_id
"""


def q_pii_docs(sf_dir):
    """PII scan over a deterministically PII-augmented text column (the
    synthetic docs contain no organic PII; both sides build the same
    fixture: doc_id%3 -> email, %5 -> phone, %7 -> ip)."""
    from ..functions.text import pii_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])

    def augment(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = t["text"].to_pylist()
        scan = []
        for i, d in enumerate(did):
            s = txt[i]
            if d % 3 == 0:
                s += f" contact user{d}@example.com"
            if d % 5 == 0:
                s += " call 555-123-4567"
            if d % 7 == 0:
                s += f" from 192.168.0.{d % 250}"
            scan.append(s)
        return pa.table({"doc_id": t["doc_id"], "text": scan})

    ds = ds.map_batches(augment, batch_format="pyarrow")
    return ds.map_batches(pii_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_email", "n_phone", "n_ipv4",
                         "redacted"])


def _pii_sql() -> str:
    from ..functions.text import PII_PATTERNS
    pats = {name: (rx, tok) for name, rx, tok in PII_PATTERNS}
    red = "t"
    for name, (rx, tok) in pats.items():
        red = f"regexp_replace({red}, '{rx}', '{tok}', 'g')"
    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(t, '{rx}')) AS BIGINT) AS n_{name}"
        for name, (rx, _) in pats.items())
    return rf"""
WITH scan AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' from 192.168.0.' || (doc_id % 250) ELSE '' END AS t
  FROM documents)
SELECT doc_id,
  {counts},
  {red} AS redacted
FROM scan
"""


# benchmark-contamination phrase list: fixed literals (stand-ins for an
# eval-set n-gram inventory; broadcast once at scale)
CONTAM_PHRASES = ("table table", "query big query", "fast merge batch",
                  "spark order data", "window stream sort", "the line sort")


def q_contamination_docs(sf_dir):
    from ..functions.text import contamination_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(
        contamination_batch, batch_format="pyarrow",
        fn_kwargs=dict(phrases=CONTAM_PHRASES)) \
        .select_columns(["doc_id", "n_hits", "contaminated"])


def _contamination_sql() -> str:
    hits = " + ".join(
        f"CASE WHEN position('{p}' IN text) > 0 THEN 1 ELSE 0 END"
        for p in CONTAM_PHRASES)
    return f"""
SELECT doc_id, CAST({hits} AS BIGINT) AS n_hits,
       ({hits}) > 0 AS contaminated
FROM documents
"""


def q_shuffle_docs(sf_dir):
    from ..functions.scan import global_rank

    ds = read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
    return global_rank(ds, id_col="doc_id", seed=42)


_SHUFFLE_SQL = """
SELECT doc_id,
       row_number() OVER (ORDER BY md5(doc_id::VARCHAR || ':42'), doc_id) - 1
         AS shuffle_rank
FROM documents
"""


def q_weighted_topk_docs(sf_dir):
    """Weighted sampling WITHOUT replacement (A-ES top-k): exactly 100
    docs drawn with probability proportional to n_chars, deterministic
    from (doc_id, seed) so any engine reproduces the draw. Complements
    the Bernoulli `weighted_sample_docs` (expected-k, per-batch): this
    one is exact-k via a per-block top-k combiner — only candidates
    leave a block (functions/scan.py:weighted_sample_topk)."""
    from ..functions.scan import weighted_sample_topk

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "n_chars"])
    out = weighted_sample_topk(ds, id_col="doc_id", weight_col="n_chars",
                               k=100, seed=42)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df


_WEIGHTED_TOPK_SQL = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
    ln(CAST(CAST(concat('0x', substr(md5(doc_id::VARCHAR || ':42'), 1, 15))
             AS UBIGINT) AS DOUBLE) / 1152921504606846976.0)
      / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0
  ORDER BY key DESC, doc_id LIMIT 100)
ORDER BY doc_id
"""


def _perturb_orders_batch(t: pa.Table) -> pa.Table:
    """Deterministic 'next delivery' of orders: drop key%97==0, +1.00
    price on key%89==0, status 'X' on key%83==0 (breaks the enum, so
    incremental revalidation has real verdict flips), re-keyed copies of
    key%101==0 appended. Mirrored exactly by the new_snap CTE in
    _SNAPSHOT_DIFF_SQL / _INCR_VALIDATE_SQL."""
    import numpy as np

    k = t["o_orderkey"].to_numpy()
    price = t["o_totalprice"].to_numpy(zero_copy_only=False)
    status = np.asarray(t["o_orderstatus"].to_pylist(), object)
    new_price = np.where((k % 89) == 0, price + 1.0, price)
    new_status = np.where((k % 83) == 0, "X", status)
    keep = (k % 97) != 0
    base = pa.table({
        "o_orderkey": pa.array(k[keep]),
        "o_totalprice": pa.array(new_price[keep]),
        "o_orderstatus": pa.array(new_status[keep].tolist(), pa.string()),
    })
    add = (k % 101) == 0
    added = pa.table({
        "o_orderkey": pa.array(k[add] + 100000000),
        "o_totalprice": pa.array(price[add]),
        "o_orderstatus": pa.array(status[add].tolist(), pa.string()),
    })
    return pa.concat_tables([base, added])


def q_snapshot_diff_orders(sf_dir):
    """Snapshot diff (functions/diff.py): added/removed/changed orders
    between the base table and a deterministically perturbed delivery
    (_perturb_orders_batch). One narrow keys+compared columns shuffle;
    unchanged keys emit nothing."""
    from ..functions.diff import snapshot_diff

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    old = read_table(table_path(sf_dir, "orders"), columns=cols)
    new = read_table(table_path(sf_dir, "orders"), columns=cols) \
        .map_batches(_perturb_orders_batch, batch_format="pyarrow")
    out = snapshot_diff(old, new, key_col="o_orderkey",
                        compare_cols=["o_totalprice", "o_orderstatus"])
    df = out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    # coalesce absent-side values to sentinels (the oracle does the same):
    # value-hash comparison should not depend on NaN-vs-None encodings
    return df.fillna({"o_totalprice_old": -1.0, "o_totalprice_new": -1.0,
                      "o_orderstatus_old": "", "o_orderstatus_new": ""})


_SNAPSHOT_DIFF_SQL = r"""
WITH new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 83 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 101 = 0
)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       coalesce(o.o_totalprice, -1.0)  AS o_totalprice_old,
       coalesce(n.o_totalprice, -1.0)  AS o_totalprice_new,
       coalesce(o.o_orderstatus, '')   AS o_orderstatus_old,
       coalesce(n.o_orderstatus, '')   AS o_orderstatus_new
FROM orders o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
"""


_INCR_ORDERS_SPEC = {
    "$id": "https://jschon-ray.dev/specs/orders-delta",
    "type": "object",
    "required": ["o_orderkey", "o_orderstatus", "o_totalprice"],
    "properties": {
        "o_orderkey": {"type": "integer", "exclusiveMinimum": 0},
        "o_orderstatus": {"enum": ["O", "F", "P"]},
        "o_totalprice": {"type": "number", "exclusiveMinimum": 0,
                         "maximum": 300000},
    },
}


def q_incremental_validate_orders(sf_dir):
    """Incremental revalidation: validate ONLY the delta of a new
    delivery and merge with the stored verdicts of the previous one —
    provably equal to revalidating the whole snapshot (the oracle runs
    the full validation SQL over the new snapshot).

    Composition: snapshot_diff gives the changed/added/removed key sets
    (delta-sized, ~3% here — broadcast via ray.put); prior verdicts
    stream through a key-set filter; only delta rows enter the
    validator. At 100 TB this turns a full revalidation into work
    proportional to the delivery's churn."""
    import ray

    from ..functions.diff import snapshot_diff
    from .validate import validate_dataset

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    old = read_table(table_path(sf_dir, "orders"), columns=cols)
    new = read_table(table_path(sf_dir, "orders"), columns=cols) \
        .map_batches(_perturb_orders_batch, batch_format="pyarrow")

    # stored verdicts of the previous delivery (simulated here by
    # validating the old snapshot; in production this is a saved table)
    old_verdicts = validate_dataset(old, _INCR_ORDERS_SPEC) \
        .select_columns(["o_orderkey", "valid"])

    delta = snapshot_diff(old, new, key_col="o_orderkey",
                          compare_cols=["o_totalprice", "o_orderstatus"]) \
        .to_pandas()
    reval = set(delta[delta["status"].isin(["added", "changed"])]
                ["o_orderkey"].tolist())
    drop = set(delta[delta["status"].isin(["removed", "changed"])]
               ["o_orderkey"].tolist())
    reval_ref, drop_ref = ray.put(reval), ray.put(drop)

    def keep_unchanged(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        k = t["o_orderkey"].to_numpy()
        mask = np.fromiter((v not in d for v in k), bool, len(k))
        return t.filter(pa.array(mask))

    def keep_delta(t: pa.Table) -> pa.Table:
        r = ray.get(reval_ref)
        k = t["o_orderkey"].to_numpy()
        mask = np.fromiter((v in r for v in k), bool, len(k))
        return t.filter(pa.array(mask))

    unchanged = old_verdicts.map_batches(keep_unchanged,
                                         batch_format="pyarrow")
    delta_verdicts = validate_dataset(
        new.map_batches(keep_delta, batch_format="pyarrow"),
        _INCR_ORDERS_SPEC).select_columns(["o_orderkey", "valid"])
    out = unchanged.union(delta_verdicts).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


_REPAIR_ORDERS_SPEC = {
    "$id": "https://jschon-ray.dev/specs/orders-repair",
    "type": "object",
    "properties": {
        "o_totalprice": {"type": "number", "minimum": 1.0,
                         "maximum": 300000.0, "default": 1.0},
        "o_orderstatus": {"enum": ["O", "F", "P"], "default": "O"},
        "o_orderpriority": {"type": "string", "maxLength": 6},
    },
}


def q_drift_daily_events(sf_dir):
    """Daily distribution-drift series: PSI of `value` between each day
    and the previous day over 5 fixed bins with add-half smoothing.
    Scale shape: per-block fused (day, bin) bincount partials -> one
    tiny (days x bins) aggregate; only ~150 count rows reach the
    driver, which does the PSI arithmetic. The temporal extension of
    drift_psi_bins_lineitem: a monitoring series, not a single score."""
    edges = np.array([1.0, 5.0, 20.0, 100.0])
    n_bins = 5

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]")
        b = np.searchsorted(edges, v, side="right")
        key = np.char.add(np.char.add(day.astype(str), "#"),
                          b.astype(str))
        uniq, counts = np.unique(key, return_counts=True)
        days = [u.split("#")[0] for u in uniq]
        bins = [int(u.split("#")[1]) for u in uniq]
        return pa.table({"day": pa.array(days, pa.string()),
                         "bin": pa.array(bins, pa.int32()),
                         "n": pa.array(counts.astype(np.int64))})

    ds = read_table(table_path(sf_dir, "events"), columns=["ts", "value"])
    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["day", "bin"]).sum("n").take_all()

    grid = {}
    for r in rows:
        grid.setdefault(r["day"], np.zeros(n_bins, np.int64))[r["bin"]] \
            += int(r["sum(n)"])
    days = sorted(grid)
    out_day, out_psi = [], []
    for prev, cur in zip(days, days[1:]):
        n0, n1 = grid[prev], grid[cur]
        p0 = (n0 + 0.5) / (n0.sum() + 0.5 * n_bins)
        p1 = (n1 + 0.5) / (n1.sum() + 0.5 * n_bins)
        psi = float(np.sum((p1 - p0) * np.log(p1 / p0)))
        out_day.append(cur)
        out_psi.append(round(psi, 6))
    return pd.DataFrame({"day": out_day, "psi": out_psi})


_DRIFT_DAILY_SQL = r"""
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CASE WHEN value < 1 THEN 0 WHEN value < 5 THEN 1
              WHEN value < 20 THEN 2 WHEN value < 100 THEN 3
              ELSE 4 END AS bin,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT d.day, g.bin, coalesce(b.n, 0) AS n
  FROM (SELECT DISTINCT day FROM b) d
  CROSS JOIN (SELECT unnest(range(5)) AS bin) g
  LEFT JOIN b ON b.day = d.day AND b.bin = g.bin
),
p AS (
  SELECT day, bin,
         (n + 0.5) / (sum(n) OVER (PARTITION BY day) + 2.5) AS p
  FROM grid
),
x AS (
  SELECT day, bin, p,
         lag(p) OVER (PARTITION BY bin ORDER BY day) AS p0
  FROM p
)
SELECT CAST(day AS VARCHAR) AS day,
       round(sum((p - p0) * ln(p / p0)), 6) AS psi
FROM x WHERE p0 IS NOT NULL
GROUP BY day
"""


def q_repair_orders(sf_dir):
    """Spec-driven repair (functions/repair.py): apply the contract's
    default / bounds / enum / maxLength annotations as fixes — fill null
    prices, clamp to [1, 300000], reset out-of-enum status to the
    default, truncate priority to 6 code units — with a `repaired` flag
    per row. Pure per-batch Arrow kernels; the oracle mirrors every rule
    with COALESCE / least / greatest / CASE / substr."""
    from ..functions.repair import repair_dataset

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus",
            "o_orderpriority"]
    ds = read_table(table_path(sf_dir, "orders"), columns=cols)
    return repair_dataset(ds, _REPAIR_ORDERS_SPEC)


_REPAIR_ORDERS_SQL = r"""
WITH fixed AS (
  SELECT o_orderkey,
         o_totalprice    AS tp0,
         o_orderstatus   AS st0,
         o_orderpriority AS pr0,
         least(greatest(coalesce(o_totalprice, 1.0), 1.0), 300000.0)
           AS o_totalprice,
         CASE WHEN coalesce(o_orderstatus, 'O') IN ('O','F','P')
              THEN coalesce(o_orderstatus, 'O') ELSE 'O' END
           AS o_orderstatus,
         CASE WHEN length(o_orderpriority) > 6
              THEN substr(o_orderpriority, 1, 6)
              ELSE o_orderpriority END
           AS o_orderpriority
  FROM orders
)
SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority,
       (tp0 IS DISTINCT FROM o_totalprice
        OR st0 IS DISTINCT FROM o_orderstatus
        OR pr0 IS DISTINCT FROM o_orderpriority) AS repaired
FROM fixed
"""


_INCR_VALIDATE_SQL = r"""
WITH new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 83 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 101 = 0
)
SELECT o_orderkey,
       (o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
        AND o_totalprice IS NOT NULL
        AND (o_orderkey IS NULL OR o_orderkey > 0)
        AND (o_orderstatus IS NULL OR o_orderstatus IN ('O','F','P'))
        AND (o_totalprice IS NULL
             OR (o_totalprice > 0 AND o_totalprice <= 300000))) AS valid
FROM new_snap
"""


def q_pack_docs(sf_dir):
    from ..functions.scan import pack_sequences
    from ..functions.text import token_count_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens"])
    return pack_sequences(ds, id_col="doc_id", tokens_col="n_tokens",
                          budget=512)


_PACK_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
  FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(excl // 512 AS BIGINT) AS pack_id,
       CAST(excl % 512 AS BIGINT) AS pack_pos
FROM c
"""


def q_drift_psi_bins_lineitem(sf_dir):
    """Binned histogram counts for the PSI/KS drift test, computed as
    per-block partial bincounts merged by a 5-group aggregate (the
    mergeable-counts pattern; state/profile.py turns these counts into
    PSI). base = even l_orderkey, cur = odd; 5 bins of width 10 over
    l_quantity (1..50)."""
    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_quantity"])
    nbins = 5

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        m = ~np.isnan(q.astype(np.float64))
        q, ok = q[m], ok[m]
        b = np.minimum((q // 10).astype(np.int64), nbins - 1)
        base = (ok % 2) == 0
        return pa.table({
            "bin_id": np.arange(nbins, dtype=np.int64),
            "n_base": np.bincount(b[base], minlength=nbins)
                        .astype(np.int64),
            "n_cur": np.bincount(b[~base], minlength=nbins)
                       .astype(np.int64)})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin_id").sum(["n_base", "n_cur"])
    return agg.map_batches(
        lambda t: t.rename_columns(["bin_id", "n_base", "n_cur"]),
        batch_format="pyarrow")


_DRIFT_PSI_SQL = """
SELECT least(CAST(floor(l_quantity / 10) AS BIGINT), 4) AS bin_id,
       CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_base,
       CAST(sum(CASE WHEN l_orderkey % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cur
FROM lineitem
WHERE l_quantity IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# per-key window scans, global tiling, set ops, shuffle referential


def q_events_user_windows(sf_dir):
    """Per-user running totals + 5-row rolling sums ordered by (ts,
    event_id) — SQL window-function semantics via the bucketed
    segmented-scan (one keys-only shuffle, bounded group count)."""
    from ..functions.windows import keyed_window_scan

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "value"])
    return keyed_window_scan(
        ds, key_col="user_id", ts_col="ts", tie_col="event_id",
        value_col="value", k=5,
        to_int=lambda v: np.round(v * 100).astype(np.int64))


_EVENTS_USER_WINDOWS_SQL = """
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT user_id, event_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       AS BIGINT) AS row_in_key,
  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_value,
  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum,
  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_n
FROM v
"""


def q_events_moving_median(sf_dir):
    """Per-user trailing 3-row moving median of event values (robust
    smoothing for time series): the lag-matrix nanmedian pass over the
    same bucketed segmented-scan shuffle as the window aggregates."""
    from ..functions.windows import keyed_moving_median

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "value"])
    return keyed_moving_median(ds, key_col="user_id", ts_col="ts",
                               tie_col="event_id", value_col="value", k=3)


_EVENTS_MOVING_MEDIAN_SQL = """
SELECT user_id, event_id,
       round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS med
FROM events
"""


def q_docs_ntile(sf_dir):
    """Seeded NTILE(7) over the global md5 shuffle order — balanced
    shard assignment via the two-phase prefix scan."""
    from ..functions.scan import global_ntile

    ds = read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
    return global_ntile(ds, id_col="doc_id", k=7, seed=42)


_DOCS_NTILE_SQL = """
SELECT doc_id,
       CAST(ntile(7) OVER (ORDER BY md5(doc_id::VARCHAR || ':42'), doc_id)
            AS BIGINT) AS tile
FROM documents
"""


def q_custkeys_without_orders(sf_dir):
    """Key EXCEPT: customers who never placed an order (distinct-keys
    shuffle; payload columns never move)."""
    from ..functions.join import key_set_op

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey"])
    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey"])
    out = key_set_op(cust, orders, on_a="c_custkey", on_b="o_custkey",
                     op="except").to_pandas()
    return _ensure_columns(out, {"key": "int64"})


_CUSTKEYS_EXCEPT_SQL = """
SELECT c_custkey AS key FROM customer
EXCEPT
SELECT o_custkey AS key FROM orders
"""


def q_referential_shuffle_lineitem(sf_dir):
    """The no-broadcast referential path: per-violating-key row counts
    via distinct-key partials + one keys-only shuffle, with a Bloom
    prefilter built distributed over the dim keys (misses short-cut the
    shuffle; result stays exact)."""
    from ..functions.join import referential_violations_shuffle
    from ..state.sketches import build_bloom

    dim = read_table(table_path(sf_dir, "orders"), columns=["o_orderkey"])
    bloom = build_bloom(dim, "o_orderkey", num_bits=1 << 21)
    fact = read_table(table_path(sf_dir, "lineitem"),
                      columns=["l_orderkey"])
    out = referential_violations_shuffle(
        fact, dim, fact_key="l_orderkey", dim_key="o_orderkey",
        bloom=bloom).to_pandas()
    return _ensure_columns(out, {"l_orderkey": "int64", "n_rows": "int64"})


_REFERENTIAL_SHUFFLE_SQL = """
SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_orderkey IS NOT NULL
  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
GROUP BY 1
"""


def q_events_pivot_hour_bands(sf_dir):
    """Pivot to a wide table: per event_type, count + cents-sum per
    6-hour band of the day. One fused bincount per block; only
    groups×bands partial rows shuffle."""
    from ..functions.relational import pivot_agg

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "ts", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.float64())
        return pa.table({"event_type": t["event_type"], "ts": t["ts"],
                         "cents": cents})

    def band_codes(t: pa.Table) -> np.ndarray:
        hours = pc.hour(t["ts"]).to_numpy(zero_copy_only=False)
        return hours // 6

    wide = pivot_agg(ds.map_batches(to_cents, batch_format="pyarrow"),
                     row_key="event_type", col_codes_batch=band_codes,
                     categories=["b0", "b1", "b2", "b3"], value_col="cents",
                     prefix="")

    def cast_sums(t: pa.Table) -> pa.Table:
        for n in ("b0_sum", "b1_sum", "b2_sum", "b3_sum"):
            i = t.schema.get_field_index(n)
            t = t.set_column(i, n, pc.round(t[n]).cast(pa.int64()))
        return t

    return wide.map_batches(cast_sums, batch_format="pyarrow")


def _pivot_hour_bands_sql() -> str:
    parts = []
    for b in range(4):
        cond = f"extract(hour FROM ts) // 6 = {b}"
        parts.append(f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) "
                     f"AS BIGINT) AS b{b}_n")
        parts.append(
            f"CAST(coalesce(sum(CASE WHEN {cond} THEN "
            f"CAST(round(value*100) AS BIGINT) ELSE 0 END), 0) "
            f"AS BIGINT) AS b{b}_sum")
    return ("SELECT event_type, " + ", ".join(parts)
            + " FROM events GROUP BY event_type")


def q_lineitem_median_qty(sf_dir):
    """Exact per-group median over the low-cardinality quantity domain:
    (key, value) count pairs shuffle, never rows."""
    from ..functions.relational import grouped_median_lowcard

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["l_quantity"])),
        batch_format="pyarrow")
    return grouped_median_lowcard(ds, key="l_returnflag",
                                  value_col="l_quantity")


_LINEITEM_MEDIAN_SQL = """
SELECT l_returnflag, median(l_quantity) AS median
FROM lineitem WHERE l_quantity IS NOT NULL
GROUP BY l_returnflag
"""


def q_docs_string_agg(sf_dir):
    """Ordered grouped concatenation on a filtered projection (text
    heads of every 7th doc, per language)."""
    from ..functions.relational import grouped_string_agg

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "lang", "text"])

    def head(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(did % 7 == 0))
        return pa.table({"lang": t["lang"], "doc_id": t["doc_id"],
                         "head": pc.utf8_slice_codeunits(t["text"], 0, 8)})

    heads = ds.map_batches(head, batch_format="pyarrow")
    return grouped_string_agg(heads, key="lang", value_col="head",
                              order_col="doc_id")


_DOCS_STRING_AGG_SQL = """
SELECT lang, string_agg(substring(text, 1, 8), '|' ORDER BY doc_id) AS agg,
       CAST(count(*) AS BIGINT) AS n_parts
FROM documents WHERE doc_id % 7 = 0
GROUP BY lang
"""


def q_audio_pitch_clips(sf_dir):
    """Autocorrelation F0 estimation per clip (rows-only: batched-FFT
    pitch tracking is not SQL-expressible)."""
    from ..sources.clips import clips_cache_dir
    from ..stages.features import pitch_features

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = pitch_features(ds, batch_size=256)
    return out.select_columns(["clip_id", "pitch_ok", "f0_hz",
                               "voiced_ratio"])


def q_audio_cmvn_clips(sf_dir):
    """Corpus CMVN over log-mel features: the canonical two-pass
    normalization (per-block moment partials -> driver-merged stats ->
    broadcast apply). Rows-only; the normalized vector is projected to
    its mean/std scalars so the driver result stays scalar-typed."""
    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import AudioResampler, MelSpectrogram
    from ..stages.features import apply_cmvn, cmvn_stats
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    mels = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                          batch_format="pyarrow", batch_size=256) \
             .map_batches(stage_fn(MelSpectrogram, sr=16000),
                          batch_format="pyarrow", batch_size=256) \
             .select_columns(["clip_id", "mel_ok", "mel_mean"])
    # consumed twice (stats pass + normalize pass): materialize the
    # narrow feature projection, not the payload table
    mels = mels.materialize()
    mean, std, _n = cmvn_stats(mels, "mel_mean")
    out = apply_cmvn(mels, mean, std, col="mel_mean")

    def project(t: pa.Table) -> pa.Table:
        # round-5 value-oracle conversion: per-clip moments of the
        # normalized vector are content (pinned by the CMVN unit
        # tests); the registry emits the normalization contract — the
        # normalized vector exists and is finite for every mel-ok clip
        vecs = t["mel_mean_cmvn"].to_pylist()
        fin = [v is not None and bool(np.isfinite(np.asarray(v)).all())
               for v in vecs]
        return pa.table({"clip_id": t["clip_id"], "mel_ok": t["mel_ok"],
                         "cmvn_finite": pa.array(fin, pa.bool_())})

    return out.map_batches(project, batch_format="pyarrow")


def q_cluster_balanced_sample(sf_dir):
    """Cluster-balanced curation sample: k-means clusters the embedding
    space, then each cluster is capped at 24 rows by deterministic
    md5(vec_id) rank (the embedding-space analogue of stratified
    sampling — upweights sparse clusters, downweights dense ones).
    Composition of kmeans_fit/assign + top_k_per_group; every stage's
    exchange is cluster- or k-bounded. Rows-only check (k-means is not
    SQL-expressible)."""
    import hashlib

    from ..functions.clustering import kmeans_assign, kmeans_fit
    from ..functions.temporal import top_k_per_group

    ds = read_table(table_path(sf_dir, "embeddings"),
                    columns=["vec_id", "embedding"])
    cents, _ = kmeans_fit(ds, k=5, seed=42, max_iters=10,
                          sample_size=1024)
    assigned = kmeans_assign(ds, cents, id_col="vec_id")

    def hash_rank(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_pylist()
        h = [hashlib.md5(str(v).encode()).hexdigest() for v in ids]
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": t["cluster"],
                         "h": pa.array(h, pa.string())})

    ranked = assigned.map_batches(hash_rank, batch_format="pyarrow")
    return top_k_per_group(ranked, group_cols=["cluster"],
                           order_col="h", k=24, descending=False,
                           tie_cols=("vec_id",))


def q_audio_mfcc_clips(sf_dir):
    """MFCC features: resample -> per-frame log-mel -> DCT-II cepstra
    (stages/audio_ops.py MFCC), pooled mean/std per clip. Payload bytes
    stop at the mel stage; the MFCC stage moves only feature floats.
    Projects scalar summaries (c0 + L2 norms) so the result is a compact
    per-clip row. Rows-only: DSP is not SQL-expressible."""
    import numpy as np

    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import MFCC, AudioResampler, MelSpectrogram
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                         batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(MelSpectrogram, sr=16000, frame_len=512,
                              n_mels=40, emit="frames"),
                     batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(MFCC, n_mels=40, n_mfcc=13),
                     batch_format="pyarrow", batch_size=1024)

    def project(t: pa.Table) -> pa.Table:
        means = t["mfcc_mean"].to_pylist()
        stds = t["mfcc_std"].to_pylist()
        c0 = [float(m[0]) if m is not None else None for m in means]
        mnorm = [float(np.linalg.norm(m)) if m is not None else None
                 for m in means]
        snorm = [float(np.linalg.norm(s)) if s is not None else None
                 for s in stds]
        return pa.table({
            "clip_id": t["clip_id"],
            "mfcc_ok": t["mfcc_ok"],
            "mel_frames": t["mel_frames"],
            "c0_mean": pa.array(c0, pa.float64()),
            "mfcc_norm": pa.array(mnorm, pa.float64()),
            "mfcc_std_norm": pa.array(snorm, pa.float64()),
        })

    return out.map_batches(project, batch_format="pyarrow")


def q_audio_fingerprint_dedup_clips(sf_dir):
    """Content-based audio dedup, the 100 TB scale path: constellation
    (peak-pair) landmark hashes -> bucketed hash groupby -> offset-
    consistency vote. Unlike q_audio_neardup_clips' exact all-pairs
    cosine (an O(N^2) oracle), both shuffles here move only small
    integer rows — never payload bytes, never embeddings. Runs over
    the planted-duplicates chord corpus (sources/clips.py
    generate_fp_clips; the main tone corpus has only ~64 distinct
    spectral contents, so every hash there is a stop-hash).
    min_matches=40 sits in the measured gap between planted duplicates
    (>=47 shared-offset votes even for 2-frame-shifted copies) and
    ambient single-segment collisions (<=25 at 5k clips). Rows-only:
    DSP is not SQL-expressible."""
    from ..sources.clips import fp_corpus_cache_dir
    from ..stages.fingerprint import (AudioFingerprinter,
                                      fingerprint_match_pairs)
    from ..stages.taskpool import stage_fn

    ds = read_table(fp_corpus_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "codec"])
    lm = ds.map_batches(stage_fn(AudioFingerprinter),
                        batch_format="pyarrow", batch_size=128)
    # one shuffle block per CPU: the chord corpus reads as ~100 tiny
    # payload blocks and the landmark shuffle would pay per-block task
    # overhead (stages/fingerprint.py coalesce_blocks note)
    return fingerprint_match_pairs(lm, min_matches=40,
                                   coalesce_blocks=32)


def q_audio_denoise_clips(sf_dir):
    """Spectral-gate noise reduction chain: resample -> NoiseReducer ->
    per-clip RMS before/after. On the stationary-tone corpus the gate
    attenuates the tone itself (documented degenerate case — quiet
    frames still contain signal), so the contract here is plumbing +
    per-clip energy accounting; SNR-improvement semantics are pinned by
    tests/test_audio_ops.py on realistic noise-lead-in clips.
    Rows-only."""
    import numpy as np

    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import AudioResampler, NoiseReducer
    from ..stages.taskpool import stage_fn

    def rms_db(out_col):
        def fn(t: pa.Table) -> pa.Table:
            vals = []
            for b, c in zip(t["bytes"].to_pylist(),
                            t["codec"].to_pylist()):
                # dirty rows that failed the resample keep their original
                # (possibly truncated / containered) payload — skip them
                if not b or c != "pcm_s16le":
                    vals.append(None)
                    continue
                x = np.frombuffer(b[:len(b) // 2 * 2], "<i2") \
                    .astype(np.float64) / 32768.0
                vals.append(float(10 * np.log10((x * x).mean() + 1e-12))
                            if len(x) else None)
            return t.append_column(out_col, pa.array(vals, pa.float64()))
        return fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                         batch_format="pyarrow", batch_size=256) \
        .map_batches(rms_db("rms_before_db"), batch_format="pyarrow") \
        .map_batches(stage_fn(NoiseReducer), batch_format="pyarrow",
                     batch_size=256) \
        .map_batches(rms_db("rms_after_db"), batch_format="pyarrow") \
        .select_columns(["clip_id", "denoise_ok", "rms_before_db",
                         "rms_after_db"])

    # round-5 value-oracle conversion: the raw dB values are content
    # (pinned by tests/test_audio_ops.py); the registry emits the
    # energy-accounting contract instead — a spectral gate must never
    # ADD energy, so rms_after <= rms_before (+0.1 dB slack for the
    # WOLA resynthesis rounding) whenever a nonempty clip was denoised
    def contract(t: pa.Table) -> pa.Table:
        before = t["rms_before_db"].to_numpy(zero_copy_only=False)
        after = t["rms_after_db"].to_numpy(zero_copy_only=False)
        ok = t["denoise_ok"].to_numpy(zero_copy_only=False)
        not_up = (~np.isnan(before)) & (~np.isnan(after)) \
            & (after <= before + 0.1) & ok
        return pa.table({"clip_id": t["clip_id"],
                         "denoise_ok": t["denoise_ok"],
                         "rms_not_increased": pa.array(not_up)})

    return out.map_batches(contract, batch_format="pyarrow")


def q_audio_fingerprint_clusters(sf_dir):
    """Full audio dedup decision: constellation-fingerprint match pairs
    (q_audio_fingerprint_dedup_clips) -> distributed connected
    components (functions/graph.py) -> per-cluster canonical = min
    clip_id. Output is one row per clip that belongs to a duplicate
    cluster with its component label; downstream dedup keeps rows where
    clip_id == component. Rows-only."""
    from ..functions.graph import connected_components

    # matched pairs stay a Dataset (typed string empties keep the schema
    # when no pair survives); materialize() pins the small pair set for
    # CC's per-round edge re-reads
    pairs = q_audio_fingerprint_dedup_clips(sf_dir).materialize()
    if pairs.count() == 0:
        return pd.DataFrame({"clip_id": pd.Series([], dtype=object),
                             "component": pd.Series([], dtype=object)})
    cc = connected_components(pairs, out_node="clip_id")
    return cc.to_pandas().sort_values("clip_id").reset_index(drop=True)


def q_audio_specaugment_clips(sf_dir):
    """ASR augmentation chain: resample -> per-frame log-mel
    (emit="frames") -> seeded SpecAugment time/freq masking (2 variants,
    deterministic per (clip_id, variant) so retries are idempotent).
    Rows-only check; the fbank payload is dropped in-stage, a masked-mean
    check value rides along."""
    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import (AudioResampler, MelSpectrogram,
                                    SpecAugment)
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                         batch_format="pyarrow", batch_size=256) \
            .map_batches(stage_fn(MelSpectrogram, sr=16000, emit="frames"),
                         batch_format="pyarrow", batch_size=256) \
            .map_batches(stage_fn(SpecAugment, variants=2),
                         batch_format="pyarrow", batch_size=256)

    def project(t: pa.Table) -> pa.Table:
        fb = t["mel_fbank"].to_pylist()
        # round-5 value-oracle conversion: the masked-mean is content
        # (not SQL-expressible); emit its finiteness contract instead —
        # masked fbank values stay pinned by the SpecAugment unit tests
        sa_finite = [bool(v) and bool(np.isfinite(np.mean(v)))
                     for v in fb]
        return pa.table({"clip_id": t["clip_id"],
                         "source_clip_id": t["source_clip_id"],
                         "mel_frames": t["mel_frames"],
                         "mel_ok": t["mel_ok"],
                         "sa_finite": pa.array(sa_finite, pa.bool_())})

    return out.map_batches(project, batch_format="pyarrow")


def q_oov_docs(sf_dir):
    """Out-of-vocabulary scoring vs a corpus-derived vocabulary
    (distributed word count -> broadcast membership pass)."""
    from ..functions.text import vocab_coverage

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return vocab_coverage(ds, min_count=5)


_OOV_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
vocab AS (SELECT tok FROM toks GROUP BY tok HAVING count(*) >= 5),
per AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks t LEFT JOIN vocab v USING (tok) GROUP BY t.doc_id)
SELECT d.doc_id, CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov
FROM documents d LEFT JOIN per USING (doc_id)
"""


# ---------------------------------------------------------------------------


def build_queries() -> dict:
    return {
        # relational / aggregates
        "q1_pricing_summary": q_q1_pricing_summary,
        "zorder_pruning_lineitem": q_zorder_pruning_lineitem,
        "top_orders": q_top_orders,
        "customers_per_region": q_customers_per_region,
        "referential_lineitem_orders": q_referential_lineitem_orders,
        "events_by_type": q_events_by_type,
        "uniqueness_orders": q_uniqueness_orders,
        "profile_lineitem": q_profile_lineitem,
        "orders_by_segment": q_orders_by_segment,
        "events_tumbling_hour": q_events_tumbling_hour,
        "events_sessions": q_events_sessions,
        "events_asof_click_view": q_events_asof_click_view,
        "events_value_bands": q_events_value_bands,
        "orders_top3_per_priority": q_orders_top3_per_priority,
        "validate_events_props": q_validate_events_props,
        "events_hopping_30m": q_events_hopping_30m,
        "distinct_counts_lineitem": q_distinct_counts_lineitem,
        "split_docs": q_split_docs,
        "stratified_sample_events": q_stratified_sample_events,
        "orders_broadcast_enrich": q_orders_broadcast_enrich,
        "uniqueness_lineitem_composite": q_uniqueness_lineitem_composite,
        "events_skew_join_auto": q_events_skew_join_auto,
        "events_user_windows": q_events_user_windows,
        "events_moving_median": q_events_moving_median,
        "docs_ntile": q_docs_ntile,
        "custkeys_without_orders": q_custkeys_without_orders,
        "referential_shuffle_lineitem": q_referential_shuffle_lineitem,
        "events_pivot_hour_bands": q_events_pivot_hour_bands,
        "lineitem_median_qty": q_lineitem_median_qty,
        "docs_string_agg": q_docs_string_agg,
        "oov_docs": q_oov_docs,
        "dup_clusters_docs": q_dup_clusters_docs,
        "dup_ngrams_docs": q_dup_ngrams_docs,
        "segment_dedup_docs": q_segment_dedup_docs,
        "dsir_logratio_docs": q_dsir_logratio_docs,
        "source_quota_docs": q_source_quota_docs,
        "gopher_filter_docs": q_gopher_filter_docs,
        "order_totals_consistency": q_order_totals_consistency,
        "dedup_corpus_docs": q_dedup_corpus_docs,
        "quantiles_lineitem": q_quantiles_lineitem,
        "lineitem_mode_qty": q_lineitem_mode_qty,
        "grouped_distinct_lineitem": q_grouped_distinct_lineitem,
        "corr_lineitem": q_corr_lineitem,
        "rollup_lineitem": q_rollup_lineitem,
        "unigram_logprob_docs": q_unigram_logprob_docs,
        "top_tokens_docs": q_top_tokens_docs,
        "events_gapfill_hour": q_events_gapfill_hour,
        "winsorize_lineitem": q_winsorize_lineitem,
        "fd_part_supplier": q_fd_part_supplier,
        "tfidf_docs": q_tfidf_docs,
        "funnel_click_purchase": q_funnel_click_purchase,
        "retention_weekly": q_retention_weekly,
        "interval_join_events": q_interval_join_events,
        "chunk_docs": q_chunk_docs,
        "zscore_lineitem": q_zscore_lineitem,
        "iqr_filter_lineitem": q_iqr_filter_lineitem,
        "grouped_p90_lineitem": q_grouped_p90_lineitem,
        "mixture_docs": q_mixture_docs,
        "percent_rank_lineitem": q_percent_rank_lineitem,
        "event_bigrams": q_event_bigrams,
        "embedding_dup_clusters": q_embedding_dup_clusters,
        # per-row validation engine
        "validate_orders": q_validate_orders,
        "validate_lineitem": q_validate_lineitem,
        "orders_violation_counts": q_orders_violation_counts,
        "skew_lineitem": q_skew_lineitem,
        "histogram_lineitem": q_histogram_lineitem,
        "q3_shipping": q_q3_shipping,
        # documents
        "dedup_docs_exact": q_dedup_docs_exact,
        "dup_groups_prefix24": q_dup_groups_prefix24,
        "ngram_jaccard_docs": q_ngram_jaccard_docs,
        "token_count_docs": q_token_count_docs,
        "bpe_token_count_docs": q_bpe_token_count_docs,
        "compression_ratio_docs": q_compression_ratio_docs,
        "quality_docs": q_quality_docs,
        "lang_id_docs": q_lang_id_docs,
        "fingerprint_docs": q_fingerprint_docs,
        "normalize_docs": q_normalize_docs,
        "repetition_docs": q_repetition_docs,
        "lexdiv_docs": q_lexdiv_docs,
        "pii_docs": q_pii_docs,
        "contamination_docs": q_contamination_docs,
        "shuffle_docs": q_shuffle_docs,
        "weighted_topk_docs": q_weighted_topk_docs,
        "pack_docs": q_pack_docs,
        "snapshot_diff_orders": q_snapshot_diff_orders,
        "incremental_validate_orders": q_incremental_validate_orders,
        "repair_orders": q_repair_orders,
        "drift_daily_events": q_drift_daily_events,
        "drift_psi_bins_lineitem": q_drift_psi_bins_lineitem,
        "events_lag_delta": q_events_lag_delta,
        "events_throttle": q_events_throttle,
        "q5_nation_revenue": q_q5_nation_revenue,
        "q10_returned_revenue": q_q10_returned_revenue,
        "repeat_customers": q_repeat_customers,
        "q13_order_distribution": q_q13_order_distribution,
        "q18_large_orders": q_q18_large_orders,
        "weighted_sample_docs": q_weighted_sample_docs,
        "copurchase_parts": q_copurchase_parts,
        "weighted_avg_lineitem": q_weighted_avg_lineitem,
        "mad_lineitem": q_mad_lineitem,
        "user_entropy_events": q_user_entropy_events,
        "centroids_embeddings": q_centroids_embeddings,
        "customer_spend_deciles": q_customer_spend_deciles,
        "big_spenders": q_big_spenders,
        "brand_share": q_brand_share,
        "weekly_revenue_wow": q_weekly_revenue_wow,
        "gini_spend": q_gini_spend,
        "ship_latency_by_priority": q_ship_latency_by_priority,
        "latest_event_per_user_type": q_latest_event_per_user_type,
        "events_rle_compress": q_events_rle_compress,
        "top_event_by_value_per_user": q_top_event_by_value_per_user,
        "docs_percentrank_by_source": q_docs_percentrank_by_source,
        "lineitem_unpivot": q_lineitem_unpivot,
        "events_conditional_agg": q_events_conditional_agg,
        "revenue_trend_theilsen": q_revenue_trend_theilsen,
        "null_profile_lineitem": q_null_profile_lineitem,
        "events_rolling_stats": q_events_rolling_stats,
        "weekly_hhi_by_segment": q_weekly_hhi_by_segment,
        "wau_rolling_7d": q_wau_rolling_7d,
        "chi2_event_weekday": q_chi2_event_weekday,
        "heavy_hitter_parts": q_heavy_hitter_parts,
        "regr_slope_lineitem": q_regr_slope_lineitem,
        "orders_with_high_discount": q_orders_with_high_discount,
        "parts_all_low_discount": q_parts_all_low_discount,
        "q4_late_orders": q_q4_late_orders,
        "q14_promo_share": q_q14_promo_share,
        "q17_small_qty_revenue": q_q17_small_qty_revenue,
        "q12_shipping_delay_bands": q_q12_shipping_delay_bands,
        "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
        "q22_idle_rich_customers": q_q22_idle_rich_customers,
        "covar_lineitem": q_covar_lineitem,
        "customer_cume_dist": q_customer_cume_dist,
        "dense_rank_brands": q_dense_rank_brands,
        "cube_lineitem": q_cube_lineitem,
        "percentile_cont_lineitem": q_percentile_cont_lineitem,
        "events_lead_delta": q_events_lead_delta,
        "supplier_balance_by_region": q_supplier_balance_by_region,
        "partkeys_union": q_partkeys_union,
        "first_event_per_user": q_first_event_per_user,
        "props_k_stats": q_props_k_stats,
        "customer_order_gap_median": q_customer_order_gap_median,
        "events_dow_hour_heatmap": q_events_dow_hour_heatmap,
        "part_color_counts": q_part_color_counts,
        "priority_label_counts": q_priority_label_counts,
        "quarterly_revenue": q_quarterly_revenue,
        "embedding_component_stats": q_embedding_component_stats,
        "spearman_lineitem": q_spearman_lineitem,
        "session_duration_stats": q_session_duration_stats,
        "weighted_median_qty": q_weighted_median_qty,
        "order_line_coverage": q_order_line_coverage,
        "orders_above_segment_avg": q_orders_above_segment_avg,
        "user_twap_value": q_user_twap_value,
        "events_ohlc_hourly": q_events_ohlc_hourly,
        "user_growth_daily": q_user_growth_daily,
        "grouping_sets_lineitem": q_grouping_sets_lineitem,
        "trimmed_mean_qty": q_trimmed_mean_qty,
        "orders_1997_high_value": q_orders_1997_high_value,
        "join_skew_profile": q_join_skew_profile,
        "events_type_share_daily": q_events_type_share_daily,
        "embedding_pca_evr": q_embedding_pca_evr,
        "embedding_linear_probe": q_embedding_linear_probe,
        "corr_matrix_lineitem": q_corr_matrix_lineitem,
        "mutual_info_flag_status": q_mutual_info_flag_status,
        # embeddings
        "ann_topk": q_ann_topk,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_ivf_persisted": q_ann_topk_ivf_persisted,
        "ann_topk_pq": q_ann_topk_pq,
        "ann_topk_ivfpq": q_ann_topk_ivfpq,
        "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
        "infer_spec_orders": q_infer_spec_orders,
        "embedding_neardup": q_embedding_neardup,
        # clips flagship (oracle-checked against the same /tmp cache)
        "clips_validation": q_clips_validation,
        "speaking_rate_clips": q_speaking_rate_clips,
        "editdist_clips": q_editdist_clips,
        "clips_violation_counts": q_clips_violations,
        # rows-only (no SQL equivalent)
        "clips_decode": q_clips_decode,
        "grouped_stats_codec": q_grouped_stats_codec,
        "profile_sketches_lineitem": q_profile_sketches_lineitem,
        "tdigest_quantiles_lineitem": q_tdigest_quantiles_lineitem,
        "drift_lineitem": q_drift_lineitem_halves,
        "audio_features_clips": q_audio_features_clips,
        "audio_resample_vad_clips": q_audio_resample_vad_clips,
        "audio_mel_clips": q_audio_mel_clips,
        "audio_neardup_clips": q_audio_neardup_clips,
        "audio_fingerprint_dedup": q_audio_fingerprint_dedup_clips,
        "audio_mfcc_clips": q_audio_mfcc_clips,
        "audio_fingerprint_clusters": q_audio_fingerprint_clusters,
        "audio_denoise_clips": q_audio_denoise_clips,
        "audio_prep_segments": q_audio_prep_segments,
        "audio_pitch_clips": q_audio_pitch_clips,
        "audio_cmvn_clips": q_audio_cmvn_clips,
        "media_image_features": q_media_image_features,
        "media_frame_sample": q_media_frame_sample,
        "minhash_lsh_docs": q_minhash_docs,
        "simhash_docs": q_simhash_docs,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "kmeans_embeddings": q_kmeans_embeddings,
        "audio_specaugment_clips": q_audio_specaugment_clips,
        "cluster_balanced_sample": q_cluster_balanced_sample,
        # audio analysis family (stages/analysis.py)
        "audio_qc_clips": q_audio_qc_clips,
        "audio_chroma_clips": q_audio_chroma_clips,
        "audio_onset_clips": q_audio_onset_clips,
        "audio_stretch_clips": q_audio_stretch_clips,
        "audio_chunk_clips": q_audio_chunk_clips,
        # round-2 relational additions
        "events_user_streaks": q_events_user_streaks,
        "events_markov_transitions": q_events_markov_transitions,
        "cohort_retention_matrix": q_cohort_retention_matrix,
        "parts_skyline": q_parts_skyline,
        "lineitem_benford": q_lineitem_benford,
        "lineitem_key_gaps": q_lineitem_key_gaps,
        "copurchase_triangles": q_copurchase_triangles,
        "copurchase_pagerank": q_copurchase_pagerank,
        "copurchase_pagerank_resident": q_copurchase_pagerank_resident,
        "audio_trim_clips": q_audio_trim_clips,
        "audio_compress_clips": q_audio_compress_clips,
        "audio_similar_clips": q_audio_similar_clips,
        "supplier_busy_windows": q_supplier_busy_windows,
        "trending_parts_decay": q_trending_parts_decay,
        "frequent_values_lineitem": q_frequent_values_lineitem,
        "events_ewma_value": q_events_ewma_value,
        "audio_transcode_clips": q_audio_transcode_clips,
        "events_session_paths": q_events_session_paths,
        "scd2_orders_history": q_scd2_orders_history,
        "codec_sniff_clips": q_codec_sniff_clips,
        "bigram_logprob_docs": q_bigram_logprob_docs,
        "zipf_fit_docs": q_zipf_fit_docs,
        "ann_topk_ivf_appended": q_ann_topk_ivf_appended,
        "audio_pitchshift_clips": q_audio_pitchshift_clips,
        "customer_rfm": q_customer_rfm,
        "pareto_parts_revenue": q_pareto_parts_revenue,
        "q3_shipping_priority": q_q3_shipping_priority,
        "q4_order_priority": q_q4_order_priority,
        "q13_customer_distribution": q_q13_customer_distribution,
        "q14_promo_effect": q_q14_promo_effect,
        "q6_forecast_revenue": q_q6_forecast_revenue,
        "q7_volume_shipping": q_q7_volume_shipping,
        "q8_market_share": q_q8_market_share,
        "q15_top_supplier": q_q15_top_supplier,
        "q21_waiting_suppliers": q_q21_waiting_suppliers,
        "kl_source_divergence_docs": q_kl_source_divergence_docs,
        "length_band_docs": q_length_band_docs,
        "bpe_train_docs": q_bpe_train_docs,
        "audio_loudnorm_clips": q_audio_loudnorm_clips,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "q9_product_profit": q_q9_product_profit,
        "q11_important_parts": q_q11_important_parts,
        "q16_supplier_part_counts": q_q16_supplier_part_counts,
        "q20_promotion_suppliers": q_q20_promotion_suppliers,
        "substring_dup_docs": q_substring_dup_docs,
        "fingerprint_lookup_clips": q_fingerprint_lookup_clips,
        "bloom_pointlookup_lineitem": q_bloom_pointlookup_lineitem,
        "filter_cascade_docs": q_filter_cascade_docs,
        "grouped_split_docs": q_grouped_split_docs,
        "merge_orders_cdc": q_merge_orders_cdc,
    }


def build_oracles(sf_dir: str = "/root/testdata/sf0.01") -> dict:
    """Oracle SQL per query. The driver calls this with no argument and
    compares at sf0.01 (driver contract); the clips-family oracles read a
    deterministic /tmp cache derived from that sf_dir, so sweeps at other
    scales (scripts/sweep_queries.py) pass the matching sf_dir instead."""
    sql = {
        "q1_pricing_summary": _Q1_SQL,
        "zorder_pruning_lineitem": _ZORDER_PRUNING_SQL,
        "top_orders": _TOP_ORDERS_SQL,
        "customers_per_region": _CUSTOMERS_PER_REGION_SQL,
        "referential_lineitem_orders": _REFERENTIAL_SQL,
        "events_by_type": _EVENTS_SQL,
        "uniqueness_orders": _UNIQUENESS_ORDERS_SQL,
        "profile_lineitem": _PROFILE_LINEITEM_SQL,
        "orders_by_segment": _ORDERS_BY_SEGMENT_SQL,
        "events_tumbling_hour": _EVENTS_TUMBLING_SQL,
        "events_sessions": _EVENTS_SESSIONS_SQL,
        "events_asof_click_view": _EVENTS_ASOF_SQL,
        "events_value_bands": _value_bands_sql(),
        "orders_top3_per_priority": _ORDERS_TOP3_SQL,
        "validate_events_props": _EVENTS_PROPS_SQL,
        "events_hopping_30m": _EVENTS_HOPPING_SQL,
        "distinct_counts_lineitem": _DISTINCT_COUNTS_SQL,
        "split_docs": _SPLIT_DOCS_SQL,
        "stratified_sample_events": _STRATIFIED_SQL,
        "orders_broadcast_enrich": _priority_dim_sql(),
        "uniqueness_lineitem_composite": _UNIQUENESS_COMPOSITE_SQL,
        "events_skew_join_auto": _event_type_dim_sql(),
        "events_user_windows": _EVENTS_USER_WINDOWS_SQL,
        "events_moving_median": _EVENTS_MOVING_MEDIAN_SQL,
        "docs_ntile": _DOCS_NTILE_SQL,
        "custkeys_without_orders": _CUSTKEYS_EXCEPT_SQL,
        "referential_shuffle_lineitem": _REFERENTIAL_SHUFFLE_SQL,
        "events_pivot_hour_bands": _pivot_hour_bands_sql(),
        "lineitem_median_qty": _LINEITEM_MEDIAN_SQL,
        "docs_string_agg": _DOCS_STRING_AGG_SQL,
        "oov_docs": _OOV_SQL,
        "dup_clusters_docs": _DUP_CLUSTERS_SQL,
        "dup_ngrams_docs": _DUP_NGRAMS_DOCS_SQL,
        "segment_dedup_docs": _SEGMENT_DEDUP_DOCS_SQL,
        "dsir_logratio_docs": _DSIR_LOGRATIO_SQL,
        "source_quota_docs": _SOURCE_QUOTA_SQL,
        "gopher_filter_docs": _GOPHER_FILTER_SQL,
        "order_totals_consistency": _ORDER_TOTALS_CONSISTENCY_SQL,
        "dedup_corpus_docs": _DEDUP_CORPUS_SQL,
        "quantiles_lineitem": _QUANTILES_LINEITEM_SQL,
        # round-5 conversions of rows-only queries to value oracles
        "events_ewma_value": _EVENTS_EWMA_SQL,
        "profile_sketches_lineitem": _PROFILE_SKETCHES_SQL,
        "tdigest_quantiles_lineitem": _TDIGEST_QUANTILES_SQL,
        "drift_lineitem": _DRIFT_LINEITEM_SQL,
        "infer_spec_orders": _INFER_SPEC_ORDERS_SQL,
        "media_frame_sample": _MEDIA_FRAME_SAMPLE_SQL,
        "lineitem_mode_qty": _LINEITEM_MODE_SQL,
        "grouped_distinct_lineitem": _GROUPED_DISTINCT_SQL,
        "corr_lineitem": _CORR_LINEITEM_SQL,
        "rollup_lineitem": _ROLLUP_LINEITEM_SQL,
        "unigram_logprob_docs": _UNIGRAM_SQL,
        "top_tokens_docs": _TOP_TOKENS_SQL,
        "events_gapfill_hour": _EVENTS_GAPFILL_SQL,
        "winsorize_lineitem": _WINSORIZE_SQL,
        "fd_part_supplier": _FD_PART_SUPPLIER_SQL,
        "tfidf_docs": _TFIDF_SQL,
        "funnel_click_purchase": _FUNNEL_SQL,
        "retention_weekly": _RETENTION_SQL,
        "interval_join_events": _INTERVAL_JOIN_SQL,
        "chunk_docs": _CHUNK_DOCS_SQL,
        "zscore_lineitem": _ZSCORE_SQL,
        "iqr_filter_lineitem": _IQR_FILTER_SQL,
        "grouped_p90_lineitem": _GROUPED_P90_SQL,
        "mixture_docs": _MIXTURE_SQL,
        "percent_rank_lineitem": _PERCENT_RANK_SQL,
        "event_bigrams": _EVENT_BIGRAMS_SQL,
        "embedding_dup_clusters": _EMBEDDING_DUP_CLUSTERS_SQL,
        "validate_orders": f"SELECT o_orderkey, {_ORDERS_VALID_SQL} AS valid "
                           "FROM orders",
        "validate_lineitem": "SELECT l_orderkey, l_linenumber, "
                             f"{_LINEITEM_VALID_SQL} AS valid FROM lineitem",
        "orders_violation_counts": _ORDERS_VIOLATION_COUNTS_SQL,
        "skew_lineitem": _SKEW_LINEITEM_SQL,
        "histogram_lineitem": _HISTOGRAM_LINEITEM_SQL,
        "q3_shipping": _Q3_SHIPPING_SQL,
        "dedup_docs_exact": _DEDUP_DOCS_SQL,
        "dup_groups_prefix24": _DUP_GROUPS_SQL,
        "ngram_jaccard_docs": _NGRAM_JACCARD_SQL,
        "token_count_docs": _TOKEN_COUNT_SQL,
        "bpe_token_count_docs": _BPE_TOKEN_COUNT_SQL,
        "quality_docs": _QUALITY_SQL,
        "lang_id_docs": _lang_id_sql(),
        "fingerprint_docs": _FINGERPRINT_SQL,
        "normalize_docs": _NORMALIZE_SQL,
        "repetition_docs": _REPETITION_SQL,
        "lexdiv_docs": _LEXDIV_SQL,
        "pii_docs": _pii_sql(),
        "contamination_docs": _contamination_sql(),
        "shuffle_docs": _SHUFFLE_SQL,
        "weighted_topk_docs": _WEIGHTED_TOPK_SQL,
        "pack_docs": _PACK_SQL,
        "snapshot_diff_orders": _SNAPSHOT_DIFF_SQL,
        "incremental_validate_orders": _INCR_VALIDATE_SQL,
        "repair_orders": _REPAIR_ORDERS_SQL,
        "drift_daily_events": _DRIFT_DAILY_SQL,
        "drift_psi_bins_lineitem": _DRIFT_PSI_SQL,
        "events_lag_delta": _EVENTS_LAG_DELTA_SQL,
        "events_throttle": _EVENTS_THROTTLE_SQL,
        "q5_nation_revenue": _Q5_NATION_REVENUE_SQL,
        "q10_returned_revenue": _Q10_RETURNED_REVENUE_SQL,
        "repeat_customers": _REPEAT_CUSTOMERS_SQL,
        "q13_order_distribution": _Q13_ORDER_DISTRIBUTION_SQL,
        "q18_large_orders": _Q18_LARGE_ORDERS_SQL,
        "weighted_sample_docs": _WEIGHTED_SAMPLE_SQL,
        "copurchase_parts": _COPURCHASE_PARTS_SQL,
        "weighted_avg_lineitem": _WEIGHTED_AVG_SQL,
        "mad_lineitem": _MAD_LINEITEM_SQL,
        "user_entropy_events": _USER_ENTROPY_SQL,
        "centroids_embeddings": _CENTROIDS_SQL,
        "customer_spend_deciles": _SPEND_DECILES_SQL,
        "big_spenders": _BIG_SPENDERS_SQL,
        "brand_share": _BRAND_SHARE_SQL,
        "weekly_revenue_wow": _WEEKLY_WOW_SQL,
        "gini_spend": _GINI_SPEND_SQL,
        "ship_latency_by_priority": _SHIP_LATENCY_SQL,
        "latest_event_per_user_type": _LATEST_EVENT_SQL,
        "events_rle_compress": _EVENTS_RLE_SQL,
        "top_event_by_value_per_user": _TOP_EVENT_SQL,
        "docs_percentrank_by_source": _DOCS_PCTRANK_SQL,
        "lineitem_unpivot": _LINEITEM_UNPIVOT_SQL,
        "events_conditional_agg": _EVENTS_COND_AGG_SQL,
        "revenue_trend_theilsen": _THEILSEN_SQL,
        "null_profile_lineitem": _null_profile_sql(),
        "events_rolling_stats": _EVENTS_ROLLING_STATS_SQL,
        "weekly_hhi_by_segment": _WEEKLY_HHI_SQL,
        "wau_rolling_7d": _WAU_ROLLING_SQL,
        "chi2_event_weekday": _CHI2_SQL,
        "heavy_hitter_parts": _HEAVY_HITTER_PARTS_SQL,
        "regr_slope_lineitem": _REGR_SLOPE_SQL,
        "orders_with_high_discount": _ORDERS_HIGH_DISCOUNT_SQL,
        "parts_all_low_discount": _PARTS_ALL_LOW_DISCOUNT_SQL,
        "q4_late_orders": _Q4_LATE_ORDERS_SQL,
        "q14_promo_share": _Q14_PROMO_SHARE_SQL,
        "q17_small_qty_revenue": _Q17_SMALL_QTY_SQL,
        "q12_shipping_delay_bands": _Q12_DELAY_SQL,
        "q19_disjunctive_revenue": _Q19_DISJUNCTIVE_SQL,
        "q22_idle_rich_customers": _Q22_IDLE_RICH_SQL,
        "covar_lineitem": _COVAR_SQL,
        "customer_cume_dist": _CUME_DIST_SQL,
        "dense_rank_brands": _DENSE_RANK_BRANDS_SQL,
        "cube_lineitem": _CUBE_LINEITEM_SQL,
        "percentile_cont_lineitem": _PERCENTILE_CONT_SQL,
        "events_lead_delta": _EVENTS_LEAD_DELTA_SQL,
        "supplier_balance_by_region": _SUPPLIER_BALANCE_REGION_SQL,
        "partkeys_union": _PARTKEYS_UNION_SQL,
        "first_event_per_user": _FIRST_EVENT_SQL,
        "props_k_stats": _PROPS_K_STATS_SQL,
        "customer_order_gap_median": _CUSTOMER_ORDER_GAP_SQL,
        "events_dow_hour_heatmap": _EVENTS_DOW_HOUR_SQL,
        "part_color_counts": _PART_COLOR_SQL,
        "priority_label_counts": _PRIORITY_LABEL_SQL,
        "quarterly_revenue": _QUARTERLY_REVENUE_SQL,
        "embedding_component_stats": _EMBEDDING_COMPONENT_SQL,
        "spearman_lineitem": _SPEARMAN_SQL,
        "session_duration_stats": _SESSION_DURATION_SQL,
        "weighted_median_qty": _WEIGHTED_MEDIAN_SQL,
        "order_line_coverage": _ORDER_LINE_COVERAGE_SQL,
        "orders_above_segment_avg": _ORDERS_ABOVE_SEG_AVG_SQL,
        "user_twap_value": _USER_TWAP_SQL,
        "events_ohlc_hourly": _EVENTS_OHLC_SQL,
        "user_growth_daily": _USER_GROWTH_SQL,
        "grouping_sets_lineitem": _GROUPING_SETS_SQL,
        "trimmed_mean_qty": _TRIMMED_MEAN_SQL,
        "orders_1997_high_value": _ORDERS_1997_SQL,
        "join_skew_profile": _JOIN_SKEW_SQL,
        "events_type_share_daily": _EVENTS_TYPE_SHARE_SQL,
        "corr_matrix_lineitem": _CORR_MATRIX_SQL,
        "mutual_info_flag_status": _MUTUAL_INFO_SQL,
        "ann_topk": _ANN_TOPK_SQL,
        "ann_topk_ivf": _ANN_TOPK_SQL,
        "ann_topk_ivf_persisted": _ANN_TOPK_SQL,
        "ann_topk_pq": _ANN_TOPK_SQL,
        "ann_topk_ivfpq": _ANN_TOPK_SQL,
        "embedding_neardup": _EMBEDDING_NEARDUP_SQL,
        # flagship clips oracles read the deterministic /tmp cache; the
        # driver runs side-by-side correctness at sf0.01 (driver contract),
        # which is the scale these strings are derived for
        "clips_validation": _clips_validation_sql(sf_dir),
        "speaking_rate_clips": _speaking_rate_sql(sf_dir),
        "audio_chunk_clips": _audio_chunk_sql(sf_dir),
        "events_user_streaks": _USER_STREAKS_SQL,
        "events_markov_transitions": _MARKOV_SQL,
        "cohort_retention_matrix": _COHORT_MATRIX_SQL,
        "parts_skyline": _PARTS_SKYLINE_SQL,
        "lineitem_benford": _BENFORD_SQL,
        "lineitem_key_gaps": _LINEITEM_KEY_GAPS_SQL,
        "copurchase_triangles": _TRIANGLES_SQL,
        "supplier_busy_windows": _BUSY_WINDOWS_SQL,
        "trending_parts_decay": _TRENDING_SQL,
        "frequent_values_lineitem": _FREQUENT_VALUES_SQL,
        "audio_transcode_clips":
            _audio_transcode_sql(sf_dir),
        "events_session_paths": _SESSION_PATHS_SQL,
        "scd2_orders_history": _SCD2_SQL,
        "codec_sniff_clips": _codec_sniff_sql(sf_dir),
        "kmeans_embeddings": _kmeans_embeddings_sql(sf_dir),
        "clips_decode": _clips_decode_sql(sf_dir),
        "audio_resample_vad_clips": _audio_resample_vad_sql(sf_dir),
        "audio_mel_clips": _audio_mel_sql(sf_dir),
        "audio_specaugment_clips": _audio_specaugment_sql(sf_dir),
        "audio_trim_clips": _audio_trim_sql(sf_dir),
        "audio_denoise_clips": _audio_denoise_sql(sf_dir),
        "audio_prep_segments": _audio_prep_segments_sql(sf_dir),
        "audio_cmvn_clips": _audio_cmvn_sql(sf_dir),
        "audio_features_clips": _audio_features_sql(sf_dir),
        "audio_qc_clips": _audio_qc_sql(sf_dir),
        "media_image_features": _MEDIA_IMAGE_FEATURES_SQL,
        "copurchase_pagerank": _copurchase_pagerank_sql(),
        "copurchase_pagerank_resident": _copurchase_pagerank_sql(),
        "cluster_balanced_sample": _cluster_balanced_sample_sql(sf_dir),
        "bigram_logprob_docs": _BIGRAM_SQL,
        "zipf_fit_docs": _ZIPF_SQL,
        "ann_topk_ivf_appended": _ANN_TOPK_SQL,
        "audio_pitchshift_clips":
            _audio_pitchshift_sql(sf_dir),
        "customer_rfm": _RFM_SQL,
        "pareto_parts_revenue": _PARETO_SQL,
        "q3_shipping_priority": _Q3_SHIPPING_PRIORITY_SQL,
        "q4_order_priority": _Q4_PRIORITY_SQL,
        "q13_customer_distribution": _Q13_CUSTDIST_SQL,
        "q14_promo_effect": _Q14_PROMO_SQL,
        "q6_forecast_revenue": _Q6_FORECAST_SQL,
        "q7_volume_shipping": _Q7_VOLUME_SHIPPING_SQL,
        "q8_market_share": _Q8_MARKET_SHARE_SQL,
        "q15_top_supplier": _Q15_TOP_SUPPLIER_SQL,
        "q21_waiting_suppliers": _Q21_WAITING_SQL,
        "kl_source_divergence_docs": _KL_SOURCE_SQL,
        "length_band_docs": _LENGTH_BAND_SQL,
        "editdist_clips": _editdist_clips_sql(sf_dir),
        "clips_violation_counts":
            _clips_violation_counts_sql(sf_dir),
        "grouped_stats_codec":
            _grouped_stats_codec_sql(sf_dir),
        "q2_min_cost_supplier": _Q2_MIN_COST_SQL,
        "q9_product_profit": _Q9_PRODUCT_PROFIT_SQL,
        "q11_important_parts": _Q11_IMPORTANT_PARTS_SQL,
        "q16_supplier_part_counts": _Q16_SUPPLIER_COUNTS_SQL,
        "q20_promotion_suppliers": _Q20_PROMOTION_SQL,
        "substring_dup_docs": _SUBSTRING_DUP_SQL,
        "bloom_pointlookup_lineitem": _BLOOM_POINTLOOKUP_SQL,
        "filter_cascade_docs": _FILTER_CASCADE_SQL,
        "grouped_split_docs": _GROUPED_SPLIT_SQL,
        "merge_orders_cdc": _MERGE_ORDERS_CDC_SQL,
    }
    return sql


def q_events_lag_delta(sf_dir):
    """Per-user LAG deltas: microsecond gap and value change vs the
    previous event ordered by (ts, event_id) — the SQL lag() window
    recast as a bucketed segmented scan (one narrow shuffle, keys never
    split across buckets, vectorized diff per bucket)."""
    from ..functions.windows import keyed_lag

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "value"])
    return keyed_lag(ds, key_col="user_id", ts_col="ts",
                     tie_col="event_id", value_col="value")


_EVENTS_LAG_DELTA_SQL = """
SELECT user_id, event_id,
       date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us,
       round(value - lag(value) OVER w, 4) AS value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_events_throttle(sf_dir):
    """LAG-relative rate limiting: keep an event iff it is the user's
    first or arrived >= 6h after the previous event (kept or not) —
    dedup/throttling primitive for event streams, window-expressible so
    it keeps SQL parity. Same segmented-scan shuffle as keyed_lag."""
    from ..functions.windows import keyed_throttle

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id"])
    return keyed_throttle(ds, key_col="user_id", ts_col="ts",
                          tie_col="event_id",
                          min_gap_us=21_600_000_000)


_EVENTS_THROTTLE_SQL = """
WITH w AS (
  SELECT user_id, event_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events)
SELECT user_id, event_id, gap_us
FROM w
WHERE gap_us IS NULL OR gap_us >= 21600000000
"""


def q_q5_nation_revenue(sf_dir):
    """TPC-H Q5 analogue (local supplier volume): revenue per nation for
    one region + one order year where the supplying nation equals the
    customer nation. The six-table plan split scale-appropriately:
    region/nation/supplier are broadcast dims (never shuffled),
    customer x orders and orders x lineitem are the two large-large
    bucketed hash joins. Revenue in exact integer cents (per-row round
    like the oracle) so sums hash-match under any block order.

    Reference analogy: a $ref chain across six schema resources
    (jschon vocabulary/core.py:82-103) recast as join composition.
    """
    from ray.data.aggregate import Sum

    from ..functions.join import broadcast_join, hash_join

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")

    region = read_table(table_path(sf_dir, "region")).to_pandas()
    nation = read_table(table_path(sf_dir, "nation")).to_pandas()
    rkeys = set(region.loc[region.r_name == "ASIA", "r_regionkey"])
    nat = nation[nation.n_regionkey.isin(rkeys)]
    nat_keys = pa.array(sorted(int(k) for k in nat.n_nationkey),
                        pa.int32())
    nat_names = dict(zip((int(k) for k in nat.n_nationkey), nat.n_name))

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_nationkey"])

    def filter_cust(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"], value_set=nat_keys)
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"o_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"]})

    cust = cust.map_batches(filter_cust, batch_format="pyarrow")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(pc.fill_null(keep, False)) \
                .select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(filter_orders, batch_format="pyarrow")
    co = hash_join(orders, cust, on="o_custkey", how="inner")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def project_li(t: pa.Table) -> pa.Table:
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev_e2": rev})

    li = li.map_batches(project_li, batch_format="pyarrow")
    j = hash_join(li, co.select_columns(["o_orderkey", "c_nationkey"]),
                  on="o_orderkey", how="inner")

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = pa.table({"l_suppkey": pa.array(supp.s_suppkey, pa.int64()),
                     "s_nationkey": pa.array(supp.s_nationkey, pa.int32())})
    j = broadcast_join(j, supp, on="l_suppkey", how="inner")

    def local_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["s_nationkey"].cast(pa.int32()),
                        t["c_nationkey"].cast(pa.int32()))
        t = t.filter(pc.fill_null(keep, False))
        names = pa.array(
            [nat_names.get(int(k)) if k is not None else None
             for k in t["s_nationkey"].to_pylist()], pa.string())
        return pa.table({"n_name": names, "rev_e2": t["rev_e2"]})

    j = j.map_batches(local_only, batch_format="pyarrow")
    agg = j.groupby("n_name").aggregate(Sum("rev_e2",
                                            alias_name="revenue_e2"))

    def fix(t: pa.Table) -> pa.Table:
        col = t["revenue_e2"]
        if col.type != pa.int64():
            t = t.set_column(t.schema.get_field_index("revenue_e2"),
                             "revenue_e2", pc.round(col).cast(pa.int64()))
        return t

    return agg.map_batches(fix, batch_format="pyarrow") \
              .sort("revenue_e2", descending=True)


_Q5_NATION_REVENUE_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                     AS BIGINT)) AS BIGINT) AS revenue_e2
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_e2 DESC
"""


def q_q10_returned_revenue(sf_dir):
    """TPC-H Q10 analogue (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter. lineitem x orders is the
    large-large bucketed hash join; the per-customer revenue aggregate
    is then small and joins customer via a second bucketed join; nation
    names resolve from a broadcast dict. Deterministic tie-break
    (revenue DESC, custkey ASC) on both sides keeps the LIMIT exact.
    """
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    lo = pd.Timestamp("1996-10-01")
    hi = pd.Timestamp("1997-01-01")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_returnflag",
                             "l_extendedprice", "l_discount"])

    def filter_li(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["l_returnflag"], "R")
        t = t.filter(pc.fill_null(keep, False))
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_orderkey": t["l_orderkey"], "rev_e2": rev})

    li = li.map_batches(filter_li, batch_format="pyarrow")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(pc.fill_null(keep, False)) \
                .select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(filter_orders, batch_format="pyarrow")
    j = hash_join(li, orders, on="o_orderkey", how="inner")
    agg = j.groupby("o_custkey").aggregate(Sum("rev_e2",
                                               alias_name="revenue_e2"))

    def to_custkey(t: pa.Table) -> pa.Table:
        col = t["revenue_e2"]
        if col.type != pa.int64():
            col = pc.round(col).cast(pa.int64())
        return pa.table({"c_custkey": t["o_custkey"], "revenue_e2": col})

    agg = agg.map_batches(to_custkey, batch_format="pyarrow")

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_name", "c_nationkey"])
    j2 = hash_join(agg, cust, on="c_custkey", how="inner")

    nation = read_table(table_path(sf_dir, "nation")).to_pandas()
    nat_names = dict(zip((int(k) for k in nation.n_nationkey),
                         nation.n_name))

    def add_nation(t: pa.Table) -> pa.Table:
        names = pa.array(
            [nat_names.get(int(k)) if k is not None else None
             for k in t["c_nationkey"].to_pylist()], pa.string())
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_name": t["c_name"],
                         "n_name": names,
                         "revenue_e2": t["revenue_e2"]})

    return j2.map_batches(add_nation, batch_format="pyarrow") \
             .sort(["revenue_e2", "c_custkey"],
                   descending=[True, False]).limit(20)


_Q10_RETURNED_REVENUE_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                       AS BIGINT)) AS BIGINT) AS revenue_e2
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, n_name, revenue_e2
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_e2 DESC, c_custkey ASC
LIMIT 20
"""


def q_repeat_customers(sf_dir):
    """Customers who ordered in BOTH 1996 and 1997 — SQL INTERSECT via
    the distributed key-set op: each block reduces to its distinct keys
    first (payload rows never shuffle), then one keys-only groupby sums
    per-side presence."""
    from ..functions.join import key_set_op

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey", "o_orderdate"])

    def year(ds, y):
        lo = pd.Timestamp(f"{y}-01-01")
        hi = pd.Timestamp(f"{y + 1}-01-01")

        def f(t: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)))
            return t.filter(pc.fill_null(keep, False)) \
                    .select(["o_custkey"])

        return ds.map_batches(f, batch_format="pyarrow")

    return key_set_op(year(orders, 1996), year(orders, 1997),
                      on_a="o_custkey", on_b="o_custkey",
                      op="intersect", out="custkey")


_REPEAT_CUSTOMERS_SQL = """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
"""


def q_q13_order_distribution(sf_dir):
    """TPC-H Q13 analogue (customer order-count distribution): how many
    customers placed exactly k orders, including the zero bucket. Two
    narrow keys-only aggregations (orders custkey -> per-customer count,
    then count -> histogram) plus the distinct-key EXCEPT for
    zero-order customers — payload columns never shuffle, and the
    second groupby input is at most |customers| rows."""
    import ray.data

    from ..functions.join import key_set_op

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey"])
    per_cust = orders.groupby("o_custkey").count()

    def to_count(t: pa.Table) -> pa.Table:
        return pa.table({"c_count": t["count()"].cast(pa.int64())})

    hist = per_cust.map_batches(to_count, batch_format="pyarrow") \
                   .groupby("c_count").count()

    def to_dist(t: pa.Table) -> pa.Table:
        return pa.table({"c_count": t["c_count"],
                         "custdist": t["count()"].cast(pa.int64())})

    hist = hist.map_batches(to_dist, batch_format="pyarrow")

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey"])
    n_zero = key_set_op(cust, orders, on_a="c_custkey", on_b="o_custkey",
                        op="except", out="k").count()
    if n_zero:
        zero = ray.data.from_arrow(pa.table(
            {"c_count": pa.array([0], pa.int64()),
             "custdist": pa.array([int(n_zero)], pa.int64())}))
        hist = hist.union(zero)
    return hist


_Q13_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""


def q_q18_large_orders(sf_dir):
    """TPC-H Q18 analogue (large-volume orders): orders whose total line
    quantity exceeds 200 units, with the buyer. The quantity rollup is
    a keys-only shuffle in exact integer units; the HAVING filter runs
    before the join so only qualifying orders (a tiny fraction) enter
    the orders-side hash join."""
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_quantity"])

    def project(t: pa.Table) -> pa.Table:
        q = pc.round(pc.multiply(t["l_quantity"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_orderkey": t["l_orderkey"], "qty_e2": q})

    agg = li.map_batches(project, batch_format="pyarrow") \
            .groupby("o_orderkey").aggregate(Sum("qty_e2",
                                                 alias_name="sum_qty_e2"))

    def having(t: pa.Table) -> pa.Table:
        col = t["sum_qty_e2"]
        if col.type != pa.int64():
            col = pc.round(col).cast(pa.int64())
        keep = pc.greater(col, 20000)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "sum_qty_e2": col}).filter(
                             pc.fill_null(keep, False))

    big = agg.map_batches(having, batch_format="pyarrow")
    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey"])
    return hash_join(big, orders, on="o_orderkey", how="inner")


_Q18_LARGE_ORDERS_SQL = """
SELECT l_orderkey AS o_orderkey,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_e2,
       any_value(o_custkey) AS o_custkey
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY l_orderkey
HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 20000
"""


def q_weighted_sample_docs(sf_dir):
    """Weight-proportional deterministic downsample: keep each document
    with probability min(1, n_tokens/150), reproducibly by md5 id hash
    (the weighted-importance mix step of a pretraining pipeline). Pure
    per-batch kernel — no shuffle, identical row set on re-run, retry,
    or any repartitioning."""
    from ..functions.split import weighted_sample
    from ..functions.text import token_count_batch

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow") \
        .map_batches(functools.partial(
            weighted_sample, id_col="doc_id", weight_col="n_tokens",
            factor=150.0), batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens"])


_WEIGHTED_SAMPLE_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n_tokens,
         {_U_SQL.format(id='doc_id')} AS u
  FROM documents)
SELECT doc_id, n_tokens FROM t WHERE u * 150.0 < n_tokens
"""


def q_copurchase_parts(sf_dir):
    """Parts bought together: unordered part pairs co-occurring in >= 2
    orders (market-basket mining). Basket-bucketed pair explosion with
    a per-bucket combiner before the pair-keyed shuffle."""
    from ..functions.relational import copurchase_pairs

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_partkey"])
    return copurchase_pairs(ds, order_col="l_orderkey",
                            item_col="l_partkey", min_count=2)


_COPURCHASE_PARTS_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(count(*) AS BIGINT) AS n_orders
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def q_weighted_avg_lineitem(sf_dir):
    """Quantity-weighted average discount per return flag, in exact
    integer units: the ratio divides the same two exact integer sums on
    both sides, so it hash-matches without rounding tricks."""
    from ..functions.relational import grouped_weighted_avg

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity", "l_discount"])
    return grouped_weighted_avg(ds, key="l_returnflag",
                                weight_col="l_quantity",
                                value_col="l_discount")


_WEIGHTED_AVG_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS w,
         CAST(round(l_discount * 100) AS BIGINT) AS v
  FROM lineitem)
SELECT l_returnflag,
       CAST(sum(w) AS BIGINT) AS w_sum,
       CAST(sum(w * v) AS BIGINT) AS wv_sum,
       CAST(sum(w * v) AS BIGINT) / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE)
         AS wavg
FROM t
GROUP BY l_returnflag
"""


def q_mad_lineitem(sf_dir):
    """Robust spread per return flag: median absolute deviation of
    quantity — two chained exact grouped medians with the tiny median
    map broadcast between passes (rows shuffle as (key, value, count)
    pairs only)."""
    from ..functions.relational import grouped_mad

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity"])
    return grouped_mad(ds, key="l_returnflag", value_col="l_quantity")


_MAD_LINEITEM_SQL = """
WITH m AS (
  SELECT l_returnflag, median(l_quantity) AS med
  FROM lineitem GROUP BY l_returnflag)
SELECT m.l_returnflag, med AS median,
       median(abs(l_quantity - med)) AS mad
FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
GROUP BY m.l_returnflag, med
"""


def q_user_entropy_events(sf_dir):
    """Per-user Shannon entropy (nats) of the event-type mix — behavior
    diversity scoring. One keys-only count shuffle with a per-batch
    distinct combiner, then a vectorized per-key finish."""
    from ..functions.relational import group_entropy

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "event_type"])
    return group_entropy(ds, key="user_id", cat_col="event_type")


_USER_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type),
t AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot FROM c
      GROUP BY user_id)
SELECT c.user_id,
       round(-sum((n / CAST(tot AS DOUBLE))
                  * ln(n / CAST(tot AS DOUBLE))), 4) AS entropy,
       any_value(tot) AS n_events
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id
"""


def q_centroids_embeddings(sf_dir):
    """Per-label embedding centroids (class prototypes for few-shot /
    cluster seeding), exploded as (label, dim, value) rows. Each batch
    ships one partial sum per label x dim — the combiner — so the
    shuffle is O(batches x labels x dim) regardless of row count."""
    from ..functions.relational import grouped_vector_mean

    ds = read_table(table_path(sf_dir, "embeddings"),
                    columns=["label", "embedding"])
    return grouped_vector_mean(ds, key="label", vec_col="embedding")


_CENTROIDS_SQL = """
SELECT label, i, round(avg(v), 4) AS c
FROM (SELECT label,
             unnest(embedding) AS v,
             unnest(range(len(embedding))) AS i
      FROM embeddings)
GROUP BY label, i
"""


def _customer_spend(sf_dir):
    """(o_custkey, spend_e2): per-customer order total in exact cents —
    one keys-only groupby over two projected columns."""
    from ray.data.aggregate import Sum

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey", "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "e2": e2})

    agg = orders.map_batches(project, batch_format="pyarrow") \
                .groupby("o_custkey").aggregate(Sum("e2",
                                                    alias_name="spend_e2"))

    def fix(t: pa.Table) -> pa.Table:
        col = t["spend_e2"]
        if col.type != pa.int64():
            col = pc.round(col).cast(pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "spend_e2": col})

    return agg.map_batches(fix, batch_format="pyarrow")


def q_customer_spend_deciles(sf_dir):
    """Customer-value decile assignment (the classic LTV segmentation):
    spend per customer, then exact NTILE(10) over (spend, custkey) via
    the range-partitioned global value rank — per-bucket counts give a
    driver-side cumsum, rows sort once within their range bucket."""
    from ..functions.scan import _ntile_of_rank, global_value_rank

    spend = _customer_spend(sf_dir)
    n = spend.count()
    ranked = global_value_rank(spend, value_col="spend_e2",
                               tie_cols=("o_custkey",))

    def tile(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        tl = _ntile_of_rank(r - 1, n, 10)
        return pa.table({"o_custkey": t["o_custkey"],
                         "spend_e2": t["spend_e2"],
                         "tile": pa.array(tl, pa.int64())})

    return ranked.map_batches(tile, batch_format="pyarrow")


_SPEND_DECILES_SQL = """
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_e2
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, spend_e2,
       CAST(ntile(10) OVER (ORDER BY spend_e2, o_custkey) AS BIGINT)
         AS tile
FROM s
"""


def q_big_spenders(sf_dir):
    """Customers spending more than 2x the average customer spend — the
    correlated-scalar HAVING shape, made EXACT by cross-multiplying
    integers (spend * n > 2 * total) instead of comparing against a
    float average; the two scalars broadcast, rows never re-shuffle."""
    from ray.data.aggregate import Sum

    spend = _customer_spend(sf_dir)
    stats = spend.aggregate(Sum("spend_e2", alias_name="tot"))
    tot = int(stats["tot"])
    n = spend.count()

    def keep(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(t["spend_e2"], np.int64(n))
        mask = pc.greater(lhs, np.int64(2) * np.int64(tot))
        return t.filter(pc.fill_null(mask, False))

    return spend.map_batches(keep, batch_format="pyarrow")


_BIG_SPENDERS_SQL = """
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_e2
  FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(sum(spend_e2) AS BIGINT) AS tot,
             count(*) AS n FROM s)
SELECT o_custkey, spend_e2 FROM s, t WHERE spend_e2 * n > 2 * tot
"""


def q_brand_share(sf_dir):
    """Revenue share of each brand within its part type (ratio-to-parent
    window): one large-large hash join lineitem x part, a composite-key
    rollup, then the per-type totals broadcast as a dict (group count is
    bounded by the brand x type domain, not the data)."""
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_extendedprice",
                             "l_discount"])

    def project(t: pa.Table) -> pa.Table:
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "rev_e2": rev})

    li = li.map_batches(project, batch_format="pyarrow")

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_brand", "p_type"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": t["p_partkey"],
                         "p_brand": t["p_brand"],
                         "p_type": t["p_type"]})

    part = part.map_batches(rename, batch_format="pyarrow")
    j = hash_join(li, part, on="l_partkey", how="inner")
    agg = j.groupby(["p_type", "p_brand"]).aggregate(
        Sum("rev_e2", alias_name="brand_rev_e2"))

    def fix(t: pa.Table) -> pa.Table:
        col = t["brand_rev_e2"]
        if col.type != pa.int64():
            col = pc.round(col).cast(pa.int64())
        return pa.table({"p_type": t["p_type"], "p_brand": t["p_brand"],
                         "brand_rev_e2": col})

    brands = agg.map_batches(fix, batch_format="pyarrow").materialize()
    totals = {}
    for b in brands.iter_batches(batch_format="pyarrow"):
        for ty, rv in zip(b["p_type"].to_pylist(),
                          b["brand_rev_e2"].to_pylist()):
            totals[ty] = totals.get(ty, 0) + int(rv)

    def share(t: pa.Table) -> pa.Table:
        tot = np.array([totals[ty] for ty in t["p_type"].to_pylist()],
                       np.float64)
        rv = t["brand_rev_e2"].to_numpy(zero_copy_only=False) \
              .astype(np.float64)
        s = np.round(rv / tot, 6)
        return t.append_column("share", pa.array(s, pa.float64()))

    return brands.map_batches(share, batch_format="pyarrow")


_BRAND_SHARE_SQL = """
WITH b AS (
  SELECT p_type, p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                       AS BIGINT)) AS BIGINT) AS brand_rev_e2
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_type, p_brand)
SELECT p_type, p_brand, brand_rev_e2,
       round(brand_rev_e2
             / CAST(sum(brand_rev_e2) OVER (PARTITION BY p_type)
                    AS DOUBLE), 6) AS share
FROM b
"""


def q_weekly_revenue_wow(sf_dir):
    """Week-over-week revenue change: calendar-week rollup (keys-only
    shuffle) then LAG + percent change over the BOUNDED week series —
    the series finish is one vectorized pass over at most a few hundred
    rows, so driver-side is the scale-correct placement."""
    from ray.data.aggregate import Sum

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderdate", "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False) \
              .astype("datetime64[D]")
        # Monday-anchored week start (DuckDB date_trunc('week', ...))
        days = (ts - np.datetime64("1969-12-29")).astype(np.int64)
        wk = (np.datetime64("1969-12-29")
              + (days // 7) * np.timedelta64(7, "D")) \
            .astype("datetime64[us]")
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"wk": pa.array(wk), "e2": e2})

    agg = orders.map_batches(project, batch_format="pyarrow") \
                .groupby("wk").aggregate(Sum("e2", alias_name="rev_e2"))
    wkly = agg.to_pandas().sort_values("wk").reset_index(drop=True)
    rev = wkly["rev_e2"].to_numpy(np.int64)
    n = len(rev)
    prevf = np.concatenate(([np.nan], rev[:-1].astype(np.float64))) \
        if n else np.array([], np.float64)
    wow = np.round((rev - prevf) / prevf, 6)
    return pd.DataFrame({"wk": wkly["wk"], "rev_e2": rev,
                         "prev_e2": prevf, "wow": wow})


_WEEKLY_WOW_SQL = """
WITH w AS (
  SELECT date_trunc('week', o_orderdate) AS wk,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_e2
  FROM orders GROUP BY wk)
SELECT CAST(wk AS TIMESTAMP) AS wk, rev_e2,
       lag(rev_e2) OVER (ORDER BY wk) AS prev_e2,
       round((rev_e2 - lag(rev_e2) OVER (ORDER BY wk))
             / CAST(lag(rev_e2) OVER (ORDER BY wk) AS DOUBLE), 6) AS wow
FROM w
"""


def q_gini_spend(sf_dir):
    """Gini coefficient of customer spend (inequality of the customer
    value distribution): rank-weighted integer sums over the
    range-partitioned exact value rank; the two sums and the count
    reduce to one driver-side formula. Integer path is exact up to
    sum(rank * cents) < 2^63 (~sf1 scales; beyond that the rank-sum
    switches to the oracle's hugeint semantics only)."""
    from ray.data.aggregate import Sum

    from ..functions.scan import global_value_rank

    spend = _customer_spend(sf_dir)
    ranked = global_value_rank(spend, value_col="spend_e2",
                               tie_cols=("o_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["spend_e2"].to_numpy(zero_copy_only=False) \
             .astype(np.int64)
        return pa.table({"rx": pa.array([int((r * x).sum())], pa.int64()),
                         "x": pa.array([int(x.sum())], pa.int64()),
                         "n": pa.array([len(r)], pa.int64())})

    sums = ranked.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("rx", alias_name="rx"),
                   Sum("x", alias_name="x"),
                   Sum("n", alias_name="n"))
    rx, x, n = int(sums["rx"]), int(sums["x"]), int(sums["n"])
    gini = round(2.0 * rx / (n * x) - (n + 1.0) / n, 6)
    return pd.DataFrame({"n": [np.int64(n)], "sum_e2": [np.int64(x)],
                         "gini": [gini]})


_GINI_SPEND_SQL = """
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_e2
  FROM orders GROUP BY o_custkey),
r AS (SELECT spend_e2,
             row_number() OVER (ORDER BY spend_e2, o_custkey) AS rn
      FROM s)
SELECT count(*) AS n, CAST(sum(spend_e2) AS BIGINT) AS sum_e2,
       round(2.0 * CAST(sum(rn * spend_e2) AS BIGINT)
             / (count(*) * CAST(sum(spend_e2) AS BIGINT))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r
"""


def q_ship_latency_by_priority(sf_dir):
    """Order-to-ship latency percentiles per order priority (SLA
    reporting): one large-large hash join, a per-row day derivation,
    then two exact grouped quantile_disc passes over the bounded
    priority domain (fixed-size histogram counts to the driver — rows
    never leave their blocks after the join)."""
    from ..functions.join import hash_join
    from ..functions.quantiles import grouped_quantile_disc

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_shipdate"])

    def li_rename(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "l_shipdate": t["l_shipdate"]})

    li = li.map_batches(li_rename, batch_format="pyarrow")
    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])
    j = hash_join(li, orders, on="o_orderkey", how="inner")

    def derive(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[D]")
        od = t["o_orderdate"].to_numpy(zero_copy_only=False) \
              .astype("datetime64[D]")
        d = (ship - od).astype(np.int64)
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "d": pa.array(d, pa.int64())})

    days = j.map_batches(derive, batch_format="pyarrow").materialize()
    p50 = grouped_quantile_disc(days, "o_orderpriority", "d", 0.5,
                                bins=512, gather_limit=4096,
                                materialize=False, out="p50")
    p90 = grouped_quantile_disc(days, "o_orderpriority", "d", 0.9,
                                bins=512, gather_limit=4096,
                                materialize=False, out="p90")
    out = p50.merge(p90, on="o_orderpriority")
    out["p50_days"] = out["p50"].astype(np.int64)
    out["p90_days"] = out["p90"].astype(np.int64)
    return out[["o_orderpriority", "p50_days", "p90_days"]]


_SHIP_LATENCY_SQL = """
SELECT o_orderpriority,
       CAST(quantile_disc(d, 0.5) AS BIGINT) AS p50_days,
       CAST(quantile_disc(d, 0.9) AS BIGINT) AS p90_days
FROM (SELECT o_orderpriority,
             date_diff('day', o_orderdate, l_shipdate) AS d
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
GROUP BY o_orderpriority
"""


def q_latest_event_per_user_type(sf_dir):
    """Latest-record snapshot per (user, event type) — the standard
    changelog-to-current-state dedup. Bucketed keep-last pass; rows
    collapse inside their bucket so the exchange output is bounded by
    the key domain."""
    from ..functions.windows import keyed_latest

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "event_type", "ts",
                             "event_id", "value"])
    return keyed_latest(ds, key_cols=["user_id", "event_type"],
                        ts_col="ts", tie_col="event_id")


_LATEST_EVENT_SQL = """
SELECT user_id, event_type, ts, event_id, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def q_events_rle_compress(sf_dir):
    """State-transition compression: drop an event when its type equals
    the user's previous event type (heartbeat collapse) — keeps only
    transitions. lag(type)-relative, so SQL-window parity holds."""
    from ..functions.windows import keyed_distinct_runs

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "event_type"])
    return keyed_distinct_runs(ds, key_col="user_id", ts_col="ts",
                               tie_col="event_id", run_col="event_type")


_EVENTS_RLE_SQL = """
SELECT user_id, ts, event_id, event_type
FROM (SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events)
WHERE prev IS NULL OR event_type <> prev
"""


def q_top_event_by_value_per_user(sf_dir):
    """Per-user argmax row (highest-value event, full row): the
    keep-last bucketed pass ordered by (value, event_id) — grouped
    argmax without a row-shuffling window sort."""
    from ..functions.windows import keyed_latest

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "value", "event_id",
                             "event_type"])
    return keyed_latest(ds, key_cols=["user_id"], ts_col="value",
                        tie_col="event_id")


_TOP_EVENT_SQL = """
SELECT user_id, value, event_id, event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id DESC) = 1
"""


def q_docs_percentrank_by_source(sf_dir):
    """Per-source percent_rank of document length — grouped order
    statistics (the within-corpus length percentile used for quality
    filtering). Exact tie-broken ranks; the pct divides two exact
    integers, so it hash-matches the window oracle bit-for-bit."""
    from ..functions.windows import keyed_percent_rank

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["source", "n_chars", "doc_id"])
    return keyed_percent_rank(ds, key_col="source", value_col="n_chars",
                              tie_col="doc_id")


_DOCS_PCTRANK_SQL = """
SELECT source, doc_id, n_chars,
       CAST(row_number() OVER w AS BIGINT) AS rnk,
       percent_rank() OVER w AS pct
FROM documents
WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
"""


def q_lineitem_unpivot(sf_dir):
    """UNPIVOT / melt: wide metric columns to long (key, metric, value)
    rows — the reshape feeding generic per-metric pipelines. Stateless
    per-batch explode (x3 rows), exact integer units; no shuffle."""

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_linenumber", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ok = t["l_orderkey"]
        ln = t["l_linenumber"]
        parts = []
        for name, col in (("quantity", "l_quantity"),
                          ("price", "l_extendedprice"),
                          ("discount", "l_discount")):
            e2 = pc.round(pc.multiply(t[col], 100.0),
                          round_mode="half_towards_infinity") \
                   .cast(pa.int64())
            parts.append(pa.table({
                "l_orderkey": ok, "l_linenumber": ln,
                "metric": pa.array([name] * n, pa.string()),
                "value_e2": e2}))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


_LINEITEM_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
       CAST(round(l_quantity * 100) AS BIGINT) AS value_e2 FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'price',
       CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount',
       CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
"""


def q_events_conditional_agg(sf_dir):
    """FILTER-clause conditional aggregates per event type: total count,
    high-value count (value > 3), and their exact-integer share — the
    per-batch combiner ships three ints per (batch, type)."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hi = pc.fill_null(pc.greater(t["value"], 3.0), False) \
               .cast(pa.int64())
        tbl = pa.table({"event_type": t["event_type"],
                        "one": pa.array(np.ones(t.num_rows, np.int64)),
                        "hi": hi})
        return tbl.group_by("event_type").aggregate(
            [("one", "sum"), ("hi", "sum")]) \
            .rename_columns(["event_type", "n", "n_high"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("event_type").aggregate(
                Sum("n", alias_name="n_total"),
                Sum("n_high", alias_name="n_high"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_total"]
        h = t["n_high"]
        if n.type != pa.int64():
            n = pc.round(n).cast(pa.int64())
        if h.type != pa.int64():
            h = pc.round(h).cast(pa.int64())
        share = pc.divide(h.cast(pa.float64()), n.cast(pa.float64()))
        return pa.table({"event_type": t["event_type"], "n_total": n,
                         "n_high": h, "high_share": share})

    return agg.map_batches(finish, batch_format="pyarrow")


_EVENTS_COND_AGG_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE value > 3.0) AS BIGINT) AS n_high,
       CAST(count(*) FILTER (WHERE value > 3.0) AS BIGINT)
         / CAST(count(*) AS DOUBLE) AS high_share
FROM events
GROUP BY event_type
"""


def q_revenue_trend_theilsen(sf_dir):
    """Robust trend of weekly revenue: Theil-Sen estimator (median of
    all pairwise slopes) over the calendar-week rollup — outlier-proof
    trend detection. The rollup is the only distributed pass; the slope
    set is O(weeks^2) on a BOUNDED series, so the finish is driver-side
    by design."""
    from ray.data.aggregate import Sum

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderdate", "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False) \
              .astype("datetime64[D]")
        days = (ts - np.datetime64("1969-12-29")).astype(np.int64)
        wk = (np.datetime64("1969-12-29")
              + (days // 7) * np.timedelta64(7, "D")) \
            .astype("datetime64[us]")
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"wk": pa.array(wk), "e2": e2})

    agg = orders.map_batches(project, batch_format="pyarrow") \
                .groupby("wk").aggregate(Sum("e2", alias_name="rev_e2"))
    wkly = agg.to_pandas().sort_values("wk").reset_index(drop=True)
    rev = wkly["rev_e2"].to_numpy(np.float64)
    day = wkly["wk"].to_numpy().astype("datetime64[D]").astype(np.int64) \
        .astype(np.float64)
    i, j = np.triu_indices(len(rev), k=1)
    slopes = (rev[j] - rev[i]) / (day[j] - day[i])
    return pd.DataFrame({"n_weeks": [np.int64(len(rev))],
                         "theil_sen": [round(float(np.median(slopes)), 4)]})


_THEILSEN_SQL = """
WITH w AS (
  SELECT date_trunc('week', o_orderdate) AS wk,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_e2
  FROM orders GROUP BY wk),
p AS (
  SELECT (b.rev_e2 - a.rev_e2)
         / CAST(date_diff('day', a.wk, b.wk) AS DOUBLE) AS slope
  FROM w a JOIN w b ON b.wk > a.wk)
SELECT (SELECT count(*) FROM w) AS n_weeks,
       round(median(slope), 4) AS theil_sen
FROM p
"""


def q_null_profile_lineitem(sf_dir):
    """Column-completeness profile: per column, how many rows are NULL
    out of the total — the first data-quality report run on any new
    table. Per-batch partial null-count vectors (one row per column per
    batch) reduce through one bounded groupby."""
    from ray.data.aggregate import Sum

    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
            "l_discount", "l_returnflag", "l_shipdate"]
    ds = read_table(table_path(sf_dir, "lineitem"), columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        names, nulls, tot = [], [], []
        for c in cols:
            names.append(c)
            nulls.append(t[c].null_count)
            tot.append(t.num_rows)
        return pa.table({"column": pa.array(names, pa.string()),
                         "n_null": pa.array(nulls, pa.int64()),
                         "n_total": pa.array(tot, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("column").aggregate(
                Sum("n_null", alias_name="n_null"),
                Sum("n_total", alias_name="n_total"))

    def fix(t: pa.Table) -> pa.Table:
        out = {"column": t["column"]}
        for c in ("n_null", "n_total"):
            col = t[c]
            if col.type != pa.int64():
                col = pc.round(col).cast(pa.int64())
            out[c] = col
        return pa.table(out)

    return agg.map_batches(fix, batch_format="pyarrow")


def _null_profile_sql():
    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
            "l_discount", "l_returnflag", "l_shipdate"]
    parts = [(f"SELECT '{c}' AS column, "
              f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
              f"CAST(count(*) AS BIGINT) AS n_total FROM lineitem")
             for c in cols]
    return "\nUNION ALL\n".join(parts)


def q_events_rolling_stats(sf_dir):
    """Per-user trailing 5-row rolling mean + sample stddev — the
    anomaly-score inputs (x - mean)/std computed as a windowed scan.
    Lag-matrix nanmean/nanstd over the bucketed segmented shuffle."""
    from ..functions.windows import keyed_rolling_stats

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "value"])
    return keyed_rolling_stats(ds, key_col="user_id", ts_col="ts",
                               tie_col="event_id", value_col="value",
                               k=5)


_EVENTS_ROLLING_STATS_SQL = """
SELECT user_id, event_id,
       round(avg(value) OVER w, 4) AS roll_mean,
       round(stddev_samp(value) OVER w, 4) AS roll_std
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_weekly_hhi_by_segment(sf_dir):
    """Weekly revenue-concentration index (Herfindahl-Hirschman) across
    customer segments: join + two-level rollup, then a per-week share-
    squared sum — market-concentration monitoring. The (week, segment)
    aggregate is bounded by the calendar x segment domain, so the HHI
    finish runs on a tiny keyed groupby."""
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False) \
              .astype("datetime64[D]")
        days = (ts - np.datetime64("1969-12-29")).astype(np.int64)
        wk = (np.datetime64("1969-12-29")
              + (days // 7) * np.timedelta64(7, "D")) \
            .astype("datetime64[us]")
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"c_custkey": t["o_custkey"],
                         "wk": pa.array(wk), "e2": e2})

    orders = orders.map_batches(project, batch_format="pyarrow")
    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_mktsegment"])
    j = hash_join(orders, cust, on="c_custkey", how="inner")
    agg = j.groupby(["wk", "c_mktsegment"]).aggregate(
        Sum("e2", alias_name="rev"))

    def hhi(g: pd.DataFrame) -> pd.DataFrame:
        rev = g["rev"].to_numpy(np.float64)
        tot = rev.sum()
        shares = rev / tot
        return pd.DataFrame({
            "wk": [g["wk"].iloc[0]],
            "n_segments": [np.int64(len(rev))],
            "hhi": [round(float(np.sum(shares * shares)), 6)]})

    return agg.groupby("wk").map_groups(hhi, batch_format="pandas")


_WEEKLY_HHI_SQL = """
WITH s AS (
  SELECT date_trunc('week', o_orderdate) AS wk,
         c_mktsegment AS seg,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY wk, seg),
t AS (SELECT *, sum(rev) OVER (PARTITION BY wk) AS tot FROM s)
SELECT CAST(wk AS TIMESTAMP) AS wk,
       CAST(count(*) AS BIGINT) AS n_segments,
       round(sum(power(rev / CAST(tot AS DOUBLE), 2)), 6) AS hhi
FROM t
GROUP BY wk
"""


def q_wau_rolling_7d(sf_dir):
    """Rolling 7-day active users per observed day — the sliding
    DISTINCT that resists pre-aggregation: reduce to distinct
    (day, user) pairs first (per-batch combiner, then one keys-only
    groupby), explode each pair into the <=7 windows it serves
    (bounded x7), and count distinct per window day. Every exchange
    carries (day, user) ids only."""
    ds = read_table(table_path(sf_dir, "events"),
                    columns=["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy(zero_copy_only=False) \
             .astype("datetime64[D]")
        tbl = pa.table({"d": pa.array(d),
                        "user_id": t["user_id"]})
        return tbl.group_by(["d", "user_id"]).aggregate([]) \

    pairs = ds.map_batches(day_pairs, batch_format="pyarrow") \
              .groupby(["d", "user_id"]).count()

    observed = set()
    for b in pairs.select_columns(["d"]).iter_batches(
            batch_format="pyarrow"):
        observed.update(b["d"].to_numpy(zero_copy_only=False)
                        .astype("datetime64[D]").tolist())
    observed_arr = np.array(sorted(observed), dtype="datetime64[D]")

    def explode(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        u = t["user_id"].to_numpy(zero_copy_only=False)
        parts = []
        for i in range(7):
            w = d + np.timedelta64(i, "D")
            keep = np.isin(w, observed_arr)
            parts.append(pa.table({
                "day": pa.array(w[keep].astype("datetime64[us]")),
                "user_id": pa.array(u[keep])}))
        return pa.concat_tables(parts)

    wins = pairs.map_batches(explode, batch_format="pyarrow") \
        .groupby(["day", "user_id"]).count() \
        .groupby("day").count()

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({"day": t["day"],
                         "wau": t["count()"].cast(pa.int64())})

    return wins.map_batches(fix, batch_format="pyarrow")


_WAU_ROLLING_SQL = """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events)
SELECT CAST(days.d AS TIMESTAMP) AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
FROM days JOIN du
  ON du.d > days.d - INTERVAL 7 DAY AND du.d <= days.d
GROUP BY days.d
"""


def q_chi2_event_weekday(sf_dir):
    """Chi-square test of independence between event type and weekday:
    the contingency table reduces through one bounded keys-only count
    shuffle (7 x #types cells); expected counts and the statistic are
    exact-integer-derived on the driver."""
    ds = read_table(table_path(sf_dir, "events"),
                    columns=["ts", "event_type"])

    def project(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy(zero_copy_only=False) \
             .astype("datetime64[D]").astype(np.int64)
        # 1970-01-01 was a Thursday; ISO dow Monday=1
        dow = ((d + 3) % 7 + 1).astype(np.int64)
        return pa.table({"dow": pa.array(dow),
                         "event_type": t["event_type"]})

    counts = ds.map_batches(project, batch_format="pyarrow") \
        .map_batches(lambda t: t.group_by(["dow", "event_type"])
                     .aggregate([([], "count_all")]),
                     batch_format="pyarrow") \
        .groupby(["dow", "event_type"]).sum("count_all").to_pandas()

    piv = counts.pivot_table(index="dow", columns="event_type",
                             values="sum(count_all)", fill_value=0)
    obs = piv.to_numpy(np.float64)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    tot = obs.sum()
    exp = row @ col / tot
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return pd.DataFrame({"n": [np.int64(tot)],
                         "dof": [np.int64(dof)],
                         "chi2": [round(chi2, 4)]})


_CHI2_SQL = """
WITH c AS (
  SELECT isodow(ts) AS dow, event_type, count(*) AS n
  FROM events GROUP BY dow, event_type),
grid AS (
  SELECT d.dow, t.event_type, coalesce(c.n, 0) AS n
  FROM (SELECT DISTINCT dow FROM c) d
  CROSS JOIN (SELECT DISTINCT event_type FROM c) t
  LEFT JOIN c ON c.dow = d.dow AND c.event_type = t.event_type),
m AS (
  SELECT grid.*,
         sum(n) OVER (PARTITION BY dow) AS row_n,
         sum(n) OVER (PARTITION BY event_type) AS col_n,
         sum(n) OVER () AS tot
  FROM grid)
SELECT CAST(any_value(tot) AS BIGINT) AS n,
       CAST((count(DISTINCT dow) - 1)
            * (count(DISTINCT event_type) - 1) AS BIGINT) AS dof,
       round(sum(power(n - row_n * col_n / CAST(tot AS DOUBLE), 2)
                 / (row_n * col_n / CAST(tot AS DOUBLE))), 4) AS chi2
FROM m
"""


def q_heavy_hitter_parts(sf_dir):
    """Parts with more than a 1/1500 share of all line items — the exact
    heavy-hitter pass whose output feeds `salted_hash_join` hot-key
    salting. Integer cross-multiplied threshold; one keys-only count
    shuffle plus one scalar aggregate."""
    from ..functions.relational import heavy_hitters

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey"])
    return heavy_hitters(ds, col="l_partkey", num=1, den=1500)


_HEAVY_HITTER_PARTS_SQL = """
WITH c AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT l_partkey, n FROM c, t WHERE n * 1500 > tot * 1
"""


def q_regr_slope_lineitem(sf_dir):
    """Per-group OLS fit (price-vs-quantity slope + intercept per return
    flag): five exact integer moment sums per (batch, flag) — the
    combiner — then one bounded groupby and a closed-form finish whose
    double arithmetic is reproduced verbatim in the oracle, so the fit
    hash-matches without tolerance tricks."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.round(pc.multiply(t["l_quantity"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        p = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        tbl = pa.table({"l_returnflag": t["l_returnflag"],
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                        "sx": q, "sy": p,
                        "sxy": pc.multiply(q, p),
                        "sxx": pc.multiply(q, q)})
        return tbl.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")]) \
            .rename_columns(["l_returnflag", "n", "sx", "sy",
                             "sxy", "sxx"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("l_returnflag").aggregate(
                Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
                Sum("sxx", alias_name="sxx"))

    def finish(t: pa.Table) -> pa.Table:
        cols = {}
        for c in ("n", "sx", "sy", "sxy", "sxx"):
            col = t[c]
            if col.type != pa.int64():
                col = pc.round(col).cast(pa.int64())
            cols[c] = col.to_numpy(zero_copy_only=False) \
                         .astype(np.float64)
        n, sx, sy, sxy, sxx = (cols[c] for c in
                               ("n", "sx", "sy", "sxy", "sxx"))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(cols["n"].astype(np.int64)),
            "slope": pa.array(np.round(slope, 6)),
            "intercept": pa.array(np.round(intercept, 4))})

    return agg.map_batches(finish, batch_format="pyarrow")


_REGR_SLOPE_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sx,
         CAST(sum(p) AS BIGINT) AS sy,
         CAST(sum(q * p) AS BIGINT) AS sxy,
         CAST(sum(q * q) AS BIGINT) AS sxx
  FROM (SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p
        FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       round((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4)
         AS intercept
FROM m
"""


def q_orders_with_high_discount(sf_dir):
    """EXISTS semi-join with a predicate: orders having at least one
    line with discount >= 0.08. Qualifying orderkeys reduce to per-block
    DISTINCT before the one keys-only exchange.

    Scale posture: with TPC-H's uniform 0-0.10 discounts MOST orders
    qualify, so the "small" side is O(|orders|) — NOT broadcast-small.
    The key set is therefore materialized keys-only and COUNTED first:
    under `_BROADCAST_KEYS_MAX` it broadcasts (one ray.put, payload rows
    never shuffle); above it, it falls back to a bucketed `hash_join`
    semi-join so the driver never holds O(|orders|) keys."""
    from ..functions.join import broadcast_join, hash_join

    _BROADCAST_KEYS_MAX = 2_000_000  # ~16 MB of int64 keys

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_discount"])

    def qualifying(t: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.greater_equal(t["l_discount"], 0.08),
                            False)
        keys = t.filter(keep)["l_orderkey"].unique()
        return pa.table({"o_orderkey": keys})

    keys = li.map_batches(qualifying, batch_format="pyarrow") \
             .groupby("o_orderkey").count() \
             .map_batches(lambda t: t.select(["o_orderkey"]),
                          batch_format="pyarrow")
    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "total_e2": e2})

    orders = orders.map_batches(project, batch_format="pyarrow")
    keyset = keys.materialize()
    if keyset.count() <= _BROADCAST_KEYS_MAX:
        kt = pa.concat_tables(
            list(keyset.iter_batches(batch_format="pyarrow")))
        return broadcast_join(orders, kt, on="o_orderkey", how="inner")
    return hash_join(orders, keyset, on="o_orderkey", how="inner")


_ORDERS_HIGH_DISCOUNT_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_e2
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)
"""


def q_parts_all_low_discount(sf_dir):
    """ALL-quantified filter: parts whose EVERY line ships with discount
    < 0.09 (never discounted deeply). One keys-only grouped-max in
    integer units, then an exact threshold filter — the NOT EXISTS /
    ALL comparison as a max aggregate."""
    from ray.data.aggregate import Max

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_discount"])

    def project(t: pa.Table) -> pa.Table:
        d = pc.round(pc.multiply(t["l_discount"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "d_e2": d})

    agg = li.map_batches(project, batch_format="pyarrow") \
            .groupby("l_partkey").aggregate(Max("d_e2",
                                                alias_name="max_d_e2"))

    def keep(t: pa.Table) -> pa.Table:
        col = t["max_d_e2"]
        if col.type != pa.int64():
            col = pc.round(col).cast(pa.int64())
        mask = pc.less(col, 9)
        return pa.table({"l_partkey": t["l_partkey"],
                         "max_d_e2": col}).filter(
                             pc.fill_null(mask, False))

    return agg.map_batches(keep, batch_format="pyarrow")


_PARTS_ALL_LOW_DISCOUNT_SQL = """
SELECT l_partkey,
       CAST(max(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS max_d_e2
FROM lineitem
GROUP BY l_partkey
HAVING max(CAST(round(l_discount * 100) AS BIGINT)) < 9
"""


# ---------------------------------------------------------------------------
# TPC-H Q4/Q14/Q17/Q19/Q22-style adaptations + covariance / cume_dist /
# dense-rank window family


def q_q4_late_orders(sf_dir):
    """Q4-style priority check (EXISTS rewritten as a grouped max):
    orders with at least one line shipped >30 days after the order
    date, counted per priority. The lineitem side reduces to one row
    per orderkey (per-block partial max, then a keys-only groupby)
    before joining orders — payload columns never shuffle.

    Reference parity: vocabulary/applicator.py:248-263 `contains`
    (dataset-level EXISTS) composed with a `maximum` bound
    (validation.py:78-84) on a derived latency column."""
    from ray.data.aggregate import Max
    from ..functions.join import hash_join

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_shipdate"])

    def part_max(t: pa.Table) -> pa.Table:
        us = t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        tbl = pa.table({"o_orderkey": t["l_orderkey"], "ship_us": us})
        return tbl.group_by("o_orderkey").aggregate([("ship_us", "max")]) \
                  .rename_columns(["o_orderkey", "ship_us"])

    maxship = li.map_batches(part_max, batch_format="pyarrow") \
                .groupby("o_orderkey") \
                .aggregate(Max("ship_us", alias_name="ship_us"))

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])

    def proj_orders(t: pa.Table) -> pa.Table:
        us = t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "od_us": us,
                         "o_orderpriority": t["o_orderpriority"]})

    joined = hash_join(orders.map_batches(proj_orders,
                                          batch_format="pyarrow"),
                       maxship, on="o_orderkey", how="inner")

    def late_only(t: pa.Table) -> pa.Table:
        lim = pc.add(t["od_us"], 30 * 86400 * 1_000_000)
        mask = pc.fill_null(pc.greater(t["ship_us"], lim), False)
        return pa.table(
            {"o_orderpriority": t["o_orderpriority"]}).filter(mask)

    return joined.map_batches(late_only, batch_format="pyarrow") \
                 .groupby("o_orderpriority").count() \
                 .map_batches(
                     lambda t: t.rename_columns(
                         ["o_orderpriority", "n_late"]),
                     batch_format="pyarrow")


_Q4_LATE_ORDERS_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
FROM orders
JOIN (SELECT l_orderkey, max(l_shipdate) AS ms
      FROM lineitem GROUP BY 1) li ON li.l_orderkey = o_orderkey
WHERE ms > o_orderdate + INTERVAL 30 DAY
GROUP BY 1
"""


def q_q14_promo_share(sf_dir):
    """Q14-style promo revenue share: broadcast the (partkey, is_promo)
    dim once, one fused conditional-sum pass over lineitem, exact e4
    integer revenue (price cents x (1-discount) hundredths), share =
    division of the two exact integers on both sides. Scale posture:
    the (partkey, is_promo) dim rides the object store; when part
    outgrows the store budget this degrades to hash_join on
    l_partkey (same result, one extra exchange)."""
    import ray
    from ray.data.aggregate import Sum

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_type"])
    pt = pa.concat_tables(
        list(part.iter_batches(batch_format="pyarrow")))
    promo = pa.table({
        "l_partkey": pt["p_partkey"],
        "is_promo": pc.equal(pt["p_type"], "PROMO")})
    ref = ray.put(promo.combine_chunks())

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_extendedprice",
                             "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray
        dim = _ray.get(ref)
        j = t.join(dim, keys="l_partkey", join_type="inner")
        p = pc.round(pc.multiply(j["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        d = pc.round(pc.multiply(pc.subtract(1.0, j["l_discount"]),
                                 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        rev = pc.multiply(p, d)
        pm = pc.fill_null(j["is_promo"], False)
        promo_rev = pc.sum(pc.if_else(pm, rev, pa.scalar(0, pa.int64())))
        return pa.table({
            "promo_rev_e4": pa.array(
                [promo_rev.as_py() or 0], pa.int64()),
            "total_rev_e4": pa.array(
                [pc.sum(rev).as_py() or 0], pa.int64())})

    agg = li.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo_rev_e4", alias_name="promo_rev_e4"),
        Sum("total_rev_e4", alias_name="total_rev_e4"))
    pr, tr = int(agg["promo_rev_e4"]), int(agg["total_rev_e4"])
    return pd.DataFrame({"promo_rev_e4": [pr], "total_rev_e4": [tr],
                         "promo_share": [pr / tr]})


_Q14_PROMO_SHARE_SQL = """
WITH r AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev,
         (p_type = 'PROMO') AS pm
  FROM lineitem JOIN part ON p_partkey = l_partkey)
SELECT CAST(sum(CASE WHEN pm THEN rev ELSE 0 END) AS BIGINT)
         AS promo_rev_e4,
       CAST(sum(rev) AS BIGINT) AS total_rev_e4,
       CAST(sum(CASE WHEN pm THEN rev ELSE 0 END) AS DOUBLE)
         / CAST(sum(rev) AS DOUBLE) AS promo_share
FROM r
"""


def q_q17_small_qty_revenue(sf_dir):
    """Q17-style small-quantity revenue: for one brand's parts, revenue
    of lines whose quantity is below 20% of that part's average
    quantity. The correlated AVG subquery becomes a per-partkey (n,
    sum_qty) aggregate joined back to the same lines; the threshold
    compare is the exact integer cross-multiplication
    5*qty*n < sum_qty (quantities are whole), so no float boundary can
    disagree with the oracle."""
    from ray.data.aggregate import Sum
    from ..functions.join import broadcast_join

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_brand"])
    pt = pa.concat_tables(list(part.iter_batches(batch_format="pyarrow")))
    brand = pa.table({"l_partkey":
                      pt.filter(pc.equal(pt["p_brand"],
                                         "Brand#13"))["p_partkey"]})

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        q = pc.round(t["l_quantity"],
                     round_mode="half_towards_infinity").cast(pa.int64())
        p = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "qty": q,
                         "price_e2": p})

    li13 = broadcast_join(li.map_batches(proj, batch_format="pyarrow"),
                          brand, on="l_partkey", how="inner")

    def part_moments(t: pa.Table) -> pa.Table:
        tbl = pa.table({"l_partkey": t["l_partkey"],
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                        "sq": t["qty"]})
        return tbl.group_by("l_partkey").aggregate(
            [("n", "sum"), ("sq", "sum")]) \
            .rename_columns(["l_partkey", "n", "sq"])

    mom = li13.map_batches(part_moments, batch_format="pyarrow") \
              .groupby("l_partkey").aggregate(
                  Sum("n", alias_name="n"), Sum("sq", alias_name="sq"))
    mt = pa.concat_tables(list(mom.iter_batches(batch_format="pyarrow")))
    cols = {}
    for c in ("n", "sq"):
        col = mt[c]
        if col.type != pa.int64():
            col = pc.round(col).cast(pa.int64())
        cols[c] = col
    mt = pa.table({"l_partkey": mt["l_partkey"], "n": cols["n"],
                   "sq": cols["sq"]})

    probe = broadcast_join(li13, mt, on="l_partkey", how="inner")

    def small_qty(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.multiply(t["qty"], 5), t["n"])
        mask = pc.fill_null(pc.less(lhs, t["sq"]), False)
        kept = t.filter(mask)
        s = pc.sum(kept["price_e2"]).as_py() or 0
        return pa.table({"sum_price_e2": pa.array([s], pa.int64())})

    agg = probe.map_batches(small_qty, batch_format="pyarrow") \
               .aggregate(Sum("sum_price_e2", alias_name="sum_price_e2"))
    s = int(agg["sum_price_e2"])
    return pd.DataFrame({"sum_price_e2": [s],
                         "avg_yearly_e2": [s / 7.0]})


_Q17_SMALL_QTY_SQL = """
WITH li13 AS (
  SELECT l_partkey,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_e2
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#13'),
m AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qty) AS BIGINT) AS sq
  FROM li13 GROUP BY 1)
SELECT CAST(sum(price_e2) AS BIGINT) AS sum_price_e2,
       CAST(sum(price_e2) AS DOUBLE) / 7.0 AS avg_yearly_e2
FROM li13 JOIN m USING (l_partkey)
WHERE 5 * qty * n < sq
"""


def q_q19_disjunctive_revenue(sf_dir):
    """Q19-style disjunctive predicate revenue: three (type, size-band,
    qty-band) conjunctive branches OR-ed together, evaluated as boolean
    column algebra against one broadcast part dim (SURVEY 2.2 anyOf =
    OR of child masks). Output = per-branch row count + exact e4
    revenue. Same broadcast-dim scale posture as q14_promo_share
    (hash_join fallback when part outgrows the object store)."""
    import ray
    from ray.data.aggregate import Sum

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_type", "p_size"])
    pt = pa.concat_tables(list(part.iter_batches(batch_format="pyarrow")))
    dim = pa.table({"l_partkey": pt["p_partkey"],
                    "p_type": pt["p_type"], "p_size": pt["p_size"]})
    ref = ray.put(dim.combine_chunks())

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice", "l_discount"])

    BRANCHES = [("ECONOMY", 1, 5, 1, 11), ("STANDARD", 1, 10, 10, 20),
                ("LARGE", 1, 15, 20, 30)]

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray
        d = _ray.get(ref)
        j = t.join(d, keys="l_partkey", join_type="inner")
        qty = pc.round(j["l_quantity"],
                       round_mode="half_towards_infinity").cast(pa.int64())
        p = pc.round(pc.multiply(j["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        disc = pc.round(pc.multiply(pc.subtract(1.0, j["l_discount"]),
                                    100.0),
                        round_mode="half_towards_infinity") \
                 .cast(pa.int64())
        rev = pc.multiply(p, disc)
        names, ns, revs = [], [], []
        for name, s_lo, s_hi, q_lo, q_hi in BRANCHES:
            m = pc.and_(
                pc.and_(pc.equal(j["p_type"], name),
                        pc.and_(pc.greater_equal(j["p_size"], s_lo),
                                pc.less_equal(j["p_size"], s_hi))),
                pc.and_(pc.greater_equal(qty, q_lo),
                        pc.less_equal(qty, q_hi)))
            m = pc.fill_null(m, False)
            names.append(name)
            ns.append(pc.sum(m.cast(pa.int64())).as_py() or 0)
            revs.append(pc.sum(
                pc.if_else(m, rev, pa.scalar(0, pa.int64()))).as_py()
                or 0)
        return pa.table({"branch": pa.array(names),
                         "n_rows": pa.array(ns, pa.int64()),
                         "rev_e4": pa.array(revs, pa.int64())})

    agg = li.map_batches(partial, batch_format="pyarrow") \
            .groupby("branch").aggregate(
                Sum("n_rows", alias_name="n_rows"),
                Sum("rev_e4", alias_name="rev_e4"))

    def drop_empty(t: pa.Table) -> pa.Table:
        # the oracle's inner join emits no row for a branch with zero
        # matches; mirror that so the row sets stay equal on any data
        n = t["n_rows"]
        if n.type != pa.int64():
            n = pc.round(n).cast(pa.int64())
        return t.filter(pc.greater(n, 0))

    return agg.map_batches(drop_empty, batch_format="pyarrow")


_Q19_DISJUNCTIVE_SQL = """
WITH j AS (
  SELECT p_type, p_size,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev
  FROM lineitem JOIN part ON p_partkey = l_partkey),
b(branch, s_lo, s_hi, q_lo, q_hi) AS (VALUES
  ('ECONOMY', 1, 5, 1, 11), ('STANDARD', 1, 10, 10, 20),
  ('LARGE', 1, 15, 20, 30))
SELECT branch,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(rev) AS BIGINT) AS rev_e4
FROM j JOIN b ON p_type = branch
  AND p_size BETWEEN s_lo AND s_hi AND qty BETWEEN q_lo AND q_hi
GROUP BY 1
"""


def q_q22_idle_rich_customers(sf_dir):
    """Q22-style: customers with above-average positive balance and NO
    order since 2000-01-01 (lapsed accounts), aggregated per nation.
    The global AVG threshold is one tiny two-integer aggregate (compare
    bal_e2 * n_pos > sum_e2 — exact, no float boundary); the
    predicated NOT EXISTS is the keys-only EXCEPT path over the
    date-filtered orders (payloads never shuffle); the survivor set is
    small, so the final enrich is a broadcast probe."""
    from ray.data.aggregate import Sum
    from ..functions.join import key_set_op, broadcast_join

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def proj(t: pa.Table) -> pa.Table:
        bal = pc.round(pc.multiply(t["c_acctbal"], 100.0),
                       round_mode="half_towards_infinity") \
                .cast(pa.int64())
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "bal_e2": bal})

    # three consumers (global aggregate, EXCEPT tag pass, broadcast
    # probe) would each re-run the read+projection lineage; pin the
    # narrow projected blocks once instead
    cust = cust.map_batches(proj, batch_format="pyarrow").materialize()

    def pos_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["bal_e2"], 0))
        return pa.table({
            "n_pos": pa.array([pos.num_rows], pa.int64()),
            "sum_pos": pa.array(
                [pc.sum(pos["bal_e2"]).as_py() or 0], pa.int64())})

    g = cust.map_batches(pos_partial, batch_format="pyarrow").aggregate(
        Sum("n_pos", alias_name="n_pos"),
        Sum("sum_pos", alias_name="sum_pos"))
    n_pos, sum_pos = int(g["n_pos"]), int(g["sum_pos"])

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey", "o_orderdate"])
    cutoff_us = int(pd.Timestamp("2000-01-01").value // 1000)

    def recent_only(t: pa.Table) -> pa.Table:
        us = t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        mask = pc.fill_null(pc.greater_equal(us, cutoff_us), False)
        return pa.table({"o_custkey": t["o_custkey"]}).filter(mask)

    recent = orders.map_batches(recent_only, batch_format="pyarrow")
    idle = key_set_op(cust, recent, on_a="c_custkey", on_b="o_custkey",
                      op="except", out="c_custkey")
    it = pa.concat_tables(list(idle.iter_batches(batch_format="pyarrow")))

    def rich_only(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(t["bal_e2"], n_pos)
        mask = pc.fill_null(pc.greater(lhs, sum_pos), False)
        return t.filter(mask)

    rich_idle = broadcast_join(
        cust.map_batches(rich_only, batch_format="pyarrow"),
        it, on="c_custkey", how="inner")

    def per_nation(t: pa.Table) -> pa.Table:
        tbl = pa.table({"c_nationkey": t["c_nationkey"],
                        "n_cust": pa.array(
                            np.ones(t.num_rows, np.int64)),
                        "sum_bal_e2": t["bal_e2"]})
        return tbl.group_by("c_nationkey").aggregate(
            [("n_cust", "sum"), ("sum_bal_e2", "sum")]) \
            .rename_columns(["c_nationkey", "n_cust", "sum_bal_e2"])

    return rich_idle.map_batches(per_nation, batch_format="pyarrow") \
                    .groupby("c_nationkey").aggregate(
                        Sum("n_cust", alias_name="n_cust"),
                        Sum("sum_bal_e2", alias_name="sum_bal_e2"))


_Q22_IDLE_RICH_SQL = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_e2
  FROM customer),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(bal_e2) AS BIGINT) AS sum_pos
  FROM c WHERE bal_e2 > 0)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(bal_e2) AS BIGINT) AS sum_bal_e2
FROM c, g
WHERE bal_e2 * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""


def q_covar_lineitem(sf_dir):
    """Grouped sample + population covariance of (quantity, price) per
    return flag from four exact integer moment sums, closed-form finish
    reproduced verbatim in the oracle (regr_slope pattern,
    functions/relational.py grouped_corr sibling)."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.round(pc.multiply(t["l_quantity"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        p = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        tbl = pa.table({"l_returnflag": t["l_returnflag"],
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                        "sx": q, "sy": p, "sxy": pc.multiply(q, p)})
        return tbl.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum")]) \
            .rename_columns(["l_returnflag", "n", "sx", "sy", "sxy"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("l_returnflag").aggregate(
                Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"))

    def finish(t: pa.Table) -> pa.Table:
        cols = {}
        for c in ("n", "sx", "sy", "sxy"):
            col = t[c]
            if col.type != pa.int64():
                col = pc.round(col).cast(pa.int64())
            cols[c] = col.to_numpy(zero_copy_only=False) \
                         .astype(np.float64)
        n, sx, sy, sxy = (cols[c] for c in ("n", "sx", "sy", "sxy"))
        # moments are e2-scaled: covar of raw units = e4 moment / 1e4
        cpop = (sxy - sx * sy / n) / n / 1e4
        csamp = (sxy - sx * sy / n) / (n - 1) / 1e4
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(cols["n"].astype(np.int64)),
            "covar_pop": pa.array(np.round(cpop, 4)),
            "covar_samp": pa.array(np.round(csamp, 4))})

    return agg.map_batches(finish, batch_format="pyarrow")


_COVAR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sx,
         CAST(sum(p) AS BIGINT) AS sy,
         CAST(sum(q * p) AS BIGINT) AS sxy
  FROM (SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p
        FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag, n,
       round((CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE) / 1e4, 4) AS covar_pop,
       round((CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE))
             / CAST(n - 1 AS DOUBLE) / 1e4, 4) AS covar_samp
FROM m
"""


def q_customer_cume_dist(sf_dir):
    """cume_dist() OVER (PARTITION BY mktsegment ORDER BY balance):
    tie-inclusive cumulative distribution per segment, every output a
    division of two exact integers (functions/windows.keyed_cume_dist;
    percent_rank's tie-counting sibling)."""
    from ..functions.windows import keyed_cume_dist

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def proj(t: pa.Table) -> pa.Table:
        bal = pc.round(pc.multiply(t["c_acctbal"], 100.0),
                       round_mode="half_towards_infinity") \
                .cast(pa.int64())
        return pa.table({"c_mktsegment": t["c_mktsegment"],
                         "c_custkey": t["c_custkey"], "bal_e2": bal})

    return keyed_cume_dist(cust.map_batches(proj, batch_format="pyarrow"),
                           key_col="c_mktsegment", value_col="bal_e2",
                           tie_col="c_custkey")


_CUME_DIST_SQL = """
SELECT c_mktsegment, c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_e2,
       cume_dist() OVER (PARTITION BY c_mktsegment
                         ORDER BY CAST(round(c_acctbal * 100) AS BIGINT))
         AS cd
FROM customer
"""


def q_dense_rank_brands(sf_dir):
    """Top-3 brands per part type by exact e4 revenue with DENSE_RANK
    tie semantics. The wide work is one broadcast-dim conditional
    aggregate (partial per block, then a bounded groupby of
    types x brands rows); the rank itself runs on that tiny aggregate.
    Same broadcast-dim scale posture as q14_promo_share (hash_join
    fallback when part outgrows the object store)."""
    import ray
    from ray.data.aggregate import Sum

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_type", "p_brand"])
    pt = pa.concat_tables(list(part.iter_batches(batch_format="pyarrow")))
    dim = pa.table({"l_partkey": pt["p_partkey"],
                    "p_type": pt["p_type"], "p_brand": pt["p_brand"]})
    ref = ray.put(dim.combine_chunks())

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_extendedprice",
                             "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray
        d = _ray.get(ref)
        j = t.join(d, keys="l_partkey", join_type="inner")
        p = pc.round(pc.multiply(j["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        disc = pc.round(pc.multiply(pc.subtract(1.0, j["l_discount"]),
                                    100.0),
                        round_mode="half_towards_infinity") \
                 .cast(pa.int64())
        tbl = pa.table({"p_type": j["p_type"], "p_brand": j["p_brand"],
                        "rev_e4": pc.multiply(p, disc)})
        return tbl.group_by(["p_type", "p_brand"]).aggregate(
            [("rev_e4", "sum")]) \
            .rename_columns(["p_type", "p_brand", "rev_e4"])

    agg = li.map_batches(partial, batch_format="pyarrow") \
            .groupby(["p_type", "p_brand"]).aggregate(
                Sum("rev_e4", alias_name="rev_e4"))
    df = agg.to_pandas()
    df = finalize(df, {"p_type": None, "p_brand": None,
                       "rev_e4": "float64"})
    df["rev_e4"] = df["rev_e4"].round().astype("int64")
    df = df.sort_values(["p_type", "rev_e4"],
                        ascending=[True, False], kind="mergesort")
    # dense rank: position of the value among distinct values, desc
    df["rnk"] = df.groupby("p_type")["rev_e4"] \
                  .rank(method="dense", ascending=False).astype("int64")
    out = df[df["rnk"] <= 3].reset_index(drop=True)
    return out[["p_type", "p_brand", "rev_e4", "rnk"]]


_DENSE_RANK_BRANDS_SQL = """
WITH a AS (
  SELECT p_type, p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS rev_e4
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2),
r AS (
  SELECT *, CAST(dense_rank() OVER (PARTITION BY p_type
                                    ORDER BY rev_e4 DESC) AS BIGINT)
              AS rnk
  FROM a)
SELECT p_type, p_brand, rev_e4, rnk FROM r WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# CUBE / percentile_cont / lead / dim-chain / set-op-union batch


def q_cube_lineitem(sf_dir):
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping
    sets from ONE finest-level shuffle; coarser subsets re-aggregated
    from the finest result (functions/relational.py::cube_agg, the
    rollup_agg sibling)."""
    from ..functions.relational import cube_agg

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_linestatus",
                             "l_quantity"])
    ds = _drop_null_rows(ds, ["l_returnflag", "l_linestatus",
                              "l_quantity"])
    out = cube_agg(ds, keys=["l_returnflag", "l_linestatus"],
                   value_col="l_quantity")
    out["sum_l_quantity"] = out["sum_l_quantity"].round(4)
    return out


_CUBE_LINEITEM_SQL = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 4) AS sum_l_quantity
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
  AND l_quantity IS NOT NULL
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def q_percentile_cont_lineitem(sf_dir):
    """Interpolated grouped percentiles (percentile_cont 0.25/0.5/0.75
    of quantity per return flag): (key, value) COUNT pairs shuffle —
    never rows — then the pos = q*(n-1) interpolation reproduced
    exactly per key (quantity's whole-number domain keeps both sides
    bit-identical)."""
    from ..functions.relational import grouped_percentile_cont_lowcard

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity"])

    def proj(t: pa.Table) -> pa.Table:
        q = pc.round(t["l_quantity"],
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"], "qty": q})

    return grouped_percentile_cont_lowcard(
        ds.map_batches(proj, batch_format="pyarrow"),
        key="l_returnflag", value_col="qty")


_PERCENTILE_CONT_SQL = """
SELECT l_returnflag,
       quantile_cont(CAST(round(l_quantity) AS BIGINT), 0.25) AS p25,
       quantile_cont(CAST(round(l_quantity) AS BIGINT), 0.5) AS p50,
       quantile_cont(CAST(round(l_quantity) AS BIGINT), 0.75) AS p75
FROM lineitem
GROUP BY 1
"""


def q_events_lead_delta(sf_dir):
    """Per-user LEAD deltas (time-to-next-event + next-value change),
    NULL on each user's last event — keyed_lag's mirror scan
    (functions/windows.py::keyed_lead)."""
    from ..functions.windows import keyed_lead

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "value"])
    return keyed_lead(ds, key_col="user_id", ts_col="ts",
                      tie_col="event_id", value_col="value")


_EVENTS_LEAD_DELTA_SQL = """
SELECT user_id, event_id,
       date_diff('microsecond', ts, lead(ts) OVER w) AS lead_gap_us,
       round(lead(value) OVER w - value, 4) AS lead_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_supplier_balance_by_region(sf_dir):
    """Supplier account balance rolled up region-wise through the
    nation->region dim chain: two tiny broadcast probes composed into
    one map stage (dims join driver-side first — the $ref chain of
    SURVEY 2.3 resolved at compile time), then a bounded groupby."""
    from ray.data.aggregate import Sum
    from ..functions.join import broadcast_join

    nation = read_table(table_path(sf_dir, "nation"),
                        columns=["n_nationkey", "n_regionkey"])
    region = read_table(table_path(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"])
    nt = pa.concat_tables(list(nation.iter_batches(
        batch_format="pyarrow")))
    rt = pa.concat_tables(list(region.iter_batches(
        batch_format="pyarrow")))
    dim = nt.join(rt, keys="n_regionkey", right_keys="r_regionkey",
                  join_type="inner") \
            .select(["n_nationkey", "r_name"]) \
            .rename_columns(["s_nationkey", "r_name"])

    sup = read_table(table_path(sf_dir, "supplier"),
                     columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def proj(t: pa.Table) -> pa.Table:
        bal = pc.round(pc.multiply(t["s_acctbal"], 100.0),
                       round_mode="half_towards_infinity") \
                .cast(pa.int64())
        return pa.table({
            "s_nationkey": t["s_nationkey"].cast(pa.int32()),
            "n_sup": pa.array(np.ones(t.num_rows, np.int64)),
            "bal_e2": bal})

    joined = broadcast_join(sup.map_batches(proj,
                                            batch_format="pyarrow"),
                            dim, on="s_nationkey", how="inner")

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("r_name").aggregate(
            [("n_sup", "sum"), ("bal_e2", "sum")]) \
            .rename_columns(["r_name", "n_sup", "bal_e2"])

    return joined.map_batches(partial, batch_format="pyarrow") \
                 .groupby("r_name").aggregate(
                     Sum("n_sup", alias_name="n_sup"),
                     Sum("bal_e2", alias_name="sum_bal_e2"))


_SUPPLIER_BALANCE_REGION_SQL = """
SELECT r_name, CAST(count(*) AS BIGINT) AS n_sup,
       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS sum_bal_e2
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY 1
"""


def q_partkeys_union(sf_dir):
    """SQL UNION (distinct) of two key columns — completes the
    INTERSECT / EXCEPT / UNION family over
    functions/join.py::key_set_op's distinct-presence shuffle: part
    keys appearing in the catalog or in any line."""
    from ..functions.join import key_set_op

    part = read_table(table_path(sf_dir, "part"), columns=["p_partkey"])
    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey"])
    out = key_set_op(part, li, on_a="p_partkey", on_b="l_partkey",
                     op="union").to_pandas()
    return _ensure_columns(out, {"key": "int64"})


_PARTKEYS_UNION_SQL = """
SELECT p_partkey AS key FROM part
UNION
SELECT l_partkey AS key FROM lineitem
"""


def q_first_event_per_user(sf_dir):
    """First-touch attribution: each user's earliest event —
    keyed_latest with keep='first' (row_number ASC = 1). Same bounded
    bucketed keep-pass as the snapshot dedup."""
    from ..functions.windows import keyed_latest

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "event_type",
                             "value"])
    return keyed_latest(ds, key_cols=["user_id"], ts_col="ts",
                        tie_col="event_id", keep="first")


_FIRST_EVENT_SQL = """
SELECT user_id, ts, event_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC) = 1
"""


def q_props_k_stats(sf_dir):
    """Nested-JSON field aggregation: props is a JSON string column;
    one vectorized NDJSON parse per block (functions/text.py::
    parse_json_column — reference json.py:120-151 tree walk recast as
    a batch C++ parse) feeds an integer-exact grouped min/max/sum of
    the extracted field."""
    from ray.data.aggregate import Sum, Min, Max
    from ..functions.text import parse_json_column

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "props"])
    parsed = ds.map_batches(
        functools.partial(parse_json_column, col="props", out="_props"),
        batch_format="pyarrow")

    def extract(t: pa.Table) -> pa.Table:
        k = pc.struct_field(t["_props"], "k").cast(pa.int64())
        tbl = pa.table({"event_type": t["event_type"], "k": k,
                        "n": pa.array(np.ones(t.num_rows, np.int64))})
        return tbl.group_by("event_type").aggregate(
            [("n", "sum"), ("k", "sum"), ("k", "min"), ("k", "max")]) \
            .rename_columns(["event_type", "n", "sum_k", "min_k",
                             "max_k"])

    return parsed.map_batches(extract, batch_format="pyarrow") \
                 .groupby("event_type").aggregate(
                     Sum("n", alias_name="n"),
                     Sum("sum_k", alias_name="sum_k"),
                     Min("min_k", alias_name="min_k"),
                     Max("max_k", alias_name="max_k"))


_PROPS_K_STATS_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events
GROUP BY 1
"""


def q_customer_order_gap_median(sf_dir):
    """Median inter-order gap per customer (repeat-purchase cadence):
    LAG day-diff composed with an exact per-key median in one bucketed
    segmented scan — keys never split, so both the diff and the median
    finish inside the bucket without a second exchange."""
    from ..functions.windows import _key_bucket

    ds = read_table(table_path(sf_dir, "orders"),
                    columns=["o_custkey", "o_orderdate", "o_orderkey"])
    keyed = ds.map_batches(
        functools.partial(_key_bucket, key_col="o_custkey", num_buckets=64),
        batch_format="pyarrow")

    def med_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        days = g["o_orderdate"].to_numpy().astype("datetime64[D]") \
                               .astype(np.int64)
        keys = g["o_custkey"].to_numpy()
        gap = np.diff(days, prepend=days[:1]).astype(np.float64)
        same = np.zeros(len(g), dtype=bool)
        if len(g):
            same[1:] = keys[1:] == keys[:-1]
        df = pd.DataFrame({"o_custkey": keys, "gap": gap})[same]
        if not len(df):
            return pd.DataFrame({
                "o_custkey": pd.Series([], dtype="int64"),
                "n_gaps": pd.Series([], dtype="int64"),
                "med_gap_days": pd.Series([], dtype="float64")})
        out = df.groupby("o_custkey")["gap"] \
                .agg(n_gaps="size", med_gap_days="median") \
                .reset_index()
        out["n_gaps"] = out["n_gaps"].astype("int64")
        return out

    return keyed.groupby("_bucket").map_groups(med_bucket,
                                               batch_format="pandas")


_CUSTOMER_ORDER_GAP_SQL = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate,
                                                   o_orderkey),
                   o_orderdate) AS gap
  FROM orders)
SELECT o_custkey, CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(median(gap) AS DOUBLE) AS med_gap_days
FROM g WHERE gap IS NOT NULL
GROUP BY 1
"""


def q_events_dow_hour_heatmap(sf_dir):
    """Traffic heatmap: event count + exact cents sum per (day-of-week,
    hour-of-day) — calendar-part extraction as pure pyarrow kernels,
    one fused per-block partial into a 7x24-bounded groupby."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # arrow day_of_week: 0=Mon..6=Sun -> SQL dow: 0=Sun..6=Sat
        dow = pc.add(pc.day_of_week(t["ts"]), 1)
        dow = pc.if_else(pc.equal(dow, 7),
                         pa.scalar(0, pa.int64()),
                         dow.cast(pa.int64()))
        hour = pc.hour(t["ts"]).cast(pa.int64())
        cents = pc.round(pc.multiply(t["value"], 100.0),
                         round_mode="half_towards_infinity") \
                  .cast(pa.int64())
        tbl = pa.table({"dow": dow, "hour": hour, "cents": cents})
        return tbl.group_by(["dow", "hour"]).aggregate(
            [("cents", "sum"), ([], "count_all")]) \
            .rename_columns(["dow", "hour", "sum_cents", "n"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(["dow", "hour"]).aggregate(
                 Sum("n", alias_name="n"),
                 Sum("sum_cents", alias_name="sum_cents"))


_EVENTS_DOW_HOUR_SQL = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events
GROUP BY 1, 2
"""


def q_part_color_counts(sf_dir):
    """String tokenization aggregate: first word of p_name (the color)
    via one vectorized split kernel per block, then a bounded groupby —
    split_part semantics without any Python row loop."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "part"), columns=["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        first = pc.list_element(pc.split_pattern(t["p_name"], " "), 0)
        tbl = pa.table({"color": first,
                        "n": pa.array(np.ones(t.num_rows, np.int64))})
        return tbl.group_by("color").aggregate([("n", "sum")]) \
                  .rename_columns(["color", "n"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("color").aggregate(Sum("n", alias_name="n"))


_PART_COLOR_SQL = """
SELECT split_part(p_name, ' ', 1) AS color,
       CAST(count(*) AS BIGINT) AS n
FROM part
GROUP BY 1
"""


def q_priority_label_counts(sf_dir):
    """Split a composite code column ('1-URGENT' -> numeric rank +
    label) with vectorized split + cast kernels; per-label counts and
    exact cents revenue."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "orders"),
                    columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["o_orderpriority"], "-",
                                 max_splits=1)
        num = pc.list_element(parts, 0).cast(pa.int64())
        label = pc.list_element(parts, 1)
        cents = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                         round_mode="half_towards_infinity") \
                  .cast(pa.int64())
        tbl = pa.table({"prio_num": num, "label": label,
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                        "cents": cents})
        return tbl.group_by(["prio_num", "label"]).aggregate(
            [("n", "sum"), ("cents", "sum")]) \
            .rename_columns(["prio_num", "label", "n", "sum_price_e2"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(["prio_num", "label"]).aggregate(
                 Sum("n", alias_name="n"),
                 Sum("sum_price_e2", alias_name="sum_price_e2"))


_PRIORITY_LABEL_SQL = """
SELECT CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS prio_num,
       split_part(o_orderpriority, '-', 2) AS label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_e2
FROM orders
GROUP BY 1, 2
"""


def q_quarterly_revenue(sf_dir):
    """Quarterly revenue roll-up: floor_temporal(quarter) as a pure
    arrow kernel, per-block partials into a bounded (years x 4)
    groupby — the date_trunc seasonality report."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "orders"),
                    columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.floor_temporal(t["o_orderdate"], unit="quarter")
        cents = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                         round_mode="half_towards_infinity") \
                  .cast(pa.int64())
        tbl = pa.table({"quarter": q,
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                        "cents": cents})
        return tbl.group_by("quarter").aggregate(
            [("n", "sum"), ("cents", "sum")]) \
            .rename_columns(["quarter", "n", "sum_price_e2"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("quarter").aggregate(
                Sum("n", alias_name="n"),
                Sum("sum_price_e2", alias_name="sum_price_e2"))

    def to_us(t: pa.Table) -> pa.Table:
        # ray's pandas-backed aggregate downcasts the key to seconds;
        # restore the driver-visible microsecond unit
        return t.set_column(t.schema.get_field_index("quarter"),
                            "quarter",
                            t["quarter"].cast(pa.timestamp("us")))

    return agg.map_batches(to_us, batch_format="pyarrow")


_QUARTERLY_REVENUE_SQL = """
SELECT date_trunc('quarter', o_orderdate) AS quarter,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_e2
FROM orders
GROUP BY 1
"""


def q_embedding_component_stats(sf_dir):
    """List-column scalar derivations: per row, the first embedding
    component and the component sum (fixed-size-list -> one zero-copy
    (n, dim) numpy view per block, no per-row loop), rounded to e6
    integers so the grouped min/max/sum stay exact across engines."""
    from ray.data.aggregate import Sum, Min, Max

    ds = read_table(table_path(sf_dir, "embeddings"),
                    columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
                  .astype(np.float64)
        dim = len(flat) // max(t.num_rows, 1)
        mat = flat.reshape(t.num_rows, dim) if t.num_rows else \
            flat.reshape(0, 0)
        first_e6 = np.round(mat[:, 0] * 1e6).astype(np.int64) \
            if t.num_rows else np.zeros(0, np.int64)
        csum_e6 = np.round(mat.sum(axis=1) * 1e6).astype(np.int64) \
            if t.num_rows else np.zeros(0, np.int64)
        tbl = pa.table({"label": t["label"].cast(pa.int64()),
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                        "first_e6": pa.array(first_e6),
                        "csum_e6": pa.array(csum_e6)})
        return tbl.group_by("label").aggregate(
            [("n", "sum"), ("first_e6", "min"), ("first_e6", "max"),
             ("csum_e6", "sum")]) \
            .rename_columns(["label", "n", "min_first_e6",
                             "max_first_e6", "sum_csum_e6"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("label").aggregate(
                 Sum("n", alias_name="n"),
                 Min("min_first_e6", alias_name="min_first_e6"),
                 Max("max_first_e6", alias_name="max_first_e6"),
                 Sum("sum_csum_e6", alias_name="sum_csum_e6"))


_EMBEDDING_COMPONENT_SQL = """
WITH r AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
           AS first_e6,
         CAST(round(list_sum(list_transform(
                embedding, x -> CAST(x AS DOUBLE))) * 1e6) AS BIGINT)
           AS csum_e6
  FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(min(first_e6) AS BIGINT) AS min_first_e6,
       CAST(max(first_e6) AS BIGINT) AS max_first_e6,
       CAST(sum(csum_e6) AS BIGINT) AS sum_csum_e6
FROM r GROUP BY 1
"""


def q_spearman_lineitem(sf_dir):
    """Grouped Spearman rank correlation of (quantity, price) per
    return flag: doubled average-rank transform (whole integers even
    under ties) + exact integer moments, finish arithmetic mirrored
    verbatim in the oracle (functions/relational.py::grouped_spearman;
    regr_slope/covar's rank-domain sibling)."""
    from ..functions.relational import grouped_spearman

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        q = pc.round(pc.multiply(t["l_quantity"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        p = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "q": q, "p": p})

    return grouped_spearman(ds.map_batches(proj, batch_format="pyarrow"),
                            key="l_returnflag", x_col="q", y_col="p")


_SPEARMAN_SQL = """
WITH r AS (
  SELECT l_returnflag,
         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY q)
           + count(*) OVER (PARTITION BY l_returnflag, q) - 1 AS rx,
         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY p)
           + count(*) OVER (PARTITION BY l_returnflag, p) - 1 AS ry
  FROM (SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p
        FROM lineitem)),
m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rx) AS BIGINT) AS sx,
         CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx * ry) AS BIGINT) AS sxy,
         CAST(sum(rx * rx) AS BIGINT) AS sxx,
         CAST(sum(ry * ry) AS BIGINT) AS syy
  FROM r GROUP BY 1)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS rho
FROM m
"""


def q_session_duration_stats(sf_dir):
    """The session TABLE itself (one row per 30-minute-gap session:
    user, 1-based index, event count, exact microsecond duration) —
    functions/windows.py::session_stats, the engagement-analytics
    input that session_counts only summarizes."""
    from ..functions.windows import session_stats

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id"])
    return session_stats(ds, gap_minutes=30)


_SESSION_DURATION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       date_diff('microsecond', min(ts), max(ts)) AS dur_us
FROM sess
GROUP BY 1, 2
"""


def q_weighted_median_qty(sf_dir):
    """Revenue-weighted median quantity per return flag: smallest
    quantity whose cumulative cents-weight reaches half the group total
    (lower weighted median — integer compares only, no interpolation).
    (key, value, weight-sum) partials shuffle; inputs never do
    (functions/relational.py::grouped_weighted_median_lowcard)."""
    from ..functions.relational import grouped_weighted_median_lowcard

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        v = pc.round(t["l_quantity"],
                     round_mode="half_towards_infinity").cast(pa.int64())
        w = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "qty": v, "w": w})

    return grouped_weighted_median_lowcard(
        ds.map_batches(proj, batch_format="pyarrow"),
        key="l_returnflag", value_col="qty", weight_col="w")


_WEIGHTED_MEDIAN_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS v,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
cw AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS total
  FROM c)
SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian,
       CAST(max(total) AS BIGINT) AS total_w
FROM cw WHERE 2 * cum >= total
GROUP BY 1
"""


def q_order_line_coverage(sf_dir):
    """FULL OUTER join coverage report: every orderkey seen on either
    side with its line count (0 when the order has no lines, null
    status when a line references no order). The lineitem side reduces
    to one count row per key before the single bucketed exchange
    (functions/join.py::hash_join how='full')."""
    from ray.data.aggregate import Sum
    from ..functions.join import hash_join

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey"])

    def part_counts(t: pa.Table) -> pa.Table:
        tbl = pa.table({"o_orderkey": t["l_orderkey"]})
        return tbl.group_by("o_orderkey").aggregate([([], "count_all")]) \
                  .rename_columns(["o_orderkey", "n"])

    counts = li.map_batches(part_counts, batch_format="pyarrow") \
               .groupby("o_orderkey").aggregate(Sum("n", alias_name="n"))
    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderstatus"])
    joined = hash_join(orders, counts, on="o_orderkey", how="full")

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"]
        if n.type != pa.int64():
            n = pc.round(n).cast(pa.int64())
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderstatus": t["o_orderstatus"],
            "n_lines": pc.fill_null(n, 0)})

    return joined.map_batches(finish, batch_format="pyarrow")


_ORDER_LINE_COVERAGE_SQL = """
SELECT COALESCE(o.o_orderkey, c.l_orderkey) AS o_orderkey,
       o.o_orderstatus,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_lines
FROM orders o
FULL JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1) c
  ON o.o_orderkey = c.l_orderkey
"""


def q_orders_above_segment_avg(sf_dir):
    """Orders priced above their market segment's average: one bucketed
    hash join tags each order with its segment, the narrow
    (orderkey, seg, cents) join output is pinned ONCE, its 5-row
    segment stats broadcast back as an exact integer threshold
    (e2 x n_seg > sum_seg — the correlated scalar subquery without a
    second join pass)."""
    from ray.data.aggregate import Sum
    from ..functions.join import hash_join

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice"])
    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_mktsegment"])

    def to_cents(t: pa.Table) -> pa.Table:
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "price_e2": e2})

    def rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "c_mktsegment"])

    joined = hash_join(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        cust.map_batches(rekey, batch_format="pyarrow"),
        on="o_custkey", how="inner").materialize()

    def seg_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"c_mktsegment": t["c_mktsegment"],
                        "s": t["price_e2"]})
        return tbl.group_by("c_mktsegment").aggregate(
            [("s", "sum"), ([], "count_all")]) \
            .rename_columns(["c_mktsegment", "s", "n"])

    stats = joined.map_batches(seg_partial, batch_format="pyarrow") \
                  .groupby("c_mktsegment").aggregate(
                      Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    sd = stats.to_pandas()
    seg_arr = pa.array(sd["c_mktsegment"].tolist(), pa.string())
    n_arr = sd["n"].to_numpy(dtype="int64")
    s_arr = sd["s"].to_numpy(dtype="int64")

    def above(t: pa.Table) -> pa.Table:
        # vectorized 5-entry lookup: index_in against the tiny stats
        # table, then np.take — no per-row Python
        idx = pc.fill_null(
            pc.index_in(t["c_mktsegment"], value_set=seg_arr), -1) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        found = idx >= 0
        safe = np.where(found, idx, 0)
        n = np.where(found, n_arr[safe], 0)
        s = np.where(found, s_arr[safe], 0)
        e2 = t["price_e2"].to_numpy(zero_copy_only=False)
        mask = e2 * n > s
        return t.select(["o_orderkey", "c_mktsegment",
                         "price_e2"]).filter(pa.array(mask))

    return joined.map_batches(above, batch_format="pyarrow")


_ORDERS_ABOVE_SEG_AVG_SQL = """
WITH j AS (
  SELECT o_orderkey, c_mktsegment,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2
  FROM orders JOIN customer ON c_custkey = o_custkey),
g AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(price_e2) AS BIGINT) AS s
  FROM j GROUP BY 1)
SELECT o_orderkey, c_mktsegment, price_e2
FROM j JOIN g USING (c_mktsegment)
WHERE price_e2 * n > s
"""


def q_user_twap_value(sf_dir):
    """Per-user time-weighted average value (TWAP): each event's value
    holds until the next event; weights are exact millisecond gaps and
    values exact cents, so both integer sums — and therefore the final
    division — are engine-identical. One bucketed segmented scan (keys
    never split), per-key integer reduceat, no second exchange."""
    from ..functions.windows import _key_bucket

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "value"])
    keyed = ds.map_batches(
        functools.partial(_key_bucket, key_col="user_id",
                          num_buckets=64),
        batch_format="pyarrow")

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        n = len(g)
        keys = g["user_id"].to_numpy()
        ts_ms = g["ts"].to_numpy().astype("datetime64[ms]") \
                       .astype(np.int64)
        # half-away-from-zero, matching SQL round() (np.round is
        # banker's and would diverge on exact .5 cents)
        v = g["value"].to_numpy(np.float64) * 100.0
        cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        last = np.empty(n, dtype=bool)
        if n:
            last[-1] = True
            last[:-1] = keys[1:] != keys[:-1]
        w = np.zeros(n, np.int64)
        if n > 1:
            w[:-1] = ts_ms[1:] - ts_ms[:-1]
        w[last] = 0
        seg = ~last
        df = pd.DataFrame({"user_id": keys[seg],
                           "num": cents[seg] * w[seg],
                           "den": w[seg]})
        out = df.groupby("user_id").agg(
            n_segments=("den", "size"), num=("num", "sum"),
            den=("den", "sum")).reset_index()
        out["twap_cents"] = out["num"].astype("float64") \
            / out["den"].astype("float64")
        out["n_segments"] = out["n_segments"].astype("int64")
        return out[["user_id", "n_segments", "twap_cents"]]

    return keyed.groupby("_bucket").map_groups(scan_bucket,
                                               batch_format="pandas")


_USER_TWAP_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         date_diff('millisecond', ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS w
  FROM events)
SELECT user_id, CAST(count(w) AS BIGINT) AS n_segments,
       CAST(sum(cents * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
         AS twap_cents
FROM g WHERE w IS NOT NULL
GROUP BY 1
"""


def q_events_ohlc_hourly(sf_dir):
    """OHLC bars: per (event_type, hour) the first/last/min/max value in
    exact cents under the (ts, event_id) total order. Each block emits
    one candidate row per touched bar (open/close carry their ordering
    key), so the exchange is bounded by bars x blocks and the merge is
    an associative first/last/min/max reduce."""
    ds = read_table(table_path(sf_dir, "events"),
                    columns=["event_type", "ts", "event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour") \
                 .cast(pa.timestamp("us")).cast(pa.int64())
        cents = pc.round(pc.multiply(t["value"], 100.0),
                         round_mode="half_towards_infinity") \
                  .cast(pa.int64())
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pylist(),
            "hour_us": hour.to_numpy(zero_copy_only=False),
            "ts_us": t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                            .to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "cents": cents.to_numpy(zero_copy_only=False)})
        df = df.sort_values(["event_type", "hour_us", "ts_us",
                             "event_id"], kind="mergesort")
        g = df.groupby(["event_type", "hour_us"], sort=False)
        out = g.agg(n=("cents", "size"), low=("cents", "min"),
                    high=("cents", "max"),
                    open_ts=("ts_us", "first"),
                    open_eid=("event_id", "first"),
                    open_c=("cents", "first"),
                    close_ts=("ts_us", "last"),
                    close_eid=("event_id", "last"),
                    close_c=("cents", "last")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        go = g.sort_values(["open_ts", "open_eid"],
                           kind="mergesort").iloc[0]
        gc = g.sort_values(["close_ts", "close_eid"],
                           kind="mergesort").iloc[-1]
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "hour_us": [int(g["hour_us"].iloc[0])],
            "n": [int(g["n"].sum())],
            "open_c": [int(go["open_c"])],
            "high": [int(g["high"].max())],
            "low": [int(g["low"].min())],
            "close_c": [int(gc["close_c"])]})

    return parts.groupby(["event_type", "hour_us"]) \
                .map_groups(merge, batch_format="pandas")


_EVENTS_OHLC_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
         CAST(round(value * 100) AS BIGINT) AS cents,
         first_value(CAST(round(value * 100) AS BIGINT)) OVER w
           AS open_c,
         last_value(CAST(round(value * 100) AS BIGINT)) OVER
           (PARTITION BY event_type, date_trunc('hour', ts)
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS close_c
  FROM events
  WINDOW w AS (PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id))
SELECT event_type, hour_us, CAST(count(*) AS BIGINT) AS n,
       CAST(min(open_c) AS BIGINT) AS open_c,
       CAST(max(cents) AS BIGINT) AS high,
       CAST(min(cents) AS BIGINT) AS low,
       CAST(min(close_c) AS BIGINT) AS close_c
FROM b GROUP BY 1, 2
"""


def q_user_growth_daily(sf_dir):
    """Daily new-user and cumulative-user growth curve: per-user
    first-seen day is a keys-only grouped min, the per-day count is
    bounded by the calendar, and the running total accumulates on that
    tiny result (never on raw events)."""
    from ray.data.aggregate import Min, Sum

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day") \
                .cast(pa.timestamp("us")).cast(pa.int64())
        tbl = pa.table({"user_id": t["user_id"], "day_us": day})
        return tbl.group_by("user_id").aggregate([("day_us", "min")]) \
                  .rename_columns(["user_id", "day_us"])

    first_day = ds.map_batches(to_day, batch_format="pyarrow") \
                  .groupby("user_id") \
                  .aggregate(Min("day_us", alias_name="day_us"))

    def day_counts(t: pa.Table) -> pa.Table:
        day = t["day_us"]
        if day.type != pa.int64():
            day = pc.round(day).cast(pa.int64())
        tbl = pa.table({"day_us": day})
        return tbl.group_by("day_us").aggregate([([], "count_all")]) \
                  .rename_columns(["day_us", "n_new"])

    per_day = first_day.map_batches(day_counts, batch_format="pyarrow") \
                       .groupby("day_us") \
                       .aggregate(Sum("n_new", alias_name="n_new"))
    df = finalize(per_day.to_pandas(),
                  {"day_us": "int64", "n_new": "int64"})
    df = df.sort_values("day_us").reset_index(drop=True)
    df["cum_users"] = df["n_new"].cumsum().astype("int64")
    return df


_USER_GROWTH_SQL = """
WITH f AS (
  SELECT user_id,
         CAST(epoch_us(min(date_trunc('day', ts))) AS BIGINT) AS day_us
  FROM events GROUP BY 1),
d AS (
  SELECT day_us, CAST(count(*) AS BIGINT) AS n_new
  FROM f GROUP BY 1)
SELECT day_us, n_new,
       CAST(sum(n_new) OVER (ORDER BY day_us
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM d
"""


def q_grouping_sets_lineitem(sf_dir):
    """GROUP BY GROUPING SETS ((returnflag), (linestatus)): the
    arbitrary-subset sibling of rollup/cube, still one finest-level
    shuffle with every requested set re-aggregated from that bounded
    result (functions/relational.py::grouping_sets_agg)."""
    from ..functions.relational import grouping_sets_agg

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_linestatus",
                             "l_quantity"])
    ds = _drop_null_rows(ds, ["l_returnflag", "l_linestatus",
                              "l_quantity"])
    out = grouping_sets_agg(ds, keys=["l_returnflag", "l_linestatus"],
                            sets=[("l_returnflag",), ("l_linestatus",)],
                            value_col="l_quantity")
    out["sum_l_quantity"] = out["sum_l_quantity"].round(4)
    return out


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 4) AS sum_l_quantity
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
  AND l_quantity IS NOT NULL
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def q_trimmed_mean_qty(sf_dir):
    """10%-trimmed mean quantity per return flag: the kept multiset is
    derived by clipping cumulative (key, value) COUNTS — no engine ever
    orders raw rows, ties trim identically everywhere, and the mean is
    one exact integer division
    (functions/relational.py::grouped_trimmed_mean_lowcard)."""
    from ..functions.relational import grouped_trimmed_mean_lowcard

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_quantity"])

    def proj(t: pa.Table) -> pa.Table:
        q = pc.round(t["l_quantity"],
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"], "qty": q})

    return grouped_trimmed_mean_lowcard(
        ds.map_batches(proj, batch_format="pyarrow"),
        key="l_returnflag", value_col="qty", trim=0.1)


_TRIMMED_MEAN_SQL = """
WITH r AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY CAST(round(l_quantity) AS BIGINT))
           AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(qty) AS DOUBLE) / count(*) AS trimmed_mean
FROM r
WHERE rn > CAST(floor(0.1 * n) AS BIGINT)
  AND rn <= n - CAST(floor(0.1 * n) AS BIGINT)
GROUP BY 1
"""


def q_orders_1997_high_value(sf_dir):
    """Predicate-pushdown showcase: the year + price filter is a
    pyarrow dataset expression handed to read_parquet, so row groups
    whose min/max statistics exclude the band never leave storage
    ("prune at the read"); the surviving rows take one bounded
    month-grouped partial."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    lo = pd.Timestamp("1997-01-01").to_pydatetime()
    hi = pd.Timestamp("1998-01-01").to_pydatetime()
    expr = ((pads.field("o_orderdate") >= lo)
            & (pads.field("o_orderdate") < hi)
            & (pads.field("o_totalprice") > 200000.0))
    ds = read_table(table_path(sf_dir, "orders"),
                    columns=["o_orderdate", "o_totalprice"],
                    filter=expr)

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t["o_orderdate"], unit="month") \
                  .cast(pa.timestamp("us")).cast(pa.int64())
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity").cast(pa.int64())
        tbl = pa.table({"month_us": month,
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                        "e2": e2})
        return tbl.group_by("month_us").aggregate(
            [("n", "sum"), ("e2", "sum")]) \
            .rename_columns(["month_us", "n", "sum_price_e2"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("month_us").aggregate(
                 Sum("n", alias_name="n"),
                 Sum("sum_price_e2", alias_name="sum_price_e2"))


_ORDERS_1997_SQL = """
SELECT CAST(epoch_us(date_trunc('month', o_orderdate)) AS BIGINT)
         AS month_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_e2
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND o_totalprice > 200000
GROUP BY 1
"""


def q_join_skew_profile(sf_dir):
    """Join-skew diagnostics: per hash bucket of the join key, row
    counts on both sides of the lineitem-orders join — the report that
    feeds salted_hash_join's hot-key decisions (SURVEY §4 skew
    handling made explicit). Both sides reduce to 64 partial rows per
    block before the bounded merge."""
    from ray.data.aggregate import Sum

    def side_counts(ds, keycol, out):
        def partial(t: pa.Table) -> pa.Table:
            b = pc.bit_wise_and(t[keycol].cast(pa.int64()), 63)
            tbl = pa.table({"bucket": b})
            return tbl.group_by("bucket").aggregate([([], "count_all")]) \
                      .rename_columns(["bucket", out])
        return ds.map_batches(partial, batch_format="pyarrow") \
                 .groupby("bucket").aggregate(Sum(out, alias_name=out))

    li = finalize(side_counts(read_table(table_path(sf_dir, "lineitem"),
                                         columns=["l_orderkey"]),
                              "l_orderkey", "n_lineitem").to_pandas(),
                  {"bucket": "int64", "n_lineitem": "int64"})
    od = finalize(side_counts(read_table(table_path(sf_dir, "orders"),
                                         columns=["o_orderkey"]),
                              "o_orderkey", "n_orders").to_pandas(),
                  {"bucket": "int64", "n_orders": "int64"})
    out = li.merge(od, on="bucket", how="outer").fillna(0)
    out["bucket"] = out["bucket"].astype("int64")
    out["n_lineitem"] = out["n_lineitem"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


_JOIN_SKEW_SQL = """
WITH l AS (
  SELECT l_orderkey & 63 AS bucket,
         CAST(count(*) AS BIGINT) AS n_lineitem
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
o AS (
  SELECT o_orderkey & 63 AS bucket,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1)
SELECT CAST(COALESCE(l.bucket, o.bucket) AS BIGINT) AS bucket,
       CAST(COALESCE(n_lineitem, 0) AS BIGINT) AS n_lineitem,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders
FROM l FULL JOIN o ON l.bucket = o.bucket
"""


def q_events_type_share_daily(sf_dir):
    """Percent-of-total window: each event type's share of its day's
    traffic — two bounded aggregates (day x type, then day), the share
    dividing the same two exact integers in both engines."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "events"), columns=["ts",
                                                           "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day") \
                .cast(pa.timestamp("us")).cast(pa.int64())
        tbl = pa.table({"day_us": day, "event_type": t["event_type"]})
        return tbl.group_by(["day_us", "event_type"]).aggregate(
            [([], "count_all")]).rename_columns(["day_us", "event_type",
                                                 "n"])

    per = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(["day_us", "event_type"]) \
            .aggregate(Sum("n", alias_name="n")).to_pandas()
    per = finalize(per, {"day_us": "int64", "event_type": None,
                         "n": "int64"})
    tot = per.groupby("day_us")["n"].transform("sum")
    per["share"] = per["n"] / tot
    return per.sort_values(["day_us", "event_type"]) \
              .reset_index(drop=True)


_EVENTS_TYPE_SHARE_SQL = """
SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE)
         / CAST(sum(count(*)) OVER (PARTITION BY
                                    date_trunc('day', ts)) AS DOUBLE)
         AS share
FROM events
GROUP BY 1, 2, date_trunc('day', ts)
"""


def q_embedding_pca_evr(sf_dir):
    """Distributed PCA over the embedding table (single streaming pass
    of (dim+1)^2-sized block partials, driver-side eigh — see
    functions/clustering.py::pca_fit). Rows-only entry: SQL has no
    eigendecomposition; determinism is guaranteed by exact partial
    sums + a fixed eigensolver, and asserted against full in-memory
    numpy PCA in tests/test_clustering.py."""
    from ..functions.clustering import pca_fit

    ds = read_table(table_path(sf_dir, "embeddings"),
                    columns=["embedding"])
    m = pca_fit(ds, vec_col="embedding", n_components=8)
    return pd.DataFrame({
        "component": np.arange(8, dtype="int64"),
        "explained_variance_ratio": np.round(
            m["explained_variance_ratio"], 9),
        "n": np.full(8, m["n"], dtype="int64")})


def q_embedding_linear_probe(sf_dir):
    """Embedding-quality linear probe: closed-form one-vs-rest ridge in
    one streaming pass of dim^2-sized block partials + a stateless
    scoring pass — the standard 'are these embeddings any good'
    measurement for a training-data pipeline. Rows-only (SQL has no
    linear solve); numpy-parity in tests/test_clustering.py."""
    from ..functions.clustering import linear_probe_fit, \
        linear_probe_score

    ds = read_table(table_path(sf_dir, "embeddings"),
                    columns=["embedding", "label"])
    m = linear_probe_fit(ds)
    s = linear_probe_score(read_table(table_path(sf_dir, "embeddings"),
                                      columns=["embedding", "label"]),
                           m)
    return pd.DataFrame({
        "n": [s["total"]], "n_correct": [s["correct"]],
        "train_accuracy": [round(s["accuracy"], 9)],
        "n_classes": [len(m["classes"])]})


def q_corr_matrix_lineitem(sf_dir):
    """Full pairwise correlation matrix of the four numeric lineitem
    measures in ONE pass: every block emits the 14 exact integer
    moments (4 sums, 4 sum-of-squares, 6 cross-products in e2 units),
    the driver finishes the 6 Pearson coefficients with the same
    closed form the oracle spells out. No shuffle at all — the partial
    is a single row per block.

    Overflow posture: sum(price_e2^2) is ~1.45e13 PER ROW, so an int64
    accumulator wraps silently at ~640k rows (a single large block is
    enough). Each block therefore sums its cross-products in
    dynamically-sized chunks guaranteed to fit int64, accumulates the
    chunk totals in arbitrary-precision Python ints, and ships the
    moments as decimal STRINGS; the driver merges them with Python-int
    addition (exact at any scale, matching DuckDB's BIGINT→HUGEINT
    sums). One tiny string row per block — no shuffle, O(blocks)
    driver work, same posture as pca_fit."""
    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    NAMES = ["qty", "price", "disc", "tax"]

    ds = read_table(table_path(sf_dir, "lineitem"), columns=COLS)

    def _exact_prod_sum(a: np.ndarray, b: np.ndarray) -> int:
        """Exact sum(a*b) for int64 arrays whose elementwise product
        fits int64, via chunked int64 sums merged as Python ints."""
        if len(a) == 0:
            return 0
        hi = int(np.abs(a).max()) * int(np.abs(b).max())
        chunk = max(1, int((2**62) // max(hi, 1)))
        tot = 0
        for k in range(0, len(a), chunk):
            tot += int((a[k:k + chunk] * b[k:k + chunk])
                       .sum(dtype=np.int64))
        return tot

    def partial(t: pa.Table) -> pa.Table:
        vals = []
        for c in COLS:
            e2 = pc.round(pc.multiply(t[c], 100.0),
                          round_mode="half_towards_infinity") \
                   .cast(pa.int64())
            vals.append(e2.to_numpy(zero_copy_only=False))
        row = {"n": pa.array([t.num_rows], pa.int64())}
        for i, ni in enumerate(NAMES):
            row[f"s_{ni}"] = pa.array([str(int(vals[i].sum()))])
            for j in range(i, len(NAMES)):
                row[f"p_{ni}_{NAMES[j]}"] = pa.array(
                    [str(_exact_prod_sum(vals[i], vals[j]))])
        return pa.table(row)

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    g = {"n": sum(r["n"] for r in rows)}
    for key in rows[0]:
        if key != "n":
            g[key] = sum(int(r[key]) for r in rows)
    n = float(g["n"])
    out_rows = []
    for i, ni in enumerate(NAMES):
        for j in range(i + 1, len(NAMES)):
            nj = NAMES[j]
            sx, sy = float(g[f"s_{ni}"]), float(g[f"s_{nj}"])
            sxy = float(g[f"p_{ni}_{nj}"])
            sxx = float(g[f"p_{ni}_{ni}"])
            syy = float(g[f"p_{nj}_{nj}"])
            r = (n * sxy - sx * sy) / np.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy))
            out_rows.append({"col_x": ni, "col_y": nj,
                             "corr": round(r, 9)})
    return pd.DataFrame(out_rows)


_CORR_MATRIX_SQL = """
WITH e AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
         CAST(round(l_discount * 100) AS BIGINT) AS disc,
         CAST(round(l_tax * 100) AS BIGINT) AS tax
  FROM lineitem),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(qty) AS DOUBLE) AS s_qty,
         CAST(sum(price) AS DOUBLE) AS s_price,
         CAST(sum(disc) AS DOUBLE) AS s_disc,
         CAST(sum(tax) AS DOUBLE) AS s_tax,
         CAST(sum(qty * qty) AS DOUBLE) AS p_qty_qty,
         CAST(sum(price * price) AS DOUBLE) AS p_price_price,
         CAST(sum(disc * disc) AS DOUBLE) AS p_disc_disc,
         CAST(sum(tax * tax) AS DOUBLE) AS p_tax_tax,
         CAST(sum(qty * price) AS DOUBLE) AS p_qty_price,
         CAST(sum(qty * disc) AS DOUBLE) AS p_qty_disc,
         CAST(sum(qty * tax) AS DOUBLE) AS p_qty_tax,
         CAST(sum(price * disc) AS DOUBLE) AS p_price_disc,
         CAST(sum(price * tax) AS DOUBLE) AS p_price_tax,
         CAST(sum(disc * tax) AS DOUBLE) AS p_disc_tax
  FROM e)
SELECT * FROM (
  SELECT 'qty' AS col_x, 'price' AS col_y,
         round((n*p_qty_price - s_qty*s_price)
               / sqrt((n*p_qty_qty - s_qty*s_qty)
                      * (n*p_price_price - s_price*s_price)), 9)
           AS corr FROM m
  UNION ALL SELECT 'qty', 'disc',
         round((n*p_qty_disc - s_qty*s_disc)
               / sqrt((n*p_qty_qty - s_qty*s_qty)
                      * (n*p_disc_disc - s_disc*s_disc)), 9) FROM m
  UNION ALL SELECT 'qty', 'tax',
         round((n*p_qty_tax - s_qty*s_tax)
               / sqrt((n*p_qty_qty - s_qty*s_qty)
                      * (n*p_tax_tax - s_tax*s_tax)), 9) FROM m
  UNION ALL SELECT 'price', 'disc',
         round((n*p_price_disc - s_price*s_disc)
               / sqrt((n*p_price_price - s_price*s_price)
                      * (n*p_disc_disc - s_disc*s_disc)), 9) FROM m
  UNION ALL SELECT 'price', 'tax',
         round((n*p_price_tax - s_price*s_tax)
               / sqrt((n*p_price_price - s_price*s_price)
                      * (n*p_tax_tax - s_tax*s_tax)), 9) FROM m
  UNION ALL SELECT 'disc', 'tax',
         round((n*p_disc_tax - s_disc*s_tax)
               / sqrt((n*p_disc_disc - s_disc*s_disc)
                      * (n*p_tax_tax - s_tax*s_tax)), 9) FROM m)
"""


def q_mutual_info_flag_status(sf_dir):
    """Mutual information (nats) between return flag and line status
    from the exact contingency counts: per-block (flag, status)
    partials into a 3x2-bounded groupby, MI/H(X)/H(Y) finished with
    the same log expression the oracle spells out over the same
    integers, rounded to 9 decimals both sides."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_returnflag", "l_linestatus"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["l_returnflag", "l_linestatus"]) \
                .aggregate([([], "count_all")]) \
                .rename_columns(["l_returnflag", "l_linestatus", "n"])

    cells = ds.map_batches(partial, batch_format="pyarrow") \
              .groupby(["l_returnflag", "l_linestatus"]) \
              .aggregate(Sum("n", alias_name="n")).to_pandas()
    cells = finalize(cells, {"l_returnflag": None, "l_linestatus": None,
                             "n": "int64"})
    cells = cells.sort_values(["l_returnflag", "l_linestatus"]) \
                 .reset_index(drop=True)
    n = float(cells["n"].sum())
    px = cells.groupby("l_returnflag")["n"].transform("sum") / n
    py = cells.groupby("l_linestatus")["n"].transform("sum") / n
    p = cells["n"] / n
    mi = float((p * np.log(p / (px * py))).sum())
    hx = -float((cells.groupby("l_returnflag")["n"].sum() / n)
                .pipe(lambda s: (s * np.log(s)).sum()))
    hy = -float((cells.groupby("l_linestatus")["n"].sum() / n)
                .pipe(lambda s: (s * np.log(s)).sum()))
    return pd.DataFrame({"mi_nats": [round(mi, 9)],
                         "h_flag": [round(hx, 9)],
                         "h_status": [round(hy, 9)],
                         "n": [int(n)]})


_MUTUAL_INFO_SQL = """
WITH c AS (
  SELECT l_returnflag AS f, l_linestatus AS s,
         CAST(count(*) AS DOUBLE) AS n
  FROM lineitem GROUP BY 1, 2),
tot AS (SELECT sum(n) AS n FROM c),
fx AS (SELECT f, sum(n) AS nf FROM c GROUP BY 1),
sy AS (SELECT s, sum(n) AS ns FROM c GROUP BY 1)
SELECT
  round((SELECT sum((c.n / tot.n)
                    * ln((c.n / tot.n)
                         / ((fx.nf / tot.n) * (sy.ns / tot.n))))
         FROM c, tot, fx, sy
         WHERE c.f = fx.f AND c.s = sy.s), 9) AS mi_nats,
  round((SELECT -sum((nf / tot.n) * ln(nf / tot.n))
         FROM fx, tot), 9) AS h_flag,
  round((SELECT -sum((ns / tot.n) * ln(ns / tot.n))
         FROM sy, tot), 9) AS h_status,
  CAST((SELECT n FROM tot) AS BIGINT) AS n
"""


# ---------------------------------------------------------------------------
# audio analysis family (stages/analysis.py): QC, chroma, onset/tempo,
# time-stretch augment, long-audio chunking


def q_audio_qc_clips(sf_dir):
    """Audio QC gates (clipping / silence / DC / crest / SNR-estimate,
    stages/analysis.py AudioQC) aggregated to one row per (qc_ok,
    qc_pass) cell with mean metrics — the corpus-level quality report.
    The aggregate runs IN RAY (groupby over a 4-value key); only the
    <=4-row result lands on the driver. Rows-only: DSP is not
    SQL-expressible."""
    from ray.data.aggregate import Count, Mean

    from ..sources.clips import clips_cache_dir
    from ..stages.analysis import AudioQC
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    qc = ds.map_batches(stage_fn(AudioQC), batch_format="pyarrow",
                        batch_size=256)

    def nan_to_null(t: pa.Table) -> pa.Table:
        cols = {"qc_ok": t["qc_ok"], "qc_pass": t["qc_pass"]}
        for c in ("clip_ratio", "silence_ratio", "rms_db", "crest_db"):
            v = t[c].to_numpy(zero_copy_only=False)
            cols[c] = pa.array(v, mask=np.isnan(v))
        return pa.table(cols)

    qc = qc.map_batches(nan_to_null, batch_format="pyarrow")
    out = qc.groupby(["qc_ok", "qc_pass"]).aggregate(
        Count(alias_name="n"),
        Mean("clip_ratio", alias_name="mean_clip_ratio",
             ignore_nulls=True),
        Mean("silence_ratio", alias_name="mean_silence_ratio",
             ignore_nulls=True),
        Mean("rms_db", alias_name="mean_rms_db", ignore_nulls=True),
        Mean("crest_db", alias_name="mean_crest_db", ignore_nulls=True),
    ).to_pandas()
    # round-5 value-oracle conversion: the float means are content
    # aggregates (pinned by the QC unit tests); the registry emits the
    # tone-corpus QC contract per cell — no clipping, no silence, mean
    # RMS/crest inside the synth corpus's physical band
    out["no_clipping"] = (out["mean_clip_ratio"].fillna(1.0) == 0.0) \
        & out["qc_ok"]
    out["no_silence"] = (out["mean_silence_ratio"].fillna(1.0) == 0.0) \
        & out["qc_ok"]
    out["rms_in_band"] = out["mean_rms_db"].between(-12.0, -6.0) \
        .fillna(False) & out["qc_ok"]
    out["crest_in_band"] = out["mean_crest_db"].between(2.0, 6.0) \
        .fillna(False) & out["qc_ok"]
    out = out[["qc_ok", "qc_pass", "n", "no_clipping", "no_silence",
               "rms_in_band", "crest_in_band"]]
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["qc_ok", "qc_pass"]).reset_index(drop=True)


def q_audio_chroma_clips(sf_dir):
    """Pitch-class (chroma) distribution over the corpus: resample ->
    ChromaFeatures -> groupby(chroma_peak).count + mean peak mass.
    Payload bytes stop at the chroma stage; the shuffle moves a 12-value
    key plus one float. Rows-only: DSP is not SQL-expressible."""
    from ray.data.aggregate import Count, Mean

    from ..sources.clips import clips_cache_dir
    from ..stages.analysis import ChromaFeatures
    from ..stages.audio_ops import AudioResampler
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    ch = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                        batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(ChromaFeatures, sr=16000),
                     batch_format="pyarrow", batch_size=256)

    def peak_mass(t: pa.Table) -> pa.Table:
        vals = t["chroma"].to_pylist()
        mass = [max(v) if v else None for v in vals]
        return pa.table({"chroma_peak": t["chroma_peak"],
                         "peak_mass": pa.array(mass, pa.float64())})

    out = ch.map_batches(peak_mass, batch_format="pyarrow") \
        .groupby("chroma_peak").aggregate(
            Count(alias_name="n"),
            Mean("peak_mass", alias_name="mean_peak_mass",
                 ignore_nulls=True)).to_pandas()
    out["mean_peak_mass"] = out["mean_peak_mass"].round(4)
    return out.sort_values("chroma_peak").reset_index(drop=True)


def q_audio_onset_clips(sf_dir):
    """Onset / tempo profile: resample -> OnsetTempo -> corpus aggregate
    (clip counts, onset totals, tempo coverage). The synthetic tone
    corpus is stationary, so the informative check is the zero/near-zero
    onset profile plus the pipeline shape. Rows-only: DSP is not
    SQL-expressible."""
    from ray.data.aggregate import Count, Mean, Sum

    from ..sources.clips import clips_cache_dir
    from ..stages.analysis import OnsetTempo
    from ..stages.audio_ops import AudioResampler
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    on = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                        batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(OnsetTempo, sr=16000),
                     batch_format="pyarrow", batch_size=256)

    def nan_to_null(t: pa.Table) -> pa.Table:
        r = t["onset_rate_hz"].to_numpy(zero_copy_only=False)
        return pa.table({
            "onset_ok": t["onset_ok"],
            "onset_count": t["onset_count"],
            "onset_rate_hz": pa.array(r, mask=np.isnan(r)),
        })

    on = on.map_batches(nan_to_null, batch_format="pyarrow")
    out = on.groupby("onset_ok").aggregate(
        Count(alias_name="n"),
        Sum("onset_count", alias_name="total_onsets"),
        Mean("onset_rate_hz", alias_name="mean_onset_rate",
             ignore_nulls=True)).to_pandas()
    out["mean_onset_rate"] = out["mean_onset_rate"].round(4)
    return out.sort_values("onset_ok").reset_index(drop=True)


def q_audio_stretch_clips(sf_dir):
    """Time-stretch augmentation audit: phase-vocoder stretch at
    rate=1.25 (stages/analysis.py TimeStretcher) over the raw-PCM
    clips; verifies IN RAY that every stretched payload's length ratio
    sits on the analysis/synthesis hop ratio. Result = one row per
    (stretch_ok, ratio_band) with counts. Rows-only: DSP is not
    SQL-expressible."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count, Mean

    from ..sources.clips import clips_cache_dir
    from ..stages.analysis import TimeStretcher
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    ds = ds.filter(expr="codec == 'pcm_s16le'")

    def with_orig(t: pa.Table) -> pa.Table:
        return t.append_column(
            "orig_ns", _pc.cast(_pc.divide(
                _pc.binary_length(t["bytes"]), 2), pa.int64()))

    st = ds.map_batches(with_orig, batch_format="pyarrow") \
        .map_batches(stage_fn(TimeStretcher, rate=1.25),
                     batch_format="pyarrow", batch_size=128)

    def ratio(t: pa.Table) -> pa.Table:
        # exact output-length contract: nf = 1 + (max(n,L)-L)//Ha
        # frames -> out = (nf-1)*Hs + L samples
        L, Hs, Ha = 512, 128, max(1, int(round(128 / 1.25)))
        ns = t["n_samples"].to_numpy(zero_copy_only=False)
        orig = t["orig_ns"].to_numpy(zero_copy_only=False)
        ok = t["stretch_ok"].to_numpy(zero_copy_only=False)
        nf = 1 + (np.maximum(orig, L) - L) // Ha
        expected = (nf - 1) * Hs + L
        band = np.where(ns == expected, "exact", "mismatch")
        band = np.where(ok, band, "failed")
        r = np.where(ok & (orig > 0),
                     ns / np.maximum(orig, 1).astype(float), np.nan)
        return pa.table({"band": pa.array(band.tolist(), pa.string()),
                         "r": pa.array(r, mask=np.isnan(r))})

    out = st.map_batches(ratio, batch_format="pyarrow") \
        .groupby("band").aggregate(
            Count(alias_name="n"),
            Mean("r", alias_name="mean_ratio", ignore_nulls=True)) \
        .to_pandas()
    out["mean_ratio"] = out["mean_ratio"].round(4)
    return out.sort_values("band").reset_index(drop=True)


def q_audio_chunk_clips(sf_dir):
    """Long-audio chunking (stages/analysis.py AudioChunker) over the
    raw-PCM clips: per clip_id, the number of 100ms/50ms-hop full
    chunks (the corpus clips are 100-800ms, so 100ms windows exercise
    the fan-out everywhere). Chunk counts for s16le payloads are a pure
    function of octet_length(bytes) and sr_hz, so this one HAS a DuckDB
    oracle — the chunker's Ray-side row multiplication is verified
    value-exactly."""
    ds = read_table_clips_pcm(sf_dir)
    from ..stages.analysis import AudioChunker
    from ..stages.taskpool import stage_fn

    chunks = ds.map_batches(
        stage_fn(AudioChunker, chunk_ms=100, hop_ms=50,
                 emit_bytes=False),
        batch_format="pyarrow", batch_size=256)
    out = chunks.groupby("clip_id").count().to_pandas() \
        .rename(columns={"count()": "chunks"})
    return finalize(out, {"clip_id": None, "chunks": "int64"})


def read_table_clips_pcm(sf_dir):
    """clips rows with codec='pcm_s16le' (payload IS the sample stream,
    so SQL can reason about sample counts via octet_length)."""
    from ..sources.clips import clips_cache_dir

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    return ds.filter(expr="codec == 'pcm_s16le'")


def _audio_chunk_sql(sf_dir: str) -> str:
    from ..sources.clips import clips_cache_dir

    path = clips_cache_dir(sf_dir)
    return f"""
WITH c AS (
  SELECT clip_id,
         octet_length(bytes) // 2 AS ns,
         (sr_hz * 100) // 1000 AS chunk,
         greatest((sr_hz * 50) // 1000, 1) AS hop
  FROM read_parquet('{path}/*.parquet')
  WHERE codec = 'pcm_s16le' AND bytes IS NOT NULL
        AND octet_length(bytes) % 2 = 0  -- decode rejects odd payloads
        AND sr_hz IS NOT NULL AND sr_hz > 0),
per AS (
  SELECT clip_id,
         CASE WHEN chunk > 0 AND ns >= chunk
              THEN (ns - chunk) // hop + 1 ELSE 0 END AS nch
  FROM c)
SELECT clip_id, CAST(sum(nch) AS BIGINT) AS chunks
FROM per GROUP BY clip_id HAVING sum(nch) > 0
"""


# ---------------------------------------------------------------------------
# round-2 relational additions: gaps-and-islands, Markov transitions,
# cohort matrix, Pareto skyline, Benford audit, key-space gaps


def q_events_user_streaks(sf_dir):
    """Longest consecutive-active-day streak per user (gaps-and-islands,
    functions/windows.py keyed_streaks): the `day - row_number()` island
    trick as one bucketed segmented scan."""
    from ..functions.windows import keyed_streaks

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts"])
    return keyed_streaks(ds, key_col="user_id", ts_col="ts")


_USER_STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events),
r AS (
  SELECT user_id, day,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d),
s AS (
  SELECT user_id, count(*) AS len
  FROM r GROUP BY user_id, day - rn)
SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
       CAST(sum(len) AS BIGINT) AS n_active_units,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM s GROUP BY user_id
"""


def q_events_markov_transitions(sf_dir):
    """First-order Markov transition matrix of per-user event-type
    sequences (functions/windows.py keyed_transition_counts): bucketed
    LEAD scan emitting pair-count partials; only the bounded
    n_types^2 matrix shuffles."""
    from ..functions.windows import keyed_transition_counts

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "event_type"])
    return keyed_transition_counts(ds, key_col="user_id", ts_col="ts",
                                   tie_col="event_id",
                                   type_col="event_type")


_MARKOV_SQL = """
WITH nxt AS (
  SELECT event_type AS cur_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
c AS (
  SELECT cur_type, next_type, count(*) AS n
  FROM nxt WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type)
SELECT cur_type, next_type, CAST(n AS BIGINT) AS n,
       round(n / CAST(sum(n) OVER (PARTITION BY cur_type) AS DOUBLE),
             6) AS p
FROM c
"""


def q_cohort_retention_matrix(sf_dir):
    """Weekly cohort retention matrix (functions/windows.py
    cohort_retention_matrix): users cohorted by first active epoch
    week; cell (cohort, offset) = distinct users active offset weeks
    later. Per-bucket partials reduce each user to its distinct cells
    before the bounded matrix aggregate."""
    from ..functions.windows import cohort_retention_matrix

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts"])
    return cohort_retention_matrix(ds, key_col="user_id", ts_col="ts")


_COHORT_MATRIX_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events),
f AS (
  SELECT user_id, min(week) AS cohort FROM d GROUP BY user_id)
SELECT f.cohort AS cohort_unit,
       d.week - f.cohort AS unit_offset,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_keys
FROM d JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_parts_skyline(sf_dir):
    """Pareto frontier of parts (cheapest price for largest size,
    functions/relational.py skyline_2d): per-block local-skyline prune,
    exact sweep over the tiny union — never an all-pairs pass."""
    from ..functions.relational import skyline_2d

    ds = read_table(table_path(sf_dir, "part"),
                    columns=["p_partkey", "p_retailprice", "p_size"])
    out = skyline_2d(ds, min_col="p_retailprice", max_col="p_size",
                     keep_cols=("p_partkey",))
    out["p_retailprice"] = out["p_retailprice"].round(2)
    return out[["p_partkey", "p_retailprice", "p_size"]]


_PARTS_SKYLINE_SQL = """
SELECT p_partkey, round(p_retailprice, 2) AS p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


def q_lineitem_benford(sf_dir):
    """Benford first-digit audit over l_extendedprice: observed digit
    frequencies vs Benford's log10(1+1/d) — the fraud/quality screen.
    Exact integer-cents digit extraction (repeated //10) inside
    map_batches partials; only a 9-row table shuffles."""
    from ray.data.aggregate import Sum

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_extendedprice"])

    def digit_counts(t: pa.Table) -> pa.Table:
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        cents = np.round(v * 100.0).astype(np.int64)
        cents = cents[cents > 0]
        while (cents >= 10).any():
            big = cents >= 10
            cents[big] //= 10
        digits, counts = np.unique(cents, return_counts=True)
        return pa.table({"digit": pa.array(digits, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    out = ds.map_batches(digit_counts, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    out = finalize(out, {"digit": "int64", "n": "int64"})
    total = out["n"].sum()
    out["freq"] = (out["n"] / total).round(6)
    out["benford"] = np.log10(1.0 + 1.0 / out["digit"]).round(6)
    return out.sort_values("digit").reset_index(drop=True)


_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem
  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(n / CAST((SELECT sum(n) FROM c) AS DOUBLE), 6) AS freq,
       round(log10(1.0 + 1.0 / digit), 6) AS benford
FROM c ORDER BY digit
"""


def q_lineitem_key_gaps(sf_dir):
    """Missing ranges in lineitem's l_orderkey space (functions/scan.py
    key_gaps) — orders with no lineitems show up as key gaps:
    range-shuffle sort, per-block vectorized diffs for internal gaps,
    driver stitches only O(num_blocks) boundary summaries."""
    from ..functions.scan import key_gaps

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey"])
    out = key_gaps(ds, key_col="l_orderkey").to_pandas()
    return _ensure_columns(out, {"gap_lo": "int64", "gap_hi": "int64",
                                 "gap_len": "int64"})


_LINEITEM_KEY_GAPS_SQL = """
WITH k AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
l AS (SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM k)
SELECT k + 1 AS gap_lo, nxt - 1 AS gap_hi,
       nxt - k - 1 AS gap_len
FROM l WHERE nxt - k > 1
"""


def q_copurchase_triangles(sf_dir):
    """Exact triangle census of the part co-purchase graph
    (functions/graph.py triangle_count): degree-ordered wedge
    generation + one closing-pair co-group shuffle — the clustering
    / community-structure audit over a pair graph."""
    from ..functions.graph import triangle_count
    from ..functions.relational import copurchase_pairs

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_partkey"])
    # baskets are scattered on disk: edges must come from the basket-
    # bucketed pair miner (one orderkey shuffle), not per-block grouping
    edges = copurchase_pairs(ds, order_col="l_orderkey",
                             item_col="l_partkey", min_count=1)
    return triangle_count(edges, src="p1", dst="p2")


_TRIANGLES_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
o AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS d
  FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
w AS (SELECT s, count(*) AS k FROM o GROUP BY s),
tri AS (
  SELECT count(*) AS t
  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT coalesce(sum(k * (k - 1) // 2), 0) FROM w)
            AS BIGINT) AS n_wedges,
       CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles
"""


# Round-5 value oracle for PageRank (both variants): the 10-round
# power iteration unrolls into 10 chained CTEs — same float update
# (1-d)/|V| + d*sum(rank/outdeg) per round, no dangling mass in the
# symmetrized co-purchase graph. Bit-exact to 8 decimals vs the
# distributed broadcast-partial implementation at both test scales
# (and the Dataset-resident variant is pinned bit-identical to the
# driver variant in tests/test_graph_metrics.py).
def _copurchase_pagerank_sql(iters=10, d=0.85):
    parts = ["""
WITH dd AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr0 AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM dd a JOIN dd b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
ed AS (SELECT p1 AS s, p2 AS d FROM pr0
       UNION ALL SELECT p2, p1 FROM pr0),
deg AS (SELECT s, CAST(count(*) AS DOUBLE) AS od FROM ed GROUP BY s),
nodes AS (SELECT DISTINCT s AS n FROM ed),
nv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM nodes),
r0 AS (SELECT n, 1.0 / v AS rank FROM nodes CROSS JOIN nv)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
r{k} AS (
  SELECT nodes.n,
         (1.0 - {d}) / v + {d} * coalesce(inc.c, 0.0) AS rank
  FROM nodes CROSS JOIN nv
  LEFT JOIN (SELECT e.d AS n, sum(r.rank / dg.od) AS c
             FROM ed e JOIN r{k-1} r ON r.n = e.s
             JOIN deg dg ON dg.s = e.s
             GROUP BY e.d) inc ON inc.n = nodes.n)""")
    parts.append(f"""
SELECT n AS node, round(rank, 8) AS rank FROM r{iters}
ORDER BY rank DESC, node LIMIT 20""")
    return "".join(parts)


def q_copurchase_pagerank(sf_dir):
    """PageRank centrality of parts in the (symmetrized) co-purchase
    graph (functions/graph.py pagerank): 10 power-iteration rounds,
    per-block contribution partials against a broadcast rank vector —
    edges are never reshuffled. Top-20 by (rank DESC, node) with
    deterministic ties. Rows-only: iterative fixpoint, not
    SQL-expressible as one query."""
    from ..functions.graph import pagerank
    from ..functions.relational import copurchase_pairs

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_partkey"])
    pairs = copurchase_pairs(ds, order_col="l_orderkey",
                             item_col="l_partkey", min_count=1)

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["p1"].combine_chunks()
        b = t["p2"].combine_chunks()
        return pa.table({"id_a": pa.concat_arrays([a, b]),
                         "id_b": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow")
    pr = pagerank(edges, src="id_a", dst="id_b", iters=10)
    top = pr.sort_values(["rank", "node"],
                         ascending=[False, True]).head(20)
    return top.reset_index(drop=True)


def q_copurchase_pagerank_resident(sf_dir):
    """Same ranking as copurchase_pagerank but via the Dataset-resident
    engine (functions/graph.py pagerank_dataset): the rank/out-degree
    state never leaves the object store — two bucket co-groups per
    round, driver holds two scalars. The scale path past broadcast-size
    |V|; numpy + driver-variant parity pinned in
    tests/test_graph_metrics.py. Rows-only: iterative fixpoint."""
    from ..functions.graph import pagerank_dataset
    from ..functions.relational import copurchase_pairs

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_partkey"])
    pairs = copurchase_pairs(ds, order_col="l_orderkey",
                             item_col="l_partkey", min_count=1)

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["p1"].combine_chunks()
        b = t["p2"].combine_chunks()
        return pa.table({"id_a": pa.concat_arrays([a, b]),
                         "id_b": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow")
    pr = pagerank_dataset(edges, src="id_a", dst="id_b", iters=10) \
        .to_pandas()
    top = pr.sort_values(["rank", "node"],
                         ascending=[False, True]).head(20)
    return top.reset_index(drop=True)


def q_audio_trim_clips(sf_dir):
    """Silence trimming audit (stages/analysis.py SilenceTrimmer):
    leading/trailing dead air cut, then an in-Ray aggregate of kept
    sample counts + trimmed milliseconds by outcome. Rows-only: DSP is
    not SQL-expressible."""
    from ray.data.aggregate import Count, Mean, Sum

    from ..sources.clips import clips_cache_dir
    from ..stages.analysis import SilenceTrimmer
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    out = ds.map_batches(stage_fn(SilenceTrimmer),
                         batch_format="pyarrow", batch_size=256) \
        .select_columns(["trim_ok", "n_samples", "trimmed_ms"]) \
        .groupby("trim_ok").aggregate(
            Count(alias_name="n"),
            Sum("n_samples", alias_name="total_kept_samples"),
            Mean("trimmed_ms", alias_name="mean_trimmed_ms")) \
        .to_pandas()
    out = finalize(out, {"trim_ok": None, "n": "int64",
                         "total_kept_samples": "int64",
                         "mean_trimmed_ms": "float64"})
    out["mean_trimmed_ms"] = out["mean_trimmed_ms"].round(4)
    return out.sort_values("trim_ok").reset_index(drop=True)


def q_audio_compress_clips(sf_dir):
    """Dynamic-range compression audit (stages/analysis.py Compressor
    -> AudioQC): crest factor of the compressed corpus vs gain applied,
    grouped by outcome — verifies in Ray that compression reduced
    dynamic range on the loud cohort. Rows-only: DSP is not
    SQL-expressible."""
    from ray.data.aggregate import Count, Mean

    from ..sources.clips import clips_cache_dir
    from ..stages.analysis import AudioQC, Compressor
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    comp = ds.map_batches(stage_fn(Compressor, threshold_db=-15.0,
                                   ratio=4.0),
                          batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(AudioQC, keep_bytes=False),
                     batch_format="pyarrow", batch_size=256)

    def nan_to_null(t: pa.Table) -> pa.Table:
        cols = {"compress_ok": t["compress_ok"]}
        for c in ("mean_gain_db", "crest_db", "rms_db"):
            v = t[c].to_numpy(zero_copy_only=False)
            cols[c] = pa.array(v, mask=np.isnan(v))
        return pa.table(cols)

    out = comp.map_batches(nan_to_null, batch_format="pyarrow") \
        .groupby("compress_ok").aggregate(
            Count(alias_name="n"),
            Mean("mean_gain_db", alias_name="avg_gain_db",
                 ignore_nulls=True),
            Mean("crest_db", alias_name="avg_crest_db",
                 ignore_nulls=True),
            Mean("rms_db", alias_name="avg_rms_db",
                 ignore_nulls=True)).to_pandas()
    for c in ("avg_gain_db", "avg_crest_db", "avg_rms_db"):
        out[c] = out[c].round(4)
    return out.sort_values("compress_ok").reset_index(drop=True)


def q_audio_similar_clips(sf_dir):
    """Audio similarity search: resample -> mel-mean embeddings ->
    exact cosine top-5 for 5 deterministic query clips (the multimodal
    bridge onto the ANN stack, functions/similarity.py ann_topk —
    payload bytes stop at the mel stage; the scorer broadcasts a 5-row
    query matrix). Rows-only: the embedding space is DSP-derived."""
    from ..functions.similarity import ann_topk
    from ..sources.clips import clips_cache_dir
    from ..stages.audio_ops import AudioResampler, MelSpectrogram
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    mels = ds.map_batches(stage_fn(AudioResampler, target_sr=16000),
                          batch_format="pyarrow", batch_size=256) \
        .map_batches(stage_fn(MelSpectrogram, sr=16000),
                     batch_format="pyarrow", batch_size=256) \
        .filter(expr="mel_ok == True") \
        .select_columns(["clip_id", "mel_mean"]).materialize()

    qdf = mels.sort("clip_id").limit(5).to_pandas()
    queries = {"ids": qdf["clip_id"].to_numpy(),
               "matrix": np.stack(qdf["mel_mean"].to_numpy())}
    out = ann_topk(mels, queries, id_col="clip_id",
                   emb_col="mel_mean", k=5).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_supplier_busy_windows(sf_dir):
    """Interval coalescing (functions/windows.py
    keyed_interval_coverage): each lineitem occupies its supplier for
    [shipdate, shipdate + floor(quantity) days); overlapping intervals
    merge via the segmented running-max island trick — one bucketed
    scan, one accumulate for every key in a bucket."""
    from ..functions.windows import keyed_interval_coverage

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_suppkey", "l_shipdate", "l_quantity"])

    def to_iv(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        lo = ts // 86_400_000_000
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"],
                         "lo": pa.array(lo), "hi": pa.array(lo + q)})

    iv = ds.map_batches(to_iv, batch_format="pyarrow")
    out = keyed_interval_coverage(iv, key_col="l_suppkey",
                                  lo_col="lo", hi_col="hi") \
        .to_pandas()
    out = out.rename(columns={"covered": "covered_days"})
    return out.sort_values("l_suppkey").reset_index(drop=True)


_BUSY_WINDOWS_SQL = """
WITH iv AS (
  SELECT l_suppkey,
         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS lo,
         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)
           + CAST(floor(l_quantity) AS BIGINT) AS hi
  FROM lineitem),
r AS (
  SELECT l_suppkey, lo, hi,
         max(hi) OVER (PARTITION BY l_suppkey ORDER BY lo, hi
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_hi
  FROM iv),
g AS (
  SELECT l_suppkey, lo, hi,
         sum(CASE WHEN prev_hi IS NULL OR lo > prev_hi
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_suppkey ORDER BY lo, hi) AS grp
  FROM r),
m AS (
  SELECT l_suppkey, grp, min(lo) AS wlo, max(hi) AS whi
  FROM g GROUP BY l_suppkey, grp)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(whi - wlo) AS BIGINT) AS covered_days
FROM m GROUP BY l_suppkey
"""


def q_trending_parts_decay(sf_dir):
    """Time-decayed trending score: every lineitem contributes
    0.9^(age_days vs the corpus max shipdate) to its part; top-20 by
    (score DESC, partkey). The decayed partials fuse per block before a
    part-keyed aggregate — the streaming-freshness ranking."""
    from ray.data.aggregate import Max, Sum

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_shipdate"])
    mx = ds.aggregate(Max("l_shipdate"))["max(l_shipdate)"]
    max_day = int(np.datetime64(mx, "us").astype(np.int64)
                  // 86_400_000_000)

    def decay_partial(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        age = max_day - ts // 86_400_000_000
        w = 0.9 ** age.astype(np.float64)
        df = pd.DataFrame({"l_partkey":
                           t["l_partkey"].to_numpy(zero_copy_only=False),
                           "w": w})
        out = df.groupby("l_partkey", as_index=False)["w"].sum()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    agg = ds.map_batches(decay_partial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("w", alias_name="trend")) \
        .to_pandas()
    agg["trend"] = agg["trend"].round(6)
    top = agg.sort_values(["trend", "l_partkey"],
                          ascending=[False, True]).head(20)
    return top.reset_index(drop=True)


_TRENDING_SQL = """
WITH mx AS (
  SELECT CAST(floor(epoch(max(l_shipdate)) / 86400) AS BIGINT) AS d
  FROM lineitem),
s AS (
  SELECT l_partkey,
         round(sum(pow(0.9, (SELECT d FROM mx)
                       - CAST(floor(epoch(l_shipdate) / 86400)
                              AS BIGINT))), 6) AS trend
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, trend FROM s
ORDER BY trend DESC, l_partkey LIMIT 20
"""


def q_frequent_values_lineitem(sf_dir):
    """Frequent-values profile (the profiler's top-k value report):
    top-3 values by count for each categorical-ish column, emitted as
    one long (column, value, n, rnk) table. Per-block fused value
    counts -> one bounded (col, value) aggregate -> driver-side top-3
    over the tiny distinct-value table."""
    from ray.data.aggregate import Sum

    cols = ["l_returnflag", "l_linestatus", "l_quantity"]
    ds = read_table(table_path(sf_dir, "lineitem"), columns=cols)

    def value_counts(t: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False)
            if c == "l_quantity":
                v = np.floor(v).astype(np.int64).astype(str)
            s = pd.Series(v).value_counts()
            frames.append(pd.DataFrame({
                "col": c, "val": s.index.astype(str),
                "n": s.to_numpy(np.int64)}))
        return pa.Table.from_pandas(pd.concat(frames),
                                    preserve_index=False).replace_schema_metadata(None)

    agg = ds.map_batches(value_counts, batch_format="pyarrow") \
        .groupby(["col", "val"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    agg = finalize(agg, {"col": None, "val": None, "n": "int64"})
    agg = agg.sort_values(["col", "n", "val"],
                          ascending=[True, False, True])
    agg["rnk"] = agg.groupby("col").cumcount() + 1
    out = agg[agg["rnk"] <= 3].reset_index(drop=True)
    out["rnk"] = out["rnk"].astype("int64")
    return out[["col", "val", "n", "rnk"]]


_FREQUENT_VALUES_SQL = """
WITH long AS (
  SELECT 'l_returnflag' AS col, l_returnflag AS val FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', l_linestatus FROM lineitem
  UNION ALL
  SELECT 'l_quantity', CAST(CAST(floor(l_quantity) AS BIGINT)
                            AS VARCHAR) FROM lineitem),
c AS (SELECT col, val, count(*) AS n FROM long GROUP BY col, val)
SELECT col, val, CAST(n AS BIGINT) AS n,
       CAST(row_number() OVER (PARTITION BY col
                               ORDER BY n DESC, val) AS BIGINT) AS rnk
FROM c QUALIFY rnk <= 3
"""


def q_events_ewma_value(sf_dir):
    """Per-user EWMA smoothing of event values (functions/windows.py
    keyed_ewma, alpha=0.3): the streaming-recursion operator,
    vectorized by blocked exponential rescaling. Restricted to
    user_id < 10 so the emitted smoothed series stays small. Rows-only:
    the recursion is not expressible as a single SQL window."""
    from ..functions.windows import keyed_ewma

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "value"])
    ds = ds.filter(expr="user_id < 10")
    out = keyed_ewma(ds, key_col="user_id", ts_col="ts",
                     tie_col="event_id", value_col="value",
                     alpha=0.3).to_pandas()
    return out.sort_values(["user_id", "event_id"]) \
        .reset_index(drop=True)


# Value oracle for the EWMA recursion (round-5 conversion of a
# rows-only query): DuckDB can express the per-row recursion as a
# prefix-list fold — the window collects each row's ordered value
# prefix, list_reduce seeds acc = xs[0] (= the y_0 = x_0 seed) and
# folds alpha*x + (1-alpha)*acc left-to-right. O(n^2) in rows-per-key,
# fine for the user_id<10 slice; exact to 6 decimals against the
# blocked-rescaling operator at both test scales.
_EVENTS_EWMA_SQL = r"""
WITH src AS (
  SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v
  FROM events
  WHERE user_id < 10 AND user_id IS NOT NULL AND ts IS NOT NULL),
pre AS (
  SELECT user_id, event_id,
         list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS xs
  FROM src)
SELECT user_id, event_id,
       round(list_reduce(xs, (acc, x) -> 0.3*x + 0.7*acc), 6) AS ewma
FROM pre
"""


def q_audio_transcode_clips(sf_dir):
    """Container-normalization audit: raw-PCM clips re-encoded as
    canonical RIFF/WAVE (stages/analysis.py WavWriter), verified by an
    EXACT DuckDB size oracle — the canonical writer emits 44 +
    2*n_samples bytes, a pure function of octet_length for s16le
    inputs, so the transcode's Ray-side byte accounting is
    value-checked end to end."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count, Sum

    from ..stages.analysis import WavWriter
    from ..stages.taskpool import stage_fn

    ds = read_table_clips_pcm(sf_dir)
    wav = ds.map_batches(stage_fn(WavWriter), batch_format="pyarrow",
                         batch_size=256)

    def sizes(t: pa.Table) -> pa.Table:
        ok = t["wav_ok"]
        out_len = _pc.cast(_pc.binary_length(t["bytes"]), pa.int64())
        in_len = _pc.multiply(t["n_samples"], 2)
        return pa.table({"wav_ok": ok,
                         "in_bytes": in_len,
                         "out_bytes": out_len}).filter(ok)

    out = wav.map_batches(sizes, batch_format="pyarrow") \
        .groupby("wav_ok").aggregate(
            Count(alias_name="n"),
            Sum("in_bytes", alias_name="in_bytes"),
            Sum("out_bytes", alias_name="out_bytes")).to_pandas()
    out = out.drop(columns=["wav_ok"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _audio_transcode_sql(sf_dir: str) -> str:
    from ..sources.clips import clips_cache_dir

    path = clips_cache_dir(sf_dir)
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum((octet_length(bytes) // 2) * 2) AS BIGINT) AS in_bytes,
       CAST(sum((octet_length(bytes) // 2) * 2 + 44) AS BIGINT)
         AS out_bytes
FROM read_parquet('{path}/*.parquet')
WHERE codec = 'pcm_s16le' AND bytes IS NOT NULL
      AND octet_length(bytes) % 2 = 0 AND octet_length(bytes) >= 2
      AND sr_hz IS NOT NULL AND sr_hz > 0
"""


def q_events_session_paths(sf_dir):
    """Top navigation paths: sessionize per user (30-min gaps), take
    each session's first 3 event types as a '>'-joined path, count
    paths corpus-wide — the product-analytics path report. One
    user-bucketed scan emits per-bucket PATH COUNT partials (bounded by
    n_types^3), so the final exchange is a tiny matrix; top-10 by
    (n DESC, path) on the driver."""
    import functools

    from ray.data.aggregate import Sum

    from ..functions.windows import _key_bucket, _resolve_buckets

    ds = read_table(table_path(sf_dir, "events"),
                    columns=["user_id", "ts", "event_id", "event_type"])
    keyed = ds.map_batches(
        functools.partial(_key_bucket, key_col="user_id",
                          num_buckets=_resolve_buckets(ds, None,
                                                       row_bytes=40)),
        batch_format="pyarrow")

    GAP_US = 1800 * 1_000_000

    def paths_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        n = len(g)
        if not n:
            return pd.DataFrame({"path": [], "n": []})
        keys = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]") \
                                  .astype(np.int64)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap = np.zeros(n, np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        new_sess = new_key | (gap > GAP_US)
        sess_id = np.cumsum(new_sess) - 1
        starts = np.flatnonzero(new_sess)
        pos = np.arange(n) - np.repeat(
            starts, np.diff(np.append(starts, n)))
        head = pos < 3
        df = pd.DataFrame({"sess": sess_id[head],
                           "t": g["event_type"].to_numpy()[head]})
        paths = df.groupby("sess", sort=False)["t"] \
            .agg(">".join)
        out = paths.value_counts().reset_index()
        out.columns = ["path", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    partial = keyed.groupby("_bucket").map_groups(paths_bucket,
                                                  batch_format="pandas")
    agg = partial.groupby("path").aggregate(
        Sum("n", alias_name="n")).to_pandas()
    agg = finalize(agg, {"path": None, "n": "int64"})
    top = agg.sort_values(["n", "path"],
                          ascending=[False, True]).head(10)
    return top.reset_index(drop=True)


_SESSION_PATHS_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS pts
  FROM events),
s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(CASE WHEN pts IS NULL
                    OR epoch_us(ts) - epoch_us(pts) > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
  FROM o),
r AS (
  SELECT user_id, sess, event_type,
         row_number() OVER (PARTITION BY user_id, sess
                            ORDER BY ts, event_id) AS rn
  FROM s),
p AS (
  SELECT user_id, sess,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 3 GROUP BY user_id, sess)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY path ORDER BY n DESC, path LIMIT 10
"""


def q_scd2_orders_history(sf_dir):
    """SCD type-2 history build (functions/diff.py scd2_history): the
    base orders snapshot (v1) and the deterministically perturbed
    delivery (v2, same generator as snapshot_diff_orders) merge into
    one row per effective interval with valid_from/valid_to version
    stamps. History-sized output; the oracle reproduces all four
    interval cases with a FULL OUTER JOIN UNION."""
    from ..functions.diff import scd2_history

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    old = read_table(table_path(sf_dir, "orders"), columns=cols)
    new = read_table(table_path(sf_dir, "orders"), columns=cols) \
        .map_batches(_perturb_orders_batch, batch_format="pyarrow")
    out = scd2_history(old, new, key_col="o_orderkey",
                       compare_cols=["o_totalprice", "o_orderstatus"])
    df = out.to_pandas().sort_values(
        ["o_orderkey", "valid_from"]).reset_index(drop=True)
    df["o_totalprice"] = df["o_totalprice"].round(2)
    return df


_SCD2_SQL = r"""
WITH new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 83 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 101 = 0
),
m AS (
  SELECT o.o_orderkey AS ko, n.o_orderkey AS kn,
         o.o_totalprice AS po, n.o_totalprice AS pn,
         o.o_orderstatus AS so, n.o_orderstatus AS sn
  FROM orders o FULL OUTER JOIN new_snap n
    ON o.o_orderkey = n.o_orderkey),
flags AS (
  SELECT *,
         (ko IS NOT NULL AND kn IS NOT NULL
          AND po IS NOT DISTINCT FROM pn
          AND so IS NOT DISTINCT FROM sn) AS same,
         (ko IS NOT NULL AND kn IS NOT NULL
          AND (po IS DISTINCT FROM pn
               OR so IS DISTINCT FROM sn)) AS changed,
         (kn IS NULL) AS removed, (ko IS NULL) AS added
  FROM m)
SELECT ko AS o_orderkey, round(po, 2) AS o_totalprice,
       so AS o_orderstatus,
       1 AS valid_from, -1 AS valid_to
FROM flags WHERE same
UNION ALL
SELECT ko, round(po, 2), so, 1, 2 FROM flags WHERE changed
UNION ALL
SELECT ko, round(po, 2), so, 1, 2 FROM flags WHERE removed
UNION ALL
SELECT kn, round(pn, 2), sn, 2, -1 FROM flags WHERE changed
UNION ALL
SELECT kn, round(pn, 2), sn, 2, -1 FROM flags WHERE added
"""


def q_codec_sniff_clips(sf_dir):
    """Container-sniffing audit: DECLARED codec column vs the payload's
    actual magic bytes (RIFF/WAVE header, the sandbox's FAKE<codec>
    container tags, else raw) — the defend-against-mislabeled-deliveries
    check. Pure vectorized prefix compares (pyarrow binary_slice per
    block, no decode), aggregated to (declared, sniffed, consistent)
    counts in Ray. The DuckDB oracle sniffs the same prefixes via
    hex(bytes) substrings, so the audit is value-exact."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count

    from ..sources.clips import clips_cache_dir

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "codec"])

    def sniff(t: pa.Table) -> pa.Table:
        b = t["bytes"].combine_chunks()
        n = len(b)
        p4 = _pc.binary_slice(b, 0, 4)
        p12 = _pc.binary_slice(b, 8, 12)
        magic12 = _pc.binary_slice(b, 0, 12)
        is_wav = _pc.and_(_pc.equal(p4, b"RIFF"),
                          _pc.equal(p12, b"WAVE"))
        sniffed = np.full(n, "raw", dtype=object)
        wav_mask = _pc.fill_null(is_wav, False).to_numpy(
            zero_copy_only=False)
        sniffed[wav_mask] = "wav"
        for c in ("flac", "opus", "mp3", "amr"):
            tag = b"FAKE" + c.encode().ljust(8, b"\0")
            m = _pc.fill_null(_pc.equal(magic12, tag), False) \
                .to_numpy(zero_copy_only=False)
            sniffed[m] = "fake:" + c
        null_mask = _pc.is_null(b).to_numpy(zero_copy_only=False)
        sniffed[null_mask] = "missing"
        declared = t["codec"].to_numpy(zero_copy_only=False)
        dec = np.where(pd.isna(declared), "null", declared)
        consistent = (
            ((dec == "wav") & (sniffed == "wav"))
            | ((dec == "pcm_s16le") & (sniffed == "raw"))
            | (np.char.add("fake:", dec.astype(str)) == sniffed))
        return pa.table({
            "declared": pa.array(dec.astype(str)),
            "sniffed": pa.array(sniffed.astype(str)),
            "consistent": pa.array(consistent)})

    out = ds.map_batches(sniff, batch_format="pyarrow") \
        .groupby(["declared", "sniffed", "consistent"]) \
        .aggregate(Count(alias_name="n")).to_pandas()
    out = finalize(out, {"declared": None, "sniffed": None,
                         "consistent": None, "n": "int64"})
    return out.sort_values(["declared", "sniffed"]) \
        .reset_index(drop=True)


def _codec_sniff_sql(sf_dir: str) -> str:
    from ..sources.clips import clips_cache_dir

    path = clips_cache_dir(sf_dir)
    return """
WITH s AS (
  SELECT coalesce(codec, 'null') AS declared,
    CASE
      WHEN bytes IS NULL THEN 'missing'
      WHEN substring(hex(bytes), 1, 8) = '52494646'
       AND substring(hex(bytes), 17, 8) = '57415645' THEN 'wav'
      WHEN substring(hex(bytes), 1, 24)
           = '46414B45666C616300000000' THEN 'fake:flac'
      WHEN substring(hex(bytes), 1, 24)
           = '46414B456F70757300000000' THEN 'fake:opus'
      WHEN substring(hex(bytes), 1, 24)
           = '46414B456D70330000000000' THEN 'fake:mp3'
      WHEN substring(hex(bytes), 1, 24)
           = '46414B45616D720000000000' THEN 'fake:amr'
      ELSE 'raw' END AS sniffed
  FROM read_parquet('{path}/*.parquet'))
SELECT declared, sniffed,
       (declared = 'wav' AND sniffed = 'wav')
       OR (declared = 'pcm_s16le' AND sniffed = 'raw')
       OR ('fake:' || declared = sniffed) AS consistent,
       CAST(count(*) AS BIGINT) AS n
FROM s GROUP BY 1, 2, 3
""".replace("{path}", path)


def q_bigram_logprob_docs(sf_dir):
    """Per-document mean conditional bigram log-probability
    (functions/text.py bigram_logprob): distributed single-key bigram
    count -> broadcast model -> vectorized doc scoring. The conditional
    model (no smoothing, contexts derived from the same counts) is
    exactly reproducible in SQL, so the LM-scoring path is
    value-checked end to end."""
    from ..functions.text import bigram_logprob

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    ds = _drop_null_rows(ds, ["text"])
    out = bigram_logprob(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_BIGRAM_SQL = r"""
WITH arrs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS a
  FROM documents WHERE text IS NOT NULL),
big AS (
  SELECT doc_id, unnest(list_zip(a[:-2], a[2:])) AS z FROM arrs),
bw AS (
  SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big
  WHERE z[1] IS NOT NULL AND z[2] IS NOT NULL),
cnt AS (SELECT w1, w2, count(*) AS c FROM bw GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c) AS t FROM cnt GROUP BY w1),
per AS (
  SELECT doc_id, count(*) AS n_bigrams, avg(ln(c / t)) AS alp
  FROM bw JOIN cnt USING (w1, w2) JOIN ctx USING (w1)
  GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(alp, 4) AS avg_logprob
FROM documents d LEFT JOIN per USING (doc_id)
WHERE d.text IS NOT NULL
"""


def q_zipf_fit_docs(sf_dir):
    """Zipf rank-frequency fit over the corpus vocabulary: distributed
    token count (per-block partials, single-key shuffle), top-100
    tokens by (count DESC, token), least-squares slope/intercept of
    ln(count) vs ln(rank) — the corpus-health power-law check. Only the
    bounded top-k table reaches the driver."""
    import functools

    from ..functions.text import vocab_count_partial

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    ds = _drop_null_rows(ds, ["text"])
    from ray.data.aggregate import Count, Sum

    counts = ds.map_batches(
        functools.partial(vocab_count_partial, col="text"),
        batch_format="pyarrow").groupby("tok").sum("n").materialize()
    # corpus totals as Ray aggregates; only the top-100 rows and two
    # scalars reach the driver (the count table itself never does)
    tot = counts.aggregate(Sum("sum(n)", alias_name="t"),
                           Count(alias_name="v"))
    n_tokens = int(tot["t"])
    vocab_size = int(tot["v"])
    # ray sort is single-direction across keys: negate the count so
    # (count DESC, tok ASC) becomes one ascending sort
    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return t.append_column("_negc", _pc.negate(
            _pc.cast(t["sum(n)"], pa.int64())))

    top = counts.map_batches(neg, batch_format="pyarrow") \
        .sort(["_negc", "tok"]).limit(100).to_pandas() \
        .rename(columns={"sum(n)": "c"})
    y = np.log(top["c"].to_numpy(np.float64))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    xm, ym = x.mean(), y.mean()
    slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
    intercept = float(ym - slope * xm)
    return pd.DataFrame({
        "n_tokens": [n_tokens], "vocab_size": [vocab_size],
        "zipf_slope": [round(slope, 6)],
        "zipf_intercept": [round(intercept, 6)]})


_ZIPF_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents WHERE text IS NOT NULL),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rn
  FROM cnt QUALIFY rn <= 100)
SELECT CAST((SELECT count(*) FROM toks) AS BIGINT) AS n_tokens,
       CAST((SELECT count(*) FROM cnt) AS BIGINT) AS vocab_size,
       round(regr_slope(ln(c), ln(rn)) , 6) AS zipf_slope,
       round(regr_intercept(ln(c), ln(rn)), 6) AS zipf_intercept
FROM top
"""


def q_ann_topk_ivf_appended(sf_dir):
    """Index MAINTENANCE path, driver-verified: the persisted IVF index
    is built from the first half of the embeddings, the second half is
    APPENDED without retraining (functions/similarity.py
    append_to_ivf_index — frozen centroids, new files inside existing
    cell partitions, no read of old cells), then probed exhaustively.
    Bit-identical to the exact scan over the full table, so it shares
    the ANN oracle — the append path is value-checked end to end."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from ..functions.similarity import AnnIndex, _embedding_matrix

    idx = f"/tmp/jschon_ray_ivf_app/{_index_cache_tag(sf_dir)}-c12-u1"
    if not os.path.exists(os.path.join(idx, "_appended.ok")):
        shutil.rmtree(idx, ignore_errors=True)
        full = pq.read_table(table_path(sf_dir, "embeddings"))
        half = full.num_rows // 2
        import ray.data as _rd
        index = AnnIndex.build(_rd.from_arrow(full.slice(0, half)), idx,
                               kind="ivf", n_centroids=12)
        index.append(_rd.from_arrow(full.slice(half)))
        with open(os.path.join(idx, "_appended.ok"), "w") as f:
            f.write("ok")
    qt = pq.read_table(table_path(sf_dir, "embeddings"),
                       filters=[("vec_id", "<", 10)])
    queries = {"ids": qt["vec_id"].to_numpy(zero_copy_only=False),
               "matrix": _embedding_matrix(qt, "embedding")}
    return AnnIndex(idx).probe(queries, k=5, nprobe=12)


def q_audio_pitchshift_clips(sf_dir):
    """Pitch-shift augmentation (+2 semitones, stages/analysis.py
    PitchShifter = phase-vocoder stretch -> resample composition) over
    the raw-PCM clips; per clip_id, the total output samples. The
    two-stage length contract — nf = 1 + (max(n,L)-L)//Ha frames,
    stretched (nf-1)*Hs + L samples, floor(/r) on resample — is a pure
    function of octet_length, so the DuckDB oracle checks the composed
    DSP plumbing value-exactly."""
    from ray.data.aggregate import Sum

    from ..stages.analysis import PitchShifter
    from ..stages.taskpool import stage_fn

    ds = read_table_clips_pcm(sf_dir)
    out = ds.map_batches(stage_fn(PitchShifter, semitones=2.0),
                         batch_format="pyarrow", batch_size=128) \
        .filter(expr="shift_ok == True") \
        .select_columns(["clip_id", "n_samples"]) \
        .groupby("clip_id").aggregate(
            Sum("n_samples", alias_name="out_samples")).to_pandas()
    return finalize(out, {"clip_id": None, "out_samples": "int64"})


def _audio_pitchshift_sql(sf_dir: str) -> str:
    from ..sources.clips import clips_cache_dir

    rate = 2.0 ** (2.0 / 12.0)
    path = clips_cache_dir(sf_dir)
    return f"""
WITH c AS (
  SELECT clip_id, octet_length(bytes) // 2 AS ns
  FROM read_parquet('{path}/*.parquet')
  WHERE codec = 'pcm_s16le' AND bytes IS NOT NULL
        AND octet_length(bytes) % 2 = 0
        -- NO >= 2 bound: an empty pcm payload stretches to one
        -- zero-padded frame (512 samples) like any sub-frame clip
        AND sr_hz IS NOT NULL AND sr_hz > 0),
st AS (
  SELECT clip_id,
         (1 + (greatest(ns, 512) - 512) // {_PS_HA}) AS nf
  FROM c),
o AS (
  SELECT clip_id,
         greatest(CAST(floor(((nf - 1) * 128 + 512) / {rate!r})
                       AS BIGINT), 1) AS out_n
  FROM st)
SELECT clip_id, CAST(sum(out_n) AS BIGINT) AS out_samples
FROM o GROUP BY clip_id
"""


# analysis-stage hop constants mirrored into the pitch-shift oracle:
# TimeStretcher(rate=r): Hs = 512//4 = 128, Ha = round(128 / r)
_PS_HA = int(round(128 / (2.0 ** (2.0 / 12.0))))


def q_customer_rfm(sf_dir):
    """RFM segmentation: per customer, NTILE(5) scores for Recency
    (last order day), Frequency (order count) and Monetary (exact
    cents), each an independent range-partitioned exact NTILE over
    (metric, custkey) — three sorts, like SQL's three window passes —
    joined into one (r, f, m, rfm_code) row per customer via the
    bucketed hash join."""
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.join import hash_join
    from ..functions.scan import _ntile_of_rank, global_value_rank

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        day = pc.cast(t["o_orderdate"], pa.int64())
        e2 = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                      round_mode="half_towards_infinity") \
            .cast(pa.int64())
        return pa.table({
            "o_custkey": t["o_custkey"],
            "day": pc.divide(day, 86_400_000_000),
            "e2": e2})

    base = orders.map_batches(project, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(
            Max("day", alias_name="last_day"),
            Count(alias_name="n_orders"),
            Sum("e2", alias_name="spend_e2")).materialize()
    n = base.count()

    def metric_tiles(col):
        ranked = global_value_rank(
            base.select_columns(["o_custkey", col]),
            value_col=col, tie_cols=("o_custkey",))

        def tile(t: pa.Table) -> pa.Table:
            r = t["rank"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            tl = _ntile_of_rank(r - 1, n, 5)
            return pa.table({"o_custkey": t["o_custkey"],
                             col + "_tile": pa.array(tl, pa.int64())})

        return ranked.map_batches(tile, batch_format="pyarrow")

    out = metric_tiles("last_day")
    for col in ("n_orders", "spend_e2"):
        out = hash_join(out, metric_tiles(col), on="o_custkey")
    df = out.to_pandas().rename(columns={
        "last_day_tile": "r_score", "n_orders_tile": "f_score",
        "spend_e2_tile": "m_score"})
    df["rfm_code"] = (df["r_score"] * 100 + df["f_score"] * 10
                      + df["m_score"]).astype("int64")
    return df.sort_values("o_custkey").reset_index(drop=True)


_RFM_SQL = """
WITH base AS (
  SELECT o_custkey,
         CAST(floor(epoch(max(o_orderdate)) / 86400) AS BIGINT)
           AS last_day,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_e2
  FROM orders GROUP BY o_custkey),
t AS (
  SELECT o_custkey,
         CAST(ntile(5) OVER (ORDER BY last_day, o_custkey) AS BIGINT)
           AS r_score,
         CAST(ntile(5) OVER (ORDER BY n_orders, o_custkey) AS BIGINT)
           AS f_score,
         CAST(ntile(5) OVER (ORDER BY spend_e2, o_custkey) AS BIGINT)
           AS m_score
  FROM base)
SELECT o_custkey, r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
         AS rfm_code
FROM t
"""


def q_pareto_parts_revenue(sf_dir):
    """Revenue-concentration (80/20) report: the share of total
    lineitem revenue held by the top 1% / 5% / 20% of parts. Part
    revenue rolls up bounded; the exact global rank over (-revenue,
    partkey) makes each top-k share ONE filtered Ray sum — no ranked
    table ever reaches the driver."""
    from ray.data.aggregate import Count, Sum

    from ..functions.scan import global_value_rank

    ds = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_extendedprice"])

    def project(t: pa.Table) -> pa.Table:
        e2 = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                      round_mode="half_towards_infinity") \
            .cast(pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "e2": e2})

    rev = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("e2", alias_name="rev_e2"))

    def neg(t: pa.Table) -> pa.Table:
        col = t["rev_e2"]
        if col.type != pa.int64():
            col = pc.round(col).cast(pa.int64())
        return pa.table({"l_partkey": t["l_partkey"],
                         "rev_e2": col,
                         "neg_rev": pc.negate(col)})

    rev = rev.map_batches(neg, batch_format="pyarrow").materialize()
    tot = rev.aggregate(Sum("rev_e2", alias_name="t"),
                        Count(alias_name="n"))
    total_e2, n_parts = int(tot["t"]), int(tot["n"])
    ranked = global_value_rank(rev, value_col="neg_rev",
                               tie_cols=("l_partkey",)).materialize()

    import math
    row = {"n_parts": n_parts}
    for pct in (1, 5, 20):
        k = max(1, math.ceil(n_parts * pct / 100.0))
        # global_value_rank keeps only (value, tie, rank): recover the
        # revenue by negating the ranked value's sum
        top = ranked.filter(expr=f"rank <= {k}") \
            .aggregate(Sum("neg_rev", alias_name="s"))
        row[f"share_top{pct}"] = round(-int(top["s"]) / total_e2, 6)
    return pd.DataFrame([row])


_PARETO_SQL = """
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_e2
  FROM lineitem GROUP BY l_partkey),
r AS (
  SELECT rev_e2,
         row_number() OVER (ORDER BY rev_e2 DESC, l_partkey) AS rnk
  FROM rev),
tot AS (SELECT sum(rev_e2) AS t, count(*) AS n FROM r)
SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_parts,
       round((SELECT sum(rev_e2) FROM r
              WHERE rnk <= greatest(1, CAST(ceil(
                  (SELECT n FROM tot) * 0.01) AS BIGINT)))
             / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS share_top1,
       round((SELECT sum(rev_e2) FROM r
              WHERE rnk <= greatest(1, CAST(ceil(
                  (SELECT n FROM tot) * 0.05) AS BIGINT)))
             / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS share_top5,
       round((SELECT sum(rev_e2) FROM r
              WHERE rnk <= greatest(1, CAST(ceil(
                  (SELECT n FROM tot) * 0.20) AS BIGINT)))
             / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS share_top20
"""


def q_q6_forecast_revenue(sf_dir):
    """TPC-H Q6 analogue (forecasting revenue change): one fused
    filter+aggregate pass over lineitem — shipdate year band, discount
    band (exact e2 integers, so the float column can't straddle the
    boundary differently from the oracle), quantity cap. Revenue =
    price_e2 x disc_e2 exact e4 integers. The cheapest possible shape:
    no shuffle, no join, O(blocks) two-int partials.

    Reference analogy: a pure conjunction of range keywords
    (jschon vocabulary/validation.py:78-111) reduced over the corpus.
    """
    from ray.data.aggregate import Sum

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_shipdate", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.round(pc.multiply(t["l_discount"], 100.0),
                        round_mode="half_towards_infinity") \
                 .cast(pa.int64())
        qty = pc.round(t["l_quantity"],
                       round_mode="half_towards_infinity").cast(pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi))),
            pc.and_(pc.and_(pc.greater_equal(disc, 5),
                            pc.less_equal(disc, 7)),
                    pc.less(qty, 24)))
        keep = pc.fill_null(keep, False)
        kept = t.filter(keep)
        kdisc = disc.filter(keep)
        p = pc.round(pc.multiply(kept["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        rev = pc.sum(pc.multiply(p, kdisc)).as_py() or 0
        return pa.table({"n_rows": pa.array([kept.num_rows], pa.int64()),
                         "rev_e4": pa.array([rev], pa.int64())})

    agg = li.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("rev_e4", alias_name="rev_e4"))
    return pd.DataFrame({"n_rows": [int(agg["n_rows"])],
                         "rev_e4": [int(agg["rev_e4"])]})


_Q6_FORECAST_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS rev_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(round(l_quantity) AS BIGINT) < 24
"""


def q_q15_top_supplier(sf_dir):
    """TPC-H Q15 analogue (top supplier by quarterly revenue): per-block
    (suppkey, rev) partials pre-aggregate before ONE small groupby (at
    most n_suppliers rows shuffle); the max + equality filter and the
    name enrich run over that bounded result on the driver. Ties all
    surface, exactly like the oracle's `= (SELECT max(...))`."""
    from ray.data.aggregate import Sum

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1996-04-01")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_suppkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(pc.fill_null(keep, False))
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        tbl = pa.table({"s_suppkey": t["l_suppkey"], "rev_e2": rev})
        return tbl.group_by("s_suppkey").aggregate([("rev_e2", "sum")]) \
                  .rename_columns(["s_suppkey", "rev_e2"])

    agg = li.map_batches(partial, batch_format="pyarrow") \
            .groupby("s_suppkey").aggregate(
                Sum("rev_e2", alias_name="total_rev_e2")).to_pandas()
    agg["total_rev_e2"] = agg["total_rev_e2"].round().astype("int64")
    best = agg[agg.total_rev_e2 == agg.total_rev_e2.max()]

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(supp, on="s_suppkey")
    return out[["s_suppkey", "s_name", "total_rev_e2"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


_Q15_TOP_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                       AS BIGINT)) AS BIGINT) AS total_rev_e2
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_rev_e2
FROM r JOIN supplier USING (s_suppkey)
WHERE total_rev_e2 = (SELECT max(total_rev_e2) FROM r)
"""


def q_q7_volume_shipping(sf_dir):
    """TPC-H Q7 analogue (volume shipping between two nations): revenue
    by (supplier nation, customer nation, ship year) for the ordered
    pairs (NATION_1, NATION_2) / (NATION_2, NATION_1). Scale split:
    supplier + nation are broadcast dims; customer x orders and
    orders x lineitem are the two large-large bucketed hash joins —
    both sides pre-filtered to the two nations / the two ship years
    BEFORE any exchange, so only qualifying narrow rows shuffle."""
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1998-01-01")
    N1, N2 = "NATION_1", "NATION_2"

    nation = read_table(table_path(sf_dir, "nation")).to_pandas()
    name_of = dict(zip((int(k) for k in nation.n_nationkey),
                       nation.n_name))
    pair_keys = pa.array(
        sorted(int(k) for k, v in name_of.items() if v in (N1, N2)),
        pa.int32())

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_nationkey"])

    def filter_cust(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"].cast(pa.int32()),
                        value_set=pair_keys)
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"o_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"].cast(pa.int32())})

    cust = cust.map_batches(filter_cust, batch_format="pyarrow")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey"])
    co = hash_join(orders, cust, on="o_custkey", how="inner") \
        .select_columns(["o_orderkey", "c_nationkey"])

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp.s_nationkey.astype(int).isin(
        set(int(k) for k in pair_keys.to_pylist()))]
    sdim = pa.table({
        "l_suppkey": pa.array(supp.s_suppkey.astype("int64")),
        "s_nationkey": pa.array(supp.s_nationkey.astype("int32"))})

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_suppkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])

    def project_li(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(pc.fill_null(keep, False))
        j = t.join(sdim, keys="l_suppkey", join_type="inner")
        rev = pc.round(pc.multiply(
            pc.multiply(j["l_extendedprice"], 100.0),
            pc.subtract(1.0, j["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        yr = pc.year(j["l_shipdate"]).cast(pa.int64())
        return pa.table({"o_orderkey": j["l_orderkey"],
                         "s_nationkey": j["s_nationkey"],
                         "l_year": yr, "rev_e2": rev})

    li = li.map_batches(project_li, batch_format="pyarrow")
    j = hash_join(li, co, on="o_orderkey", how="inner")

    def finish(t: pa.Table) -> pa.Table:
        s = t["s_nationkey"].cast(pa.int32())
        c = t["c_nationkey"].cast(pa.int32())
        keep = pc.fill_null(pc.not_equal(s, c), False)
        t = t.filter(keep)
        sn = [name_of[int(k)] for k in t["s_nationkey"].to_pylist()]
        cn = [name_of[int(k)] for k in t["c_nationkey"].to_pylist()]
        return pa.table({"supp_nation": pa.array(sn, pa.string()),
                         "cust_nation": pa.array(cn, pa.string()),
                         "l_year": t["l_year"], "rev_e2": t["rev_e2"]})

    out = j.map_batches(finish, batch_format="pyarrow") \
           .groupby(["supp_nation", "cust_nation", "l_year"]) \
           .aggregate(Sum("rev_e2", alias_name="revenue_e2")) \
           .to_pandas()  # O(pairs x years) rows by construction
    if out.empty:
        # typed empty (nothing shipped between the two nations)
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype="object"),
            "cust_nation": pd.Series([], dtype="object"),
            "l_year": pd.Series([], dtype="int64"),
            "revenue_e2": pd.Series([], dtype="int64")})
    out["revenue_e2"] = out["revenue_e2"].round().astype("int64")
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
              .reset_index(drop=True)


_Q7_VOLUME_SHIPPING_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                     AS BIGINT)) AS BIGINT) AS revenue_e2
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


def q_q8_market_share(sf_dir):
    """TPC-H Q8 analogue (national market share): NATION_7's share of
    PROMO-part revenue sold to region-2 customers, per order year.
    Broadcast sides: promo partkey set, supplier nation map, region-2
    nation set. Shuffles: customer x orders then orders x lineitem
    bucketed hash joins. The share division happens once per year on
    exact integer sums, so the float is a pure projection of two
    hash-checked ints."""
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1998-01-01")
    TARGET = 7  # NATION_7's market share
    REGION = 2

    nation = read_table(table_path(sf_dir, "nation")).to_pandas()
    r2_keys = pa.array(
        sorted(int(k) for k, r in zip(nation.n_nationkey,
                                      nation.n_regionkey)
               if int(r) == REGION), pa.int32())

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_type"]).to_pandas()
    promo = pa.array(
        sorted(int(k) for k, ty in zip(part.p_partkey, part.p_type)
               if ty == "PROMO"), pa.int64())

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    target_supp = pa.array(
        sorted(int(k) for k, n in zip(supp.s_suppkey, supp.s_nationkey)
               if int(n) == TARGET), pa.int64())

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_nationkey"])

    def filter_cust(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"].cast(pa.int32()),
                        value_set=r2_keys)
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"o_custkey": t["c_custkey"]})

    cust = cust.map_batches(filter_cust, batch_format="pyarrow")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate"])

    def filter_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)))
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_year": pc.year(t["o_orderdate"])
                         .cast(pa.int64())})

    orders = orders.map_batches(filter_orders, batch_format="pyarrow")
    co = hash_join(orders, cust, on="o_custkey", how="inner") \
        .select_columns(["o_orderkey", "o_year"])

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def project_li(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["l_partkey"].cast(pa.int64()),
                        value_set=promo)
        t = t.filter(pc.fill_null(keep, False))
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        is_t = pc.is_in(t["l_suppkey"].cast(pa.int64()),
                        value_set=target_supp)
        return pa.table({"o_orderkey": t["l_orderkey"], "rev_e2": rev,
                         "nat_rev_e2": pc.if_else(
                             pc.fill_null(is_t, False), rev,
                             pa.scalar(0, pa.int64()))})

    li = li.map_batches(project_li, batch_format="pyarrow")
    j = hash_join(li, co, on="o_orderkey", how="inner")

    def year_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"o_year": t["o_year"],
                        "nation_rev_e2": t["nat_rev_e2"],
                        "total_rev_e2": t["rev_e2"]})
        return tbl.group_by("o_year").aggregate(
            [("nation_rev_e2", "sum"), ("total_rev_e2", "sum")]) \
            .rename_columns(["o_year", "nation_rev_e2", "total_rev_e2"])

    agg = j.map_batches(year_partial, batch_format="pyarrow") \
           .groupby("o_year").aggregate(
               Sum("nation_rev_e2", alias_name="nation_rev_e2"),
               Sum("total_rev_e2", alias_name="total_rev_e2")) \
           .to_pandas()
    for c in ("nation_rev_e2", "total_rev_e2"):
        agg[c] = agg[c].round().astype("int64")
    agg["mkt_share"] = (agg.nation_rev_e2 / agg.total_rev_e2).round(6)
    return agg.sort_values("o_year").reset_index(drop=True)


_Q8_MARKET_SHARE_SQL = """
WITH j AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * 100 * (1 - l_discount))
              AS BIGINT) AS rev_e2,
         s_nationkey
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_type = 'PROMO' AND n_regionkey = 2
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT o_year,
       CAST(sum(CASE WHEN s_nationkey = 7 THEN rev_e2 ELSE 0 END)
            AS BIGINT) AS nation_rev_e2,
       CAST(sum(rev_e2) AS BIGINT) AS total_rev_e2,
       round(sum(CASE WHEN s_nationkey = 7 THEN rev_e2 ELSE 0 END)
             / CAST(sum(rev_e2) AS DOUBLE), 6) AS mkt_share
FROM j GROUP BY 1 ORDER BY 1
"""


def q_q21_waiting_suppliers(sf_dir):
    """TPC-H Q21 analogue (suppliers who kept orders waiting): for
    finalized ('F') multi-supplier orders where EXACTLY ONE distinct
    supplier shipped late, count such orders per that supplier. "Late"
    is adapted to this schema (no commit/receipt dates): l_shipdate >
    o_orderdate + 90 days.

    The correlated EXISTS / NOT EXISTS pair becomes per-order
    set algebra: per-block (orderkey, suppkey, late)-max partials
    pre-collapse duplicate supplier lines, one hash-bucketed
    map_groups finishes the per-order distinct/late-distinct counts
    (each bucket holds whole orders), and the survivor counts make a
    tiny final groupby. Only narrow int rows ever shuffle."""
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderstatus"])

    def filter_f(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderstatus"], "F")
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"l_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"]})

    fo = orders.map_batches(filter_f, batch_format="pyarrow")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    j = hash_join(li, fo, on="l_orderkey", how="inner")

    NUM_BUCKETS = 128

    def late_partial(t: pa.Table) -> pa.Table:
        cutoff = pc.add(t["o_orderdate"],
                        pa.scalar(pd.Timedelta(days=90)))
        late = pc.fill_null(pc.greater(t["l_shipdate"], cutoff), False) \
            .cast(pa.int64())
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        tbl = pa.table({"l_orderkey": t["l_orderkey"],
                        "l_suppkey": t["l_suppkey"], "late": late,
                        "_b": pa.array(
                            (okey * 0x9E3779B97F4A7C15 % (1 << 63))
                            % NUM_BUCKETS)})
        out = tbl.group_by(["_b", "l_orderkey", "l_suppkey"]) \
                 .aggregate([("late", "max")])
        return out.rename_columns(["_b", "l_orderkey", "l_suppkey",
                                   "late"])

    parts = j.map_batches(late_partial, batch_format="pyarrow")

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["l_orderkey", "l_suppkey"], as_index=False) \
             ["late"].max()
        agg = d.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_late=("late", "sum"))
        lates = d[d.late == 1].groupby("l_orderkey")["l_suppkey"].max()
        agg["late_supp"] = lates.reindex(agg.index).fillna(-1) \
            .astype("int64")
        hit = agg[(agg.n_supp >= 2) & (agg.n_late == 1)]
        cnt = hit.groupby("late_supp").size()
        return pd.DataFrame({
            "s_suppkey": cnt.index.to_numpy(dtype="int64"),
            "numwait": cnt.to_numpy(dtype="int64")})

    waits = parts.groupby("_b").map_groups(per_order,
                                           batch_format="pandas") \
        .groupby("s_suppkey").aggregate(Sum("numwait",
                                            alias_name="numwait")) \
        .to_pandas()
    waits["numwait"] = waits["numwait"].round().astype("int64")

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_name"]).to_pandas()
    out = waits.merge(supp, on="s_suppkey")
    return out[["s_suppkey", "s_name", "numwait"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


_Q21_WAITING_SQL = """
WITH f AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
j AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN f ON o_orderkey = l_orderkey
  GROUP BY 1, 2),
o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
         max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM j GROUP BY 1)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM o JOIN supplier ON s_suppkey = late_supp
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1, 2
"""


def q_kl_source_divergence_docs(sf_dir):
    """Per-source token-distribution KL divergence vs the corpus — the
    corpus-mix drift diagnostic run before fixing per-source sampling
    weights (functions/text.py source_kl_divergence; md5 bucket hash
    reproduced exactly in the oracle)."""
    from ..functions.text import source_kl_divergence

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["source", "text"])
    ds = _drop_null_rows(ds, ["text"])
    return source_kl_divergence(ds, group_col="source", col="text",
                                num_buckets=2048)


_KL_SOURCE_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents WHERE text IS NOT NULL),
b AS (
  SELECT source,
         CAST(concat('0x', substr(md5(tok), 1, 15)) AS UBIGINT)
           % 2048 AS h
  FROM toks),
sh AS (SELECT source, h, count(*) AS c FROM b GROUP BY 1, 2),
s AS (SELECT source, sum(c) AS n FROM sh GROUP BY 1),
g AS (SELECT h, sum(c) AS ch FROM sh GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM sh)
SELECT sh.source, CAST(s.n AS BIGINT) AS n_tokens,
       round(sum((c / CAST(s.n AS DOUBLE))
                 * ln((c / CAST(s.n AS DOUBLE))
                      / (g.ch / CAST(tot.n AS DOUBLE)))), 6) AS kl
FROM sh JOIN s USING (source) JOIN g USING (h) CROSS JOIN tot
GROUP BY 1, 2
"""


def q_length_band_docs(sf_dir):
    """Per-language length-band filter (drop the tails outside the
    lang's exact [p05, p95] of n_chars) — the per-group percentile
    filter LLM corpora apply before packing. Exact grouped
    quantile_disc via the fused (group x bin) histogram refinement
    (functions/quantiles.grouped_quantile_disc — fixed-size counts to
    the driver, the column never shuffles), bands broadcast into one
    stateless filter pass."""
    import ray

    from ..functions.quantiles import grouped_quantile_disc

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "lang", "n_chars"])
    ds = _drop_null_rows(ds, ["lang", "n_chars"])
    narrow = ds.materialize()
    lo = grouped_quantile_disc(narrow, "lang", "n_chars", 0.05,
                               bins=512, gather_limit=4096,
                               materialize=False, out="lo")
    hi = grouped_quantile_disc(narrow, "lang", "n_chars", 0.95,
                               bins=512, gather_limit=4096,
                               materialize=False, out="hi")
    b = lo.merge(hi, on="lang")
    bands = ray.put({k: (int(l), int(h)) for k, l, h
                     in zip(b["lang"], b["lo"], b["hi"])})

    def keep(t: pa.Table, bref) -> pa.Table:
        import ray as _ray
        f = _ray.get(bref)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        codes, uni = pd.factorize(langs)
        lo_ = np.array([f[u][0] for u in uni])[codes]
        hi_ = np.array([f[u][1] for u in uni])[codes]
        return t.filter(pa.array((v >= lo_) & (v <= hi_)))

    return narrow.map_batches(keep, fn_args=(bands,),
                              batch_format="pyarrow")


_LENGTH_BAND_SQL = """
WITH b AS (
  SELECT lang,
         CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS lo,
         CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS hi
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1)
SELECT doc_id, d.lang, n_chars
FROM documents d JOIN b USING (lang)
WHERE n_chars BETWEEN lo AND hi
"""


def q_bpe_train_docs(sf_dir):
    """Tokenizer-training pipeline stage: learn 24 BPE merges over the
    documents corpus (functions/text.py bpe_train — one corpus pass to
    a word-frequency Dataset, then |vocab|-table merge rounds).
    Rows-only: the rounds are sequentially dependent, so there is no
    single-query SQL oracle; exact parity vs a single-process reference
    implementation is pinned by tests/test_bpe_train.py under multiple
    block splits."""
    from ..functions.text import bpe_train

    docs = read_table(table_path(sf_dir, "documents"), columns=["text"])
    return bpe_train(docs, n_merges=24)


def q_audio_loudnorm_clips(sf_dir):
    """Loudness normalization (stages/analysis.py R128LoudnessNormalizer:
    gated program loudness -> single gain to -23 dB) over the raw-PCM
    clips, aggregated IN RAY to one row per (loudnorm_ok, gain sign
    band) with count + mean pre-loudness + mean |gain| — the corpus
    leveling report. Payload bytes are dropped in-stage before the
    aggregate so only metric columns shuffle. Rows-only: DSP is not
    SQL-expressible; post-normalization convergence to the target is
    pinned by tests/test_loudnorm.py re-measuring the emitted PCM."""
    from ray.data.aggregate import Count, Mean

    from ..sources.clips import clips_cache_dir
    from ..stages.analysis import R128LoudnessNormalizer
    from ..stages.taskpool import stage_fn

    ds = read_table(clips_cache_dir(sf_dir),
                    columns=["clip_id", "bytes", "sr_hz", "codec"])
    ln = ds.map_batches(stage_fn(R128LoudnessNormalizer),
                        batch_format="pyarrow", batch_size=256)

    def to_metrics(t: pa.Table) -> pa.Table:
        g = t["gain_db"].to_numpy(zero_copy_only=False)
        band = np.where(np.isnan(g), "n/a",
                        np.where(g >= 0, "boost", "cut"))
        ld = t["loudness_db"].to_numpy(zero_copy_only=False)
        return pa.table({
            "loudnorm_ok": t["loudnorm_ok"],
            "gain_band": pa.array(band, pa.string()),
            "loudness_db": pa.array(ld, mask=np.isnan(ld)),
            "abs_gain_db": pa.array(np.abs(g), mask=np.isnan(g)),
        })

    out = ln.map_batches(to_metrics, batch_format="pyarrow") \
        .groupby(["loudnorm_ok", "gain_band"]).aggregate(
            Count(alias_name="n"),
            Mean("loudness_db", alias_name="mean_loudness_db",
                 ignore_nulls=True),
            Mean("abs_gain_db", alias_name="mean_abs_gain_db",
                 ignore_nulls=True)).to_pandas()
    for c in ("mean_loudness_db", "mean_abs_gain_db"):
        out[c] = out[c].round(4)
    return out.sort_values(["loudnorm_ok", "gain_band"]) \
        .reset_index(drop=True)


# --- TPC-H analogue batch 2: Q3 / Q4 / Q13 / Q14 -------------------------


def q_q3_shipping_priority(sf_dir):
    """TPC-H Q3 analogue (shipping priority): top-10 open orders by
    unshipped revenue in the BUILDING segment. Scale split: the
    segment filter prunes customer to ~1/5 BEFORE its bucketed hash
    join with orders (both fact-sized at scale, narrow key columns
    only), lineitem is date-pruned at the read side and joined on
    o_orderkey, and the top-10 runs as per-block partial top-k ->
    O(blocks x 10) driver merge — never a global sort.

    Reference analogy: conjunction of `enum` + range keywords
    (jschon vocabulary/validation.py:49-55, :78-84) feeding a
    cross-resource `$ref` lookup (core.py:82-103), reduced to an
    ordered report. Money math is exact e4 integers:
    rev_e4 = price_e2 * (100 - disc_e2).
    """
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    cut = pd.Timestamp("1998-06-01")

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey", "c_mktsegment"])

    def filt_cust(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_mktsegment"], "BUILDING")
        return pa.table(
            {"o_custkey": t.filter(pc.fill_null(keep, False))["c_custkey"]})

    cust = cust.map_batches(filt_cust, batch_format="pyarrow")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate", "o_orderpriority"])

    def filt_orders(t: pa.Table) -> pa.Table:
        keep = pc.less(t["o_orderdate"], pa.scalar(cut))
        return t.filter(pc.fill_null(keep, False))

    orders = orders.map_batches(filt_orders, batch_format="pyarrow")
    co = hash_join(orders, cust, on="o_custkey", how="inner") \
        .select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])

    def proj_li(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_shipdate"], pa.scalar(cut))
        t = t.filter(pc.fill_null(keep, False))
        p = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        d = pc.round(pc.multiply(t["l_discount"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        rev = pc.multiply(p, pc.subtract(pa.scalar(100, pa.int64()), d))
        return pa.table({"o_orderkey": t["l_orderkey"], "rev_e4": rev})

    li = li.map_batches(proj_li, batch_format="pyarrow")

    per_order = hash_join(li, co, on="o_orderkey", how="inner") \
        .groupby(["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .aggregate(Sum("rev_e4", alias_name="revenue_e4"))

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_e4", "o_orderkey"],
                              ascending=[False, True]).head(10)

    out = per_order.map_batches(block_top, batch_format="pandas") \
        .to_pandas()  # O(blocks x 10) rows
    out["revenue_e4"] = out["revenue_e4"].round().astype("int64")
    out = out.sort_values(["revenue_e4", "o_orderkey"],
                          ascending=[False, True]).head(10)
    return out[["o_orderkey", "revenue_e4", "o_orderdate",
                "o_orderpriority"]].reset_index(drop=True)


_Q3_SHIPPING_PRIORITY_SQL = """
SELECT o_orderkey, revenue_e4, o_orderdate, o_orderpriority
FROM (
  SELECT l_orderkey AS o_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS revenue_e4,
         o_orderdate, o_orderpriority
  FROM customer, orders, lineitem
  WHERE c_mktsegment = 'BUILDING'
    AND c_custkey = o_custkey
    AND l_orderkey = o_orderkey
    AND o_orderdate < TIMESTAMP '1998-06-01'
    AND l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY 1, 3, 4) t
ORDER BY revenue_e4 DESC, o_orderkey
LIMIT 10
"""


def q_q4_order_priority(sf_dir):
    """TPC-H Q4 analogue (order priority checking). The reference
    predicate pair (l_commitdate < l_receiptdate) does not exist in
    this table's columns; the late-shipment test becomes
    EXISTS(lineitem shipped > 60 days after o_orderdate). Pattern:
    quarter-pruned orders bucket-hash-join the (orderkey, shipdate)
    projection of lineitem, the lateness test runs vectorized per
    batch, and the EXISTS collapses through a distinct groupby on
    o_orderkey BEFORE the tiny per-priority count — duplicate late
    lines never reach the final exchange.
    """
    import datetime as _dt

    from ray.data.aggregate import Count

    from ..functions.join import hash_join

    lo = pd.Timestamp("1997-07-01")
    hi = pd.Timestamp("1997-10-01")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])

    def filt_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                       pc.less(t["o_orderdate"], pa.scalar(hi)))
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"l_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "o_orderpriority": t["o_orderpriority"]})

    orders = orders.map_batches(filt_orders, batch_format="pyarrow")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_shipdate"])

    j = hash_join(li, orders, on="l_orderkey", how="inner")

    def late_only(t: pa.Table) -> pa.Table:
        lim = pc.add(t["o_orderdate"],
                     pa.scalar(_dt.timedelta(days=60)))
        keep = pc.greater(t["l_shipdate"], lim)
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "o_orderpriority": t["o_orderpriority"]})

    distinct_late = j.map_batches(late_only, batch_format="pyarrow") \
        .groupby(["l_orderkey", "o_orderpriority"]) \
        .aggregate(Count(alias_name="_n"))

    out = distinct_late.groupby("o_orderpriority") \
        .aggregate(Count(alias_name="order_count")).to_pandas()
    out = finalize(out, {"o_orderpriority": None, "order_count": "int64"})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


_Q4_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_q13_customer_distribution(sf_dir):
    """TPC-H Q13 analogue (customer order-count distribution): orders
    per customer excluding urgent ones, then the histogram of those
    counts including zero-order customers. Scale split: the per-cust
    count is one keyed exchange over the date/priority-pruned orders
    projection; the zero-fill runs as a bucketed LEFT hash join of the
    customer key column against the (already O(customers)-bounded)
    count table; the histogram is a second tiny exchange whose output
    is O(distinct counts).
    """
    from ray.data.aggregate import Count

    from ..functions.join import hash_join

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_custkey", "o_orderpriority"])

    def filt(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["o_orderpriority"], "1-URGENT")
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"c_custkey": t["o_custkey"]})

    per_cust = orders.map_batches(filt, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Count(alias_name="c_count"))

    cust = read_table(table_path(sf_dir, "customer"),
                      columns=["c_custkey"])

    j = hash_join(cust, per_cust, on="c_custkey", how="left")

    def zero_fill(t: pa.Table) -> pa.Table:
        c = pc.fill_null(t["c_count"], 0).cast(pa.int64())
        return pa.table({"c_count": c})

    out = j.map_batches(zero_fill, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Count(alias_name="custdist")) \
        .to_pandas()
    out = finalize(out, {"c_count": "int64", "custdist": "int64"})
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)


_Q13_CUSTDIST_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_q14_promo_effect(sf_dir):
    """TPC-H Q14 analogue (promotion effect): promo-part revenue vs
    total revenue for one ship month, both as exact e4 integers (the
    percentage is a trivial driver-side division; returning the two
    integers keeps the oracle comparison exact). Scale split: lineitem
    is month-pruned and projected to (partkey, rev_e4) BEFORE the
    bucketed hash join against the (p_partkey, is_promo) projection of
    part — part is fact-sized at SF 100k, so no broadcast; only a
    9-byte dim row per part enters the exchange. The final reduction
    is two-int partials per block, no shuffle.
    """
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    lo = pd.Timestamp("1997-09-01")
    hi = pd.Timestamp("1997-10-01")

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_type"])

    def proj_part(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["p_partkey"],
            "is_promo": pc.equal(t["p_type"], "PROMO")})

    part = part.map_batches(proj_part, batch_format="pyarrow")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])

    def proj_li(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                       pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(pc.fill_null(keep, False))
        p = pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        d = pc.round(pc.multiply(t["l_discount"], 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        rev = pc.multiply(p, pc.subtract(pa.scalar(100, pa.int64()), d))
        return pa.table({"l_partkey": t["l_partkey"], "rev_e4": rev})

    li = li.map_batches(proj_li, batch_format="pyarrow")
    j = hash_join(li, part, on="l_partkey", how="inner")

    def partial(t: pa.Table) -> pa.Table:
        rev = t["rev_e4"]
        promo = pc.sum(pc.if_else(pc.fill_null(t["is_promo"], False),
                                  rev, pa.scalar(0, pa.int64()))).as_py() or 0
        total = pc.sum(rev).as_py() or 0
        return pa.table({"promo_rev_e4": pa.array([promo], pa.int64()),
                         "total_rev_e4": pa.array([total], pa.int64())})

    agg = j.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo_rev_e4", alias_name="promo_rev_e4"),
        Sum("total_rev_e4", alias_name="total_rev_e4"))
    return pd.DataFrame({
        "promo_rev_e4": [int(agg["promo_rev_e4"] or 0)],
        "total_rev_e4": [int(agg["total_rev_e4"] or 0)]})


_Q14_PROMO_SQL = """
SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     ELSE 0 END) AS BIGINT) AS promo_rev_e4,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS total_rev_e4
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# --- TPC-H analogue: Q12 (shipping-delay priority bands) ------------------


def q_q12_shipping_delay_bands(sf_dir):
    """TPC-H Q12 analogue (shipping-mode priority counting). The
    reference's l_shipmode column does not exist in this table; the
    mode bands become shipping-DELAY bands (shipdate - orderdate:
    <30d / 30-90d / >90d), counting critical-priority (1-URGENT,
    2-HIGH) vs other orders per band for one ship year. One bucketed
    hash join on the orderkey, then a vectorized band/priority
    classification and an O(bands) exchange.
    """
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1998-01-01")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])

    def proj_orders(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "o_orderpriority": t["o_orderpriority"]})

    orders = orders.map_batches(proj_orders, batch_format="pyarrow")

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_shipdate"])

    def filt_li(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                       pc.less(t["l_shipdate"], pa.scalar(hi)))
        return t.filter(pc.fill_null(keep, False))

    li = li.map_batches(filt_li, batch_format="pyarrow")
    j = hash_join(li, orders, on="l_orderkey", how="inner")

    def classify(t: pa.Table) -> pa.Table:
        delay = pc.days_between(t["o_orderdate"], t["l_shipdate"])
        d = delay.to_numpy(zero_copy_only=False)
        band = np.where(d < 30, "under_30d",
                        np.where(d <= 90, "30_to_90d", "over_90d"))
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(pri, ("1-URGENT", "2-HIGH")).astype(np.int64)
        return pa.table({"delay_band": pa.array(band, pa.string()),
                         "high_line_count": pa.array(high),
                         "low_line_count": pa.array(1 - high)})

    out = j.map_batches(classify, batch_format="pyarrow") \
        .groupby("delay_band").aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count")) \
        .to_pandas()
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].round().astype("int64")
    return out.sort_values("delay_band").reset_index(drop=True)


_Q12_DELAY_SQL = """
SELECT delay_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30
              THEN 'under_30d'
              WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
              THEN '30_to_90d'
              ELSE 'over_90d' END AS delay_band
  FROM orders, lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01') t
GROUP BY delay_band
ORDER BY delay_band
"""



# ---------------------------------------------------------------------------
# z-order clustered layout + stats-pruned scan (functions/layout.py)
# ---------------------------------------------------------------------------

def q_zorder_pruning_lineitem(sf_dir):
    """Box-selective aggregate over a z-order-clustered lineitem layout:
    cluster once by Morton-interleaved (l_partkey, l_suppkey) rank bits
    into 32 z-sorted parquet files, then answer the box predicate by
    reading ONLY the files whose footer min/max stats intersect it
    (functions/layout.py zorder_write/pruned_scan — the data-layout
    complement of read-time column pruning; no jschon analogue, the
    reference has no storage layer at all, json.py:34). The clustered
    layout is a /tmp cache fingerprinted by source size+mtime (ADVICE
    r2 posture), and the result is layout-independent — byte-equal to
    the same aggregate over the original file, which is exactly what
    the DuckDB oracle checks."""
    import os

    from ray.data.aggregate import Count, Sum

    from ..functions.layout import pruned_scan, zorder_write

    tag = _index_cache_tag(sf_dir, "lineitem")
    out_dir = f"/tmp/jschon_ray_zorder_{tag}"
    if not os.path.exists(os.path.join(out_dir, "_manifest.json")):
        ds = read_table(table_path(sf_dir, "lineitem"),
                        columns=["l_partkey", "l_suppkey", "l_quantity",
                                 "l_returnflag"])
        zorder_write(ds, ["l_partkey", "l_suppkey"], out_dir,
                     num_files=32)

    box = {"l_partkey": (100, 400), "l_suppkey": (10, 60)}
    ds, stats = pruned_scan(out_dir, box)

    def to_exact(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "qty": pc.round(t["l_quantity"]).cast(pa.int64()),
        })

    out = ds.map_batches(to_exact, batch_format="pyarrow") \
        .groupby("l_returnflag") \
        .aggregate(Sum("qty", alias_name="sum_qty"),
                   Count(alias_name="n_rows")) \
        .to_pandas()
    out = finalize(out, {"l_returnflag": None, "sum_qty": "int64",
                         "n_rows": "int64"})
    return out.sort_values("l_returnflag").reset_index(drop=True)


_ZORDER_PRUNING_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 400
  AND l_suppkey BETWEEN 10 AND 60
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# TPC-H analogue completion: Q2 / Q9 / Q11 / Q16 / Q20 (no partsupp table in
# the driver testdata, so each states its adapted cost/stock proxy — the
# reference semantics being mirrored are the classic TPC-H shapes:
# min-cost-supplier, product profit, important stock, supplier-part counts,
# promotion shortlist).


def q_q2_min_cost_supplier(sf_dir):
    """TPC-H Q2 analogue (min-cost supplier per part within a region).

    Without a partsupp table the 'supply cost' proxy is the cheapest
    discounted line ever shipped for a (part, supplier) pair:
    cost_e2 = min round(l_extendedprice*100*(1-l_discount)). Scale
    split: the part filter (STANDARD, size>=10) and the EUROPE
    supplier dim are broadcast value-sets; lineitem pre-aggregates
    (part, supplier) -> min cost per block before ONE groupby whose
    key count is bounded by |parts| x |region suppliers| (a dim
    product, not a fact count). The per-part min + tie surface run
    over that bounded result, exactly like the oracle's QUALIFY."""
    from ray.data.aggregate import Min

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_type", "p_size"]).to_pandas()
    part = part[(part.p_type == "STANDARD") & (part.p_size >= 10)]
    part_keys = pa.array(sorted(int(k) for k in part.p_partkey), pa.int64())

    nation = read_table(table_path(sf_dir, "nation")).to_pandas()
    region = read_table(table_path(sf_dir, "region")).to_pandas()
    eu_nations = set(
        int(k) for k in nation.merge(
            region[region.r_name == "EUROPE"],
            left_on="n_regionkey", right_on="r_regionkey").n_nationkey)
    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_name",
                               "s_nationkey"]).to_pandas()
    supp = supp[supp.s_nationkey.astype(int).isin(eu_nations)]
    if len(supp) and int(supp.s_suppkey.max()) >= (1 << 20):
        raise ValueError("q2_min_cost_supplier: s_suppkey exceeds the "
                         "2^20 (partkey, suppkey) pack width")
    supp_keys = pa.array(sorted(int(k) for k in supp.s_suppkey), pa.int64())
    name_of = dict(zip((int(k) for k in supp.s_suppkey), supp.s_name))

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["l_partkey"], value_set=part_keys),
            pc.is_in(t["l_suppkey"], value_set=supp_keys))
        t = t.filter(pc.fill_null(keep, False))
        cost = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        key = pc.add(pc.multiply(t["l_partkey"], 1 << 20), t["l_suppkey"])
        tbl = pa.table({"ps_key": key, "cost_e2": cost})
        return tbl.group_by("ps_key").aggregate([("cost_e2", "min")]) \
                  .rename_columns(["ps_key", "cost_e2"])

    agg = li.map_batches(partial, batch_format="pyarrow") \
            .groupby("ps_key") \
            .aggregate(Min("cost_e2", alias_name="cost_e2")).to_pandas()
    if len(agg) == 0:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "cost_e2": pd.Series([], dtype="int64")})
    agg["p_partkey"] = (agg.ps_key // (1 << 20)).astype("int64")
    agg["s_suppkey"] = (agg.ps_key % (1 << 20)).astype("int64")
    agg["cost_e2"] = agg.cost_e2.astype("int64")
    best = agg.groupby("p_partkey").cost_e2.transform("min")
    out = agg[agg.cost_e2 == best].copy()
    out["s_name"] = out.s_suppkey.map(name_of)
    return out[["p_partkey", "s_suppkey", "s_name", "cost_e2"]] \
        .sort_values(["p_partkey", "s_suppkey"]).reset_index(drop=True)


_Q2_MIN_COST_SQL = """
WITH eu AS (
  SELECT s_suppkey, s_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
pf AS (
  SELECT p_partkey FROM part
  WHERE p_type = 'STANDARD' AND p_size >= 10),
cost AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         min(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                  AS BIGINT)) AS cost_e2
  FROM lineitem
  JOIN pf ON l_partkey = p_partkey
  JOIN eu ON l_suppkey = s_suppkey
  GROUP BY 1, 2)
SELECT p_partkey, s_suppkey, s_name, cost_e2
FROM cost JOIN eu USING (s_suppkey)
QUALIFY cost_e2 = min(cost_e2) OVER (PARTITION BY p_partkey)
ORDER BY p_partkey, s_suppkey
"""


def q_q9_product_profit(sf_dir):
    """TPC-H Q9 analogue (product-type profit by nation and year).

    profit_e2 = sum(round(l_extendedprice*100*(1-l_discount))
                    - round(60*p_retailprice*l_quantity)) over parts
    whose name contains 'widget' — the partsupp.ps_supplycost term is
    replaced by 0.6*p_retailprice (a broadcast part attribute; both
    engines round the cent-scaled term identically, and 60*retail*qty
    has fractional part in {0,.2,.4,.6,.8} so no half-way ties exist).
    Scale split: part and supplier->nation dims broadcast into the
    lineitem scan; lineitem x orders is the one large-large bucketed
    hash join; per-block partials reduce to <= 25 nations x years
    rows before the final groupby."""
    from ray.data.aggregate import Sum

    from ..functions.join import hash_join

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_name",
                               "p_retailprice"]).to_pandas()
    part = part[part.p_name.str.contains("widget")]
    pdim = pa.table({
        "l_partkey": pa.array(part.p_partkey.astype("int64")),
        "p_retailprice": pa.array(part.p_retailprice.astype("float64"))})

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sdim = pa.table({
        "l_suppkey": pa.array(supp.s_suppkey.astype("int64")),
        "s_nationkey": pa.array(supp.s_nationkey.astype("int64"))})

    nation = read_table(table_path(sf_dir, "nation")).to_pandas()
    nation_name = dict(zip((int(k) for k in nation.n_nationkey),
                           nation.n_name))

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_quantity", "l_extendedprice",
                             "l_discount"])

    def project_li(t: pa.Table) -> pa.Table:
        j = t.join(pdim, keys="l_partkey", join_type="inner")
        j = j.join(sdim, keys="l_suppkey", join_type="inner")
        rev = pc.round(pc.multiply(
            pc.multiply(j["l_extendedprice"], 100.0),
            pc.subtract(1.0, j["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        cost = pc.round(pc.multiply(
            pc.multiply(j["p_retailprice"], 60.0), j["l_quantity"]),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_orderkey": j["l_orderkey"],
                         "s_nationkey": j["s_nationkey"],
                         "profit_e2": pc.subtract(rev, cost)})

    li = li.map_batches(project_li, batch_format="pyarrow")

    orders = read_table(table_path(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderdate"])

    def project_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["o_orderkey"],
            "o_year": pc.year(t["o_orderdate"]).cast(pa.int64())})

    orders = orders.map_batches(project_orders, batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey", how="inner")

    def partial(t: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(t["s_nationkey"], 10000), t["o_year"])
        tbl = pa.table({"ny_key": key, "profit_e2": t["profit_e2"]})
        return tbl.group_by("ny_key").aggregate([("profit_e2", "sum")]) \
                  .rename_columns(["ny_key", "profit_e2"])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("ny_key") \
        .aggregate(Sum("profit_e2", alias_name="profit_e2")).to_pandas()
    if len(agg) == 0:
        return pd.DataFrame({"nation": pd.Series([], dtype=object),
                             "o_year": pd.Series([], dtype="int64"),
                             "profit_e2": pd.Series([], dtype="int64")})
    agg["nation"] = (agg.ny_key // 10000).astype(int).map(nation_name)
    agg["o_year"] = (agg.ny_key % 10000).astype("int64")
    agg["profit_e2"] = agg.profit_e2.astype("int64")
    return agg[["nation", "o_year", "profit_e2"]] \
        .sort_values(["nation", "o_year"]).reset_index(drop=True)


_Q9_PRODUCT_PROFIT_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                     AS BIGINT)
              - CAST(round(60.0 * p_retailprice * l_quantity)
                     AS BIGINT)) AS BIGINT) AS profit_e2
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_q11_important_parts(sf_dir):
    """TPC-H Q11 analogue (important stock): parts whose ASIA-supplied
    revenue exceeds TWICE the mean per-part ASIA revenue (a scale-free
    threshold — TPC-H's fixed `> fraction * total` cutoff empties out
    as |parts| grows past 1/fraction). The partsupp
    ps_availqty*ps_supplycost value term is replaced by discounted
    lineitem revenue from ASIA suppliers (a broadcast supplier
    value-set). Per-block (partkey, rev) partials bound the groupby at
    |parts| keys; the threshold pass runs over that O(parts) result
    with Python-int cross-multiplication (no float division, no int64
    overflow at scale)."""
    from ray.data.aggregate import Sum

    nation = read_table(table_path(sf_dir, "nation")).to_pandas()
    region = read_table(table_path(sf_dir, "region")).to_pandas()
    asia_nations = set(
        int(k) for k in nation.merge(
            region[region.r_name == "ASIA"],
            left_on="n_regionkey", right_on="r_regionkey").n_nationkey)
    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp.s_nationkey.astype(int).isin(asia_nations)]
    supp_keys = pa.array(sorted(int(k) for k in supp.s_suppkey), pa.int64())

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["l_suppkey"], value_set=supp_keys)
        t = t.filter(pc.fill_null(keep, False))
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        tbl = pa.table({"p_partkey": t["l_partkey"], "value_e2": rev})
        return tbl.group_by("p_partkey").aggregate([("value_e2", "sum")]) \
                  .rename_columns(["p_partkey", "value_e2"])

    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("p_partkey") \
        .aggregate(Sum("value_e2", alias_name="value_e2")).to_pandas()
    if len(agg) == 0:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "value_e2": pd.Series([], dtype="int64")})
    agg["value_e2"] = agg.value_e2.astype("int64")
    total = sum(int(v) for v in agg.value_e2)
    n = len(agg)
    keep = [int(v) * n > 2 * total for v in agg.value_e2]
    out = agg[pd.Series(keep, index=agg.index)]
    return out[["p_partkey", "value_e2"]] \
        .sort_values(["value_e2", "p_partkey"],
                     ascending=[False, True]).reset_index(drop=True)


_Q11_IMPORTANT_PARTS_SQL = """
WITH v AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                  AS BIGINT)) AS value_e2
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1)
SELECT p_partkey, CAST(value_e2 AS BIGINT) AS value_e2
FROM v
WHERE value_e2 * (SELECT count(*) FROM v)
      > 2 * (SELECT sum(value_e2) FROM v)
ORDER BY value_e2 DESC, p_partkey
"""


def q_q16_supplier_part_counts(sf_dir):
    """TPC-H Q16 analogue (supplier count per part attribute triple):
    distinct suppliers that shipped each (brand, type, size) class,
    excluding negative-balance suppliers (the 'customer complaints'
    exclusion proxy). Scale split: the part attribute dim and the
    excluded-supplier set broadcast into the scan; per-block unique
    (partkey, suppkey) pairs shuffle into a groupby bounded by the
    |parts| x |suppliers| dim product — never by fact rows; the attr
    rollup + distinct count run over that bounded pair set."""
    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_brand", "p_type",
                               "p_size"]).to_pandas()
    sizes = {1, 4, 7, 10, 13, 16, 19, 22, 25}
    part = part[(part.p_brand != "Brand#13") & (part.p_type != "PROMO")
                & (part.p_size.astype(int).isin(sizes))]
    part_keys = pa.array(sorted(int(k) for k in part.p_partkey), pa.int64())
    attr_of = {int(k): (b, t, int(s)) for k, b, t, s in zip(
        part.p_partkey, part.p_brand, part.p_type, part.p_size)}

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_acctbal"]).to_pandas()
    if len(supp) and int(supp.s_suppkey.max()) >= (1 << 20):
        raise ValueError("q16_supplier_part_counts: s_suppkey exceeds "
                         "the 2^20 (partkey, suppkey) pack width")
    bad = sorted(int(k) for k in supp[supp.s_acctbal < 0].s_suppkey)
    bad_keys = pa.array(bad, pa.int64())

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_suppkey"])

    def block_pairs(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["l_partkey"], value_set=part_keys)
        if len(bad):
            keep = pc.and_(keep, pc.invert(
                pc.is_in(t["l_suppkey"], value_set=bad_keys)))
        t = t.filter(pc.fill_null(keep, False))
        key = pc.add(pc.multiply(t["l_partkey"], 1 << 20), t["l_suppkey"])
        uniq = pc.unique(key)
        return pa.table({"ps_key": uniq})

    pairs = li.map_batches(block_pairs, batch_format="pyarrow") \
        .groupby("ps_key").count().to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"p_brand": pd.Series([], dtype=object),
                             "p_type": pd.Series([], dtype=object),
                             "p_size": pd.Series([], dtype="int64"),
                             "supplier_cnt": pd.Series([], dtype="int64")})
    pk = (pairs.ps_key // (1 << 20)).astype(int)
    sk = (pairs.ps_key % (1 << 20)).astype(int)
    df = pd.DataFrame({"attr": pk.map(attr_of), "s": sk})
    g = df.groupby("attr").s.nunique()
    out = pd.DataFrame({
        "p_brand": [a[0] for a in g.index],
        "p_type": [a[1] for a in g.index],
        "p_size": pd.array([a[2] for a in g.index], dtype="int64"),
        "supplier_cnt": pd.array(g.values, dtype="int64")})
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)


_Q16_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_q20_promotion_suppliers(sf_dir):
    """TPC-H Q20 analogue (potential part promotion shortlist):
    suppliers whose 1997 shipped quantity of '%bolt%' parts is
    strictly above the mean over suppliers that shipped any such
    part (the ps_availqty > 0.5*sum(qty) stock test is replaced by
    an above-average shipped-volume test — same shape: a per-supplier
    aggregate compared against a corpus statistic). The part filter
    broadcasts; per-block (suppkey, qty) partials bound the groupby
    at |suppliers| keys; the mean comparison cross-multiplies Python
    ints (qty_sum * n > total) so no float division enters the
    verdict."""
    from ray.data.aggregate import Sum

    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1998-01-01")

    part = read_table(table_path(sf_dir, "part"),
                      columns=["p_partkey", "p_name"]).to_pandas()
    part = part[part.p_name.str.contains("bolt")]
    part_keys = pa.array(sorted(int(k) for k in part.p_partkey), pa.int64())

    li = read_table(table_path(sf_dir, "lineitem"),
                    columns=["l_partkey", "l_suppkey", "l_quantity",
                             "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["l_partkey"], value_set=part_keys),
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi))))
        t = t.filter(pc.fill_null(keep, False))
        qty = t["l_quantity"].cast(pa.int64())
        tbl = pa.table({"s_suppkey": t["l_suppkey"], "qty_sum": qty})
        return tbl.group_by("s_suppkey").aggregate([("qty_sum", "sum")]) \
                  .rename_columns(["s_suppkey", "qty_sum"])

    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("s_suppkey") \
        .aggregate(Sum("qty_sum", alias_name="qty_sum")).to_pandas()
    if len(agg) == 0:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "qty_sum": pd.Series([], dtype="int64")})
    agg["qty_sum"] = agg.qty_sum.astype("int64")
    total = sum(int(v) for v in agg.qty_sum)
    n = len(agg)
    keep = [int(v) * n > total for v in agg.qty_sum]
    out = agg[pd.Series(keep, index=agg.index)].copy()

    supp = read_table(table_path(sf_dir, "supplier"),
                      columns=["s_suppkey", "s_name"]).to_pandas()
    out = out.merge(supp, on="s_suppkey")
    return out[["s_suppkey", "s_name", "qty_sum"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


_Q20_PROMOTION_SQL = """
WITH s AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%bolt%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, qty_sum
FROM s JOIN supplier USING (s_suppkey)
WHERE qty_sum * (SELECT count(*) FROM s) > (SELECT sum(qty_sum) FROM s)
ORDER BY s_suppkey
"""


def q_substring_dup_docs(sf_dir):
    """Exact substring cross-doc duplication audit (bounded
    suffix-array-style span dedup): overlapping 40-char windows at
    stride 10, duplicated = identical content in >= 2 distinct docs;
    per owning doc, window counts + exact union char coverage. Narrow
    3-int rows shuffle twice (hash bucket, then doc bucket); document
    text never leaves the scan stage."""
    from ..functions.dedup import substring_dup_spans

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "text"])
    return substring_dup_spans(ds, id_col="doc_id", col="text",
                               window=40, stride=10)


_SUBSTRING_DUP_SQL = """
WITH wins AS (
  SELECT doc_id, CAST(t.i * 10 AS BIGINT) AS pos,
         substr(text, CAST(t.i * 10 + 1 AS BIGINT), 40) AS w,
         CAST((length(text) - 40) // 10 + 1 AS BIGINT) AS n_windows
  FROM documents,
       UNNEST(range(CAST((length(text) - 40) // 10 + 1 AS BIGINT)))
         AS t(i)
  WHERE length(text) >= 40
), freq AS (
  SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2
), dup AS (
  SELECT doc_id, pos, n_windows FROM wins JOIN freq USING (w)
), cov AS (
  SELECT doc_id, n_windows,
         CASE WHEN lead(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS NULL
              THEN 40
              ELSE least(lead(pos) OVER (PARTITION BY doc_id
                                         ORDER BY pos) - pos, 40)
         END AS c
  FROM dup
)
SELECT doc_id, n_windows,
       CAST(count(*) AS BIGINT) AS n_dup_windows,
       CAST(sum(c) AS BIGINT) AS dup_chars
FROM cov
GROUP BY doc_id, n_windows
"""


def q_fingerprint_lookup_clips(sf_dir):
    """Query-by-example audio retrieval: fingerprint 4 deterministic
    query clips (members of planted duplicate groups in the fp corpus),
    broadcast their landmarks, and probe the corpus landmark stream —
    the corpus side never shuffles; only per-candidate vote partials
    do. Each query retrieves itself (dt=0) plus its duplicate-group
    partners at the planted frame offsets. Rows-only: DSP is not
    SQL-expressible."""
    from ..sources.clips import fp_corpus_cache_dir, fp_plan
    from ..stages.fingerprint import AudioFingerprinter, fingerprint_lookup
    from ..stages.taskpool import stage_fn

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    n = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 20000}.get(tag, 500)
    ids, dup = fp_plan(n, seed=17)
    query_ids = [ids[i] for i in sorted(dup)[:4]]   # 4 planted copies

    import pyarrow.parquet as pq

    corpus_dir = fp_corpus_cache_dir(sf_dir)
    corpus = read_table(corpus_dir,
                        columns=["clip_id", "bytes", "codec"])
    # the 4 query rows come from a pushed-down parquet predicate —
    # kilobytes read, not a second full corpus scan
    qtab = pq.read_table(corpus_dir,
                         columns=["clip_id", "bytes", "codec"],
                         filters=[("clip_id", "in", query_ids)])
    q_landmarks = AudioFingerprinter()(qtab)

    lm = corpus.map_batches(stage_fn(AudioFingerprinter),
                            batch_format="pyarrow", batch_size=128)
    hits = fingerprint_lookup(lm, q_landmarks, min_matches=40)
    out = hits.to_pandas()
    if not len(out.columns):   # ray to_pandas drops cols when all-empty
        out = pd.DataFrame({"query_id": pd.Series([], dtype=object),
                            "clip_id": pd.Series([], dtype=object),
                            "matches": pd.Series([], dtype="int64"),
                            "dt": pd.Series([], dtype="int64")})
    return out.sort_values(["query_id", "clip_id"]) \
        .reset_index(drop=True)


_BLOOM_LOOKUP_KEYS = [97 * i for i in range(1, 25)]   # deterministic probes


def q_bloom_pointlookup_lineitem(sf_dir):
    """Point-lookup aggregate over a hash-partitioned lineitem layout
    with per-file Bloom sidecars: partition once by l_orderkey into 32
    files (each key wholly in one file), index each file with a Bloom
    filter over the key column, then answer a 24-key IN probe by
    reading ONLY the files whose sidecar may contain a probe key
    (functions/layout.py hash_partition_write / bloom_index_write /
    bloom_point_scan — membership skipping where min/max stats cannot
    prune point sets; no false negatives, so the result is byte-equal
    to the unpruned filter, which is exactly what the oracle checks).
    Layout + sidecars are a /tmp cache fingerprinted by source
    size+mtime."""
    import os

    from ray.data.aggregate import Count, Sum

    from ..functions.layout import (bloom_index_write, bloom_point_scan,
                                    hash_partition_write)

    tag = _index_cache_tag(sf_dir, "lineitem")
    out_dir = f"/tmp/jschon_ray_bloomidx_{tag}"
    if not os.path.exists(os.path.join(out_dir, "_INDEXED")):
        ds = read_table(table_path(sf_dir, "lineitem"),
                        columns=["l_orderkey", "l_extendedprice",
                                 "l_discount"])
        hash_partition_write(ds, "l_orderkey", out_dir, num_files=32)
        bloom_index_write(out_dir, "l_orderkey")
        with open(os.path.join(out_dir, "_INDEXED"), "w") as f:
            f.write("ok")

    ds, stats = bloom_point_scan(out_dir, "l_orderkey",
                                 _BLOOM_LOOKUP_KEYS)

    def to_exact(t: pa.Table) -> pa.Table:
        rev = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], 100.0),
            pc.subtract(1.0, t["l_discount"])),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e2": rev})

    out = ds.map_batches(to_exact, batch_format="pyarrow") \
        .groupby("l_orderkey") \
        .aggregate(Sum("rev_e2", alias_name="rev_e2"),
                   Count(alias_name="n_lines")) \
        .to_pandas()
    out = finalize(out, {"l_orderkey": "int64", "n_lines": "int64",
                         "rev_e2": "int64"})
    return out.sort_values("l_orderkey").reset_index(drop=True)


_BLOOM_POINTLOOKUP_SQL = f"""
SELECT l_orderkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100 * (1 - l_discount))
                     AS BIGINT)) AS BIGINT) AS rev_e2
FROM lineitem
WHERE l_orderkey IN ({', '.join(str(k) for k in _BLOOM_LOOKUP_KEYS)})
GROUP BY 1
ORDER BY 1
"""


def q_filter_cascade_docs(sf_dir):
    """Staged quality-filter cascade with per-stage survivor accounting
    — the yield report every corpus-cleaning pipeline publishes (each
    gate sees only the previous gate's survivors): length band ->
    language allowlist -> minimum word count -> mean-word-length cap.
    ONE streaming pass: cumulative masks per batch emit 4 partial
    (stage, n_in, n_out) rows per block, summed in one tiny groupby —
    counts are additive across blocks, so the global funnel is exact.
    The mean-word-length gate cross-multiplies integers
    (nonspace <= 8 * n_words) so no float division enters a verdict."""
    from ray.data.aggregate import Sum

    STAGES = ["length", "lang", "min_words", "mean_word_len"]
    LANGS = ("en", "de", "fr", "es")

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["text", "lang", "n_chars"])

    def partials(t: pa.Table) -> pa.Table:
        n = t.num_rows
        texts = t["text"].to_pandas()
        nw = texts.str.split().str.len().fillna(0).to_numpy(np.int64)
        nonspace = texts.str.replace(r"\s", "", regex=True) \
            .str.len().fillna(0).to_numpy(np.int64)
        nchars = t["n_chars"].to_numpy(zero_copy_only=False)
        lang = t["lang"].to_pandas()
        m1 = (nchars >= 120) & (nchars <= 480)
        m2 = m1 & lang.isin(LANGS).to_numpy()
        m3 = m2 & (nw >= 20)
        m4 = m3 & (nonspace <= 8 * nw)
        ins = np.array([n, m1.sum(), m2.sum(), m3.sum()], np.int64)
        outs = np.array([m1.sum(), m2.sum(), m3.sum(), m4.sum()],
                        np.int64)
        return pa.table({"stage_no": pa.array([1, 2, 3, 4], pa.int64()),
                         "n_in": pa.array(ins), "n_out": pa.array(outs)})

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("stage_no") \
        .aggregate(Sum("n_in", alias_name="n_in"),
                   Sum("n_out", alias_name="n_out")).to_pandas()
    agg = finalize(agg, {"stage_no": "int64", "n_in": "int64",
                         "n_out": "int64"})
    agg = agg.sort_values("stage_no").reset_index(drop=True)
    agg["stage"] = [STAGES[i - 1] for i in agg.stage_no]
    return agg[["stage_no", "stage", "n_in", "n_out"]]


_FILTER_CASCADE_SQL = r"""
WITH f AS (
  SELECT n_chars, lang,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS nw,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace
  FROM documents),
m AS (
  SELECT (n_chars BETWEEN 120 AND 480) AS p1,
         (n_chars BETWEEN 120 AND 480)
           AND lang IN ('en', 'de', 'fr', 'es') AS p2,
         (n_chars BETWEEN 120 AND 480)
           AND lang IN ('en', 'de', 'fr', 'es') AND nw >= 20 AS p3,
         (n_chars BETWEEN 120 AND 480)
           AND lang IN ('en', 'de', 'fr', 'es') AND nw >= 20
           AND nonspace <= 8 * nw AS p4
  FROM f)
SELECT CAST(1 AS BIGINT) AS stage_no, 'length' AS stage,
       CAST(count(*) AS BIGINT) AS n_in,
       CAST(count(*) FILTER (WHERE p1) AS BIGINT) AS n_out FROM m
UNION ALL
SELECT 2, 'lang', CAST(count(*) FILTER (WHERE p1) AS BIGINT),
       CAST(count(*) FILTER (WHERE p2) AS BIGINT) FROM m
UNION ALL
SELECT 3, 'min_words', CAST(count(*) FILTER (WHERE p2) AS BIGINT),
       CAST(count(*) FILTER (WHERE p3) AS BIGINT) FROM m
UNION ALL
SELECT 4, 'mean_word_len', CAST(count(*) FILTER (WHERE p3) AS BIGINT),
       CAST(count(*) FILTER (WHERE p4) AS BIGINT) FROM m
ORDER BY stage_no
"""


def q_grouped_split_docs(sf_dir):
    """Leakage-safe train/heldout split: the split key is the SOURCE,
    not the document, so near-duplicates within one crawl source can
    never straddle the boundary (the contamination failure mode of
    per-doc splits). Pure per-batch kernel over the hashed source —
    no shuffle, layout-invariant; the per-(source, split) counts it
    returns PROVE the invariant: every source maps to exactly one
    split."""
    from ray.data.aggregate import Count

    from ..functions.split import assign_split

    ds = read_table(table_path(sf_dir, "documents"),
                    columns=["doc_id", "source"])
    ds = ds.map_batches(
        functools.partial(assign_split, id_col="source",
                          fracs={"train": 0.8, "heldout": 0.2}),
        batch_format="pyarrow")

    def key(t: pa.Table) -> pa.Table:
        return pa.table({"source_split": pc.binary_join_element_wise(
            t["source"], t["split"], "|")})

    out = ds.map_batches(key, batch_format="pyarrow") \
        .groupby("source_split") \
        .aggregate(Count(alias_name="n_docs")).to_pandas()
    out = finalize(out, {"source_split": None, "n_docs": "int64"})
    parts = out.source_split.str.split("|")
    out["source"] = parts.str[0]
    out["split"] = parts.str[1]
    out["n_docs"] = out.n_docs.astype("int64")
    return out[["source", "split", "n_docs"]] \
        .sort_values(["source", "split"]).reset_index(drop=True)


_GROUPED_SPLIT_SQL = f"""
SELECT source,
       CASE WHEN u < 0.8 THEN 'train' ELSE 'heldout' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs
FROM (SELECT source, {_U_SQL.format(id='source')} AS u FROM documents)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_merge_orders_cdc(sf_dir):
    """CDC MERGE apply (upsert engine op): a change-set of DELETEs
    (o_orderkey % 97 == 0), UPDATEs (price +1.00 where key % 10 == 3)
    and INSERTs (key + 10_000_000 clones where key % 1000 == 1) is
    applied to the base orders table through ONE bucketed full-outer
    co-group on the key (functions/join.hash_join how='full'): a
    matched DELETE drops the row, a matched UPDATE replaces it, an
    unmatched delta row inserts — the reference's JSONPatch add/
    remove/replace ops (vspec/patch.py; reference json.py:327-445)
    lifted from one document to a keyed table. Verdict surface: the
    merged table's per-priority counts and exact cent sums (every op
    type shifts them)."""
    from ray.data.aggregate import Count, Sum

    from ..functions.join import hash_join

    base = read_table(table_path(sf_dir, "orders"),
                      columns=["o_orderkey", "o_orderpriority",
                               "o_totalprice"])

    def project_base(t: pa.Table) -> pa.Table:
        price = pc.round(pc.multiply(t["o_totalprice"], 100.0),
                         round_mode="half_towards_infinity") \
            .cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"],
                         "price_e2": price})

    base = base.map_batches(project_base, batch_format="pyarrow")

    def make_delta(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        # DELETE takes precedence: a key matching both rules gets ONE
        # delta row (one op per key is the CDC-feed invariant the
        # full-outer apply relies on)
        dele = t.filter(pa.array(k % 97 == 0))
        upd = t.filter(pa.array((k % 10 == 3) & (k % 97 != 0)))
        ins = t.filter(pa.array(k % 1000 == 1))
        # insert keys must land OUTSIDE the base keyspace or the
        # full-outer apply would silently REPLACE a real order instead
        # of inserting — fail loud past the offset
        if len(k) and int(k.max()) >= 10_000_000:
            raise ValueError(
                "merge_orders_cdc: base o_orderkey >= 10_000_000 "
                "collides with the synthetic insert keyspace")
        out = pa.table({
            "o_orderkey": pa.concat_arrays([
                dele["o_orderkey"].combine_chunks(),
                upd["o_orderkey"].combine_chunks(),
                pc.add(ins["o_orderkey"], 10_000_000).combine_chunks()]),
            "op": pa.array(["D"] * dele.num_rows + ["U"] * upd.num_rows
                           + ["I"] * ins.num_rows, pa.string()),
            "new_priority": pa.concat_arrays([
                dele["o_orderpriority"].combine_chunks(),
                upd["o_orderpriority"].combine_chunks(),
                ins["o_orderpriority"].combine_chunks()]),
            "new_price_e2": pa.concat_arrays([
                dele["price_e2"].combine_chunks(),
                pc.add(upd["price_e2"], 100).combine_chunks(),
                ins["price_e2"].combine_chunks()])})
        return out

    delta = base.map_batches(make_delta, batch_format="pyarrow")
    merged = hash_join(base, delta, on="o_orderkey", how="full")

    def apply_ops(t: pa.Table) -> pa.Table:
        op = t["op"].to_numpy(zero_copy_only=False)
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        price = t["price_e2"].to_numpy(zero_copy_only=False)
        npri = t["new_priority"].to_numpy(zero_copy_only=False)
        nprice = t["new_price_e2"].to_numpy(zero_copy_only=False)
        keep = op != "D"                       # matched deletes drop
        out_pri = np.where((op == "U") | (op == "I"), npri, pri)
        out_price = np.where((op == "U") | (op == "I"),
                             nprice, price)
        return pa.table({
            "o_orderpriority": pa.array(out_pri[keep].tolist(),
                                        pa.string()),
            "price_e2": pa.array(
                out_price[keep].astype(np.int64))})

    agg = merged.map_batches(apply_ops, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Count(alias_name="n_orders"),
                   Sum("price_e2", alias_name="sum_price_e2")) \
        .to_pandas()
    agg = finalize(agg, {"o_orderpriority": None, "n_orders": "int64",
                         "sum_price_e2": "int64"})
    return agg.sort_values("o_orderpriority").reset_index(drop=True)


_MERGE_ORDERS_CDC_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2
  FROM orders),
merged AS (
  SELECT o_orderpriority, price_e2 FROM base
  WHERE o_orderkey % 97 <> 0 AND o_orderkey % 10 <> 3
  UNION ALL
  SELECT o_orderpriority, price_e2 + 100 FROM base
  WHERE o_orderkey % 10 = 3 AND o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderpriority, price_e2 FROM base
  WHERE o_orderkey % 1000 = 1)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(price_e2) AS BIGINT) AS sum_price_e2
FROM merged
GROUP BY 1
ORDER BY 1
"""
