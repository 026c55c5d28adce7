"""Core relational operators over the TPC-H-ish tables.

Each query demonstrates one operator family from SURVEY.md §2 at table
scale, Catalyst-planned (filters push into the parquet scan, small sides
broadcast, aggregates partial+final).  Scale notes per query docstring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLES"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec(col: str, prec: str = "decimal(18,4)"):
    return F.col(col).cast(prec)


# --------------------------------------------------------------------------
# filters / projections (§2.2 — predicate select analogs; pushdown-checked)
def q_filter_project(spark, sf_dir):
    """Predicate + projection pushdown: both reach the parquet scan
    (`PushedFilters`/`ReadSchema` in explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
                 & (F.col("l_quantity") >= 45))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


_O_FILTER = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  AND l_quantity >= 45
"""


# --------------------------------------------------------------------------
# aggregation (§2.4 — conf_sum / mean-height analogs; TPC-H Q1 shape)
def q_agg_pricing(spark, sf_dir):
    """Partial+final aggregation with exact decimal arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 4).cast("double").alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")
                          * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))),
                    4).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


_O_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# join + group + top-k (§2.3/§2.6 — TPC-H Q3 shape; deterministic top-k)
def q_join_topk(spark, sf_dir):
    """3-way join (dimension sides broadcast by AQE at this scale, sort-merge
    at 100 TB), aggregate, deterministic top-10 via full tie-break."""
    cu = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")
                           * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))),
                     4).cast("double").alias("revenue"))
    )
    # Deterministic top-k via orderBy+limit: Catalyst plans
    # TakeOrderedAndProject (per-partition top-k + driver merge) — no
    # single-task global window funnel at scale.
    return (rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)
            .select("o_orderkey", "revenue"))


_O_JOIN_TOPK = """
WITH rev AS (
  SELECT o_orderkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
  FROM customer JOIN orders ON c_custkey = o_custkey
                JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY o_orderkey)
SELECT o_orderkey, revenue FROM rev
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# broadcast join (§2.3 — small dim explicitly broadcast)
def q_broadcast_join(spark, sf_dir):
    pa = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("sum_qty"),
             F.count("*").alias("n_items"))
    )


_O_BCAST = """
SELECT p_brand,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# semi / anti joins (§2.3 — the boxes_directly_* semi+anti analogs)
def q_semi_join(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    na = _t(spark, sf_dir, "nation")
    active = cu.join(od, cu.c_custkey == od.o_custkey, "left_semi")
    return (active.join(F.broadcast(na), active.c_nationkey == na.n_nationkey)
            .groupBy("n_name").agg(F.count("*").alias("n_customers")))


_O_SEMI = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


def q_anti_join(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    na = _t(spark, sf_dir, "nation")
    inactive = cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
    return (inactive.join(F.broadcast(na), inactive.c_nationkey == na.n_nationkey)
            .groupBy("n_name").agg(F.count("*").alias("n_customers")))


_O_ANTI = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# range / interval join (§2.3 — the interval-overlap theta-join analog of
# Box.intersects_box, expressed relationally)
def q_range_join(spark, sf_dir):
    """Theta-join on a date interval; both sides pre-filtered so the
    quadratic blowup is bounded (the kernel-side equivalent is the per-doc
    strip intersection)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") == 50)
    od = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    j = li.join(od, (od.o_orderdate <= li.l_shipdate)
                & (od.o_orderdate >= F.date_sub(li.l_shipdate, 90)))
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


_O_RANGE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM (SELECT * FROM lineitem WHERE l_quantity = 50) l
JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON o.o_orderdate <= l.l_shipdate AND o.o_orderdate >= l.l_shipdate - INTERVAL 90 DAY
GROUP BY o_orderpriority
"""


def q_quantiles(spark, sf_dir):
    """Exact percentiles per group (median / p90 / p99, linear
    interpolation — identical definition on both engines).  At 100 TB the
    approx_percentile sketch replaces this one call; the exact form is the
    correctness anchor the sketch is validated against."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count("*").alias("n")))


_O_QUANTILES = """
SELECT event_type,
       ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90,
       ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 4) AS p99,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


PIVOT_TYPES = ("view", "click", "purchase", "error")


def q_pivot(spark, sf_dir):
    """Pivot (long→wide): per-user event-type counts as columns.  Explicit
    value list — at scale an implicit pivot forces a distinct-values job
    first and an unbounded column blowup."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .pivot("event_type", list(PIVOT_TYPES))
            .agg(F.count(F.lit(1)))
            .select("user_id",
                    *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                      for t in PIVOT_TYPES]))


_O_PIVOT = f"""
SELECT user_id,
       {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
                  for t in PIVOT_TYPES)}
FROM events GROUP BY user_id
"""


def q_asof_join(spark, sf_dir):
    """As-of join (an operator Spark lacks natively): each click matched to
    the user's most recent view at-or-before it.  Implemented with the
    scale-right union + running-``last`` window — ONE shuffle on user_id and
    zero joins, where the naive range-join is quadratic per user.  Ties:
    views sort before clicks at equal ts (at-or-before), max event_id wins
    among equal-ts views."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type").isin("view", "click"))
    tagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("k"),
    )
    w = (Window.partitionBy("user_id").orderBy("ts", "k", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = tagged.select(
        "user_id", "ts", "event_id", "k",
        F.last(F.when(F.col("k") == 0, F.col("event_id")), ignorenulls=True)
        .over(w).alias("view_id"),
        F.last(F.when(F.col("k") == 0, F.col("ts")), ignorenulls=True)
        .over(w).alias("view_ts"),
    )
    return (run.where(F.col("k") == 1)
            .select(F.col("event_id").alias("click_id"), "user_id",
                    F.col("ts").alias("click_ts"), "view_id", "view_ts"))


_O_ASOF = """
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       (SELECT v.event_id FROM events v
        WHERE v.event_type = 'view' AND v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_id,
       (SELECT v.ts FROM events v
        WHERE v.event_type = 'view' AND v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_ts
FROM events c WHERE c.event_type = 'click'
"""


# --------------------------------------------------------------------------
# window functions (§2.5 — adjacent-word-gap lag analog)
def q_window_lag(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn("prev_value", F.lag("value").over(w))
    return (
        gaps.where(F.col("prev_value").isNotNull())
        .groupBy("event_type")
        .agg(F.round(F.sum((F.col("value") - F.col("prev_value")).cast("decimal(18,4)")), 4)
             .cast("double").alias("sum_gap"),
             F.count("*").alias("n_gaps"))
    )


_O_LAG = """
WITH g AS (
  SELECT event_type, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events)
SELECT event_type,
       CAST(ROUND(SUM(CAST(value - prev_value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_gap,
       COUNT(*) AS n_gaps
FROM g WHERE prev_value IS NOT NULL
GROUP BY event_type
"""


def q_window_topk(spark, sf_dir):
    """rank-1-by-custom-order analog of next_top_block (§2.5)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
            .select("user_id", "event_id", "value", "rn"))


_O_WTOPK = """
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS INT) AS rn
  FROM events)
WHERE rn <= 2
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization: lag + conditional cumsum (stateful-window
    shape; batch analog of a streaming session window)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (ev.withColumn("prev_ts", F.lag("ts").over(w))
         .withColumn("new_session",
                     (F.col("prev_ts").isNull()
                      | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 1800 SECOND")))
                     .cast("int"))
         .withColumn("session_id", F.sum("new_session").over(
             Window.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, 0))))
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"))


_O_SESS = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM s)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM t GROUP BY user_id
"""


# --------------------------------------------------------------------------
# distinct & set operations (§2.7)
def q_distinct_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"))


_O_DISTINCT = """
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types, COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def q_hll_distinct(spark, sf_dir):
    """Sketch-backed distinct counting beside its exact anchor: per event
    type, the exact ``COUNT(DISTINCT user_id)`` plus a flag that Spark's
    HyperLogLog++ estimate (rsd 2%) landed within ±5% of it.  At 100 TB the
    sketch is the one that runs (fixed-size partial state, no distinct
    shuffle); the exact form here is the correctness anchor the sketch is
    validated against, and the flag — deterministic, HLL++ is a pure
    function of the data — is what the cross-engine oracle can state."""
    ev = _t(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.02)
    return (ev.groupBy("event_type")
            .agg(exact.alias("n_exact"),
                 ((F.abs(approx - exact) / exact) <= 0.05).alias("hll_ok")))


_O_HLL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS hll_ok
FROM events GROUP BY event_type
"""


def q_set_ops(spark, sf_dir):
    """Union/intersect/except over nation-key sets (visited/non-visited set
    difference analog, §2.7)."""
    cu = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    su = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    u = cu.union(su).distinct().withColumn("op", F.lit("union"))
    i = cu.intersect(su).withColumn("op", F.lit("intersect"))
    e = cu.subtract(su).withColumn("op", F.lit("except"))
    return u.union(i).union(e)


_O_SETOPS = """
WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT nk, 'union' AS op FROM (SELECT nk FROM c UNION SELECT nk FROM s)
UNION ALL SELECT nk, 'intersect' AS op FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
UNION ALL SELECT nk, 'except' AS op FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
"""


# --------------------------------------------------------------------------
# sorts / global top-k (§2.6) and histogram (§2.4 bincount analog)
def q_topk_global(spark, sf_dir):
    """Global deterministic top-20 as orderBy+limit: plans
    TakeOrderedAndProject (per-partition heap top-k, driver merge) instead
    of funnelling the whole table through one unpartitioned-window task."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.select("l_orderkey", "l_linenumber", "l_extendedprice")
            .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
            .limit(20))


_O_TOPK = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20
"""


def q_histogram(spark, sf_dir):
    """np.bincount analog: frequency per rounded value bucket (the analyzer
    histograms of ocr_tree_analyser.py:34-52 at relational scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy(F.round("l_quantity", 0).cast("long").alias("bucket"))
            .agg(F.count("*").alias("freq")))


_O_HIST = """
SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS bucket, COUNT(*) AS freq
FROM lineitem GROUP BY 1
"""


def q_rollup(spark, sf_dir):
    """Grouping-sets/rollup (Catalyst built-in noted absent in the
    reference, SURVEY.md §2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("sum_qty"))
        .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
                "sum_qty")
    )


_O_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_time_rollup(spark, sf_dir):
    """Hypertable-style time-bucket rollup: per-event-type counts and value
    sums at hour resolution with day and grand-total rollup levels — the
    continuous-aggregate shape a time-series store materializes; here one
    pass, partial+final aggregated, no re-scan per resolution."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .withColumn("hour", F.date_trunc("hour", "ts"))
        .rollup("day", "hour", "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(_dec("value")), 4).cast("double").alias("sum_value"))
        .select(F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
                F.coalesce(F.col("hour").cast("string"), F.lit("ALL")).alias("hour"),
                F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
                "n_events", "sum_value")
    )


_O_TIME_ROLLUP = """
SELECT COALESCE(CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR), 'ALL') AS day,
       COALESCE(CAST(date_trunc('hour', ts) AS VARCHAR), 'ALL') AS hour,
       COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts), event_type)
"""


def q_props_extract(spark, sf_dir):
    """Semi-structured payload extraction: pull the numeric field out of the
    events ``props`` JSON blob with portable regex (web-scale logs shape)."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r"\d+", 0).cast("long")
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.round(F.sum(k.cast("decimal(18,4)")), 4).cast("double").alias("sum_k"),
                 F.count("*").alias("n")))


_O_PROPS = """
SELECT event_type,
       CAST(ROUND(SUM(CAST(CAST(regexp_extract(props, '\\d+') AS BIGINT) AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_grouped_pandas(spark, sf_dir):
    """``groupBy().applyInPandas`` surface (SURVEY §2.12): per-language
    word-length histogram computed by a grouped Arrow kernel (np.bincount
    inside), equivalent to a relational unnest+group — which is exactly what
    the oracle does."""
    import numpy as np
    import pandas as pd

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def hist(pdf: pd.DataFrame) -> pd.DataFrame:
        lens = np.concatenate([
            np.fromiter((len(w) for w in t.split(" ")), dtype=np.int64)
            for t in pdf["text"]
        ]) if len(pdf) else np.empty(0, np.int64)
        counts = np.bincount(lens) if len(lens) else np.empty(0, np.int64)
        nz = np.nonzero(counts)[0]
        return pd.DataFrame({"lang": pdf["lang"].iloc[0],
                             "word_len": nz.astype("int32"),
                             "freq": counts[nz]})

    schema = "lang string, word_len int, freq long"
    return docs.groupBy("lang").applyInPandas(hist, schema)


_O_GROUPED = """
SELECT lang, CAST(strlen(w) AS INT) AS word_len, COUNT(*) AS freq
FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY lang, word_len
"""


def q_cogroup_reconcile(spark, sf_dir):
    """``cogroup().applyInPandas`` surface (SURVEY §2.12 — the two-sided
    grouped-Arrow API): reconcile the events stream against the orders
    table per key, emitting counts and a presence status.  Each key's two
    groups arrive as separate pandas frames in ONE task — the custom-merge
    shape (conflict resolution, temporal reconciliation) that a plain join
    cannot express without exploding intermediate rows."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    od = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))

    def rec(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        ne, no = len(left), len(right)
        status = "both" if ne and no else ("events_only" if ne else "orders_only")
        return pd.DataFrame({"k": [key[0]], "n_events": [ne],
                             "n_orders": [no], "status": [status]})

    return (ev.groupBy("k").cogroup(od.groupBy("k"))
            .applyInPandas(rec, "k long, n_events long, n_orders long, status string"))


_O_COGROUP = """
WITH e AS (SELECT user_id AS k, COUNT(*) AS ne FROM events GROUP BY 1),
o AS (SELECT o_custkey AS k, COUNT(*) AS no FROM orders GROUP BY 1)
SELECT COALESCE(e.k, o.k) AS k,
       CAST(COALESCE(ne, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(no, 0) AS BIGINT) AS n_orders,
       CASE WHEN ne IS NOT NULL AND no IS NOT NULL THEN 'both'
            WHEN ne IS NOT NULL THEN 'events_only' ELSE 'orders_only' END AS status
FROM e FULL OUTER JOIN o ON e.k = o.k
"""


QUERIES = {
    "q_filter_project": q_filter_project,
    "q_cogroup_reconcile": q_cogroup_reconcile,
    "q_props_extract": q_props_extract,
    "q_grouped_pandas": q_grouped_pandas,
    "q_agg_pricing": q_agg_pricing,
    "q_join_topk": q_join_topk,
    "q_broadcast_join": q_broadcast_join,
    "q_semi_join": q_semi_join,
    "q_anti_join": q_anti_join,
    "q_range_join": q_range_join,
    "q_asof_join": q_asof_join,
    "q_quantiles": q_quantiles,
    "q_pivot": q_pivot,
    "q_window_lag": q_window_lag,
    "q_window_topk": q_window_topk,
    "q_sessionize": q_sessionize,
    "q_distinct_agg": q_distinct_agg,
    "q_hll_distinct": q_hll_distinct,
    "q_set_ops": q_set_ops,
    "q_topk_global": q_topk_global,
    "q_histogram": q_histogram,
    "q_rollup": q_rollup,
    "q_time_rollup": q_time_rollup,
}

ORACLES = {
    "q_filter_project": _O_FILTER,
    "q_cogroup_reconcile": _O_COGROUP,
    "q_props_extract": _O_PROPS,
    "q_grouped_pandas": _O_GROUPED,
    "q_agg_pricing": _O_AGG,
    "q_join_topk": _O_JOIN_TOPK,
    "q_broadcast_join": _O_BCAST,
    "q_semi_join": _O_SEMI,
    "q_anti_join": _O_ANTI,
    "q_range_join": _O_RANGE,
    "q_asof_join": _O_ASOF,
    "q_quantiles": _O_QUANTILES,
    "q_pivot": _O_PIVOT,
    "q_window_lag": _O_LAG,
    "q_window_topk": _O_WTOPK,
    "q_sessionize": _O_SESS,
    "q_distinct_agg": _O_DISTINCT,
    "q_hll_distinct": _O_HLL,
    "q_set_ops": _O_SETOPS,
    "q_topk_global": _O_TOPK,
    "q_histogram": _O_HIST,
    "q_rollup": _O_ROLLUP,
    "q_time_rollup": _O_TIME_ROLLUP,
}
