"""Star-schema analytics over the TPC-H-ish tables (extension surface).

The reference engine has NO relational operators at all — SURVEY.md
§2.2 records "no joins of any kind, no grouped aggregation, no window
functions, no sorts, no set operations" (evidence: the whole
`src/main/java` tree, /root/reference/README.md:20-34). This module is
the standard OLAP layer a user of the engine needs once the corpus
lives in tables: multi-way star joins, wide partial aggregation,
grouping sets, anti-join audits, exact quantile profiles and grouped
top-k — each expressed declaratively so Catalyst plans the 100 TB
shape (broadcast dims, shuffle on join keys, partial agg map-side).

Determinism (oracle hash): every money column is quantized per row to
integer cents — ``CAST(round(x * 100) AS BIGINT)`` — one fixed
IEEE-754 multiply + a half-away-from-zero round that Spark
(``F.round`` = HALF_UP) and DuckDB (``round`` = away-from-zero) agree
on; sums then run on exact longs. Derived doubles are computed
post-agg from those longs with an identical op sequence in both
dialects (registry.py determinism rules).

Timestamps: unlike ``events.ts`` (TIMESTAMP(NANOS) → nanosAsLong),
the TPC-H date columns are TIMESTAMP(MILLIS) and read as
TIMESTAMP_NTZ in Spark / TIMESTAMP in DuckDB — both tz-naive, so
predicates compare directly against the SAME wall-clock literal in
both dialects (no epoch arithmetic, no session-timezone dependence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

# Fixture constants shared by both dialects (tz-naive wall-clock).
PRICING_CUTOFF = "2000-12-01 00:00:00"
STAR_REGION = "ASIA"
STAR_DATE_LO = "1996-01-01 00:00:00"
STAR_DATE_HI = "1997-01-01 00:00:00"
TOPK_PER_GROUP = 3
QUANTILES = (0.5, 0.9, 0.99)


def cents(col: Column) -> Column:
    """Per-row exact quantization of a money double to integer cents."""
    return F.round(col * F.lit(100.0), 0).cast("long")


def _cents_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * 100.0) AS BIGINT)"


def _ts(lit: str) -> Column:
    """Tz-naive timestamp literal matching the TIMESTAMP_NTZ columns."""
    return F.lit(lit).cast("timestamp_ntz")


# ------------------------------------------------------------ pricing summary
def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped wide aggregate: per (returnflag, linestatus)
    sums/averages over lineitem rows shipped before the cutoff.

    Scale: the canonical partial-agg workload — 6 groups, so the
    map-side combine reduces 100 TB of scan output to (tasks x 6)
    rows before the single tiny shuffle; the filter and 7-column
    projection push into the parquet scan (pinned in
    test_plan_shapes.py). Averages derive post-agg from exact longs.
    """
    base = lineitem.where(F.col("l_shipdate") <= _ts(PRICING_CUTOFF)).select(
        "l_returnflag",
        "l_linestatus",
        cents(F.col("l_quantity")).alias("qty_c"),
        cents(F.col("l_extendedprice")).alias("base_c"),
        cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "disc_c"
        ),
        cents(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("charge_c"),
    )
    agg = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").alias("sum_qty_c"),
        F.sum("base_c").alias("sum_base_c"),
        F.sum("disc_c").alias("sum_disc_c"),
        F.sum("charge_c").alias("sum_charge_c"),
        F.count(F.lit(1)).alias("n_items"),
    )
    per_item = lambda c: (  # noqa: E731 — two-division fixed op sequence
        F.col(c).cast("double") / F.col("n_items").cast("double") / F.lit(100.0)
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty_c",
        "sum_base_c",
        "sum_disc_c",
        "sum_charge_c",
        "n_items",
        per_item("sum_qty_c").alias("avg_qty"),
        per_item("sum_base_c").alias("avg_price"),
    )


def pricing_summary_sql() -> str:
    qty = _cents_sql("l_quantity")
    base = _cents_sql("l_extendedprice")
    disc = _cents_sql("l_extendedprice * (1.0 - l_discount)")
    charge = _cents_sql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")
    return f"""
        WITH g AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM({qty}) AS BIGINT) AS sum_qty_c,
                   CAST(SUM({base}) AS BIGINT) AS sum_base_c,
                   CAST(SUM({disc}) AS BIGINT) AS sum_disc_c,
                   CAST(SUM({charge}) AS BIGINT) AS sum_charge_c,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus, sum_qty_c, sum_base_c,
               sum_disc_c, sum_charge_c, n_items,
               CAST(sum_qty_c AS DOUBLE) / CAST(n_items AS DOUBLE)
                   / CAST(100 AS DOUBLE) AS avg_qty,
               CAST(sum_base_c AS DOUBLE) / CAST(n_items AS DOUBLE)
                   / CAST(100 AS DOUBLE) AS avg_price
        FROM g
    """


# ---------------------------------------------------------------- star join
def star_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5-shaped star join: revenue per nation for one region and
    one order-date year, lineitem ⋈ orders ⋈ customer ⋈ (nation ⋈
    region).

    Scale plan (the shape Catalyst must produce at 100 TB):

    - region filter applied BEFORE the dim join, so the broadcast side
      is nations-of-one-region (5 rows, never the full dim);
    - nation⋈region and the customer-side dim join are explicit
      ``F.broadcast`` — dims are KB-sized at any corpus scale;
    - lineitem⋈orders is the data-sized join and shuffles on the join
      key only after both scans pruned columns and orders applied the
      date filter (scan-level pushdown pinned in test_plan_shapes.py);
    - the final agg is 5 groups -> map-side partial.
    """
    r = region.where(F.col("r_name") == STAR_REGION).select("r_regionkey")
    dims = nation.join(
        F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey", "n_name")
    o = orders.where(
        (F.col("o_orderdate") >= _ts(STAR_DATE_LO))
        & (F.col("o_orderdate") < _ts(STAR_DATE_HI))
    ).select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    li = lineitem.select(
        "l_orderkey",
        cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "rev_c"
        ),
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(dims), c["c_nationkey"] == dims["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum("rev_c").alias("revenue_c"), F.count(F.lit(1)).alias("n_items"))
    )


def star_revenue_sql() -> str:
    rev = _cents_sql("l_extendedprice * (1.0 - l_discount)")
    return f"""
        SELECT n_name,
               CAST(SUM({rev}) AS BIGINT) AS revenue_c,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = '{STAR_REGION}'
          AND o_orderdate >= TIMESTAMP '{STAR_DATE_LO}'
          AND o_orderdate < TIMESTAMP '{STAR_DATE_HI}'
        GROUP BY n_name
    """


# ------------------------------------------------------------- grouping sets
def rollup_report(orders: DataFrame) -> DataFrame:
    """Grouped aggregation with ROLLUP(status, priority): detail rows +
    per-status subtotals + grand total, tagged by grouping id.

    Scale: grouping sets expand map-side (Spark's Expand operator
    multiplies rows BEFORE the shuffle, but the partial agg collapses
    them to #groups per task) — one shuffle, no re-scan per grouping
    set. NULL group placeholders are coalesced to 'ALL' so the output
    is hashable and unambiguous next to real values.
    """
    gid = (
        F.grouping("o_orderstatus") * F.lit(2) + F.grouping("o_orderpriority")
    ).cast("int")
    return (
        orders.select(
            "o_orderstatus",
            "o_orderpriority",
            cents(F.col("o_totalprice")).alias("price_c"),
        )
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_c").alias("total_c"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "total_c",
        )
    )


def rollup_report_sql() -> str:
    price = _cents_sql("o_totalprice")
    return f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2
                    + GROUPING(o_orderpriority) AS INT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM({price}) AS BIGINT) AS total_c
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """


# ----------------------------------------------------------------- anti join
def orders_without_items(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Integrity audit: orders with no lineitem rows (left-anti join).

    Scale: both sides are data-sized, so this plans as a shuffled
    left-anti join on the key only — the probe side projects just
    ``l_orderkey`` (column pruning reaches the scan), never the wide
    row. No NOT IN / nested-loop shape anywhere.
    """
    keys = lineitem.select("l_orderkey")
    return orders.join(
        keys, orders["o_orderkey"] == keys["l_orderkey"], "left_anti"
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        cents(F.col("o_totalprice")).alias("price_c"),
    )


def orders_without_items_sql() -> str:
    price = _cents_sql("o_totalprice")
    return f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, {price} AS price_c
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        )
    """


# ----------------------------------------------------------- exact quantiles
def quantile_profile(customer: DataFrame) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99) of account balance per
    market segment: smallest value whose cume_dist reaches q
    (PERCENTILE_DISC semantics), on integer cents.

    Scale: one shuffle on the segment key, then a per-partition sort —
    exact quantiles need the full ordered group, so this is for
    profile/report cardinalities (segments x values that fit a task).
    For billion-row groups the engine's approx path is
    ``approx_percentile`` (sketch-mergeable, no sort); the exact
    variant here is the oracle-checkable profile the report card uses.
    cume_dist = rank/n is one IEEE division in both engines.
    """
    base = customer.select(
        "c_mktsegment", cents(F.col("c_acctbal")).alias("bal_c")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("bal_c")
    cd = base.withColumn("cd", F.cume_dist().over(w))
    q50, q90, q99 = QUANTILES
    pick = lambda q: F.min(  # noqa: E731
        F.when(F.col("cd") >= F.lit(q), F.col("bal_c"))
    )
    return cd.groupBy("c_mktsegment").agg(
        pick(q50).alias("p50_c"),
        pick(q90).alias("p90_c"),
        pick(q99).alias("p99_c"),
        F.count(F.lit(1)).alias("n"),
    )


def quantile_profile_sql() -> str:
    bal = _cents_sql("c_acctbal")
    q50, q90, q99 = QUANTILES
    return f"""
        WITH b AS (
            SELECT c_mktsegment, {bal} AS bal_c FROM customer
        ), r AS (
            SELECT c_mktsegment, bal_c,
                   cume_dist() OVER (
                       PARTITION BY c_mktsegment ORDER BY bal_c
                   ) AS cd
            FROM b
        )
        SELECT c_mktsegment,
               MIN(CASE WHEN cd >= {q50} THEN bal_c END) AS p50_c,
               MIN(CASE WHEN cd >= {q90} THEN bal_c END) AS p90_c,
               MIN(CASE WHEN cd >= {q99} THEN bal_c END) AS p99_c,
               COUNT(*) AS n
        FROM r GROUP BY c_mktsegment
    """


# --------------------------------------------------------- grouped top-k
def topk_per_group(orders: DataFrame, k: int = TOPK_PER_GROUP) -> DataFrame:
    """Top-k orders per priority by price (row_number window, exact
    integer tie-break on the key so ranking is total and deterministic).

    Scale: rank-then-filter pushes a single shuffle on the group key;
    with AQE the post-filter result is k x #groups rows. For heavy
    groups the salted two-phase variant (operators/skew.py) applies;
    priorities are 5 near-uniform groups, so no salt needed here.
    """
    base = orders.select(
        "o_orderpriority",
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("price_c"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("price_c").desc(), F.col("o_orderkey")
    )
    return (
        base.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("o_orderpriority", "o_orderkey", "price_c", "rk")
    )


def topk_per_group_sql(k: int = TOPK_PER_GROUP) -> str:
    price = _cents_sql("o_totalprice")
    return f"""
        WITH b AS (
            SELECT o_orderpriority, o_orderkey, {price} AS price_c
            FROM orders
        ), r AS (
            SELECT o_orderpriority, o_orderkey, price_c,
                   CAST(row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY price_c DESC, o_orderkey
                   ) AS INT) AS rk
            FROM b
        )
        SELECT o_orderpriority, o_orderkey, price_c, rk
        FROM r WHERE rk <= {k}
    """
