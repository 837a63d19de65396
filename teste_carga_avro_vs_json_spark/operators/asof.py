"""As-of (nearest-preceding-event) join — the temporal-attribution
primitive Spark lacks as a built-in (SURVEY.md §2.3 extension surface;
the reference engine has no temporal operators at all).

Implemented as the union-marker + running ``last(ignorenulls)`` window
— the shape that survives 100 TB:

1. Tag left rows side=1, right rows side=0; null-pad each side's
   columns and union.
2. One window per join key ordered by (ts, side, right tiebreak),
   ``rowsBetween(unboundedPreceding, current)``: the running ``last``
   of the right-side payload IS the as-of match (right rows sort
   before left rows at equal ts, so ties are inclusive — the
   ``l.ts >= r.ts`` convention, same as DuckDB's ASOF JOIN).
3. Keep side=1 rows.

Scale shape: ONE shuffle keyed on the join key + one sort — never a
range-predicate join (Catalyst would nested-loop it) and never an
explode over candidate windows. Cost is linear in |left| + |right|;
skewed keys are split by AQE. Contrast the naive
``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-window, which
materializes every (left, preceding-right) pair first — quadratic per
key.

The DuckDB oracle runs the SAME semantics through the planner's native
``ASOF LEFT JOIN`` — an algorithmically independent implementation, so
agreement is strong evidence of correctness (like the recursive-CTE
closure vs label propagation in dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts`` <= left ``ts`` within the same ``key`` (NULLs when no such
    row). ``right_cols`` are emitted with an ``asof_`` prefix.
    ``tiebreak`` (a right column, default first of ``right_cols``)
    makes equal-ts right rows deterministic: the greatest wins.
    """
    tiebreak = tiebreak or right_cols[0]
    l2 = left.select(
        key,
        ts,
        *[c for c in left.columns if c not in (key, ts)],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{c}")
          for c in right_cols],
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
    )
    r2 = right.select(
        key,
        ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, ts)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
        F.col(tiebreak).alias("_tb"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = l2.unionByName(r2).select(
        "*",
        *[
            F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_cols
        ],
    )
    return (
        attributed.filter(F.col("_side") == 1)
        .select(
            key,
            ts,
            *[c for c in left.columns if c not in (key, ts)],
            *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in right_cols],
        )
    )


def attribution(events: DataFrame) -> DataFrame:
    """Click→purchase attribution over the events table: each purchase
    is attributed to the same user's most recent click at-or-before it.
    Output: (event_id, user_id, ts_ms, click_id, click_ts_ms, gap_ms)
    — gap NULL for unattributed purchases.

    Equal-timestamp clicks are pre-reduced to the max event_id (one
    tiny keyed agg) so both engines tie-break identically.
    """
    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000").alias("ts_ms"),
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms"
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_ms")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts_ms").alias("click_ts_ms"), "click_id")
    )
    clicks2 = clicks.select(
        "user_id",
        F.col("click_ts_ms").alias("ts_ms"),
        "click_id",
        F.col("click_ts_ms"),
    )
    res = asof_join(
        purchases,
        clicks2,
        key="user_id",
        ts="ts_ms",
        right_cols=["click_id", "click_ts_ms"],
        tiebreak="click_id",
    )
    return res.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_click_ts_ms").alias("click_ts_ms"),
        (F.col("ts_ms") - F.col("asof_click_ts_ms")).alias("gap_ms"),
    ).orderBy("event_id")


def attribution_sql(table: str = "events") -> str:
    """DuckDB twin via the native ASOF LEFT JOIN planner rule."""
    return f"""
        WITH base AS (
            SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
            FROM {table}
        ),
        purchases AS (
            SELECT event_id, user_id, ts_ms FROM base
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, ts_ms AS click_ts_ms,
                   MAX(event_id) AS click_id
            FROM base WHERE event_type = 'click'
            GROUP BY user_id, ts_ms
        )
        SELECT p.event_id, p.user_id, p.ts_ms,
               c.click_id, c.click_ts_ms,
               p.ts_ms - c.click_ts_ms AS gap_ms
        FROM purchases p
        ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts_ms >= c.click_ts_ms
        ORDER BY p.event_id
    """
