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

    The right payload travels as ONE struct through the running
    ``last(ignorenulls)`` so the as-of match is atomic per row: with
    per-column lasts, a NULL in one right column would fall through to
    an older right row for that column only, stitching fields from
    different matches.
    """
    tiebreak = tiebreak or right_cols[0]
    from pyspark.sql.types import StructField, StructType

    pay_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l2 = left.select(
        key,
        ts,
        *[c for c in left.columns if c not in (key, ts)],
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
    )
    r2 = right.select(
        key,
        ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, ts)],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_pay"),
        F.col(tiebreak).alias("_tb"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = l2.unionByName(r2).select(
        "*", F.last("_pay", ignorenulls=True).over(w).alias("_m")
    )
    return (
        attributed.filter(F.col("_side") == 1)
        .select(
            key,
            ts,
            *[c for c in left.columns if c not in (key, ts)],
            *[F.col("_m")[c].alias(f"asof_{c}") for c in right_cols],
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


def sessionize(
    events: DataFrame, gap_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Inactivity-gap sessionization: consecutive events of a user
    belong to one session while the gap between them stays under
    ``gap_ms``. Output: one row per (user_id, session) with bounds,
    event count and value sum.

    Plan shape: the lag/running-sum window and the session aggregation
    both key on user_id, so Catalyst plans ONE exchange — the groupBy
    reuses the window's hash partitioning (child distribution
    (user_id, session_idx) is a superset). Linear in events; skewed
    power users are the window's partition grain, handled by AQE.
    DuckDB twin: identical lag + cumulative-sum formulation (the
    standard SQL sessionization idiom).
    """
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    base = events.select(
        "event_id",
        "user_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "value",
    )
    marked = base.withColumn(
        "new_sess",
        F.when(
            F.col("ts_ms") - F.lag("ts_ms").over(w) > gap_ms, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
        )
        .orderBy("user_id", "session_idx")
    )


def sessionize_sql(table: str = "events", gap_ms: int = 30 * 60 * 1000) -> str:
    return f"""
        WITH base AS (
            SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
            FROM {table}
        ),
        marked AS (
            SELECT *,
                   CASE WHEN ts_ms - LAG(ts_ms) OVER w > {gap_ms}
                        THEN 1 ELSE 0 END AS new_sess
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        ),
        sess AS (
            SELECT *,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts_ms, event_id
                       ROWS UNBOUNDED PRECEDING
                   )::BIGINT AS session_idx
            FROM marked
        )
        SELECT user_id, session_idx,
               COUNT(*)::BIGINT AS n_events,
               MIN(ts_ms) AS start_ms,
               MAX(ts_ms) AS end_ms,
               MAX(ts_ms) - MIN(ts_ms) AS duration_ms
        FROM sess GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
    """


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Range (point-in-interval) join without a range predicate reaching
    the join: each interval is registered into every time bucket it
    covers (explode over ``sequence(start_bucket, end_bucket)``), each
    point carries its single bucket, and the join is an EQUI-join on
    (key, bucket) with the exact range check as a post-filter.

    Why: Catalyst plans a raw ``p.ts BETWEEN i.start AND i.end`` (plus
    key equality) as a join whose range half is a per-row filter over
    every key-matched pair — fine for small keys, quadratic for hot
    ones — and with NO equality at all it degenerates to a
    BroadcastNestedLoopJoin. Bucketization keeps it a shuffle-keyed
    equi-join at any scale; cost is O(points + intervals × span/bucket).
    Size ``bucket_ms`` near the typical interval span so the explode
    factor stays ~1-2. A point matches an interval via exactly one
    bucket (its own), so no dedup pass is needed.

    The interval side is pinned ``shuffle_hash``: it typically arrives
    post-window/post-agg (e.g. sessionize output), where Catalyst's
    size estimates are unreliable enough to pick a broadcast that is
    data-sized at 100× (same SCALE.md rule as the LSH tail joins).
    """
    pt = points.withColumn("_b", F.expr(f"{ts} div {bucket_ms}"))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {bucket_ms}"),
                F.expr(f"{end} div {bucket_ms}"),
            )
        ),
    ).hint("shuffle_hash")
    return (
        pt.join(iv, [key, "_b"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_b")
    )


def error_sessions(events: DataFrame) -> DataFrame:
    """Range-join showcase: place every 'error' event inside its user's
    session (sessions are non-overlapping per user, so each error lands
    in exactly one). Output: (event_id, user_id, ts_ms, session_idx)."""
    sess = sessionize(events).select(
        "user_id", "session_idx", "start_ms", "end_ms"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.expr("ts div 1000000").alias("ts_ms")
    )
    return (
        interval_join(errors, sess, "user_id", "ts_ms", "start_ms", "end_ms")
        .select("event_id", "user_id", "ts_ms", "session_idx")
        .orderBy("event_id")
    )


def error_sessions_sql(table: str = "events") -> str:
    return f"""
        WITH sessions AS ({sessionize_sql(table)}),
        errors AS (
            SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
            FROM {table} WHERE event_type = 'error'
        )
        SELECT e.event_id, e.user_id, e.ts_ms, s.session_idx
        FROM errors e
        JOIN sessions s
          ON e.user_id = s.user_id
         AND e.ts_ms BETWEEN s.start_ms AND s.end_ms
        ORDER BY e.event_id
    """


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
