"""Temporal operators: as-of (attribution) join + gap sessionization.

Neither exists in the reference — these are the event-time operators
a training-data / behavioral pipeline needs (SURVEY §2.12a X20/X21):
an as-of join attaches "the most recent fact at or before this time"
(feature backfill, attribution), and sessionization groups an event
stream into engagement sessions.

Spark-first shapes:

- **As-of join without a join**: Spark has no ASOF JOIN operator, and
  the naive `JOIN ON key AND r.ts <= l.ts` + "keep latest" explodes
  into a near-cross-product per key before the filter. Instead the
  two sides are UNION-tagged into one stream and the match is a
  running `last(..., ignoreNulls)` window over (key, time) — exactly
  one shuffle on the key, no join node at all, and the window's
  running frame streams in sorted order (state = one carried row per
  key, never the partition). This is the standard distributed as-of
  re-expression; a merge join would shuffle BOTH sides on the same
  key anyway, then still need the per-key ordering pass.
- **Sessionization is Spark-native**: ``F.session_window`` (gap-based
  merging windows) in ONE groupBy — the same expression runs under
  Structured Streaming with a watermark (state-store sessions with
  eviction), which the streaming twin below and its duality test
  exercise. Session end = last event + gap (Spark's window.end
  contract), mirrored exactly in the oracle.

Both oracles are exact: DuckDB has a native ASOF JOIN for the first,
and the lag/cumulative-sum re-derivation of session ids pins the
second (also serving as an independent re-implementation of the gap
semantics: merge iff gap <= GAP — Spark extends a session whose end
is exactly the next event's time, so only a STRICTLY larger gap
opens a new session; pinned by test_session_gap_boundary).

Scale notes: both shuffle once on user_id; per-user data is window /
session state, not materialized lists. Skewed users (bots) would
salt the session groupBy the same way any keyed agg is salted; the
as-of window is order-streaming so skew costs sort, not memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import round6_sql as _R6

ASOF_LEFT_TYPE = "purchase"  # attribution target
ASOF_RIGHT_TYPE = "click"  # attribution source
SESSION_GAP = "6 hours"
_GAP_SQL = "INTERVAL 6 HOUR"
NO_MATCH = -1  # left rows with no preceding right row (typed, not
# NULL: nullable int64 round-trips to float64 in pandas on one engine
# but not always the other — the verify-workflow typed-hash rule)


def _us(c) -> Column:
    """Epoch microseconds of an (NTZ) timestamp column. The catalog
    reads events.ts as TIMESTAMP_NTZ; the session timezone is pinned
    UTC, so the cast to TIMESTAMP is the identity instant."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent click of the same
    user at or before the purchase time (last-touch attribution).

    Plan: clicks deduped to one per (user, ts) [max event_id — the
    same tie DuckDB's ASOF would otherwise pick arbitrarily], tagged
    UNION with purchases, one running-last window per user ordered by
    (ts, click-first), filter back to purchase rows. Single shuffle on
    user_id; the running frame carries exactly one (click_id, ts)
    pair of state per user. No-match rows keep NO_MATCH / gap_us
    NO_MATCH instead of NULL (typed-hash contract).

    Times surface as epoch microseconds (BIGINT on both engines —
    timestamps themselves render differently in pandas).
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == ASOF_RIGHT_TYPE)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.where(F.col("event_type") == ASOF_LEFT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    tagged = clicks.select(
        "user_id",
        "ts",
        "click_id",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("click_id"),
            F.lit(0).alias("is_click"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    # Clicks sort before purchases at equal ts (is_click DESC), so a
    # click at exactly the purchase time matches — the >= semantics
    # of ASOF JOIN.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_click"), "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = tagged.select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last(
            F.when(F.col("is_click") == 1, F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_click_ts"),
    )
    p_us = _us("ts")
    c_us = _us("last_click_ts")
    return (
        runs.where(F.col("is_click") == 0)
        .select(
            F.col("purchase_id"),
            "user_id",
            p_us.alias("purchase_us"),
            F.coalesce("last_click_id", F.lit(NO_MATCH)).alias("click_id"),
            F.coalesce(c_us, F.lit(NO_MATCH)).alias("click_us"),
            F.coalesce(p_us - c_us, F.lit(NO_MATCH)).alias("gap_us"),
        )
        .sortWithinPartitions("purchase_id")
    )


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream: consecutive
    events of a user with inter-event gaps under SESSION_GAP form one
    session. One ``session_window`` groupBy — the Spark-native
    operator whose streaming form keeps per-session state-store state
    with watermark eviction (see streaming twin + duality test)."""
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev)


def sessionize(ev: DataFrame) -> DataFrame:
    """The shared batch/streaming session aggregation (identical
    expression under IncrementalExecution — the T5 duality pattern),
    plus the batch presentation sort (streaming plans sort on the
    sink read instead — append mode forbids Sort nodes)."""
    return _session_agg(ev).sortWithinPartitions(
        "user_id", "session_start_us"
    )


def _session_agg(ev: DataFrame) -> DataFrame:
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum (order-independent, exact), one final cast
            # to double — the events_json_stats typed-hash pattern
            # try_cast: non-finite/overflow value rows degrade to
            # NULL (sum skips them) rather than ANSI-crashing
            F.sum(F.col("value").try_cast("decimal(18,2)"))
            .try_cast("decimal(18,2)")
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            _us(F.col("w.start")).alias("session_start_us"),
            _us(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


RANGE_W_US = 24 * 3600 * 1_000_000  # 24h lookback window, in micros


def range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, binned: for every purchase, COUNT the clicks of the
    same user in the preceding 24 hours (the sliding-window
    conversion feature next to asof's last-touch).

    Spark plans a raw inequality join (`ON user AND c.ts BETWEEN ...`)
    as BroadcastNestedLoopJoin — O(|L|·|R|) per key and a
    driver-memory bomb when neither side broadcasts. The scale-safe
    re-expression is the canonical BUCKETIZED range join: bin both
    sides by window-width buckets of event time, explode each click to
    (bin, bin+1) — the two bins whose purchases can reach back to it —
    equi-join on (user_id, bin) (ordinary shuffle hash join), then
    apply the exact range predicate. Each right row duplicates at
    most 2×; candidate pairs are bounded by per-(user, bin) activity
    products instead of per-user products. The plan pin asserts no
    NestedLoop node survives.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == ASOF_LEFT_TYPE).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        _us("ts").alias("p_us"),
    )
    c = ev.where(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        "user_id", _us("ts").alias("c_us")
    )
    p = p.withColumn("bin", (F.col("p_us") / RANGE_W_US).cast("long"))
    c = c.select(
        "user_id",
        "c_us",
        F.explode(
            F.array(
                (F.col("c_us") / RANGE_W_US).cast("long"),
                (F.col("c_us") / RANGE_W_US).cast("long") + 1,
            )
        ).alias("bin"),
    )
    in_window = (F.col("c_us") > F.col("p_us") - RANGE_W_US) & (
        F.col("c_us") <= F.col("p_us")
    )
    return (
        p.join(c, ["user_id", "bin"], "left")
        .select(
            "purchase_id",
            "user_id",
            "p_us",
            F.when(in_window, F.lit(1)).otherwise(F.lit(0)).alias("hit"),
        )
        .groupBy("purchase_id", "user_id", F.col("p_us").alias("purchase_us"))
        .agg(F.sum("hit").alias("n_clicks_24h"))
        .sortWithinPartitions("purchase_id")
    )


def streaming_user_sessions(events_stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """The same sessionization as a streaming plan: session_window
    state merges open sessions per user and the watermark closes and
    evicts them — bounded state on an unbounded stream. Watermarks
    require TIMESTAMP (not NTZ); the cast is the identity instant
    under the UTC-pinned session. No presentation sort here: append
    mode forbids Sort nodes; consumers sort the sink."""
    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return _session_agg(ev.withWatermark("ts", watermark))


ORACLE_SQL: dict[str, str] = {
    # DuckDB's native ASOF JOIN (right side pre-deduped to one row
    # per (user, ts) — with duplicates ASOF's pick is unspecified).
    "asof_attribution": f"""
        WITH clicks AS (
            SELECT user_id, ts, max(event_id) AS click_id
            FROM events WHERE event_type = '{ASOF_RIGHT_TYPE}'
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT event_id, user_id, ts
            FROM events WHERE event_type = '{ASOF_LEFT_TYPE}'
        )
        SELECT p.event_id AS purchase_id,
               p.user_id,
               epoch_us(p.ts) AS purchase_us,
               coalesce(c.click_id, {NO_MATCH}) AS click_id,
               coalesce(epoch_us(c.ts), {NO_MATCH}) AS click_us,
               coalesce(epoch_us(p.ts) - epoch_us(c.ts), {NO_MATCH}) AS gap_us
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY purchase_id
    """,
    # Independent re-derivation of the session semantics: new session
    # iff gap > GAP, strictly — Spark MERGES an event arriving exactly
    # GAP after the previous one (its time equals the session end and
    # touching windows coalesce; pinned by test_session_gap_boundary
    # and the session-window property test).
    "user_sessions": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > {_GAP_SQL}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               epoch_us(min(ts)) AS session_start_us,
               epoch_us(max(ts) + {_GAP_SQL}) AS session_end_us,
               count(*) AS n_events,
               sum(value::DECIMAL(18,2))::DECIMAL(18,2)::DOUBLE
                   AS session_value
        FROM numbered
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us
    """,
}

# Plain inequality join on the oracle side (DuckDB plans IEJoin);
# epoch-micros arithmetic on both sides so no interval edge cases.
ORACLE_SQL["range_join_counts"] = f"""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
        FROM events WHERE event_type = '{ASOF_LEFT_TYPE}'
    ),
    c AS (
        SELECT user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = '{ASOF_RIGHT_TYPE}'
    )
    SELECT p.purchase_id, p.user_id, p.purchase_us,
           count(c.c_us) AS n_clicks_24h
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.c_us > p.purchase_us - {RANGE_W_US}
     AND c.c_us <= p.purchase_us
    GROUP BY 1, 2, 3
    ORDER BY purchase_id
"""

PAIR_GAP_US = 6 * 3600 * 1_000_000  # same 6h bound as SESSION_GAP


def next_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event → next event) training pairs per user — the dataset
    construction step for next-action / sequence models: each event
    pairs with the SAME user's next event when the gap is within the
    session bound (PAIR_GAP_US ≡ the 6 h sessionization gap, so pairs
    never cross a session boundary).

    One lead() window partitioned by user_id ordered by (ts,
    event_id) — ties are broken by the unique event id so the pairing
    is deterministic on both engines. Single shuffle on user_id;
    window state is one carried row per user (the as-of discipline).
    Events with no successor in bound simply emit no pair (training
    sets want only positive transitions)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paired = ev.select(
        "event_id",
        "user_id",
        "event_type",
        _us("ts").alias("t_us"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.lead(_us("ts")).over(w) - _us("ts")).alias("gap_us"),
    )
    return (
        paired.where(
            F.col("next_type").isNotNull() & (F.col("gap_us") <= PAIR_GAP_US)
        )
        .select("event_id", "user_id", "event_type", "next_type", "gap_us")
        .sortWithinPartitions("event_id")
    )


ORACLE_SQL["next_event_pairs"] = f"""
    WITH paired AS (
        SELECT event_id, user_id, event_type,
               lead(event_type) OVER w AS next_type,
               lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, event_type, next_type, gap_us
    FROM paired
    WHERE next_type IS NOT NULL AND gap_us <= {PAIR_GAP_US}
    ORDER BY event_id
"""


FUNNEL_STAGES = ("view", "click", "purchase")  # ordered product funnel


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (view → click → purchase): how many
    users reach each stage, where stage n+1 only counts events
    STRICTLY AFTER the user's first stage-n event — the
    product-analytics sequence operator (order matters; a purchase
    before any view is not funnel progression).

    Plan: cascading filtered aggregations — stage 1 is a pushed-filter
    scan + min-per-user; each later stage filters its type at the
    scan, equi-joins the previous stage's (user, t) table, and takes
    min-per-user again. Per stage: one pruned scan + one shuffle on
    user_id; the stage tables shrink monotonically (funnel!), so the
    joins get cheaper as the cascade descends. No window, no
    per-user event-list materialization (the collect_list funnel dies
    on power users). Final row = three 1-row counts
    footer-cross-joined with round6 conversion ratios."""
    ev = load_table(spark, sf_dir, "events")
    v, c, p = FUNNEL_STAGES
    s1 = (
        ev.where(F.col("event_type") == v)
        .groupBy("user_id")
        .agg(F.min(_us("ts")).alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == c)
        .join(s1, "user_id")
        .where(_us("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min(_us("ts")).alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == p)
        .join(s2, "user_id")
        .where(_us("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min(_us("ts")).alias("t3"))
    )
    n1 = s1.agg(F.count("*").alias("n_stage1"))
    n2 = s2.agg(F.count("*").alias("n_stage2"))
    n3 = s3.agg(F.count("*").alias("n_stage3"))
    from ..functions.portable import round6

    return (
        n1.crossJoin(n2)
        .crossJoin(n3)
        .select(
            "n_stage1",
            "n_stage2",
            "n_stage3",
            # empty-funnel guard: ANSI mode turns 0/0 into an error
            F.when(
                F.col("n_stage1") > 0,
                round6(F.col("n_stage2") / F.col("n_stage1")),
            ).alias("conv_12"),
            F.when(
                F.col("n_stage2") > 0,
                round6(F.col("n_stage3") / F.col("n_stage2")),
            ).alias("conv_23"),
        )
    )


ORACLE_SQL["funnel_counts"] = f"""
    WITH s1 AS (
        SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(epoch_us(ts)) AS t2 FROM events e
        JOIN s1 USING (user_id)
        WHERE event_type = '{FUNNEL_STAGES[1]}' AND epoch_us(ts) > t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(epoch_us(ts)) AS t3 FROM events e
        JOIN s2 USING (user_id)
        WHERE event_type = '{FUNNEL_STAGES[2]}' AND epoch_us(ts) > t2
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*)::BIGINT FROM s1) AS n_stage1,
           (SELECT count(*)::BIGINT FROM s2) AS n_stage2,
           (SELECT count(*)::BIGINT FROM s3) AS n_stage3,
           CASE WHEN (SELECT count(*) FROM s1) > 0 THEN
             {_R6("(SELECT count(*) FROM s2)::DOUBLE / (SELECT count(*) FROM s1)")}
           END AS conv_12,
           CASE WHEN (SELECT count(*) FROM s2) > 0 THEN
             {_R6("(SELECT count(*) FROM s3)::DOUBLE / (SELECT count(*) FROM s2)")}
           END AS conv_23
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by FIRST-ACTIVITY day, counted
    on each later day they return — the (cohort_day, day_offset,
    n_users) triangle every growth dashboard plots.

    Plan: (a) one min-per-user aggregation assigns cohorts, (b) the
    (user, day) activity set is deduped BEFORE the join (distinct
    first — a user's 1000 events on a day collapse to one row, so the
    join and final aggregation see user-days, not events), (c)
    equi-join on user_id attaches the cohort, (d) one aggregation
    keyed (cohort_day, offset). Two shuffles on user_id + one on the
    ~days² output grid; nothing scales with events except the two
    pruned scans. All-integer outputs — bit-exact oracle."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    first = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = ev.select("user_id", day.alias("day")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


ORACLE_SQL["cohort_retention"] = """
    WITH first AS (
        SELECT user_id, min(ts::DATE) AS cohort_day FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, ts::DATE AS day FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           date_diff('day', cohort_day, day)::BIGINT AS day_offset,
           count(*)::BIGINT AS n_users
    FROM active JOIN first USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "asof_attribution": asof_attribution,
    "user_sessions": user_sessions,
    "range_join_counts": range_join_counts,
    "next_event_pairs": next_event_pairs,
    "funnel_counts": funnel_counts,
    "cohort_retention": cohort_retention,
}
