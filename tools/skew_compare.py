"""Measured comparison: manual salted join vs AQE skew-join handling.

Completes the skew story `operators/skew.py` claims: AQE's
OptimizeSkewedJoin re-splits oversized partitions at RUNTIME for
sort-merge (and, since Spark 3.2, shuffled-hash) joins — so for plain
batch joins the manual salt should be roughly a wash — while plans
whose partitioning is part of their SEMANTICS (streaming state
stores, bucketed layouts, windowed ranks) cannot be re-split and need
the deterministic spread.

Builds an in-memory hot-key corpus (HOT_FRAC of N rows on one key —
the one-celebrity-account shape, same fold as `salted_hot_key_join`),
joins it to a per-key dimension, aggregates per tier, and times:

  smj_aqe_skew_on    unsalted sort-merge join, AQE skew-join enabled
  smj_aqe_skew_off   unsalted sort-merge join, AQE skew-join disabled
  shj_aqe_skew_on    unsalted shuffled-hash join, AQE skew-join enabled
  shj_aqe_skew_off   unsalted shuffled-hash join, AQE skew-join disabled
  salted_shj         the operators/skew.py construction (salt=8)

Prints one markdown row per variant (median of RUNS timed runs after
an untimed warm-up), whether the executed plan shows AQE's skew
markers (``skew=true`` / skewed AQEShuffleRead), and cross-checks
that every variant returns identical results.

Usage: python tools/skew_compare.py [n_rows]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_and_spark_spark.operators.skew import salted_equi_join
from hadoop_and_spark_spark.session import get_spark

HOT_MOD = 20  # id % HOT_MOD != 0 folds onto hot key 0 (~95% of rows)
RUNS = 3


def build(spark, n: int):
    # The md5 pad is load-bearing for an honest demo: AQE's skew
    # detector reads COMPRESSED shuffle sizes, and a constant hot key
    # with sequential ids LZ4-compresses so well that a 38M-row hot
    # partition can report under 8 MB and evade any realistic
    # threshold. Real event payloads don't compress like that.
    fact = spark.range(n).select(
        F.when(F.col("id") % HOT_MOD != 0, F.lit(0).cast("long"))
        .otherwise(F.col("id"))
        .alias("hot_user"),
        F.col("id").alias("event_id"),
        ((F.xxhash64("id") % 1000) / 10.0).alias("value"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    # A CLEAN dim (straight from range): its shuffle feeds the join
    # directly, the shape OptimizeSkewedJoin pattern-matches.
    dim = spark.range(0, n, HOT_MOD).select(
        F.col("id").alias("hot_user"),
        (F.floor(F.col("id") / HOT_MOD) % 5).alias("tier"),
    )
    # The DERIVED dim (distinct over the fact keys, the
    # salted_hot_key_join shape): its final HashAggregate fuses
    # between the shuffle and the join, so the join's child is not a
    # bare shuffle stage and AQE's skew rule silently declines.
    dim_distinct = (
        fact.select("hot_user")
        .distinct()
        .select(
            "hot_user",
            (F.floor(F.col("hot_user") / HOT_MOD) % 5).alias("tier"),
        )
    )
    return fact, dim, dim_distinct


def agg(joined):
    return (
        joined.groupBy("tier")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("tier")
    )


def timed(make_df):
    """Median of RUNS cold plans. A FRESH DataFrame per run is load-
    bearing: AQE caches materialized shuffle stages on the plan
    instance, so re-collecting the same object reuses its shuffles
    and times only the final stage. Returns the LAST run's DataFrame
    too — its executed plan carries the run's AQE markers, saving the
    caller a whole extra join just to read them."""
    rows = df = None
    make_df().collect()  # warm-up: codegen
    samples = []
    for _ in range(RUNS):
        df = make_df()
        t0 = time.perf_counter()
        rows = df.collect()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples), sorted(tuple(r) for r in rows), df


def skew_markers(df) -> bool:
    p = df._jdf.queryExecution().executedPlan().toString()
    return "skew=true" in p or "skewed" in p.lower()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    spark = get_spark("skew-compare")
    conf = spark.conf
    # AQE's skew detector defaults (256 MB threshold, 64 MB advisory
    # target) are sized for production shuffle partitions; this demo's
    # hot partition is ~100 MB, under the default threshold, so
    # OptimizeSkewedJoin would never fire. Scale both knobs to the
    # corpus — the same ratio the defaults give a real 100 TB shuffle.
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
             "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    fact, dim, dim_distinct = build(spark, n)

    variants = []

    def run(name, skew_enabled, make):
        conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
        sec, rows, last_df = timed(lambda: agg(make()))
        variants.append((name, sec, skew_markers(last_df), rows))
        print(f"{name:22s} {sec:7.2f} s  aqe_skew_markers={variants[-1][2]}",
              flush=True)

    run("smj_aqe_skew_on", True,
        lambda: fact.join(dim.hint("merge"), "hot_user"))
    run("smj_aqe_skew_off", False,
        lambda: fact.join(dim.hint("merge"), "hot_user"))
    run("smj_distinct_dim_on", True,
        lambda: fact.join(dim_distinct.hint("merge"), "hot_user"))
    run("shj_aqe_skew_on", True,
        lambda: fact.join(dim.hint("shuffle_hash"), "hot_user"))
    run("shj_aqe_skew_off", False,
        lambda: fact.join(dim.hint("shuffle_hash"), "hot_user"))
    run("salted_shj", False,
        lambda: salted_equi_join(
            fact, dim.hint("shuffle_hash"), key="hot_user",
            spread="event_id", salt=8,
        ))
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")  # session default

    baseline = variants[0][3]
    for name, _, _, rows in variants[1:]:
        assert rows == baseline, f"{name} result diverges from baseline"
    print("\nall variants byte-identical results\n")
    print("| variant | median s | AQE skew markers |")
    print("|---|---|---|")
    for name, sec, marked, _ in variants:
        print(f"| {name} | {sec:.2f} | {'yes' if marked else 'no'} |")
    spark.stop()


if __name__ == "__main__":
    main()
