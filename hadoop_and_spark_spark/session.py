"""SparkSession factory.

One place to encode the execution-model decisions that matter at
100 TB but must also behave on local[32]:

- AQE on (runtime join-strategy switch, partition coalescing, skew
  splitting) — replaces every hand-tuned reducer count in the
  reference (e.g. ``-reducers N``, RunPersonalizedPageRankBasic's
  fixed partition counts).
- Arrow on for the few Pandas-UDF kernels.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle bit-for-bit.
- Shuffle partitions default small locally (override with
  SPARK_GRAFT_SHUFFLE); on a real cluster this would be sized to
  ~128 MB post-shuffle partitions, and AQE coalesces down anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the plan has fewer partitions than
    the target. Small local scans (one parquet file) otherwise pin
    every downstream stage — Arrow kernels especially — to one core;
    a 100 TB scan already has >> defaultParallelism input splits, so
    there this is a no-op (no shuffle inserted).

    Call ONLY on scan-rooted plans: the partition introspection
    converts the plan to an RDD, and under AQE that finalizes — i.e.
    eagerly EXECUTES — any shuffle stages the plan contains, running
    them again when the real action fires. For a shuffle-rooted frame
    use a plain ``repartition(n)`` instead."""
    sc = df.sparkSession.sparkContext
    target = parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def fan_out_local_sorted(df: DataFrame, *cols: str, parts: int | None = None) -> DataFrame:
    """Parallel + WITHIN-PARTITION ordered — the scale-safe form for
    corpus-sized outputs whose ordering is presentation-only: the
    round-robin ``fan_out`` (a no-op once the scan has enough input
    splits, i.e. always at 100 TB) followed by a local sort (no
    exchange, no range-sampling pass). Use ``fan_out_sorted`` only
    when downstream logic genuinely needs global range order."""
    return fan_out(df, parts).sortWithinPartitions(*cols)


def fan_out_sorted(df: DataFrame, col: str, parts: int | None = None) -> DataFrame:
    """Globally ordered AND parallel: range-partition on ``col`` into
    an explicit partition count (exempt from AQE coalescing, which
    would fold a small sort down to one post-shuffle partition and
    serialize whatever follows), then sort within partitions. Output
    ordering equals ``orderBy(col)`` at a fraction of the cost for
    downstream per-partition work."""
    sc = df.sparkSession.sparkContext
    target = parts or sc.defaultParallelism
    return df.repartitionByRange(target, col).sortWithinPartitions(col)


def get_spark(
    app_name: str = "hadoop-and-spark-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (fallback 32);
    ``shuffle_partitions`` defaults to $SPARK_GRAFT_SHUFFLE
    (fallback = cpus, so one wave of reduce tasks locally).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus)))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Console progress bars share stdout with the driver's JSON
        # tail capture (bench.py prints its result line there); static
        # conf, so it must be set at builder time.
        .config("spark.ui.showConsoleProgress", "false")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and convert in the
        # catalog (micro truncation can't move a window bucket).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    return builder.getOrCreate()
