"""Deterministic replayable stream source for tests.

Reference (S7/T1): sorted per-minute part files → queue of RDDs →
`queueStream` driven by a ManualClock (a7/EventCount.scala:62-83,
108-118). Structured-Streaming equivalent: split a batch table into
N time-ordered parquet files and replay them with the file source +
`maxFilesPerTrigger=1` — each file becomes one micro-batch, giving
the same deterministic batch boundaries without any clock hackery.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_replay_files(df: DataFrame, ts_col: str, out_dir: str, n_files: int) -> int:
    """Split `df` into `n_files` contiguous time ranges, one parquet
    file each, named in time order (part-0000…). Returns file count."""
    tmp = os.path.join(out_dir, "_tmp")
    bucketed = df.withColumn("_bucket", F.ntile(n_files).over(Window.orderBy(ts_col)))
    os.makedirs(out_dir, exist_ok=True)
    for b in range(1, n_files + 1):
        part = bucketed.where(F.col("_bucket") == b).drop("_bucket")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(src, os.path.join(out_dir, f"part-{b:04d}.parquet"))
    shutil.rmtree(tmp)
    return n_files


def write_scripted_batches(dfs: list[DataFrame], out_dir: str) -> int:
    """Write each DataFrame as exactly one parquet file, named in
    sequence — a scripted replay where batch N contains exactly the
    rows of dfs[N] (for stateful-operator tests with exact per-batch
    counts).

    FileStreamSource orders files by MODIFICATION TIME, not name;
    back-to-back writes can tie on mtime and collapse two scripted
    batches into one trigger. Stamp strictly increasing mtimes so the
    replay order (and therefore per-batch watermark advancement) is
    deterministic."""
    import time

    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "_tmp")
    base = time.time()
    for b, df in enumerate(dfs):
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"part-{b:04d}.parquet")
        os.replace(src, dst)
        os.utime(dst, (base + 10 * b, base + 10 * b))
    shutil.rmtree(tmp)
    return len(dfs)


def read_replay_stream(spark: SparkSession, dir_path: str, schema) -> DataFrame:
    """File-source stream over the replay dir, one file per trigger."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir_path)
    )
