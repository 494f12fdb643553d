"""Table catalog: load the testdata star schema by name.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table
under a scale-factor directory.

Everything reads through ``spark.read.parquet`` so Catalyst gets
column pruning + predicate pushdown for free (the reference defeated
this by dropping to ``.rdd`` immediately, a5/Q1.scala:59-62 — we
never do).
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

# Serializes scoped session-conf mutation against itself: runtime SQL
# confs are SESSION-wide, so two threads interleaving set/restore on
# the same key can leave one thread's spark.read planning under the
# other's restored (possibly unset) value — the registry sweeps run
# queries on a thread pool and events-loading queries span four lock
# groups there. Mutators of DIFFERENT keys don't interfere (the
# streaming replay's shuffle-partition pin holds a different key and
# is additionally serialized by the sweeps' streaming group lock);
# this lock only needs to cover same-key scoped blocks, which are
# driver-side plan-time work (milliseconds), so contention is nil.
_CONF_LOCK = threading.RLock()


@contextmanager
def _scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a runtime SQL conf for the duration of the block, then
    restore the caller's prior value (or unset). Parquet reads capture
    the conf at plan time, so restoring after ``spark.read`` does not
    affect the returned DataFrame's later execution. The whole
    set→plan→restore window holds ``_CONF_LOCK`` so concurrent scoped
    reads can't observe each other's restores."""
    with _CONF_LOCK:
        prior = spark.conf.get(key, None)
        spark.conf.set(key, value)
        try:
            yield
        finally:
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are fixed-cardinality; part/supplier/customer grow
# with SF but stay << fact tables — broadcast decision is left to
# Catalyst for those, hinted only where the reference hand-chose a
# map-side join).
TINY_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    ppath = table_path(sf_dir, name)
    tpath = os.path.join(sf_dir, f"{name}.tbl")
    if not os.path.exists(ppath) and os.path.isdir(tpath):
        # Text-format scale dir (sidecar-schema pipe-delimited CSV):
        # every registered query runs unchanged from text — the
        # reference's Text/Parquet test duality as a loader switch.
        from .sources.tbl import read_text_table

        return read_text_table(spark, tpath)
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the parquet, which Spark cannot
        # read natively; nanosAsLong is a runtime-settable SQL conf,
        # so set it here rather than only in the session builder —
        # callers (the driver harness) may pass their own session.
        # Scoped: the caller's prior value is restored after the read,
        # so a later read of a DIFFERENT nanos-timestamp parquet in
        # the same session keeps the caller's own semantics.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        with _scoped_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"):
            df = spark.read.parquet(ppath)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # ns → µs with integer division: double division loses
            # ULP-level precision at ~1.7e18 and can flip a window
            # boundary by ±1µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(ppath)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as a file-source stream (ts normalized the same
    way as the batch load).

    The file stream source requires a directory; the testdata ships
    a single parquet file, so it is staged via symlink into a temp
    dir (testdata itself is read-only).
    """
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = table_path(sf_dir, "events")
    # Deliberately NOT scoped like load_table's read: the streaming
    # scan executes when the query STARTS, long after this returns, so
    # the conf must outlive the call. Permanent session mutation is
    # the documented contract here.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    if isinstance(raw_schema["ts"].dataType, T.LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif isinstance(raw_schema["ts"].dataType, T.TimestampNTZType):
        # Watermarks require TIMESTAMP (with local tz); session tz is
        # UTC so the cast preserves the stored wall clock.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
