"""NYC taxi event CSV source + geo region classification.

Reference (a7): comma-split CSV, no header, schema by position with
color-dependent dropoff coordinate columns — yellow at ordinals
10/11, green at 8/9 (a7/RegionEventCount.scala:79-90) — and two
hard-coded bounding boxes (goldman / citigroup,
a7/RegionEventCount.scala:67-75).

Spark-first: read the minimal positional columns as one schema wide
enough for both colors, then a `when/otherwise` projection picks the
right coordinate pair per color — the conditional column dispatch
(F4) without any RDD closure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (lon_min, lon_max, lat_min, lat_max), RegionEventCount.scala:67-75
GOLDMAN = (-74.0144185, -74.013777, 40.7138745, 40.7152275)
CITIGROUP = (-74.012083, -74.009867, 40.720053, 40.7217236)

# Positional columns we need: 0 color, 2 pickup_ts, 3 dropoff_ts,
# 8..11 coordinate candidates (meaning differs by color).
_N_COLS = 20


def read_taxi_csv(spark: SparkSession, path: str) -> DataFrame:
    schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(_N_COLS)]
    )
    raw = spark.read.csv(path, schema=schema, header=False)
    is_yellow = F.col("_c0") == "yellow"
    return raw.select(
        F.col("_c0").alias("color"),
        F.to_timestamp("_c2").alias("pickup_ts"),
        F.to_timestamp("_c3").alias("dropoff_ts"),
        F.when(is_yellow, F.col("_c10")).otherwise(F.col("_c8"))
        .cast("double")
        .alias("dropoff_lon"),
        F.when(is_yellow, F.col("_c11")).otherwise(F.col("_c9"))
        .cast("double")
        .alias("dropoff_lat"),
    )


def in_bbox(lon: Column, lat: Column, bbox: tuple[float, float, float, float]) -> Column:
    lon_min, lon_max, lat_min, lat_max = bbox
    return (lon > lon_min) & (lon < lon_max) & (lat > lat_min) & (lat < lat_max)


def classify_region(df: DataFrame) -> DataFrame:
    """Add `region` ∈ {goldman, citigroup, other} from the dropoff
    point (RegionEventCount.scala:91-107)."""
    lon, lat = F.col("dropoff_lon"), F.col("dropoff_lat")
    return df.withColumn(
        "region",
        F.when(in_bbox(lon, lat, GOLDMAN), "goldman")
        .when(in_bbox(lon, lat, CITIGROUP), "citigroup")
        .otherwise("other"),
    )
