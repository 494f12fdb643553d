"""Round-12 second-pass A/B harness (guide §1): candidate variants
measured against the registered queries, equality-gated first so a
faster-but-different variant can never be promoted. Variants that
LOST are kept here as the rejection evidence cited in
OPTIMIZATION_r12.md (q9 narrow keys, CMS packed cell); the pmi
chained-explode variant WON and is now the registered _cooc_pairs.

Usage: python tools/ab_r12.py <which> [n_passes]
  which in {q9, cms, pmi}

Each variant is timed with the qtime protocol (warm-up pass, then N
interleaved passes, min per variant) and the outputs are compared for
exact equality against the registered query so a faster-but-different
variant can never be promoted.
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_and_spark_spark.catalog import load_table
from hadoop_and_spark_spark.registry import collect
from hadoop_and_spark_spark.session import get_spark
from hadoop_and_spark_spark.functions.portable import (
    HASH_P,
    let_col,
    poly_hash,
    poly_hash_py,
)
from hadoop_and_spark_spark.operators.relational import Q9_PCTS
from hadoop_and_spark_spark.operators.text import (
    CMS_PROBES,
    CMS_WIDTH,
    _CMS_PERMS,
    _tokens,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---------------- q9 variants ----------------

def _q9_finish(hist, order_col: str):
    """Shared histogram -> exact-percentile finish (cumulative windows,
    bracket aggregation, linear interpolation) used by BOTH rejected
    q9 variants - parameterized by the histogram's order column so the
    two can never drift apart and silently weaken the equality gate
    (ADVICE r12). Expects hist = (l_returnflag, l_extendedprice,
    order_col, c)."""
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    hist = (
        hist.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n", F.sum("c").over(w_all))
        .withColumn("lo", F.col("cum") - F.col("c"))
    )

    def bracket(p):
        pos = F.lit(p) * (F.col("n") - F.lit(1)).cast("double")
        k_lo = F.floor(pos)
        k_hi = -F.floor(-pos)
        v_lo = F.max(
            F.when((F.col("lo") <= k_lo) & (k_lo < F.col("cum")), F.col("l_extendedprice"))
        )
        v_hi = F.max(
            F.when((F.col("lo") <= k_hi) & (k_hi < F.col("cum")), F.col("l_extendedprice"))
        )
        return v_lo, v_hi

    aggs = [F.max("n").alias("cnt")]
    for name, p in Q9_PCTS:
        v_lo, v_hi = bracket(p)
        aggs += [v_lo.alias(f"_lo_{name}"), v_hi.alias(f"_hi_{name}")]
    out = hist.groupBy("l_returnflag").agg(*aggs)

    def interp(name, p):
        pos = F.lit(p) * (F.col("cnt") - F.lit(1)).cast("double")
        k_lo = F.floor(pos)
        k_hi = -F.floor(-pos)
        v_lo, v_hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        exact = F.when(k_lo == k_hi, v_lo).otherwise(
            (k_hi.cast("double") - pos) * v_lo + (pos - k_lo.cast("double")) * v_hi
        )
        return F.round(exact, 6).alias(name)

    return out.select(
        "l_returnflag",
        *[interp(name, p) for name, p in Q9_PCTS],
        "cnt",
    ).orderBy("l_returnflag")


def q9_packed(spark, sf_dir):
    """Histogram keyed on ONE long packing (flag_char, cents):
    cents = rint(price*100) < 2^24 << flag byte at bit 34. Narrower,
    fixed-width group key -> cheaper partial-agg hash map + exchange.
    Decode is exact: price doubles roundtrip through cents (verified
    at all SFs), flag is single-char (verified)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = (
        F.ascii("l_returnflag").cast("long") * F.lit(1 << 34)
        + F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    hist = li.groupBy(key.alias("k")).agg(F.count("*").alias("c"))
    hist = hist.select(
        F.char((F.col("k") / F.lit(1 << 34)).cast("long")).alias("l_returnflag"),
        (
            (F.col("k") % F.lit(1 << 34)).cast("double") / F.lit(100.0)
        ).alias("l_extendedprice"),
        "c",
    )
    return _q9_finish(hist, "l_extendedprice")


def q9_cents_cols(spark, sf_dir):
    """Histogram keyed on (flag, cents int) - narrower than double but
    two columns."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("int").alias("cents"),
    ).agg(F.count("*").alias("c"))
    hist = hist.withColumn(
        "l_extendedprice", F.col("cents").cast("double") / F.lit(100.0)
    )
    return _q9_finish(hist, "cents")


# ---------------- token_freq_cms variants ----------------

def cms_packed(spark, sf_dir):
    """Cells packed into one int (d*WIDTH + c) - explode array<int>
    instead of array<struct<int,int>>, single-int group key."""
    toks = _tokens(spark, sf_dir)
    cells = let_col(
        poly_hash(F.col("word")),
        lambda h: F.array(
            *[
                (
                    F.lit(d * CMS_WIDTH)
                    + ((F.lit(a) * h + F.lit(b)) % HASH_P % CMS_WIDTH)
                ).cast("int")
                for d, (a, b) in enumerate(_CMS_PERMS)
            ]
        ),
    )
    grid = (
        toks.select(F.explode("toks").alias("word"))
        .select(F.explode(cells).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("cnt"))
        .select(
            (F.col("cell") / CMS_WIDTH).cast("int").alias("r"),
            (F.col("cell") % CMS_WIDTH).alias("c"),
            "cnt",
        )
    )
    probes = spark.createDataFrame(
        [
            (t, d, (a * poly_hash_py(t) + b) % HASH_P % CMS_WIDTH)
            for t in CMS_PROBES
            for d, (a, b) in enumerate(_CMS_PERMS)
        ],
        "term string, r int, c int",
    )
    return (
        probes.join(F.broadcast(grid), ["r", "c"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("approx_cnt"))
        .orderBy("term")
    )


def cms_tok_explode_only(spark, sf_dir):
    """Cost floor probe: tokenize+explode+count only (no hash)."""
    toks = _tokens(spark, sf_dir)
    return toks.select(F.explode("toks").alias("word")).groupBy().agg(
        F.count("*").alias("n")
    )


def cms_hash_only(spark, sf_dir):
    """Cost probe: tokenize+explode+poly_hash, sum of hashes."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select(F.explode("toks").alias("word"))
        .select(poly_hash(F.col("word")).alias("h"))
        .groupBy()
        .agg(F.sum("h").alias("s"))
    )


# ---------------- pmi pair-gen variants ----------------

def pmi_pairs_lateral(spark, sf_dir):
    """The r12 candidate that WON: chained-explode ("lateral") pair
    generation. Promoted to the registered _cooc_pairs in 15479bb, so
    the variant now DELEGATES to the registered query instead of
    re-inlining its body (ADVICE r12: an inlined copy would drift and
    silently weaken the equality gate). `ab_r12.py pmi` still runs,
    as an identity A/B."""
    from hadoop_and_spark_spark.registry import collect as _collect

    qs, _ = _collect()
    return qs["pmi_pairs"](spark, sf_dir)


def run(which: str, n_passes: int = 5) -> None:
    spark = get_spark("exp")
    queries, _ = collect()
    if which == "q9":
        variants = {
            "q9_registered": queries["q9_price_percentiles"],
            "q9_packed": q9_packed,
            "q9_cents_cols": q9_cents_cols,
        }
        ref = "q9_registered"
    elif which == "cms":
        variants = {
            "cms_registered": queries["token_freq_cms"],
            "cms_packed": cms_packed,
            "cms_tok_explode_only": cms_tok_explode_only,
            "cms_hash_only": cms_hash_only,
        }
        ref = "cms_registered"
    elif which == "pmi":
        variants = {
            "pmi_registered": queries["pmi_pairs"],
            "pmi_lateral": pmi_pairs_lateral,
        }
        ref = "pmi_registered"
    else:
        raise SystemExit(f"unknown experiment {which}")

    # warm-up (codegen + worker pool), qtime-shape
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(ncpu, numPartitions=ncpu).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    # equality gate first (also warms every variant)
    ref_rows = None
    rows = {}
    for name, fn in variants.items():
        rows[name] = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    ref_rows = rows[ref]
    for name in variants:
        if name.endswith("_only"):
            continue  # cost probes, not full queries
        same = rows[name] == ref_rows
        print(f"equal[{name} vs {ref}]: {same}", flush=True)
        if not same:
            print("  REF ", ref_rows[:3])
            print("  GOT ", rows[name][:3])

    times = {n: [] for n in variants}
    for p in range(n_passes):
        for name, fn in variants.items():
            gc.collect()
            spark.sparkContext.setJobDescription(f"exp:{name}#{p}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name:24s} min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} all="
            + ",".join(f"{t:.2f}" for t in ts),
            flush=True,
        )


if __name__ == "__main__":
    run(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 5)
