"""Round-13 A/B harness (guide §1): candidate variants measured
against the registered queries, equality-gated first so a
faster-but-different variant can never be promoted.

Usage: python tools/ab_r13.py <which> [n_passes]
  which in {dti, cc, q9prof, q9two}

dti    — doc_token_ids variants: registered (two tokenize passes) vs
         shared-tokenize checkpoint vs per-doc RLE counts branch.
cc     — connected-components loop: the r12 structure (identity init,
         eager per-round checkpoint, join-based convergence count)
         vs the registered r13 structure (neighbor-min init, lazy
         checkpoint materialized by the flag count), both run over
         the same memoized MinHash pair graph via dedup_clusters.
q9prof — fresh q9_price_percentiles stage profile: full query vs
         histogram-aggregate-only vs windows-over-precomputed probes
         (VERDICT r12 asked for a re-profile before touching it).

Timing: qtime protocol — shared warm-up, then N interleaved passes,
min per variant; equality gate runs before any timing.
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
from hadoop_and_spark_spark.session import get_spark, fan_out
from hadoop_and_spark_spark.functions import tokenize
from hadoop_and_spark_spark.functions.portable import array_runs
from hadoop_and_spark_spark.operators.textstats import OOV_ID, VOCAB_SIZE
from hadoop_and_spark_spark.sources.maintenance import artifact_checkpoint

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---------------- doc_token_ids variants ----------------

def dti_checkpointed(spark, sf_dir):
    """ONE tokenize pass: the (doc_id, toks) frame is localCheckpointed
    and both the vocab count and the encode branch read it — trades a
    corpus-sized materialization for the second tokenize+scan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("toks")
    )
    docs = artifact_checkpoint(fan_out(docs))
    tok = docs.select("doc_id", F.posexplode("toks").alias("pos", "token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    topv = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(VOCAB_SIZE)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = topv.withColumn("token_id", F.row_number().over(w)).select(
        "token", "token_id"
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce("token_id", F.lit(OOV_ID)).alias("token_id"),
        )
        .sortWithinPartitions("doc_id", "pos")
    )


def dti_rle_counts(spark, sf_dir):
    """Vocab counts from per-doc RLE (sort + array_runs) instead of the
    occurrence-level groupBy: fewer rows into the partial aggregate,
    paid with an interpreted per-doc array sort. Encode branch
    unchanged (still needs positions)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("toks")
    )
    tok = fan_out(docs).select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    )
    runs = (
        fan_out(docs)
        .select(F.explode(array_runs(F.array_sort("toks"))).alias("r"))
        .select(F.col("r.v").alias("token"), F.col("r.n").alias("n"))
    )
    counts = runs.groupBy("token").agg(F.sum("n").alias("cnt"))
    topv = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(VOCAB_SIZE)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = topv.withColumn("token_id", F.row_number().over(w)).select(
        "token", "token_id"
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce("token_id", F.lit(OOV_ID)).alias("token_id"),
        )
        .sortWithinPartitions("doc_id", "pos")
    )


# ---------------- connected-components variants ----------------

def _cc_r12(pairs, a="doc_a", b="doc_b", max_iter=30):
    """The pre-r13 loop, verbatim structure: identity init, eager
    per-round checkpoint, new-vs-old join for the convergence count."""
    edges = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .transform(artifact_checkpoint)
    )
    labels = (
        edges.select("u")
        .distinct()
        .withColumn("label", F.col("u"))
        .transform(artifact_checkpoint)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label").alias("vlabel")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nbr"))
        )
        new_labels = labels.join(nbr_min, "u", "left").select(
            "u",
            F.least("label", F.coalesce("nbr", F.col("label"))).alias("label"),
        ).transform(artifact_checkpoint)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError("did not converge")
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def _clusters_with(cc_fn):
    def q(spark, sf_dir):
        from hadoop_and_spark_spark.operators.dedup import dedup_minhash_lsh

        pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
        comp = cc_fn(pairs)
        wsize = Window.partitionBy("cluster_id")
        return (
            comp.select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("cluster_id"),
            )
            .withColumn("cluster_size", F.count("*").over(wsize))
            .sortWithinPartitions("doc_id")
        )

    return q


# ---------------- untouched-tail sweep variants (VERDICT r12 #7) ----

def langid_let(spark, sf_dir):
    """langid with the token array let-bound so the five lexicon-hit
    columns provably share ONE tokenize evaluation. The registered
    plan computes h_* in their own Project (CollapseProject declines
    to re-inline multiply-referenced non-cheap expressions), so this
    only wins if codegen subexpression elimination is NOT already
    deduping the five tokenize trees."""
    from hadoop_and_spark_spark.operators.textstats import (
        STOPWORDS,
        _LANGS,
        _hits,
    )
    from hadoop_and_spark_spark.functions.portable import let_col
    from hadoop_and_spark_spark.session import fan_out_local_sorted

    docs = load_table(spark, sf_dir, "documents")
    hits_struct = let_col(
        tokenize("text"),
        lambda toks: F.struct(
            *[
                _hits(toks, STOPWORDS[lang]).alias(f"h_{lang}")
                for lang in _LANGS
            ]
        ),
    )
    scored = fan_out_local_sorted(
        docs.select("doc_id", F.col("lang").alias("lang_meta"), "text"),
        "doc_id",
    ).select("doc_id", "lang_meta", hits_struct.alias("h"))
    h = lambda lang: F.col(f"h.h_{lang}")  # noqa: E731
    mx = F.greatest(*[h(lang) for lang in _LANGS])
    pred = F.when(mx == 0, "und")
    for lang in _LANGS:
        pred = pred.when(h(lang) == mx, lang)
    return scored.select(
        "doc_id", "lang_meta", pred.alias("lang_pred"), mx.alias("hits")
    )


def tstats_let(spark, sf_dir):
    """token_stats with the whitespace token count let-bound (the
    registered plan repeats the split+filter tree 4x: once for
    ws_tokens, 3x inside round6's CASE for chars_per_token)."""
    from hadoop_and_spark_spark.functions.portable import let_col, round6
    from hadoop_and_spark_spark.operators.textstats import BPE_PATTERN
    from hadoop_and_spark_spark.session import fan_out_local_sorted

    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PATTERN), 0))
    row = let_col(
        F.size(F.filter(F.split("text", " "), lambda t: t != "")),
        lambda ws: F.struct(
            ws.alias("ws_tokens"),
            round6(
                F.length("text").cast("double")
                / F.greatest(ws.cast("double"), F.lit(1.0))
            ).alias("cpt"),
        ),
    )
    return fan_out_local_sorted(
        docs.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        row.alias("r"),
        bpe.alias("bpe_tokens"),
    ).select(
        "doc_id",
        "n_chars",
        F.col("r.ws_tokens").alias("ws_tokens"),
        "bpe_tokens",
        F.col("r.cpt").alias("chars_per_token"),
    )


def ppx_nockpt(spark, sf_dir):
    """doc_perplexity WITHOUT the bigram-stream localCheckpoint: the
    LM build and the scoring join each run their own tokenize+explode
    pass (two corpus scans, nothing corpus-sized materialized). The
    registered form checkpoints the stream so tokenize runs once; at
    10x/32c that materialization contends for the storage pool, so
    this twin measures what the checkpoint is actually worth."""
    from hadoop_and_spark_spark.operators.text import (
        LM_K,
        _bigram_pairs,
    )
    from hadoop_and_spark_spark.functions.portable import round6

    def bigrams():
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        return docs.select(
            "doc_id", F.explode(_bigram_pairs()).alias("p")
        ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))

    lm = bigrams().groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    lm_a = lm.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab = lm.agg(F.count_distinct("b").alias("v"))
    p = (F.col("c_ab") + F.lit(LM_K)) / (
        F.col("c_a") + F.lit(LM_K) * F.col("v")
    )
    unit = F.floor(-F.log10(p) * 1e6 + F.lit(0.5)).cast("long")
    return (
        bigrams()
        .join(lm, ["a", "b"])
        .join(lm_a, "a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", unit.alias("u"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("u").alias("su"))
        .select(
            "doc_id",
            "n_bigrams",
            round6(F.col("su") / F.col("n_bigrams") / 1e6).alias("surprisal"),
        )
        .sortWithinPartitions("doc_id")
    )


# ---------------- q9 stage-profile probes ----------------

def q9_single_window(spark, sf_dir):
    """The PRE-r13 registered form: one cumulative window per flag
    (each flag's whole price domain in a single task). Kept as the
    A/B twin of the promoted two-level cumulative so the equality
    gate checks the registered query against its predecessor — the
    two-level body itself lives ONLY in the registered query (no
    drifting copy here)."""
    from hadoop_and_spark_spark.operators.relational import Q9_PCTS

    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("c")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
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


def q9_hist_only(spark, sf_dir):
    """Probe: the domain-bounded histogram aggregate alone."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_extendedprice")
        .agg(F.count("*").alias("c"))
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("c").alias("s"))
    )


def q9_scan_only(spark, sf_dir):
    """Probe: the two-column scan floor."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_extendedprice").groupBy().agg(
        F.count("*").alias("n")
    )


def run(which: str, n_passes: int = 5) -> None:
    spark = get_spark("exp")
    queries, _ = collect()
    if which == "dti":
        variants = {
            "dti_registered": queries["doc_token_ids"],
            "dti_checkpointed": dti_checkpointed,
            "dti_rle_counts": dti_rle_counts,
        }
        ref = "dti_registered"
    elif which == "cc":
        variants = {
            "cc_r13_registered": queries["dedup_clusters"],
            "cc_r12_structure": _clusters_with(_cc_r12),
        }
        ref = "cc_r13_registered"
    elif which == "ppx":
        variants = {
            "ppx_registered": queries["doc_perplexity"],
            "ppx_nockpt": ppx_nockpt,
        }
        ref = "ppx_registered"
    elif which == "sweep":
        variants = {
            "langid_registered": queries["langid_heuristic"],
            "langid_let": langid_let,
            "tstats_registered": queries["token_stats"],
            "tstats_let": tstats_let,
        }
        ref = None  # pairwise gates below
    elif which == "q9prof":
        variants = {
            "q9_registered": queries["q9_price_percentiles"],
            "q9_hist_only": q9_hist_only,
            "q9_scan_only": q9_scan_only,
        }
        ref = "q9_registered"
    elif which == "q9two":
        variants = {
            "q9_registered": queries["q9_price_percentiles"],
            "q9_single_window": q9_single_window,
        }
        ref = "q9_registered"
    else:
        raise SystemExit(f"unknown experiment {which}")

    # warm-up (codegen + worker pool), qtime-shape
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(ncpu, numPartitions=ncpu).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    # equality gate first (also warms every variant); *_only cost
    # probes are excluded — different outputs by design
    rows = {}
    for name, fn in variants.items():
        rows[name] = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    for name in variants:
        if name.endswith("_only"):
            continue
        # ref=None → pairwise experiments: each <q>_<variant> gates
        # against its own <q>_registered twin.
        this_ref = ref if ref else name.split("_")[0] + "_registered"
        same = rows[name] == rows[this_ref]
        print(f"equal[{name} vs {this_ref}]: {same}", flush=True)
        if not same:
            print("  REF ", rows[this_ref][:3])
            print("  GOT ", rows[name][:3])
            raise SystemExit(f"variant {name} output differs — not timeable")

    times = {n: [] for n in variants}
    jobs = {n: 0 for n in variants}
    tracker = spark.sparkContext.statusTracker()
    for p in range(n_passes):
        for name, fn in variants.items():
            gc.collect()
            group = f"exp:{name}#{p}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times[name].append(time.perf_counter() - t0)
            # driver-side job economy: actions + AQE stage-jobs per
            # invocation (the CC experiment's primary claim)
            jobs[name] = len(tracker.getJobIdsForGroup(group))
    for name, ts in times.items():
        print(
            f"{name:24s} min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} "
            f"jobs/invocation={jobs[name]} all="
            + ",".join(f"{t:.2f}" for t in ts),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 5)
