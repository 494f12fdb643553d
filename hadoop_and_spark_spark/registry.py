"""Central query registry.

Aggregates every operator module's ``QUERIES`` (name -> callable
(spark, sf_dir) -> DataFrame) and ``ORACLE_SQL`` (name -> DuckDB SQL
string) into the driver contract exposed by ``__spark_entry__.py``.

Modules register lazily so a bug in one family never hides the rest.

Ordering: the driver's correctness check records at most ~50 rows per
round, taken in registration order — with 80+ queries a static order
starves the tail of the registry of driver evidence forever. So
``collect()`` returns the dict in LEAST-RECENTLY-VERIFIED order: a
query that has never had a green driver row (or whose last driver row
was red) sorts first, then ascending by the round of its most recent
green row, module order breaking ties. Every query therefore rotates
through the driver's verification window across rounds, and brand-new
or regressed queries always land inside it.
"""

from __future__ import annotations

import glob
import importlib
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_OPERATOR_MODULES = (
    "hadoop_and_spark_spark.operators.relational",
    "hadoop_and_spark_spark.operators.text",
    "hadoop_and_spark_spark.operators.index",
    "hadoop_and_spark_spark.operators.graph",
    "hadoop_and_spark_spark.operators.ml",
    "hadoop_and_spark_spark.operators.dedup",
    "hadoop_and_spark_spark.operators.similarity",
    "hadoop_and_spark_spark.operators.textstats",
    "hadoop_and_spark_spark.operators.temporal",
    "hadoop_and_spark_spark.operators.skew",
    "hadoop_and_spark_spark.operators.layout",
    "hadoop_and_spark_spark.operators.multimodal",
    "hadoop_and_spark_spark.operators.pipeline",
    "hadoop_and_spark_spark.streaming.windows",
    "hadoop_and_spark_spark.streaming.dedup",
    "hadoop_and_spark_spark.streaming.cdc",
    "hadoop_and_spark_spark.streaming.joins",
    "hadoop_and_spark_spark.sources.taxi",
)


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_round(has_oracle: set[str] | None = None) -> dict[str, int]:
    """query name -> round of its most recent committed driver row,
    but ONLY if that most-recent row is GREEN (hash green, or the
    rows-only ``no_oracle`` form with a recorded row count). A query
    whose LATEST row is red/errored is omitted — it sorts as
    never-verified (-1) and re-enters the driver window immediately,
    even if some earlier round had a green row.

    ``has_oracle``: names that NOW carry a DuckDB oracle. For those, a
    rows-only driver row no longer counts as green — it verified a
    weaker claim than the query now makes (a query upgraded from
    rows-only to oracle-gated has zero driver evidence for the oracle
    match), so the upgrade re-enters the window immediately."""
    latest: dict[str, tuple[int, bool]] = {}  # name -> (round, green?)
    for path in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and name not in (has_oracle or ())
            )
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, green)
    return {name: rnd for name, (rnd, green) in latest.items() if green}


def query_modules() -> dict[str, str]:
    """Query name -> owning operator module (short name) — the
    ATTRIBUTION map (which family owns a query), used by family-scoped
    sweeps like the hot-user test. For concurrency grouping see
    ``sweep_groups``."""
    out: dict[str, str] = {}
    for modname in _OPERATOR_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        short = modname.rsplit(".", 1)[1]
        if ".streaming." in modname:
            short = f"streaming.{short}"
        for name in getattr(mod, "QUERIES", {}):
            out[name] = short
    return out


def sweep_groups() -> dict[str, str]:
    """Serialization groups for callers running registered queries on
    CONCURRENT threads (tests' run_queries_concurrently): query name
    -> group key; queries in different groups may run simultaneously.

    Returns the EMPTY map — every query is its own group — because as
    of round 9 every piece of cross-query shared state is guarded at
    its own source, each behind a per-key lock so distinct artifacts
    still build in parallel: session-memoized artifacts
    (maintenance.session_memo), on-disk builds incl. the replay dirs
    three streaming modules share (maintenance.build_once), the
    module-local model caches (similarity._MODEL_LOCKS,
    graph._RANKS_CACHE_LOCKS), the replay shuffle-partition pin
    (streaming/runtime.py, refcounted), the memory-sink sequence
    (trending._SEQ_LOCK), and scoped SQL-conf mutation
    (catalog._CONF_LOCK). History: rounds 7-8 serialized per MODULE
    (double-build races) with one coarse group for all streaming
    (session-wide replay state); both hazards are now locked where
    they live, which is what lets the all-query sweeps pack the
    thread pool instead of queueing behind the widest family. A new
    module-level mutable cache MUST either take a per-key lock like
    the above or re-introduce its group here."""
    return {}


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _OPERATOR_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} from {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLE_SQL", {}))
    green = last_green_round(has_oracle=set(oracles))
    reg_pos = {name: i for i, name in enumerate(queries)}
    order = sorted(queries, key=lambda n: (green.get(n, -1), reg_pos[n]))
    return {n: queries[n] for n in order}, oracles
