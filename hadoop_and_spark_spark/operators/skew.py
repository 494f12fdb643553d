"""Skew-mitigation utilities.

Policy is AQE-first: the session enables
``spark.sql.adaptive.skewJoin`` (session.py), which splits oversized
sort-merge partitions at runtime, and hash aggregations partial-
aggregate map-side, so MOST skew needs no hand-tuning. Manual salting
is for the cases AQE cannot reach:

- shuffled-hash / state-keyed plans where a single key's rows must
  not land in one task (streaming state stores, windowed ranks — see
  ``heavy_users_topk``'s two-level hierarchical form for the
  aggregation flavor),
- deterministic layouts where runtime re-splitting is not available
  (bucketed writes, pre-AQE engines being reproduced).

``salted_equi_join`` implements the classic construction: the skewed
(fact) side spreads each hot key across SALT sub-keys by hashing a
per-row spread column; the other side replicates each row SALT times
so every sub-key still finds its match. The join result is EXACTLY
the plain join's — replication is keyed, never cross-joined — at the
cost of a SALT× blowup of the (small, but not broadcastable) side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_equi_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    spread: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the skewed side's hot keys spread
    over ``salt`` shuffle sub-keys.

    ``spread`` is any column of the skewed side with per-row variety
    (an event id, a timestamp): the salt is ``pmod(hash(spread),
    salt)``, deterministic per row — no RNG, so plans stay replayable.
    ``other`` explodes to one copy per salt value; each (key, salt)
    pair therefore joins exactly one replica and the output equals the
    unsalted join row-for-row."""
    if SALT_COL in skewed.columns or SALT_COL in other.columns:
        raise ValueError(f"{SALT_COL} column name is reserved")
    left = skewed.withColumn(SALT_COL, F.pmod(F.hash(F.col(spread)), F.lit(salt)))
    right = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return left.join(right, [key, SALT_COL], how).drop(SALT_COL)
