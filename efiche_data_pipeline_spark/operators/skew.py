"""Skew-mitigation: salted equi-join.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins and after a shuffle has already materialized the
skew. Salting attacks the skew *in the plan*: the skewed (large) side
spreads each hot key over ``n_salts`` sub-keys, the small side is
replicated ``n_salts``× via an in-row explode, and the join key
becomes (key, salt) — no single reducer ever sees a whole hot key.

Use when one side is large-and-skewed and the other is small enough to
replicate (dims, lookup tables) but too big to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``on``, salted ``n_salts`` ways.

    ``salt_from`` is a column of the skewed side whose hash spreads
    rows uniformly (any unique-ish id — NOT the join key, which is the
    skewed value). Result is identical to ``skewed.join(small, on,
    how)`` for inner/left joins; tested differentially."""
    s = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    left = skewed.withColumn("_salt", F.pmod(F.xxhash64(s), F.lit(n_salts)).cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return left.join(right, [on, "_salt"], how).drop("_salt")
