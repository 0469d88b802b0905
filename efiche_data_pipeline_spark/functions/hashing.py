"""Portable deterministic hashes.

Two tiers:

- :func:`portable_hash60` — md5-derived 60-bit integer, computable
  bit-identically in any engine with ``md5`` (Spark, DuckDB, Postgres).
  Used wherever the oracle must reproduce the hash (fingerprints,
  SimHash). 60 bits = 15 hex chars, so it always fits a signed int64.
- ``xxhash64(seed, col)`` (built-in, JVM-side) — used for the
  Spark-only paths (MinHash signatures, salting) where speed matters
  and no oracle needs to replay it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: str | Column) -> Column:
    """60-bit integer hash of a string column: first 15 hex chars of
    md5, base-16 → base-10. DuckDB equivalent:
    ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def oracle_hash60(expr: str) -> str:
    """DuckDB-side rendering of :func:`portable_hash60`."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def seeded_hash64(col: str | Column, seed: int) -> Column:
    """Fast seeded 64-bit hash (JVM xxhash64). NOT oracle-portable —
    for Spark-internal use (MinHash perms, LSH bucketing, skew salt)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.lit(seed), c)


# md5-chunk hash family: seed s maps to 32-bit chunk (s % 4) of
# md5('<s//4>:' || value) — 16 INDEPENDENT hashes from 4 md5 calls.
# (A cheaper single-md5 linear-perm family (a·h+b) mod p was measured
# and rejected: min-wise correlation between perms of one base hash
# produced 6/31 false-positive LSH pairs at est_sim≥0.5 where true
# Jaccard < 0.3; distinct md5 chunks are cryptographically independent
# and showed zero.) Values are 32-bit non-negative — BIGINT-safe in
# both engines.


def portable_chunk_hash(col: str | Column, seed: int) -> Column:
    """Chunk ``seed % 4`` (8 hex chars) of ``md5('<seed//4>:' || value)``
    as a non-negative int64 — the oracle-replayable MinHash permutation
    family (DuckDB: :func:`oracle_chunk_hash`)."""
    c = F.col(col) if isinstance(col, str) else col
    digest = F.md5(F.concat_ws(":", F.lit(str(seed // 4)), c))
    return F.conv(F.substring(digest, 8 * (seed % 4) + 1, 8), 16, 10).cast("long")


def oracle_chunk_hash(expr: str, seed: int) -> str:
    """DuckDB-side rendering of :func:`portable_chunk_hash`."""
    return (
        f"CAST('0x' || substring(md5('{seed // 4}:' || {expr}), "
        f"{8 * (seed % 4) + 1}, 8) AS BIGINT)"
    )
