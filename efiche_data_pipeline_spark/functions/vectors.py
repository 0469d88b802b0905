"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (zip_with / aggregate), fully JVM-side and
codegen-friendly; no Python UDF round-trips.

Reference analogue: the declared-but-dormant ``VECTOR(768)`` column
(reference: sql/01_schema.sql:95). All arithmetic is done in DOUBLE so
results are bit-identical to a sequential-summing oracle on the same
float32 inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: str | Column) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    prod = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: str | Column) -> Column:
    v = _as_double(a)
    sq = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.sqrt(sq)


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
