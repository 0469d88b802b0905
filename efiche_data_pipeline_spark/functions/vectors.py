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


def cosine_pre(
    a: str | Column, b: str | Column, na: str | Column, nb: str | Column
) -> Column:
    """Cosine from PRE-COMPUTED norms: ``dot(a, b) / (na * nb)``.

    Bit-identical to :func:`cosine` when ``na``/``nb`` carry
    ``norm(a)``/``norm(b)`` computed on the same rows — double
    arithmetic is deterministic, so hoisting the norm out of the pair
    expression changes nothing about the value. The point is cost: in
    a candidate-pair fan-out (cell self-joins, query × candidate
    scoring) :func:`cosine` re-runs BOTH norm aggregates per pair;
    attaching the norm per vector row before the join makes the
    per-pair work a single dot product."""
    na_c = F.col(na) if isinstance(na, str) else na
    nb_c = F.col(nb) if isinstance(nb, str) else nb
    return dot(a, b) / (na_c * nb_c)
