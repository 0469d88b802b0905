"""Declarative data-quality expectations — the validation gate a
production pipeline runs before trusting an intake batch or shipping
a table downstream ("no null keys, prices in range, status codes from
the accepted set, every fact key resolves against its dimension").
The public analogues are AWS Deequ (Spark-native), Great Expectations
and dbt tests; the reference's analogue is its per-row try/except
insert guard (reference etl_pipeline.py:110-112 — rows that fail
constraints are skipped and counted), which this generalizes into a
declarative, exactly-countable rule sheet.

One entry point, :func:`check_expectations`: a list of :class:`Rule`
rows in, ONE audit row per rule out — ``(rule_id, kind, column,
n_rows, n_violations, ok)`` with EXACT integer counts, so the frame
hashes exactly against an ANSI-SQL oracle and a zero ``n_violations``
column is machine-checkable proof.

Rule kinds and their evaluation shape:

- row-local predicates — ``not_null``, ``range`` (numeric bounds,
  inclusive), ``regex`` (rlike SEARCH semantics — anchor with ^/$ for
  a full match; the oracle mirror is ``regexp_matches``, which
  searches too), ``in_set``: ALL of them fold
  into a SINGLE conditional-aggregation pass over the table
  (one map-side-combined aggregate, zero joins, zero extra scans no
  matter how many rules);
- ``unique``: one groupBy on the column counting keys with
  multiplicity > 1; violations = number of EXCESS rows (rows minus
  distinct keys over the non-null population), matching the "how many
  rows would a dedup remove" reading;
- ``ref`` (referential integrity): non-null values without a match in
  the reference frame's key column — a broadcast left-anti join
  against the (distinct, dimension-sized) key set;
- dataset-level METRIC bounds — ``min_ge`` / ``max_le`` /
  ``mean_between`` / ``row_count_between`` (the Deequ constraint
  shapes): one audit row each with n_violations in {0, 1}; they fold
  into the SAME single aggregate pass as the row-local rules, the
  mean through the decimal money discipline, and a NULL metric fails
  the bound (fail-closed).

Scale shape: the row-local pass is one scan; each unique/ref rule
adds one aggregate/join keyed on its own column. Nothing collects to
the driver but the bounded per-rule audit rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative expectation. ``kind`` ∈ {'not_null', 'range',
    'regex', 'in_set', 'unique', 'ref', 'min_ge', 'max_le',
    'mean_between', 'row_count_between'}; the payload fields used
    depend on the kind (bounds for 'range'/metric kinds, ``pattern``
    for 'regex', ``values`` for 'in_set', ``ref`` + ``ref_col`` for
    'ref')."""

    rule_id: str
    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    values: tuple = field(default=())
    ref: DataFrame | None = None
    ref_col: str | None = None


_ROW_LOCAL = ("not_null", "range", "regex", "in_set")

# dataset-level METRIC bounds (the Deequ constraint shapes): one audit
# row each, n_violations ∈ {0, 1} — the DATASET breaks the bound or
# not. All fold into the SAME single aggregate pass as the row-local
# rules. min/max compare stored values (exact); the mean goes through
# the decimal money discipline (exact sum, then one double division)
# so both engines compare the identical number. A NULL metric (empty
# or all-NULL column) FAILS the bound — fail-closed: an empty dataset
# cannot certify anything.
_DATASET_METRIC = ("min_ge", "max_le", "mean_between", "row_count_between")


def _violation_expr(rule: Rule):
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "range":
        # NULL is not a range violation (not_null owns nullness):
        # violations are non-null values outside [lo, hi]
        return c.isNotNull() & ~c.between(rule.lo, rule.hi)
    if rule.kind == "regex":
        # rlike = SEARCH semantics (anchor the pattern for full
        # match); NULL is not a regex violation (not_null owns it)
        return c.isNotNull() & ~c.rlike(rule.pattern)
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule.values))
    raise ValueError(f"not a row-local rule kind: {rule.kind}")


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule against ``df``; return one audit row per
    rule: (rule_id, kind, column, n_rows, n_violations, ok), exact
    integers, ok = n_violations == 0. See the module docstring for
    each kind's semantics and evaluation shape."""
    if not rules:
        raise ValueError("check_expectations: empty rule list")
    seen = set()
    for r in rules:
        if r.rule_id in seen:
            raise ValueError(f"duplicate rule_id {r.rule_id!r}")
        seen.add(r.rule_id)
    # The single-pass aggregate aliases '_n' and, for mean_between
    # rules, '<rule_id>_s'/'<rule_id>_c' companions — a rule_id that
    # collides with any of those would produce duplicate/ambiguous
    # aggregate columns and surface as a confusing AnalysisException
    # mid-plan; refuse it up front instead (ADVICE r11).
    reserved = {"_n"}
    for r in rules:
        if r.kind == "mean_between":
            reserved.add(r.rule_id + "_s")
            reserved.add(r.rule_id + "_c")
    bad = sorted(r.rule_id for r in rules if r.rule_id in reserved)
    if bad:
        raise ValueError(
            f"rule_id(s) {bad} collide with the audit aggregate's "
            "internal aliases ('_n' or a mean_between rule's "
            "'<rule_id>_s'/'<rule_id>_c' companions) — rename the rule"
        )

    from functools import reduce

    out_frames: list[DataFrame] = []

    row_local = [r for r in rules if r.kind in _ROW_LOCAL]
    metric = [r for r in rules if r.kind in _DATASET_METRIC]
    if row_local or metric:
        from ..functions.numeric import money_sum

        aggs = [F.count(F.lit(1)).alias("_n")]
        for r in row_local:
            aggs.append(
                F.sum(_violation_expr(r).cast("long")).alias(r.rule_id)
            )
        for r in metric:
            if r.kind == "min_ge":
                aggs.append(F.min(F.col(r.column)).alias(r.rule_id))
            elif r.kind == "max_le":
                aggs.append(F.max(F.col(r.column)).alias(r.rule_id))
            elif r.kind == "mean_between":
                aggs.append(money_sum(F.col(r.column)).alias(r.rule_id + "_s"))
                aggs.append(F.count(F.col(r.column)).alias(r.rule_id + "_c"))
            # row_count_between needs only _n
        row = df.agg(*aggs)
        per_rule = [
            row.select(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit(r.kind).alias("kind"),
                F.lit(r.column).alias("column"),
                F.col("_n").cast("long").alias("n_rows"),
                F.coalesce(F.col(r.rule_id), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
            for r in row_local
        ]
        for r in metric:
            if r.kind == "min_ge":
                ok_cond = F.col(r.rule_id) >= F.lit(r.lo)
            elif r.kind == "max_le":
                ok_cond = F.col(r.rule_id) <= F.lit(r.hi)
            elif r.kind == "mean_between":
                mean = F.col(r.rule_id + "_s") / F.col(r.rule_id + "_c")
                ok_cond = mean.between(r.lo, r.hi)
            else:  # row_count_between
                ok_cond = F.col("_n").between(int(r.lo), int(r.hi))
            per_rule.append(
                row.select(
                    F.lit(r.rule_id).alias("rule_id"),
                    F.lit(r.kind).alias("kind"),
                    F.lit(r.column).alias("column"),
                    F.col("_n").cast("long").alias("n_rows"),
                    # a NULL metric fails the bound (fail-closed)
                    F.when(ok_cond, F.lit(0))
                    .otherwise(F.lit(1))
                    .cast("long")
                    .alias("n_violations"),
                )
            )
        out_frames.append(reduce(lambda a, b: a.unionByName(b), per_rule))

    for r in rules:
        if r.kind == "unique":
            c = F.col(r.column)
            stats = df.filter(c.isNotNull()).agg(
                F.count(F.lit(1)).alias("_nn"),
                F.countDistinct(c).alias("_nd"),
                F.lit(1).alias("_one"),
            )
            total = df.agg(
                F.count(F.lit(1)).alias("_n"), F.lit(1).alias("_one")
            )
            out_frames.append(
                total.join(stats, "_one").select(
                    F.lit(r.rule_id).alias("rule_id"),
                    F.lit(r.kind).alias("kind"),
                    F.lit(r.column).alias("column"),
                    F.col("_n").cast("long").alias("n_rows"),
                    (F.col("_nn") - F.col("_nd"))
                    .cast("long")
                    .alias("n_violations"),
                )
            )
        elif r.kind == "ref":
            if r.ref is None or r.ref_col is None:
                raise ValueError(
                    f"rule {r.rule_id!r}: 'ref' needs ref + ref_col"
                )
            c = F.col(r.column)
            keys = r.ref.select(
                F.col(r.ref_col).alias(r.column)
            ).distinct()
            orphans = (
                df.filter(c.isNotNull())
                .join(F.broadcast(keys), r.column, "left_anti")
                .agg(F.count(F.lit(1)).alias("_v"), F.lit(1).alias("_one"))
            )
            total = df.agg(
                F.count(F.lit(1)).alias("_n"), F.lit(1).alias("_one")
            )
            out_frames.append(
                total.join(orphans, "_one").select(
                    F.lit(r.rule_id).alias("rule_id"),
                    F.lit(r.kind).alias("kind"),
                    F.lit(r.column).alias("column"),
                    F.col("_n").cast("long").alias("n_rows"),
                    F.col("_v").cast("long").alias("n_violations"),
                )
            )
        elif r.kind not in _ROW_LOCAL and r.kind not in _DATASET_METRIC:
            raise ValueError(f"unknown rule kind {r.kind!r} ({r.rule_id})")

    audit = reduce(lambda a, b: a.unionByName(b), out_frames)
    return audit.withColumn("ok", F.col("n_violations") == 0)
