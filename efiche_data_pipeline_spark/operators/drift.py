"""Distribution-drift measurement (PSI) over bucket-count frames.

The Population Stability Index between a reference slice and a
current slice, per column:

    PSI = Σ_buckets (p_cur - p_ran) · ln(p_cur / p_ref)

with Laplace-smoothed rates ((cnt+1)/(n+B)) so buckets empty on one
side stay finite, and — the engine-exactness discipline shared with
q107/q88 — each bucket's term rounded to a 1e-9 FIXED-POINT INTEGER
before the per-column sum, making the aggregation exact-associative:
no float-sum-order wobble across engines or across Spark's own
partition orders. Classic reading: PSI < 0.1 stable, 0.1-0.25 drifting,
> 0.25 alarmed.

Reference analogue: none (the reference ingests unconditionally);
this is the accept-gate a production 100 TB intake runs per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def psi_from_bucket_counts(per_bucket: DataFrame) -> DataFrame:
    """``per_bucket``: (column_name, bucket, c_ref, c_cur) — one row
    per observed bucket, zero-filled where a side lacks the bucket.
    Returns (column_name, psi, n_ref, n_cur, n_buckets). The only
    wide ops are bounded per-column windows over ≤ buckets rows."""
    by_col = W.partitionBy("column_name")
    wn = (
        per_bucket.withColumn("n_ref", F.sum("c_ref").over(by_col))
        .withColumn("n_cur", F.sum("c_cur").over(by_col))
        .withColumn("n_buckets", F.count(F.lit(1)).over(by_col))
    )
    pr = (F.col("c_ref") + 1) / (F.col("n_ref") + F.col("n_buckets"))
    pc = (F.col("c_cur") + 1) / (F.col("n_cur") + F.col("n_buckets"))
    term_fp = F.round(((pc - pr) * F.log(pc / pr)) * F.lit(1e9)).cast("long")
    return (
        wn.withColumn("_t", term_fp)
        .groupBy("column_name")
        .agg(
            F.round(F.sum("_t") / F.lit(1e9), 4).alias("psi"),
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max("n_buckets").cast("long").alias("n_buckets"),
        )
    )
