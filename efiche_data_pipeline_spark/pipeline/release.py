"""Release export: ship a finished dataset as deterministic, balanced,
individually verifiable shards — the artifact a training run actually
consumes.

- **Deterministic shard assignment**: shard = portable_hash60(key) mod
  n_shards — a pure function of the row key, so the same release
  written twice (or on a different cluster / partitioning) produces
  byte-equivalent shard MEMBERSHIP, and a consumer can locate any
  key's shard without an index.
- **Verifiable manifest**: per shard, the row count and an ORDER-FREE
  content digest (bit_xor of a per-row md5-derived 60-bit hash over
  the sorted column set, so the digest is invariant to row order and
  file layout within the shard). `verify_release` recomputes both
  from the shard files and compares — the check a consumer runs
  before training, and the tamper/truncation detector for transport.

Scale shape: one hash projection + one shuffle on the shard id (the
write's own repartition), digests as map-side-combinable aggregates;
the manifest is n_shards rows.

Reference anchor: none (beyond-reference tier) — the release-side
counterpart of sources/; q135 diffs two releases, this writes one.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60

MANIFEST_NAME = "_MANIFEST.json"


def _row_hash(df: DataFrame) -> F.Column:
    """Order-free per-row 60-bit content hash over ALL columns (sorted
    by name, so schema column order cannot change the digest)."""
    cols = sorted(df.columns)
    return portable_hash60(F.to_json(F.struct(*[F.col(c) for c in cols])))


def _shard_digests(df: DataFrame, shard_col: str = "shard") -> DataFrame:
    return (
        df.withColumn("_rh", _row_hash(df.drop(shard_col)))
        .groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.bit_xor("_rh").cast("long").alias("digest"),
        )
    )


def write_release(
    df: DataFrame, path: str, n_shards: int, key_col: str
) -> dict:
    """Write ``df`` under ``path`` as ``shard=N`` parquet directories
    plus a manifest. Returns the manifest dict."""
    sharded = df.withColumn(
        "shard",
        F.pmod(portable_hash60(F.col(key_col).cast("string")), n_shards).cast(
            "int"
        ),
    )
    data_dir = os.path.join(path, "data")
    sharded.repartition("shard").write.mode("errorifexists").partitionBy(
        "shard"
    ).parquet(data_dir)
    # Digest what actually LANDED, not the input lineage: re-executing
    # ``df`` here could evaluate a nondeterministic plan (sample, rand,
    # a re-run shuffle) a second time and publish a manifest describing
    # rows the files don't contain. Reading back is also cheaper than
    # re-running the upstream job.
    landed = df.sparkSession.read.parquet(data_dir)
    stats = {
        int(r["shard"]): (int(r["rows"]), int(r["digest"]))
        for r in _shard_digests(landed).collect()
    }
    manifest = {
        "n_shards": int(n_shards),
        "key_col": key_col,
        "columns": sorted(df.columns),
        "total_rows": sum(v[0] for v in stats.values()),
        "shards": {
            str(s): {
                "rows": stats.get(s, (0, 0))[0],
                "digest": stats.get(s, (0, 0))[1],
            }
            for s in range(n_shards)
        },
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))  # atomic publish
    return manifest


def verify_release(spark: SparkSession, path: str) -> dict:
    """Recompute every shard's row count and digest from the files and
    compare against the manifest. Returns {"ok": bool, "bad_shards":
    [...], "manifest": dict} — the consumer-side integrity gate."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(os.path.join(path, "data"))
    got = {
        int(r["shard"]): (int(r["rows"]), int(r["digest"]))
        for r in _shard_digests(df).collect()
    }
    bad = []
    for s in range(manifest["n_shards"]):
        want = manifest["shards"][str(s)]
        have = got.get(s, (0, 0))
        if (want["rows"], want["digest"]) != have:
            bad.append(s)
    # Addition-tampering: a shard directory OUTSIDE the manifest's
    # range is read by any consumer of data/ but would pass a
    # manifest-keyed loop — flag it explicitly.
    bad += sorted(s for s in got if s >= manifest["n_shards"] or s < 0)
    return {"ok": not bad, "bad_shards": bad, "manifest": manifest}
