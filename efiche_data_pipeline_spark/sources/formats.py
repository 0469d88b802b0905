"""Interchange formats beyond parquet — CSV / JSON-lines / ORC.

Parquet is the canonical store (columnar, typed, splittable); these
exist for the boundaries of the pipeline: CSV/JSONL are what external
producers hand you and what downstream consumers ask for, ORC is the
other columnar ecosystem. The rules that keep round-trips lossless:

- **Schema is always explicit on text reads.** CSV/JSON carry no
  types; inference samples the data (an extra pass, and
  scale-dependent results). `read_table` therefore requires the
  schema — reuse the parquet table's own schema for round-trips.
- **Timestamps are pinned to an ISO format** on both write and read,
  so CSV round-trips don't depend on session-local parsing defaults.
- **Compression**: text formats default to gzip (splittability is
  lost either way for single files; at scale prefer many files).

Scale note: a directory of CSV/JSONL files reads fully parallel
(one task per split); the cost vs parquet is decoding + no column
pruning / predicate pushdown — which is why these are import/export
formats here, not storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_TEXT_OPTIONS = {
    "csv": {
        "header": "true",
        "timestampNTZFormat": _TS_FMT,
        "timestampFormat": _TS_FMT,
        "nullValue": "\\N",  # distinguish NULL from empty string
        "escape": '"',
    },
    "json": {
        "timestampNTZFormat": _TS_FMT,
        "timestampFormat": _TS_FMT,
    },
}

SUPPORTED = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {SUPPORTED}")
    w = df.write.mode("overwrite").format(fmt)
    for k, v in _TEXT_OPTIONS.get(fmt, {}).items():
        w = w.option(k, v)
    if fmt in ("csv", "json"):
        w = w.option("compression", "gzip")
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats REQUIRE ``schema``
    (explicit types, no inference pass); columnar formats carry their
    own."""
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {SUPPORTED}")
    r = spark.read.format(fmt)
    for k, v in _TEXT_OPTIONS.get(fmt, {}).items():
        r = r.option(k, v)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} read requires an explicit schema (text formats carry "
                "no types; inference would add a sampling pass)"
            )
        r = r.schema(schema)
    elif schema is not None:
        r = r.schema(schema)
    return r.load(path)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSONL ingest with a QUARANTINE lane — the
    production posture for third-party feeds, where one malformed
    line must neither kill the job (FAILFAST) nor silently vanish
    (DROPMALFORMED): returns ``(good, quarantine)`` where ``good``
    carries every line that parses as a JSON object under ``schema``
    and ``quarantine`` carries the RAW text of every line that does
    not, ready for a dead-letter sink and replay after the producer
    is fixed.

    Contract: a syntactically-malformed line (or a JSON scalar/array
    — not an object) quarantines; a VALID object missing fields
    parses with nulls and stays in the good lane (downstream default
    coercion — the P1 rule — owns those). Implemented as
    ``spark.read.text`` + ``from_json`` with a corrupt-record field
    appended to the schema — NOT the top-level reader's PERMISSIVE
    ``columnNameOfCorruptRecord`` mode, which cannot be filtered
    without caching the whole frame (the documented Spark quirk);
    this form is one pass, no cache, and the split predicate is a
    column expression the optimizer can push. (A bare
    ``from_json(...).isNotNull()`` split is NOT enough: PERMISSIVE
    from_json returns an all-null STRUCT, not a null, for non-object
    JSON — the corrupt field is the reliable verdict.)

    Reference anchor: etl_pipeline.py:57-63 rolls back the whole
    transaction on any bad row — this keeps the good 99.99% flowing
    and isolates the bad rows instead."""
    _CORRUPT = "_quarantine_corrupt_rec"
    if isinstance(schema, str):
        # public DDL parser (ADVICE r09: the private
        # _parse_datatype_string is not a stable cross-version API)
        fields = T.StructType.fromDDL(schema)
    else:
        fields = schema
    if _CORRUPT in fields.fieldNames():
        raise ValueError(f"schema must not define {_CORRUPT!r}")
    widened = fields.add(_CORRUPT, T.StringType())
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            "value", widened, {"columnNameOfCorruptRecord": _CORRUPT}
        ).alias("_p"),
    )
    bad_pred = F.col(f"_p.{_CORRUPT}").isNotNull() | F.col("_p").isNull()
    good = parsed.filter(~bad_pred).select("_p.*").drop(_CORRUPT)
    quarantine = parsed.filter(bad_pred).select(F.col("value").alias("raw"))
    return good, quarantine
