"""Format round-trip tests (sources/formats.py): parquet fixtures →
CSV / JSONL / ORC → read back with the original schema must be
value-identical, including NULL vs empty string, timestamps, dates,
doubles, and embedded delimiters/quotes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.sources.catalog import load_table
from efiche_data_pipeline_spark.sources.formats import read_table, write_table

from .conftest import SMOKE_SF_DIR


def _norm(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_orders_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, SMOKE_SF_DIR, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _norm(back) == _norm(src)


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_tricky_values_roundtrip(spark, tmp_path, fmt):
    src = spark.createDataFrame(
        [
            (1, 'comma, "quote"', 3.5),
            (2, "", 0.0),  # empty string must NOT come back as NULL
            (3, None, None),  # NULL must NOT come back as ""
            (4, "line\ttab", -1.25),
        ],
        "id long, s string, x double",
    )
    path = str(tmp_path / f"tricky_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert _norm(back) == _norm(src)


def test_events_timestamp_roundtrip_csv(spark, tmp_path):
    """Micros-precision NTZ timestamps survive the CSV text boundary."""
    src = load_table(spark, SMOKE_SF_DIR, "events").limit(200)
    path = str(tmp_path / "events_csv")
    write_table(src, path, "csv")
    back = read_table(spark, path, "csv", schema=src.schema)
    assert _norm(back.select("event_id", "ts")) == _norm(src.select("event_id", "ts"))


def test_text_read_requires_schema(spark, tmp_path):
    src = spark.range(3)
    path = str(tmp_path / "r")
    write_table(src, path, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, "csv")


def test_jsonl_quarantine_split(spark, tmp_path):
    """Malformed lines (and non-object JSON) land raw in the
    quarantine lane; valid objects — including ones with missing
    fields — parse into the good lane. Nothing is dropped: the two
    lanes partition the input exactly."""
    from efiche_data_pipeline_spark.sources.formats import (
        read_jsonl_quarantine,
    )

    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        '{"doc_id": 2}',  # missing field -> good lane, null text
        '{"doc_id": 3, "text": "gamma"',  # truncated -> quarantine
        "not json at all",  # quarantine
        "[1, 2, 3]",  # JSON but not an object -> quarantine
        '{"doc_id": 4, "text": "delta", "extra": true}',  # extra ok
    ]
    path = str(tmp_path / "feed.jsonl")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    good, bad = read_jsonl_quarantine(
        spark, path, "doc_id long, text string"
    )
    got = {(r["doc_id"], r["text"]) for r in good.collect()}
    assert got == {(1, "alpha"), (2, None), (4, "delta")}
    raws = {r["raw"] for r in bad.collect()}
    assert raws == {lines[2], lines[3], lines[4]}
    assert good.count() + bad.count() == len(lines)
