"""efiche_data_pipeline_spark — a PySpark-native analytics & pipeline engine.

A from-scratch re-expression of the dataflow capabilities of the
reference pipeline (Bonheur773/efiche-data-pipeline: staged ETL →
normalized operational tables → star-schema warehouse → materialized
views → a 12-query analytics corpus) as idiomatic Spark:

- DataFrame/SQL over columnar Parquet (Catalyst + Tungsten, AQE)
- set-oriented jobs instead of row-at-a-time psycopg2 loops
- Structured Streaming for the incremental/micro-batch ingest path
- LLM-data-pipeline extensions: near-dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), embedding similarity search, text
  analysis, JSON/event analytics — all designed for 100 TB scale.

Layout
------
- ``session``    — tuned SparkSession builder
- ``sources``    — parquet catalog over the fixture tables
- ``functions``  — column-expression helpers (dates, text, vectors,
                   portable hashes, exact numeric aggregation)
- ``operators``  — composite dataflow operators (dedup, similarity,
                   multimodal binary columns)
- ``plans``      — the query library (relational + extensions +
                   write-side readback queries)
- ``pipeline``   — write side: parquet store, synthetic generator,
                   staging ingest, warehouse builder + MV refresh,
                   analytics report runner
- ``streaming``  — Structured Streaming incremental pipeline +
                   batch high-watermark mode
"""

__version__ = "0.1.0"
