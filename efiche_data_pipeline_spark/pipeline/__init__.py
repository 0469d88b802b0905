"""Write-side pipeline stages: synthetic generation, staging ingest,
star-schema warehouse build + MV refresh, and the analytics report
runner — the Spark re-design of the reference's four entry points
(reference: src/etl_pipeline.py, src/generate_synthetic_data.py,
src/populate_warehouse.py, src/run_analytics.py).

Each stage is a pure function over a :class:`~.store.Store` (a
directory of parquet tables); nothing is row-at-a-time and nothing
collects to the driver.
"""

from .store import Store

__all__ = ["Store"]
