"""Date-part derivation (reference: populate_warehouse.py:28-37 builds
dim_time attributes row-at-a-time in Python; here each attribute is a
vectorized JVM expression).

Semantics chosen to agree exactly with the DuckDB oracle:
- week         = ISO week (Spark weekofyear == DuckDB weekofyear)
- day_of_week  = ISO dow, 1=Monday..7=Sunday (Spark weekday()+1 == isodow)
- month_name / day_name = full English names ('March', 'Tuesday')
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(d: Column) -> Column:
    """yyyyMMdd integer key (reference: populate_warehouse.py:28)."""
    return F.date_format(d, "yyyyMMdd").cast("int")


def date_parts(d: Column) -> dict[str, Column]:
    """All dim_time attributes (reference: sql/03_warehouse.sql:57-70)."""
    return {
        "date_key": date_key(d),
        "full_date": d.cast("date"),
        "year": F.year(d),
        "quarter": F.quarter(d),
        "month": F.month(d),
        "month_name": F.date_format(d, "MMMM"),
        "week": F.weekofyear(d),
        "day_of_month": F.dayofmonth(d),
        "day_of_week": (F.weekday(d) + F.lit(1)),
        "day_name": F.date_format(d, "EEEE"),
        "is_weekend": F.weekday(d) >= F.lit(5),
    }
