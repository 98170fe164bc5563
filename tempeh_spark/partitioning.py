"""Input-spread helper for Python-heavy / row-multiplying operators.

Single-file parquet inputs arrive as ONE scan partition (CLAUDE.md gotcha),
so a mapInPandas DOM walk or a 300x shingle explode downstream runs on one
core. ``spread_if_narrow`` hash-repartitions such inputs up to
``defaultParallelism * mult`` — but ONLY when the incoming plan is actually
narrow: at crawl scale the input is thousands of splits already, and an
unconditional repartition there would shuffle the whole corpus (including
heavy payload columns) for nothing. The partition count comes from the
physical plan (no job is run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_if_narrow(df: DataFrame, key_col: str, mult: int = 2) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * mult
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        cur = 1
    if cur >= sc.defaultParallelism:
        return df
    return df.repartition(target, F.col(key_col))
