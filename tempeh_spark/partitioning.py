"""Input-spread helper for Python-heavy / row-multiplying operators.

Single-file parquet inputs arrive as ONE scan partition (CLAUDE.md gotcha),
so a mapInPandas DOM walk or a 300x shingle explode downstream runs on one
core. ``spread_if_narrow`` hash-repartitions such inputs — but ONLY when
the incoming plan is actually narrow: at crawl scale the input is
thousands of splits already, and an unconditional repartition there would
shuffle the whole corpus (including heavy payload columns) for nothing.
The partition count comes from the physical plan (no job is run).

The target count is sized by SOURCE BYTES (~192 KB of parquet per
partition, floor 8, cap 2x defaultParallelism), not a flat core multiple:
every partition of a Python-boundary stage pays a fixed worker round-trip
(~10 ms), and a flat 128-way spread of a 0.6 MB table measured +0.9 s on
pdf_extract and +1.1 s on cms_hot_tokens at sf0.1 — pure task overhead.
At sf1.0 (5.9 MB) the same rule lands at ~31 partitions, one wave on 32
cores. When the plan has no file source (in-memory test frames), the cap
is used.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_if_narrow(df: DataFrame, key_col: str, bytes_per_part: int = 192 << 10) -> DataFrame:
    sc = df.sparkSession.sparkContext
    cap = sc.defaultParallelism * 2
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        cur = 1
    if cur >= sc.defaultParallelism:
        return df
    target = cap
    try:
        paths = [
            f.removeprefix("file://").removeprefix("file:") for f in df.inputFiles()
        ]
        total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
        if total > 0:
            target = max(8, min(cap, total // bytes_per_part + 1))
    except Exception:
        pass
    if target <= cur:
        return df
    return df.repartition(target, F.col(key_col))
