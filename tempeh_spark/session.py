"""SparkSession builder with the engine's tuned defaults.

Local mode stands in for a cluster in this sandbox; every setting is chosen
for multi-executor scale-out semantics (partition counts, Arrow batch sizing,
AQE) rather than local-only shortcuts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "tempeh-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(2 * cpus))
        # AQE: runtime coalescing + skew splitting; advisory size tuned for
        # parse tasks dominated by html payload bytes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # Arrow path for pandas UDFs: the engine's hot loop. 8192-row batches
        # measured ~1.5x faster end-to-end than 2048 on mixed web documents
        # (fewer batch boundaries; ~20 MB max batch at 2.6 KB avg docs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # pandas UDFs that return large parse structs: cap batch bytes not
        # just rows, so a batch of 38 KB documents still fits comfortably.
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # local mode = ONE JVM hosting the driver AND all executor threads:
    # 8g was tight for 32 concurrent tasks of join/agg state plus
    # broadcasts (the r6 driver bench crashed one sf1.0 suite run mid-
    # flight). 24g on this 128 GiB box leaves the Python workers ~100 GiB;
    # on a real cluster this setting maps to per-executor heap instead.
    .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # Codegen-heavy mixed workloads (parse UDF stages + wide hash aggs +
        # banded joins) overflow the JVM's default 240 MB code cache; once it
        # fills, JITed whole-stage code gets evicted and later queries run
        # 3-5x slower until re-compiled (measured: minhash_lsh 33 s -> 9 s
        # right after a 50k-doc parse). Same flag belongs on
        # spark.executor.extraJavaOptions on a real cluster.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.executor.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        # The generated-CLASS cache (Janino output, static conf) defaults to
        # 100 entries — smaller than one pass over this engine's query
        # shapes, so a multi-query session evicts and re-compiles
        # continuously and every re-load re-enters the C2 JIT queue. The
        # r7 variance study (BENCH/variance_study_r07.json) measured
        # pipeline_decisions paying 9-16 s of JIT compilation EVERY rep at
        # the default (wall never converging, the r5/r6 "clean-steal slow
        # mode"), vs monotonically falling to 1.5 s JIT / settled wall with
        # this cache sized above the session's distinct codegen-unit count.
        # Shape-count-dependent, not scale- or local-mode-dependent; the
        # same setting belongs on any long-lived session running this
        # engine's full operator surface.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
