"""Structured Streaming ingestion for the extraction pipeline.

The parse kernel is stateless per row, so streaming is the same UDF over a
``readStream`` source — no stateful operators needed (SURVEY.md §2 Part B).
The watermark + dedup shown here handle the one stream-specific concern:
re-crawled urls arriving late.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tempeh_spark.corpus import PAGES_SCHEMA
from tempeh_spark.options import DEFAULT_OPTIONS, ParserOptions
from tempeh_spark.udf import make_parse_udf


def stream_pages(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "10 minutes",
    options: ParserOptions = DEFAULT_OPTIONS,
    dedup_urls: bool = True,
) -> DataFrame:
    """File-source stream of pages parquet -> parsed rows.

    * watermark on ``warc_ts`` bounds state for the url dedup;
    * ``dropDuplicates(url, warc_ts)`` keeps one parse per capture;
    * the parse UDF itself is the same batch kernel (stateless).
    """
    src = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    src = src.withWatermark("warc_ts", watermark)
    if dedup_urls:
        src = src.dropDuplicates(["url", "warc_ts"])
    parsed = src.withColumn("parsed", make_parse_udf(options)(F.col("html")))
    return parsed.select(
        "url",
        "warc_ts",
        F.col("parsed.text").alias("text"),
        F.col("parsed.main_text").alias("main_text"),
        F.col("parsed.error").alias("error"),
        F.col("parsed.n_nodes").alias("n_nodes"),
    )


def _stream_file_source(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a parquet path. File-stream sources list a DIRECTORY;
    a single-file table becomes its parent dir filtered to that file name."""
    import os

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # the basename is used as a GLOB: escape metacharacters or a file
        # named events[1].parquet silently matches nothing. Backslash-escape
        # (Hadoop GlobPattern honors \-escapes for every metachar) — the
        # [..]-class wrapping breaks for ']' and '\', which produce an
        # unclosed/empty character class that glob translation rejects.
        import re as _re

        escaped = _re.sub(r"([*?\[\]{}\\])", r"\\\1", os.path.basename(path))
        reader = reader.option("pathGlobFilter", escaped)
        return reader.parquet(os.path.dirname(path))
    return reader.parquet(path)


def _drain_to_df(agg: DataFrame, output_mode: str, name: str) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) through a
    memory sink, materialize the result, and DROP the sink table so
    repeated calls in a long-lived session don't accumulate result copies."""
    spark = agg.sparkSession
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def stream_hourly_events(
    spark: SparkSession,
    events_path: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming windowed aggregation, drained with ``availableNow``: a real
    ``readStream`` file source -> watermark -> 1-hour tumbling window agg ->
    memory sink, returned as a (finished) DataFrame.

    With availableNow the stream processes the whole backlog and stops, so
    the result equals the batch hourly rollup — which is exactly what the
    driver gate asserts (the DuckDB oracle is the batch SQL). At production
    scale the same plan runs unbounded: the watermark bounds the window
    state, late events beyond it are dropped, and the sink becomes a
    table/parquet append.
    """
    import uuid

    schema = spark.read.parquet(events_path).schema
    src = _stream_file_source(spark, events_path, schema)
    # watermarks require TIMESTAMP (with zone); parquet NTZ keeps the same
    # wall clock under the engine's fixed UTC session timezone
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    # order-independent 4-decimal average (exact DECIMAL sum of pre-rounded
    # values): round(avg(double)) is not stable across summation orders —
    # micro-batch accumulation order differs from both batch engines
    stable_avg = (
        F.sum(
            (F.round(F.col("value"), 4).cast("decimal(18,4)") * 10000).cast("long")
        ).cast("double")
        / F.count(F.lit(1))
    ) / F.lit(10000.0)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            stable_avg.alias("avg_value"),
        )
    )
    out = _drain_to_df(agg, "complete", f"stream_hourly_{uuid.uuid4().hex[:8]}")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        "avg_value",
    )


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    per-user session counting with a ``gap_minutes`` inactivity rule.

    State per user = the MERGED SESSION INTERVALS seen so far (start/end
    epoch arrays) plus the event count. Each micro-batch folds its events
    in as point intervals and re-merges under the gap rule, so the final
    answer equals the batch window-function sessionizer for ARBITRARY batch
    boundaries AND arbitrary event-time arrival order — a later trigger
    delivering older events correctly bridges (merges) two previously
    separate sessions. (A scalar last-epoch state can't do that: out-of-
    order arrival would undercount or miscount sessions; FileStreamSource
    orders files by mtime, not event time.) State size is O(open sessions
    per user), bounded in production by evicting intervals older than the
    watermark. ``availableNow`` drains the backlog; the final row per user
    is the one with the highest n_events (n_sessions itself is NOT
    monotonic — a bridging event can merge two intervals).
    """
    import uuid

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("starts", ArrayType(LongType())),
            StructField("ends", ArrayType(LongType())),
            StructField("n_events", LongType()),
        ]
    )
    gap_s = gap_minutes * 60

    def fold(key, pdfs, state: GroupState):
        new_eps: list[int] = []
        for pdf in pdfs:
            new_eps.extend(int(e) for e in pdf["epoch"])
        if state.exists:
            starts, ends, n_events = state.get
            intervals = [[int(s), int(e)] for s, e in zip(starts, ends)]
        else:
            intervals, n_events = [], 0
        intervals.extend([e, e] for e in new_eps)
        intervals.sort()
        merged: list[list[int]] = []
        for s, e in intervals:
            if merged and s - merged[-1][1] <= gap_s:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        n_events += len(new_eps)
        state.update(
            ([m[0] for m in merged], [m[1] for m in merged], n_events)
        )
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [len(merged)], "n_events": [n_events]}
        )

    schema = spark.read.parquet(events_path).schema
    src = _stream_file_source(spark, events_path, schema, max_files_per_trigger)
    keyed = src.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("epoch"),
    ).groupBy("user_id")
    updates = keyed.applyInPandasWithState(
        fold, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    out = _drain_to_df(updates, "update", f"stream_sessions_{uuid.uuid4().hex[:8]}")
    # n_events is monotonic per user, so max_by(n_sessions, n_events) picks
    # each user's LAST emission (n_sessions alone is not monotonic: an
    # out-of-order bridging event merges two intervals and lowers it)
    return out.groupBy("user_id").agg(
        F.max_by("n_sessions", "n_events").cast("long").alias("n_sessions"),
        F.max("n_events").cast("long").alias("n_events"),
    )


def run_stream_to_parquet(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Start the stream with exactly-once file sink semantics."""
    parsed = stream_pages(spark, source_dir, **kwargs)
    return (
        parsed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_keys(
    spark: SparkSession,
    path: str,
    key_cols: tuple[str, ...] | list[str],
    watermark_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first-arrival key election through the state
    store, emitted in APPEND mode (each newly-seen key exactly once — no
    aggregation, no window).

    Two state regimes, chosen by ``watermark_col``:

    * ``None`` (gate/audit config): ``dropDuplicates`` — global dedup,
      one state-store entry per distinct key, NEVER expired. Exact, but
      state grows with the distinct-key count; right for bounded key
      domains or availableNow backfills.
    * set (the crawl-scale config): ``dropDuplicatesWithinWatermark`` —
      state is evicted once the event-time watermark passes a key's last
      sighting, so an unbounded stream runs in bounded memory. A re-crawl
      arriving BEYOND the horizon re-emits its key (by design: a page
      re-fetched a month later is a new capture worth re-processing).

    Only the KEY COLUMNS are emitted: which duplicate row arrives first at
    the state store is a race between partitions, so any payload column
    would be nondeterministic — the emitted key SET is not. The DuckDB
    oracle twin is ``SELECT DISTINCT <keys>`` (exact for the unbounded
    regime; a superset bound for the watermarked one).
    """
    import uuid

    schema = spark.read.parquet(path).schema
    src = _stream_file_source(spark, path, schema)
    if watermark_col is not None:
        src = src.withColumn(watermark_col, F.col(watermark_col).cast("timestamp"))
        src = src.withWatermark(watermark_col, watermark)
        deduped = src.dropDuplicatesWithinWatermark(list(key_cols))
    else:
        deduped = src.dropDuplicates(list(key_cols))
    out = deduped.select(*key_cols)
    return _drain_to_df(out, "append", f"stream_dedup_{uuid.uuid4().hex[:8]}")
