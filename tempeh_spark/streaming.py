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
