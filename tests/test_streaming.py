"""Structured Streaming: file-source pages stream -> parsed parquet sink."""

from __future__ import annotations


def test_stream_pages_availablenow(spark, tmp_path):
    from tempeh_spark.corpus import bench_pages
    from tempeh_spark.streaming import run_stream_to_parquet

    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    bench_pages(spark, 32, partitions=2).write.parquet(src)

    q = run_stream_to_parquet(spark, src, out, ckpt)
    q.awaitTermination(120)

    result = spark.read.parquet(out)
    assert result.count() == 32
    assert result.where("error is not null").count() == 0
    assert set(result.columns) >= {"url", "warc_ts", "text", "main_text", "n_nodes"}

    # restart with no new files: checkpoint prevents reprocessing
    q2 = run_stream_to_parquet(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 32
