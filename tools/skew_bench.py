"""Hot-key skew rehearsal: measure what the warc_ts sub-bucket salt buys.

The 10^12-document corpus has hot urls — a page re-crawled 10^5 times.
Unsalted xxhash64(url) bucketing pins every capture of a hot url to ONE
task; the whole stage then waits on that straggler. pipeline.py salts the
bucketing key with pmod(xxhash64(url, warc_ts), salt_mod) so a hot url
spreads across up to ``salt_mod`` sub-buckets while staying deterministic
per row (resume/lineage safe).

This tool builds a deliberately hostile corpus — one url re-crawled
``n_hot`` times carrying the LARGEST fixture (38 KB), embedded in a normal
unique-url mix — and runs the identical parse job with salt_mod=1 (off)
and salt_mod=16 (production default), reporting wall time and the
per-partition byte distribution. Run on an IDLE box.

Usage: python tools/skew_bench.py [n_total] [n_hot]
Writes BENCH/skew_latest.json and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tempeh_spark.corpus import BASE_TS, fixture_bytes
from tempeh_spark.pipeline import PipelineConfig, extract_pages
from tempeh_spark.session import build_session


def skewed_pages(spark, n_total: int, n_hot: int):
    """n_hot captures of ONE hot url (largest fixture) + a normal mix."""
    fx = fixture_bytes()
    names = sorted(fx.keys())
    big = max(names, key=lambda n: len(fx[n]))
    payloads = [(i, n, fx[n]) for i, n in enumerate(names)]
    pay_df = spark.createDataFrame(
        payloads, "fixture_id int, fixture_name string, html binary"
    )
    big_id = names.index(big)
    rng = spark.range(n_total).withColumn(
        "fixture_id",
        F.when(F.col("id") < n_hot, F.lit(big_id)).otherwise(
            (F.col("id") % len(names)).cast("int")
        ),
    )
    return (
        rng.join(F.broadcast(pay_df), "fixture_id")
        .select(
            F.when(
                F.col("id") < n_hot, F.lit("https://hot-host.test/recrawled")
            )
            .otherwise(
                F.concat(
                    F.lit("https://synth-"),
                    F.format_string("%04d", (F.col("id") % 9973).cast("int")),
                    F.lit(".test/"),
                    F.col("fixture_name"),
                    F.lit("/"),
                    F.col("id").cast("string"),
                )
            )
            .alias("url"),
            (
                F.lit(BASE_TS) + F.make_interval(secs=F.col("id").cast("double"))
            ).alias("warc_ts"),
            F.col("html"),
            F.lit("").alias("text"),
            F.lit("en").alias("lang"),
        )
    ), len(fx[big])


def run_once(spark, pages, salt_mod: int):
    cfg = PipelineConfig(salt_mod=salt_mod, with_nodes_json=False)
    out = extract_pages(pages, cfg)
    t0 = time.time()
    dist = (
        out.groupBy("partition_id")
        .agg(
            F.count("*").alias("rows"),
            F.sum("html_bytes").alias("bytes"),
        )
        .collect()
    )
    wall = time.time() - t0
    by = sorted(r.bytes or 0 for r in dist)
    n = len(by)
    return {
        "salt_mod": salt_mod,
        "wall_sec": round(wall, 2),
        "partitions_nonempty": n,
        "max_partition_mb": round(by[-1] / 1e6, 2),
        "median_partition_mb": round(by[n // 2] / 1e6, 2),
        "total_rows": int(sum(r.rows for r in dist)),
    }


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400
    spark = build_session(app_name="skew_bench", cpus=32, shuffle_partitions=32)
    pages, big_bytes = skewed_pages(spark, n_total, n_hot)
    pages = pages.localCheckpoint(eager=True)  # corpus built once, off the clock
    # warm python workers + codegen so the contrast is skew, not JIT
    run_once(spark, pages.limit(2_000), 16)

    unsalted = run_once(spark, pages, 1)
    salted = run_once(spark, pages, 16)
    result = {
        "metric": "skew_rehearsal",
        "n_total": n_total,
        "n_hot": n_hot,
        "hot_doc_bytes": big_bytes,
        "hot_mb": round(n_hot * big_bytes / 1e6, 1),
        "unsalted": unsalted,
        "salted": salted,
        "speedup": round(unsalted["wall_sec"] / salted["wall_sec"], 2),
        "skew_ratio_unsalted": round(
            unsalted["max_partition_mb"] / max(unsalted["median_partition_mb"], 0.01), 1
        ),
        "skew_ratio_salted": round(
            salted["max_partition_mb"] / max(salted["median_partition_mb"], 0.01), 1
        ),
    }
    line = json.dumps(result)
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH", "skew_latest.json"
    ).write_text(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
