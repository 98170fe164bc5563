"""spark-submit entry point for the extraction job.

Package + submit:

    python tools/make_pyfiles_zip.py                      # -> dist/tempeh_spark.zip
    spark-submit --py-files dist/tempeh_spark.zip \\
        tools/run_job.py --source <pages.parquet|iceberg_table> \\
        --output <out_dir|iceberg_table> [--buckets 4096] [--no-resume] \\
        [--casing lower|upper|preserve] [--no-nodes-json] \\
        [--max-html-bytes 67108864]

Under spark-submit the session comes from the cluster config
(``SparkSession.builder.getOrCreate()``); run standalone (``python
tools/run_job.py ...``) and it builds a tuned local session instead.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="tempeh-spark extraction job")
    ap.add_argument("--source", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--casing", default="lower", choices=["lower", "upper", "preserve"])
    ap.add_argument("--ignore-self-closing", action="store_true")
    ap.add_argument("--no-nodes-json", action="store_true")
    ap.add_argument("--max-html-bytes", type=int, default=64 * 1024 * 1024)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tempeh_spark.options import ParserOptions
    from tempeh_spark.pipeline import PipelineConfig, run_extraction_job

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        try:  # spark-submit provides conf; standalone builds a tuned session
            spark = SparkSession.builder.getOrCreate()
            if spark.sparkContext.master == "local":
                raise RuntimeError("untuned default local session")
        except Exception:
            from tempeh_spark.session import build_session

            spark = build_session(app_name="tempeh-extract")

    cfg = PipelineConfig(
        options=ParserOptions(
            tag_name_casing=args.casing,
            ignore_self_closing_syntax=args.ignore_self_closing,
        ),
        buckets=args.buckets,
        max_html_bytes=args.max_html_bytes,
        with_nodes_json=not args.no_nodes_json,
    )
    metrics = run_extraction_job(
        spark, args.source, args.output, cfg, resume=not args.no_resume
    )
    print(json.dumps({"job": "tempeh-extract", **{k: int(v) for k, v in metrics.items()}}))


if __name__ == "__main__":
    main()
