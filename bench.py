"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline is the extraction pipeline (the engine's reason to exist):
a deterministic Common-Crawl-style corpus — the 16 reference fixtures
replicated under salted urls, 33 B – 38 KB size skew — parsed through the
full url-bucketed Arrow-UDF pipeline. Reference baseline for the same work
is ~10 docs/s/core (BASELINE.md); the suite also times the training-data
operator families (dedup/LSH, text analysis, ANN top-k, joins/aggs).

SELF-DEFENSE (round-3): this host shows 14-24% CPU steal during high-core
runs, which made prior per-round artifacts disagree with documented idle
numbers by up to 2.4x. The bench now (a) takes BEST-OF-N per query
(N=$SPARK_GRAFT_BENCH_REPS, default 3) — the minimum is the least-stolen
observation, (b) samples /proc/stat steal jiffies around every rep and
embeds the per-query steal percentage of the chosen rep plus all rep times
in the JSON, and (c) emits both the raw best-of total and a steal-adjusted
total, so the artifact of record carries its own noise evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
# parse-corpus rows scale with sf so the bench exercises real volume
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
PARSE_ROWS = int(os.environ.get("SPARK_GRAFT_PARSE_ROWS", str(int(500_000 * _SF))))

SUITE = (
    "exact_dedup",
    "pdf_extract",
    "minhash_lsh",
    "dedup_decisions",
    "simhash",
    "simhash_pairs",
    "simhash60_pairs",
    "text_analysis",
    "warc_roundtrip",
    "extract_links",
    "url_dedup",
    "line_dedup",
    "gopher_quality",
    "decontaminate",
    "embedding_neardup",
    "embedding_lsh_neardup",
    "brute_topk",
    "lsh_topk",
    "kmeans_assign",
    "media_dims",
    "hourly_events",
    "sessionize",
    "q1_pricing",
    "nation_revenue",
)


def _read_steal() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from the aggregate cpu line."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


def _timed_best(fn, reps: int = REPS) -> tuple[float, float, list[float]]:
    """(best_seconds, steal_pct_during_best_rep, all_rep_seconds)."""
    best = best_steal = None
    times: list[float] = []
    for _ in range(reps):
        s0, t0 = _read_steal()
        t = time.perf_counter()
        fn()
        dt = time.perf_counter() - t
        s1, t1 = _read_steal()
        steal = 100.0 * (s1 - s0) / max(1, t1 - t0)
        times.append(round(dt, 3))
        if best is None or dt < best:
            best, best_steal = dt, steal
    return best, best_steal, times


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tempeh_spark.corpus import bench_pages
    from tempeh_spark.session import build_session
    from tempeh_spark.udf import make_parse_udf

    spark = build_session(app_name="tempeh-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    steals: dict[str, float] = {}
    reps_log: dict[str, list[float]] = {}
    extras: dict[str, object] = {}

    run_steal0 = _read_steal()

    # Warm-up: a 100 TB job amortizes Python-worker imports and codegen to
    # zero, so the bench measures steady-state, not JVM/worker cold start.
    # One tiny parse job touches every worker; one pass of the operator
    # suite at the smallest sf compiles every query shape.
    t_w = time.perf_counter()
    warm = bench_pages(spark, 8 * CPUS, partitions=4 * CPUS)
    warm.withColumn("p", make_parse_udf()(F.col("html"))).agg(
        F.sum("p.n_nodes")
    ).collect()
    warm_qs = entrymod.queries()
    for _name in SUITE:
        warm_qs[_name](spark, "/root/testdata/sf0.001").count()
    extras["warmup_sec"] = round(time.perf_counter() - t_w, 3)

    # ---- headline: extraction throughput on the skewed synthetic corpus ----
    corpus = bench_pages(spark, PARSE_ROWS, partitions=4 * CPUS).persist()
    n_docs = corpus.count()  # materialize input outside the timed region
    total_bytes = corpus.agg(F.sum(F.length("html"))).first()[0]

    # training-data profile: text + metrics, no per-row DOM JSON / spans
    parse_udf = make_parse_udf(with_nodes_json=False, with_spans=False)

    def run_parse():
        return (
            corpus.withColumn("p", parse_udf(F.col("html")))
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("p.error").isNotNull().cast("long")).alias("errors"),
                F.sum(F.col("p.n_nodes")).alias("nodes"),
                F.sum(F.length(F.col("p.text"))).alias("chars"),
            )
            .first()
        )

    stats_box = {}

    def parse_once():
        stats_box["stats"] = run_parse()

    best, steal, reps = _timed_best(parse_once)
    timings["parse_extract"] = round(best, 3)
    steals["parse_extract"] = round(steal, 1)
    reps_log["parse_extract"] = reps
    extras["parse_docs_per_sec"] = round(n_docs / best, 1)
    extras["parse_mb_per_sec"] = round(total_bytes / best / 1e6, 1)
    extras["parse_rows"] = n_docs
    extras["parse_errors"] = int(stats_box["stats"]["errors"])
    corpus.unpersist()

    # ---- operator suite at the sf dir ----
    qs = entrymod.queries()
    for name in SUITE:
        rows_box = {}

        def run_q(name=name):
            rows_box["n"] = qs[name](spark, SF_DIR).count()

        best, steal, reps = _timed_best(run_q)
        timings[name] = round(best, 3)
        steals[name] = round(steal, 1)
        reps_log[name] = reps
        extras[f"{name}_rows"] = rows_box["n"]

    run_steal1 = _read_steal()
    run_steal_pct = 100.0 * (run_steal1[0] - run_steal0[0]) / max(
        1, run_steal1[1] - run_steal0[1]
    )

    total = round(sum(timings.values()), 3)
    adjusted = round(
        sum(t * (1 - min(steals[q], 90.0) / 100.0) for q, t in timings.items()), 3
    )
    out = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _SF,
        "cpus": CPUS,
        "reps": REPS,
        "value_steal_adjusted": adjusted,
        "steal_pct_run": round(run_steal_pct, 1),
        "steal_pct_at_best": steals,
        "query_reps_sec": reps_log,
        **extras,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
