"""Scale evidence for featurize.text_embedding (round-6 VERDICT #4).

The featurizer's 100 TB claim is "linear by construction": one wide
map-side-combinable hash agg, zero Python stages, one data exchange
(plan-audited in BENCH/PLANS.md). This probe adds the MEASURED points the
claim was missing:

* core scaling — the same corpus at local[4] vs local[16] (each level in
  its own subprocess; a JVM master can't change), docs/s + efficiency.
  The 4->16 pair is the box's clean comparison (32-core runs colocate
  against the driver/GC — BENCH/scaling_cause_r05.json). Measured at TWO
  corpus sizes: 16x (80k docs — small enough that per-job fixed overhead
  ~3.7 s dominates the 16-core level and drags raw efficiency to ~0.54)
  and 64x (320k docs — compute-bound, the honest pair).
* marginal efficiency — wall(64x) - wall(16x) at each core level is 48
  corpus-units of pure compute with the per-job fixed overhead (session
  scheduling, persist bookkeeping, result collection) subtracted by the
  difference; the ratio of marginal per-unit costs is the fixed-cost-free
  scaling number a long-running 100 TB job actually sees.
* corpus growth — 4x/16x/64x the sf0.1 documents table at fixed cores.
  Replication is deterministic doc_id-offset copies: the hash agg's group
  count (doc count) and per-group work scale exactly with the multiplier,
  so a linear operator shows ~k x wall at k x corpus minus amortized fixed
  overhead; a quadratic one would blow up by k^2.
* kernel control — the explode+md5 shingle stage alone (no wide agg) at
  the same 4/16 pair, isolating whether any scaling droop lives in the
  row-multiplying kernel or in the agg/exchange.

The measured job forces the FULL featurizer (element_at(embedding, 1)
depends on all 64 bucket counts through the norm, so nothing prunes).

Usage:
  python tools/featurize_bench.py --run <cpus> <mult> [kernel]  # one level
  python tools/featurize_bench.py                               # full report
                                  -> BENCH/featurize_scaling_r06.json
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
CORE_LEVELS = (4, 16)
# the sf0.1 documents table is only 5k docs (~1.5 MB text): multiply it so
# the measured region is compute-bound, not scheduling-bound
CORE_MULTS = (16, 64)  # 80k docs (overhead-visible) and 320k (compute-bound)
GROWTH_MULTS = (4, 16, 64)  # 20k / 80k / 320k docs, fixed cores
GROWTH_CPUS = 16
KERNEL_MULT = 64


# NOTE: steal sampling deliberately duplicates bench.py's (driver-run
# artifacts stay self-contained; keep in sync when touching either).
def _read_steal():
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


def run_level(cpus: int, mult: int, kernel: bool = False) -> None:
    import time

    from pyspark.sql import functions as F

    from tempeh_spark.featurize import text_embedding
    from tempeh_spark.session import build_session

    spark = build_session(app_name=f"featbench-{cpus}-{mult}x", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    corpus = base
    for k in range(1, mult):
        corpus = corpus.unionByName(
            base.select((F.col("doc_id") + F.lit(k * n_base)).alias("doc_id"), "text")
        )
    # fixed partitioning across levels: vary ONLY cores (scaling pair) or
    # ONLY rows (growth series) — 128 partitions like scaling_bench.py
    corpus = corpus.repartition(128).persist()
    n = corpus.count()

    if kernel:
        # explode+md5 bucket kernel only — featurize.text_embedding's
        # row-multiplying stage verbatim (same normalize/explode/md5/pmod
        # expressions) WITHOUT the per-doc wide agg, so any scaling droop
        # is attributable to kernel vs agg/exchange
        from tempeh_spark.textops import normalize_text

        base2 = corpus.select("doc_id", normalize_text("text").alias("t"))
        pos = base2.where(F.length("t") >= 3).select(
            F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"), "t"
        )
        bucket = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.encode(F.expr("substring(t, i, 3)"), "UTF-8")), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(64),
        )
        shingled = pos.select(bucket.alias("b"))

        def job():
            return shingled.agg(F.sum("b"), F.count("*")).first()
    else:
        emb = text_embedding(corpus)

        def job():
            # element_at(...,1) needs the L2 norm = all 64 bucket counts:
            # the whole wide agg runs; sum over docs forces every row
            return emb.agg(
                F.sum(F.element_at("embedding", 1)), F.count("*")
            ).first()

    job()  # warm codegen + shuffle paths
    job()
    times, steals = [], []
    for _ in range(3):
        s0, j0 = _read_steal()
        t0 = time.perf_counter()
        job()
        times.append(time.perf_counter() - t0)
        s1, j1 = _read_steal()
        steals.append(round(100.0 * (s1 - s0) / max(1, j1 - j0), 1))
    dt = min(times)  # best rep: steal only removes throughput (bench.py policy)
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "mult": mult,
                "rows": n,
                "seconds": round(dt, 3),
                "docs_per_sec": round(n / dt, 1),
                "rep_seconds": [round(t, 3) for t in times],
                "rep_steal_pct": steals,
                "steal_pct_at_best": steals[times.index(dt)],
            }
        )
    )


def _one(cpus: int, mult: int, kernel: bool = False) -> dict:
    args = [sys.executable, __file__, "--run", str(cpus), str(mult)]
    if kernel:
        args.append("kernel")
    out = subprocess.run(args, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    print(("kernel " if kernel else "") + line)
    return rec


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_level(
            int(sys.argv[2]), int(sys.argv[3]), kernel="kernel" in sys.argv[4:]
        )
        return

    lo, hi = CORE_LEVELS
    core = {m: {c: _one(c, m) for c in CORE_LEVELS} for m in CORE_MULTS}
    growth = {m: _one(GROWTH_CPUS, m) for m in GROWTH_MULTS}
    kern = {c: _one(c, KERNEL_MULT, kernel=True) for c in CORE_LEVELS}

    def eff(pair):
        return round((pair[hi]["docs_per_sec"] / pair[lo]["docs_per_sec"]) / (hi / lo), 3)

    # marginal per-corpus-unit cost between the two core-pair sizes: the
    # per-job fixed overhead cancels in the subtraction, leaving pure
    # compute per multiplier unit — the number a long job's steady state
    # scales by
    m0, m1 = CORE_MULTS
    marg = {
        c: (core[m1][c]["seconds"] - core[m0][c]["seconds"]) / (m1 - m0)
        for c in CORE_LEVELS
    }
    marg_eff = round((marg[lo] / marg[hi]) / (hi / lo), 3)

    g0 = GROWTH_MULTS[0]
    report = {
        "sf_dir": SF_DIR,
        "core_scaling": {
            f"{m}x": {str(c): core[m][c] for c in CORE_LEVELS} for m in CORE_MULTS
        },
        "core_efficiency_4_to_16": {f"{m}x": eff(core[m]) for m in CORE_MULTS},
        "marginal_per_unit_seconds": {str(c): round(marg[c], 4) for c in CORE_LEVELS},
        "marginal_core_efficiency_4_to_16": marg_eff,
        "kernel_explode_md5": {str(c): kern[c] for c in CORE_LEVELS},
        "kernel_core_efficiency_4_to_16": eff(kern),
        "growth": {f"{m}x": growth[m] for m in GROWTH_MULTS},
        "growth_wall_ratios": {
            f"{g0}x_to_{m}x": round(growth[m]["seconds"] / growth[g0]["seconds"], 2)
            for m in GROWTH_MULTS[1:]
        },
    }
    out = REPO / "BENCH" / "featurize_scaling_r06.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(
        json.dumps(
            {
                k: v
                for k, v in report.items()
                if "efficiency" in k or "ratio" in k or "marginal" in k
            }
        )
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
