"""Per-query isolation bench (guide §1.4): times declared queries with the
noop sink so the computation is measured, not the sink, and captures
``.explain("formatted")`` to plans/r07/.

NOT the artifact of record — bench.py stays the frozen driver contract.
This file exists for optimization-round evidence: before/after timings of
individual queries (best-of-N with steal sampling, same methodology as
bench.py) and the plan files the judge checks claims against.

Usage:
  python bench_extra.py [--sf-dir DIR] [--reps N] [--plans TAG] query...
  python bench_extra.py --sf-dir /root/testdata/sf1.0 embedding_neardup

With --plans TAG, writes plans/r07/<query>_<TAG>.txt per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _read_steal() -> tuple[int, int]:
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="suffix tag: write plans/r07/<q>_<tag>.txt")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from tempeh_spark.session import build_session

    spark = build_session(app_name="tempeh-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out: dict[str, object] = {"sf_dir": args.sf_dir, "reps": {}}
    for name in args.queries:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warm {name}")
            qs[name](spark, args.warm_dir).write.format("noop").mode("overwrite").save()
            qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        times, steals = [], []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            s0, t0 = _read_steal()
            t = time.perf_counter()
            qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t
            s1, t1 = _read_steal()
            times.append(round(dt, 3))
            steals.append(round(100.0 * (s1 - s0) / max(1, t1 - t0), 1))
        out["reps"][name] = {"sec": times, "steal_pct": steals, "best": min(times)}
        if args.plans:
            pdir = REPO / "plans" / "r07"
            pdir.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (pdir / f"{name}_{args.plans}.txt").write_text(txt)
        print(json.dumps({name: out["reps"][name]}))
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
