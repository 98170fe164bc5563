"""Large-Q ANN crossover: brute-force top-k vs hyperplane-LSH equi-join
(round-3 VERDICT #7).

At the gate parameters (Q=5, wide-angle corpus, 3 planes x 12 bands) LSH
and brute tie — both overhead-bound, and the wide-angle gate corpus makes
the low-selectivity band config pass ~80% of all pairs as candidates (the
repo documents this adversarial case in BENCH/growth_wideangle_r03.json).
This bench measures the regime the equi-join strategy exists for:

* corpus — PLANTED NEAR-NEIGHBOR blow-up of the sf embeddings: copy k of
  vector v = normalize(v + eps * n_k) with n_k md5-seeded deterministic
  unit noise. Planted copies sit at cosine ~0.95 (tight angles, the
  near-duplicate-retrieval workload ANN indexes are built for); cross-
  vector pairs stay near-orthogonal.
* queries — the Q base vectors themselves (Q=500 default).
* config — 8 planes x 10 bands: planted-neighbor collision probability
  per band ~(1 - theta/pi)^6 is high, random-pair probability 0.5^8 —
  selective where the gate's wide-angle config cannot be.
* recall contract — recall@10 of LSH vs the brute ground truth on the SAME
  corpus, reported next to the wall-clock; the run FAILS (nonzero exit) if
  recall < 0.9, so the speedup can never be quoted without its floor.

Usage: python tools/crossover_bench.py [sf_dir] -> BENCH/crossover_latest.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = 48
Q = 500
K = 10
EPS = 0.18  # planted-copy cosine ~0.95 at dim=64 unit-ish noise
N_PLANES = 8
N_BANDS = 10
REPS = 2


def planted_corpus(spark, sf_dir: str, copies: int):
    """Deterministic near-neighbor blow-up (see module docstring)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def perturb(batches):
        for pdf in batches:
            out_ids, out_vecs = [], []
            for vid, vec, copy in zip(pdf["vec_id"], pdf["embedding"], pdf["copy"]):
                v = np.asarray(vec, dtype=np.float64)
                if copy == 0:
                    w = v
                else:
                    seed = hashlib.md5(f"{vid}:{copy}".encode()).digest()
                    rng = np.random.default_rng(int.from_bytes(seed[:8], "big"))
                    noise = rng.standard_normal(v.shape)
                    noise /= np.linalg.norm(noise)
                    w = v + EPS * np.linalg.norm(v) * noise
                out_ids.append(int(vid) + int(copy) * 1_000_000)
                out_vecs.append(w.astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": out_ids, "embedding": out_vecs})

    fanned = base.crossJoin(
        spark.range(copies).select(F.col("id").alias("copy"))
    ).repartition(64)
    return fanned.mapInPandas(perturb, "vec_id long, embedding array<float>")


def main() -> None:
    from pyspark.sql import functions as F

    from tempeh_spark.session import build_session
    from tempeh_spark.similarity import brute_topk, lsh_bucket_topk

    spark = build_session(app_name="crossover-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = planted_corpus(spark, SF_DIR, COPIES).persist()
    n_corpus = corpus.count()
    queries = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(
        F.col("vec_id") < Q
    ).select("vec_id", "embedding")
    n_q = queries.count()

    def run_brute():
        return brute_topk(corpus, queries, k=K)

    def run_lsh():
        return lsh_bucket_topk(
            corpus, queries, dim=64, k=K, n_planes=N_PLANES, n_bands=N_BANDS
        )

    timings = {}
    for name, fn in (("brute", run_brute), ("lsh_equijoin", run_lsh)):
        fn().count()  # warm: compile + tier-up
        best = None
        for _ in range(REPS):
            t = time.perf_counter()
            fn().count()
            best = min(best or 1e9, time.perf_counter() - t)
        timings[name] = round(best, 2)

    truth = run_brute().select("query_id", "nbr_id").persist()
    n_true = truth.count()
    lsh_out = run_lsh().select("query_id", "nbr_id").persist()
    hits = lsh_out.join(truth, ["query_id", "nbr_id"]).count()
    recall = round(hits / n_true, 4)
    lsh_out.unpersist()

    out = {
        "metric": "ann_crossover",
        "sf_dir": SF_DIR,
        "n_corpus": n_corpus,
        "n_queries": n_q,
        "k": K,
        "copies": COPIES,
        "eps": EPS,
        "n_planes": N_PLANES,
        "n_bands": N_BANDS,
        "brute_sec": timings["brute"],
        "lsh_equijoin_sec": timings["lsh_equijoin"],
        "speedup": round(timings["brute"] / timings["lsh_equijoin"], 2),
        "recall_at_10": recall,
        "recall_floor": 0.9,
    }
    (REPO / "BENCH" / "crossover_latest.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    spark.stop()
    if recall < 0.9:
        sys.exit(1)


if __name__ == "__main__":
    main()
