"""Corpus-growth rehearsal for the banded dedup family (round-3 VERDICT #7).

The 100 TB claims for minhash-LSH / banded simhash / embedding-LSH rest on
plan shape (bucketed candidate/verify equi-joins, never all-pairs). This
script adds MEASURED growth evidence: each operator runs on the sf0.1
corpus and on a deterministic 4x synthetic blow-up; a quadratic operator
would show ~16x wall growth, the banded ones should stay near-linear
(~4x plus fixed overhead) with output/candidate counts reported alongside.

Blow-up construction (deterministic, distribution-preserving):

* documents — HALF-CROSS REMIX: copy k of doc i = left half of doc i +
  right half of doc (i + o_k) mod n. Token/shingle distribution is
  preserved; each half is reused a CONSTANT number of times (4), so the
  extra near-dup pairs the reuse creates grow linearly with the corpus,
  not quadratically (reported, not hidden).
* embeddings — copy k applies a fixed coordinate ROTATION (dim roll + sign
  flips): pairwise cosines within a copy are exactly the base corpus's
  (orthogonal transform), cross-copy pairs decorrelate to near-random. The
  growth threshold is 0.5 (vs the gate's wide-angle 0.30) so near-random
  cross-copy cosines (sigma = 1/8) stay below threshold and the 4x corpus
  has ~4x the true pairs.

Usage: python tools/growth_bench.py [sf_dir]  ->  BENCH/growth_latest.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = 4  # total scale factor
REPS = 2


def blow_up_docs(spark, n_copies: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n = base.count()
    out = base
    left = base.select(
        F.col("doc_id"),
        F.expr("substring(text, 1, cast(floor(length(text)/2) as int))").alias("ha"),
    )
    right = base.select(
        F.col("doc_id").alias("pid"),
        F.expr("substring(text, cast(floor(length(text)/2) as int) + 1)").alias("hb"),
    )
    for k in range(1, n_copies):
        remix = (
            left.withColumn("pid", (F.col("doc_id") + F.lit(137 * k)) % F.lit(n))
            .join(right, "pid")
            .select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                F.concat(F.col("ha"), F.col("hb")).alias("text"),
            )
        )
        out = out.unionByName(remix)
    return out


def blow_up_embeddings(spark, n_copies: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    n = base.count()
    out = base
    dim = 64
    for k in range(1, n_copies):
        # fixed rotation: roll dims by 17k, flip signs on a k-dependent mask
        # (orthogonal => within-copy pairwise cosines identical to base)
        cols = []
        for i in range(dim):
            src = (i + 17 * k) % dim
            sign = -1.0 if ((i * 2654435761 + k) % 3 == 0) else 1.0
            cols.append(F.element_at("embedding", src + 1) * F.lit(sign))
        copy = base.select(
            (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
            F.array(*cols).cast("array<float>").alias("embedding"),
            F.col("label"),
        )
        out = out.unionByName(copy)
    return out


def timed(fn, reps: int = REPS):
    best, rows = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3), rows


def main():
    from tempeh_spark.dedup import minhash_lsh_pairs, simhash_near_pairs
    from tempeh_spark.session import build_session
    from tempeh_spark.similarity import embedding_lsh_near_pairs

    spark = build_session(app_name="growth-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def ops(docs, emb):
        return {
            "minhash_lsh": lambda: minhash_lsh_pairs(
                docs, num_perm=16, bands=4, ngram=8, verify_threshold=0.3, max_chars=300
            ).count(),
            "simhash60_pairs": lambda: simhash_near_pairs(
                docs, max_hamming=6, bits=60
            ).count(),
            # TIGHT-threshold config (the 10^12-scale deployment shape):
            # 8 planes/band = 256 buckets/band keeps the candidate join
            # selective at recall ~0.995 for cosine >= 0.9 pairs. The
            # gate's wide-angle 2-plane config is intentionally
            # unselective (4 buckets/band -> candidates approach
            # all-pairs) and measured here once as evidence: wall growth
            # 12x at 4x corpus — documented in BENCH/BASELINE.md, not a
            # deployable configuration.
            "embedding_lsh_neardup": lambda: embedding_lsh_near_pairs(
                emb, dim=64, threshold=0.9, n_bands=16, planes_per_band=8
            ).count(),
        }

    # warm every shape at the smallest sf
    small_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    small_emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for fn in ops(small_docs, small_emb).values():
        fn()

    results = {}
    blow_dir = None
    for scale in (1, COPIES):
        if scale == 1:
            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        else:
            # materialize the blow-up OUTSIDE the timed region (input prep,
            # not operator cost), same single-parquet shape as the base
            import tempfile

            tmp = tempfile.mkdtemp(prefix="growth_")
            blow_dir = tmp  # removed after the sweep (multi-hundred-MB)
            blow_up_docs(spark, scale).coalesce(1).write.parquet(f"{tmp}/documents")
            blow_up_embeddings(spark, scale).coalesce(1).write.parquet(f"{tmp}/emb")
            docs = spark.read.parquet(f"{tmp}/documents")
            emb = spark.read.parquet(f"{tmp}/emb")
        n_docs, n_vecs = docs.count(), emb.count()
        for name, fn in ops(docs, emb).items():
            t, rows = timed(fn)
            results.setdefault(name, {})[f"x{scale}"] = {
                "sec": t, "out_rows": rows, "docs": n_docs, "vecs": n_vecs,
            }
            print(f"x{scale} {name}: {t}s {rows} rows", file=sys.stderr)

    for name, r in results.items():
        r["wall_growth"] = round(r[f"x{COPIES}"]["sec"] / r["x1"]["sec"], 2)
        r["out_growth"] = round(
            r[f"x{COPIES}"]["out_rows"] / max(1, r["x1"]["out_rows"]), 2
        )
        r["quadratic_would_be"] = COPIES * COPIES
    out = {"sf_dir": SF_DIR, "scale": COPIES, "reps": REPS, "results": results}
    (REPO / "BENCH" / "growth_latest.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    spark.stop()
    if blow_dir is not None:
        import shutil

        shutil.rmtree(blow_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
