"""Text -> embedding featurization: the bridge between the extraction leg
and the vector leg (dedup/ANN/k-means) of the training-data pipeline.

``text_embedding`` maps each document's text to a fixed-``dim`` L2-normalized
double vector via a hashed bag of character n-grams — the classic
feature-hashing projection (Weinberger et al., "Feature Hashing for Large
Scale Multitask Learning"), chosen here because it is:

* **deterministic and engine-portable** — bucket = first 8 md5 hex digits
  of the n-gram read as an integer, mod ``dim`` (the same md5 idiom as
  ``corpusops.hash_sample``); no learned weights, no RNG, no float
  accumulation-order dependence anywhere;
* **exact until the last step** — per-bucket counts are BIGINT, the squared
  norm is an exact BIGINT sum of 64 squares (< 2^53, so the double cast is
  exact), and each output component is ONE IEEE division — bit-identical
  across Spark and DuckDB, so the whole vector is oracle-twinnable;
* **the right Spark shape** — n-gram explode (codegen ``sequence`` +
  ``substring``, the ``dedup.shingle_rows`` pattern WITH multiplicity) into
  ONE hash aggregation with ``dim`` conditional-sum columns (map-side
  combinable, same wide-agg trick as ``minhash_signatures_wide``); one
  shuffle total, no UDF, no per-row Python.

Output vectors live in the same dim-64 space shape as the synthetic
``embeddings`` table, so they flow unchanged into ``similarity`` (LSH/ANN),
``clustering`` (k-means), and ``dedup.embedding_near_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tempeh_spark.dedup import _spread
from tempeh_spark.textops import normalize_text


def text_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    ngram: int = 3,
    max_chars: int | None = None,
) -> DataFrame:
    """(id, embedding): L2-normalized hashed char-``ngram`` counts.

    Documents too short to shingle (normalized length < ngram) get the
    all-zeros vector — NOT dropped, so downstream joins see every doc.
    Zero vectors never form cosine near-pairs downstream: both engines
    null out the 0/0 cosine (Spark's NumPy NaN crosses Arrow as SQL NULL;
    DuckDB division by zero is NULL) and NULL fails every threshold —
    convergent behavior pinned by test_oracle_twins on docs 5/6. Empty-doc
    deduplication is exact_dedup's job (identical digests), not the
    embedding path's.

    ``max_chars`` caps the counted prefix for giant documents; per-bucket
    counts are then <= max_chars, keeping the exact-integer norm far from
    2^53 at any document size (uncapped: safe to ~3e7-char docs at dim 64).
    """
    norm = normalize_text(text_col)
    if max_chars is not None:
        norm = F.substring(norm, 1, max_chars)
    base = _spread(df, id_col).select(F.col(id_col).alias("id"), norm.alias("t"))
    # multiplicity KEPT (bag, not set): no distinct — contrast shingle_rows.
    # Same short-doc guard: sequence(1, end<1) runs descending in Spark.
    pos = base.where(F.length("t") >= ngram).select(
        "id",
        "t",
        F.explode(F.sequence(F.lit(1), F.length("t") - (ngram - 1))).alias("i"),
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.encode(F.expr(f"substring(t, i, {ngram})"), "UTF-8")), 1, 8
            ),
            16,
            10,
        ).cast("long"),
        F.lit(dim),
    )
    bucketed = pos.select("id", bucket.alias("b"))
    wide = bucketed.groupBy("id").agg(
        *[F.sum((F.col("b") == k).cast("long")).alias(f"c{k}") for k in range(dim)]
    )
    # exact BIGINT sum of squares, fixed left-to-right expression order
    sumsq = F.col("c0") * F.col("c0")
    for k in range(1, dim):
        sumsq = sumsq + F.col(f"c{k}") * F.col(f"c{k}")
    l2 = F.sqrt(sumsq.cast("double"))
    emb = F.array(*[(F.col(f"c{k}").cast("double") / l2) for k in range(dim)])
    vecs = wide.select("id", emb.alias("embedding"))
    zeros = F.array(*[F.lit(0.0) for _ in range(dim)])
    # Join-back is per INPUT ROW (no distinct — that would add a corpus-
    # wide shuffle just to guard a key-violation case): duplicate ids, a
    # contract violation upstream, merge into one counted bag and each
    # input row receives that same merged vector. The DuckDB twin joins
    # the raw documents table the same way.
    return (
        df.select(F.col(id_col).alias("id"))
        .join(vecs, "id", "left")
        .select("id", F.coalesce(F.col("embedding"), zeros).alias("embedding"))
    )
