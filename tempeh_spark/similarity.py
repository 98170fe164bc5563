"""Similarity search over embedding columns (array<float>).

* ``brute_topk`` — exact cosine top-k for a set of query vectors. The
  baseline and the recall oracle. Query side is broadcast (queries are
  small); the corpus side streams — no shuffle of the corpus at all.
* ``ivf_topk`` — inverted-file ANN: restrict the search to the query's
  coarse cell (here the ``label`` column stands in for a k-means cell id;
  at scale the cell id comes from a trained codebook). Join on cell id →
  shuffle keyed by cell, each cell searched independently. This is the
  scale path: cost drops from O(N) to O(N / n_cells) per query.
* ``lsh_bucket_topk`` — random-hyperplane LSH on deterministic md5-derived
  hyperplane signs; candidates share the query's bucket. Fully portable
  (no RNG state), so the oracle can reproduce buckets bit-for-bit.

All cosines are rounded to 4 decimals and tie-broken by id so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def cosine(x: Column, y: Column) -> Column:
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


def _spread(df: DataFrame, id_col: str, mult: int = 2) -> DataFrame:
    """Single-footer parquet inputs arrive as one partition; repartition the
    corpus side so the broadcast-join scoring fans out across all cores."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * mult, F.col(id_col))


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for every query vector (self-matches excluded)."""
    corpus = _spread(corpus, id_col)
    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("nbr_id")).select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """ANN top-k searching only the query's coarse cell (inverted file)."""
    corpus = _spread(corpus, id_col)
    c = corpus.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"), F.col(cell_col).alias("cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col(cell_col).alias("cell")
    )
    scored = c.join(F.broadcast(q), on="cell").where(
        F.col("query_id") != F.col("nbr_id")
    ).select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component sign/value
    from md5 bytes of (plane, index). No RNG state — reproducible anywhere."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"hp{plane}:{i}".encode()).digest()
        v = int.from_bytes(h[:4], "big") / 2**31 - 1.0  # [-1, 1)
        out.append(v)
    return out


def lsh_signature(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit b = sign(dot(vec, plane_b))."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        bits.append(F.when(_dot(vec_col, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k within the query's hyperplane-LSH bucket."""
    corpus = _spread(corpus, id_col)
    sig = lambda col: lsh_signature(col, dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), on="bucket").where(
        F.col("query_id") != F.col("nbr_id")
    ).select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine")
    )
