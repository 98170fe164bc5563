"""Spark-vs-DuckDB differential twins on a constructed corpus containing the
pathological rows the driver's sf corpora happen to lack: empty documents,
whitespace-only documents, and documents shorter than the shingle ngram.

Guards the ADVICE-r01 divergences (Spark's descending sequence(1,0)
fabricating shingles for short docs; explode_outer emitting simhash rows for
zero-token docs) and the simhash_pairs full-pair recall contract (the oracle
computes the UNRESTRICTED pair space — the banded equi-join must match it).
"""

from __future__ import annotations

import duckdb
import pytest

from tools.check_oracles import canon  # the driver-gate rehearsal's comparator

DOCS = [
    # doc 0 is the decontaminate gate's benchmark subset (doc_id % 29 == 0)
    (0, "the quick brown fox jumps over the lazy dog is benchmark text"),
    (1, "the quick brown fox jumps over the lazy dog and runs far away"),
    (2, "the quick brown fox jumps over the lazy dog and runs far away"),
    (3, "the quick brown fox jumped over the lazy dog and ran far away"),
    (4, "completely different content about databases, queries and planners"),
    (5, ""),  # empty
    (6, "   \t  \n "),  # whitespace-only (and a raw newline) -> normalizes to ''
    (7, "short"),  # shorter than the gate's ngram=8
    (8, "tiny"),
    (9, "ok doc"),
    (10, "exactly8"),  # exactly ngram chars -> one shingle
    (11, "alpha beta gamma delta epsilon zeta eta theta " * 3),  # multi-line after 8-word split
    (12, "héllo wörld ünïcode tëxt with àccents ánd möre wörds hêre tðo"),
    (13, "O'Reilly's \"quoted\" text with 'apostrophes' and backslash \\ chars here"),
    (14, "123 456 789 0 11 22 33 44 55 66"),  # digits only: alpha_word_frac = 0
    (15, "alpha beta gamma delta epsilon zeta eta theta " * 3),  # line-dup of 11
    # \x0B (vertical tab): Java's \s contains it, RE2's does not — ops and
    # twins must both use the explicit class [ \t\n\f\r] so this doc
    # tokenizes identically in Spark and DuckDB (ADVICE-r03).
    (16, "vertical\x0Btab glued\x0Bwords stay single tokens in both engines"),
]

TWINNED = [
    "exact_dedup",
    "ngram_jaccard",
    "minhash_lsh",
    "minhash_signatures",
    "simhash",
    "simhash_pairs",
    "simhash60_pairs",
    "bottomk_sketch",
    "text_analysis",
    "line_dedup",
    "gopher_quality",
    "host_cap",
    "decontaminate",
    "pii_scrub",  # doc 14's digit runs probe Java-vs-RE2 greedy agreement
    "repetition_signals",
    "hash_sample",
    # corpus_stats omitted: it reads the real fixture's n_chars column,
    # which this constructed corpus does not carry
    "url_dedup",
    "host_graph",
    "host_anchors",
    "anchor_pairs",
    "pagerank",
    "training_pipeline",
    # featurizer family: docs 5/6 produce the all-zeros vector (normalized
    # length < ngram), probing the zero-norm cosine edge (NaN semantics
    # must agree across engines) and the left-join zero-vector path
    "text_embedding",
    "text_neardup",
    "text_kmeans",
    "text_dedup",
]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("twindata")
    spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", TWINNED)
def test_twin_on_short_doc_corpus(spark, sf_dir, name):
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    rel = con.sql(entry.oracle_sql()[name])
    ocols = [c.lower() for c in rel.columns]
    orows = rel.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"rowcount spark={len(srows)} duck={len(orows)}"
    assert canon(srows, scols) == canon(orows, ocols)


def test_simhash_pairs_plan_is_shuffled_equi_join(spark, sf_dir):
    """The scale contract: candidate generation is a banded equi-join —
    never a BroadcastNestedLoopJoin or cartesian product."""
    from tempeh_spark.dedup import simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = simhash_near_pairs(docs, max_hamming=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_pairs_bands_guardrail(spark, sf_dir):
    from tempeh_spark.dedup import simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(docs, max_hamming=6, bands=4)


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    """With max_df set, a shingle shared by every doc stops generating join
    rows; pairs driven only by rare shingles survive."""
    from tempeh_spark.dedup import ngram_jaccard_pairs

    rows = [
        (1, "aaaa bbbb"),
        (2, "aaaa cccc"),
        (3, "aaaa dddd"),
        (4, "aaaa bbbb"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(docs, ngram=4, threshold=0.01)
    capped = ngram_jaccard_pairs(docs, ngram=4, threshold=0.01, max_df=2)
    upairs = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cpairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    assert (1, 2) in upairs  # shares only the hot 'aaaa' shingles
    assert (1, 2) not in cpairs  # hot shingles capped away
    assert cpairs[(1, 4)] == 1.0  # exact dup still found via rare shingles
