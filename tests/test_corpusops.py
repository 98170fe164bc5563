"""Corpus-level cleaning operators: C4 line dedup, Gopher quality,
per-host caps, benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_segment_dedup_drops_global_duplicates(spark):
    from tempeh_spark.corpusops import segment_dedup

    rows = [
        (1, "unique first line\nshared cookie banner\nunique second line"),
        (2, "totally different text\nShared Cookie Banner"),  # case/trim-insensitive
        (3, "only unique content here"),
        (4, "repeated inside\nrepeated inside"),  # within-doc repeat: df=1, kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in segment_dedup(df, sep="\n", max_df=1).collect()}
    assert out[1]["clean_text"] == "unique first line\nunique second line"
    assert out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == "totally different text"
    assert out[3]["n_dropped"] == 0
    # duplicated WITHIN one doc only -> document frequency 1 -> kept
    assert out[4]["clean_text"] == "repeated inside\nrepeated inside"
    # a doc whose every line is boilerplate comes back empty, not missing
    rows2 = [(1, "same"), (2, "same")]
    out2 = {
        r["doc_id"]: r
        for r in segment_dedup(
            spark.createDataFrame(rows2, "doc_id long, text string")
        ).collect()
    }
    assert out2[1]["clean_text"] == "" and out2[1]["n_kept"] == 0


def test_gopher_quality_signals(spark):
    from tempeh_spark.corpusops import gopher_quality

    good = "the quick brown fox jumps over lazy dogs and keeps running fast " * 5
    rows = [
        (1, good),
        (2, "short text"),  # too few words
        (3, "the " * 80),  # degenerate repetition: top_word_frac = 1.0
        (4, "1 2 3 4 5 6 7 8 9 10 " * 5),  # numbers: alpha_word_frac = 0
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[1]["keep"]
    assert not out[2]["keep"] and out[2]["n_words"] == 2
    assert not out[3]["keep"] and out[3]["top_word_frac"] == 1.0
    assert not out[4]["keep"] and out[4]["alpha_word_frac"] == 0.0
    assert not out[5]["keep"] and out[5]["n_words"] == 0


def test_per_host_cap(spark):
    from tempeh_spark.corpusops import per_host_cap

    rows = [(i, f"https://h{i % 2}.example.com/p{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in per_host_cap(df, cap=3).collect()}
    assert out[0]["host"] == "h0.example.com"
    # lowest doc ids survive per host, deterministically
    kept = sorted(d for d, r in out.items() if r["keep"])
    assert kept == [0, 1, 2, 3, 4, 5]
    assert out[8]["host_rank"] == 5 and not out[8]["keep"]


def test_decontaminate_flags_ngram_overlap(spark):
    from tempeh_spark.corpusops import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "prefix words then alpha beta gamma delta epsilon zeta eta theta tail"),
        (2, "completely unrelated content with no overlap whatsoever at all here"),
        (3, "alpha beta gamma"),  # shares words but no full 8-gram
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, ngram=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"]


def test_pii_scrub(spark):
    from tempeh_spark.corpusops import pii_scrub

    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk or visit 192.168.1.1 today"),
        (2, "call +1 555-0142 8812 about the thing"),
        (3, "no pii in this one at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1
    assert "<EMAIL>" in out[1]["clean_text"] and "<IP>" in out[1]["clean_text"]
    assert "jane" not in out[1]["clean_text"] and "192.168" not in out[1]["clean_text"]
    assert out[2]["n_phones"] == 1 and "<PHONE>" in out[2]["clean_text"]
    assert out[3]["clean_text"] == rows[2][1]


def test_repetition_signals(spark):
    from tempeh_spark.corpusops import repetition_signals

    rows = [
        (1, "foo bar " * 20),  # 'foo bar'/'bar foo' dominate
        (2, "each word appears only once in this sentence"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["top_bigram_frac"] > 0.5 and out[1]["dup_word_frac"] > 0.9
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["top_bigram_frac"] < 0.2
    assert out[3]["top_bigram_frac"] == 0.0 and out[3]["dup_word_frac"] == 0.0


def test_hash_sample_deterministic_and_unbiased(spark):
    from tempeh_spark.corpusops import hash_sample

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    a = hash_sample(df, rate=0.25, salt="s0")
    b = hash_sample(df, rate=0.25, salt="s0")
    assert a.collect() == b.collect()  # rerun-stable
    n = a.where("keep").count()
    assert 800 < n < 1200  # ~1000 expected
    # different salts give (near-)independent draws
    c = hash_sample(df, rate=0.25, salt="s1")
    both = a.where("keep").join(c.where("keep"), "doc_id").count()
    assert 150 < both < 400  # ~250 expected under independence


def test_segment_dedup_literal_separator_and_null_text(spark):
    from tempeh_spark.corpusops import segment_dedup

    rows = [
        (1, "shared boilerplate.unique one"),
        (2, "shared boilerplate.unique two"),
        (3, None),  # must keep its output row, not vanish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # '.' is a LITERAL separator: a regex interpretation would split on
    # every character and shred the documents
    out = {r.doc_id: r for r in segment_dedup(df, sep=".").collect()}
    assert len(out) == 3
    assert out[1].clean_text == "unique one" and out[1].n_dropped == 1
    assert out[2].clean_text == "unique two"
    assert out[3].clean_text is None and out[3].n_kept == 0 and out[3].n_dropped == 0


def test_per_host_cap_mixed_case_urls(spark):
    from tempeh_spark.corpusops import per_host_cap

    rows = [
        (1, "HTTP://A.com/1"),
        (2, "http://a.COM/2"),
        (3, "https://B.com/1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in per_host_cap(df, cap=1).collect()}
    # case variants of one host share a cap; distinct hosts do not
    assert out[1].host == "a.com" and out[1].keep
    assert out[2].host == "a.com" and not out[2].keep
    assert out[3].host == "b.com" and out[3].keep


def test_equiwidth_histogram(spark):
    """Exact integer bucketing: edge clamps (under -> 0, over -> last),
    exact boundary lands in the upper bucket, nulls skipped, every
    non-null row accounted for, histograms merge by adding counts."""
    from tempeh_spark.corpusops import equiwidth_histogram

    rows = [
        ("a", -5),   # underflow -> bucket 0
        ("a", 0),    # lo -> bucket 0
        ("a", 99),   # last value of bucket 0 (width 100)
        ("a", 100),  # exact boundary -> bucket 1
        ("a", 999),  # last in-range -> bucket 9
        ("a", 1000), # hi -> clamps into bucket 9
        ("a", 10**9),
        ("a", 2**62),  # would overflow (v-lo)*buckets without the value clamp
        ("b", 250),
        ("b", None),
    ]
    df = spark.createDataFrame(rows, "source string, v long")
    out = equiwidth_histogram(df, "v", group_cols=("source",), lo=0, hi=1000, buckets=10)
    got = {(r["source"], r["bucket"]): (r["n"], r["bucket_lo"]) for r in out.collect()}
    assert got[("a", 0)] == (3, 0.0)
    assert got[("a", 1)] == (1, 100.0)
    assert got[("a", 9)] == (4, 900.0)  # incl. the 2**62 overflow probe
    assert got[("b", 2)] == (1, 200.0)
    assert sum(n for n, _ in got.values()) == 9  # null skipped
    # merge = add counts: histogram(whole) == histogram(part1) + histogram(part2)
    h1 = equiwidth_histogram(df.where("v < 500"), "v", ("source",), 0, 1000, 10)
    h2 = equiwidth_histogram(df.where("v >= 500"), "v", ("source",), 0, 1000, 10)
    merged = {}
    for r in h1.collect() + h2.collect():
        k = (r["source"], r["bucket"])
        merged[k] = merged.get(k, 0) + r["n"]
    assert merged == {k: n for k, (n, _) in got.items()}


def test_mixture_sample(spark):
    """Rate map folds to exact integer thresholds: rate 1.0 keeps all,
    0.0 drops all, unknown sources take the default, the draw matches
    hash_sample's md5-bucket contract and is rerun-stable."""
    from tempeh_spark.corpusops import mixture_sample

    rows = [(i, src) for i, src in enumerate(["a"] * 40 + ["b"] * 40 + ["zz"] * 40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, {"a": 1.0, "b": 0.0}, default_rate=0.5)
    by = {r["doc_id"]: r for r in out.collect()}
    assert all(by[i]["keep"] for i in range(40))            # rate 1.0
    assert not any(by[i]["keep"] for i in range(40, 80))    # rate 0.0
    kept_zz = sum(by[i]["keep"] for i in range(80, 120))    # default 0.5
    assert 0 < kept_zz < 40
    # deterministic: same draw on rerun
    again = {r["doc_id"]: r["keep"] for r in mixture_sample(
        df, {"a": 1.0, "b": 0.0}, default_rate=0.5).collect()}
    assert again == {i: by[i]["keep"] for i in by}


def test_pack_sequences(spark):
    """Per-group contiguous stream: start offsets are the exclusive
    cumsum in order_col order, bin = start div budget, groups pack
    independently, and a boundary-straddling doc lands in the bin its
    START falls in."""
    from tempeh_spark.corpusops import pack_sequences

    rows = [
        ("a", 1, 60), ("a", 2, 50),   # starts 0, 60  -> bins 0, 0
        ("a", 3, 10),                 # start 110     -> bin 1 (straddler 2 started at 60)
        ("b", 1, 250),                # start 0       -> bin 0 (independent group)
        ("b", 2, 1),                  # start 250     -> bin 2
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, cost long")
    out = pack_sequences(df, budget=100, cost_col="cost", order_col="doc_id")
    got = {(r["source"], r["doc_id"]): (r["start_offset"], r["bin"]) for r in out.collect()}
    assert got[("a", 1)] == (0, 0)
    assert got[("a", 2)] == (60, 0)
    assert got[("a", 3)] == (110, 1)
    assert got[("b", 1)] == (0, 0)
    assert got[("b", 2)] == (250, 2)
    # partitioning independence: same assignment from a reshuffled input
    got2 = {
        (r["source"], r["doc_id"]): (r["start_offset"], r["bin"])
        for r in pack_sequences(
            df.repartition(7), budget=100, cost_col="cost", order_col="doc_id"
        ).collect()
    }
    assert got2 == got


def test_duplicate_spans(spark):
    """Span-level self-dedup: shared 3-grams across docs flag both docs;
    within-doc repetition alone does not (doc frequency counts distinct
    documents via the per-doc-distinct shingle substrate)."""
    from tempeh_spark.corpusops import duplicate_spans

    shared = "the quick brown fox"
    rows = [
        (1, f"{shared} jumps over things"),       # shares 3-grams with doc 2
        (2, f"something {shared} appears here"),
        (3, "entirely unrelated text body here"), # no shared span
        (4, "tiny"),                              # < ngram words -> 0 spans
        (5, "rep rep rep rep rep rep"),           # self-repetition only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_spans(df, ngram=3).collect()}
    assert out[1]["flagged"] and out[2]["flagged"]
    assert out[1]["n_dup_spans"] == 2 and out[2]["n_dup_spans"] == 2
    assert not out[3]["flagged"]
    assert out[4]["n_spans"] == 0 and not out[4]["flagged"]
    # 'rep rep rep' appears in only ONE document: not a cross-doc duplicate
    assert not out[5]["flagged"] and out[5]["n_spans"] == 1
