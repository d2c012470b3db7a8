"""Operator-level tests for text analysis and the dedup funnel on planted
fixtures (the oracle gate covers cross-engine equivalence; these cover
semantics: planted duplicates are found, near-dups rank close, edges hold)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_taggregator_spark.operators import dedup as D
from hbase_taggregator_spark.operators import text as X

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "THE  Quick   Brown fox jumps over the lazy dog near the river bank"),  # exact dup modulo case/ws
    (2, "the quick brown fox jumps over the lazy cat near the river bank"),  # near dup
    (3, "completely different content about spark aggregation engines and buckets"),
    (4, "tiny"),  # < n tokens → no shingles
    (5, "der hund und die katze und das haus und der garten"),  # german markers
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_word_shingles_edges(spark, docs):
    out = docs.select("doc_id", D.word_shingles("text", 3).alias("sh")).collect()
    by_id = {r["doc_id"]: r["sh"] for r in out}
    assert by_id[4] == []  # short doc → empty, not an error
    assert "the quick brown" in by_id[0]
    # distinctness: doc 0 repeats 'the' but shingles are distinct
    assert len(by_id[0]) == len(set(by_id[0]))


def test_exact_dedup_finds_normalized_dup(spark, docs):
    out = D.exact_dedup(docs).collect()
    groups = {r["doc_id"]: r["n_duplicates"] for r in out}
    assert groups[0] == 2          # docs 0 and 1 collapse; representative = min id
    assert 1 not in groups
    assert groups[2] == 1


def test_jaccard_near_dup_ranks_high(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.jaccard_pairs(docs, threshold=0.0).collect()}
    assert pairs[(0, 1)] == 1.0           # normalized-identical
    assert pairs[(0, 2)] > 0.5            # one-word edit
    assert (0, 3) not in pairs or pairs[(0, 3)] < 0.2


def test_minhash_candidates_cover_true_dups(spark, docs):
    cands = {(r["id_a"], r["id_b"])
             for r in D.minhash_lsh_candidates(docs).collect()}
    assert (0, 1) in cands                # identical docs always collide
    # unrelated docs share no band with overwhelming probability
    assert (0, 3) not in cands


def test_simhash_hamming_orders_similarity(spark, docs):
    rows = {r["doc_id"]: r["simhash"] for r in D.simhash_table(docs).collect()}

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    assert hamming(rows[0], rows[1]) == 0         # normalized-identical
    assert hamming(rows[0], rows[2]) < hamming(rows[0], rows[3])


def test_dedup_funnel_drops_only_verified_dups(spark, docs):
    """End-to-end funnel: LSH candidates → exact-Jaccard verify → survivors.
    doc 1 (normalized-identical to 0) always drops. Doc 2 (jaccard ~0.57 to
    doc 0) is an LSH candidate at ≥4 bands but not at 2 (recall is the
    band knob — an 8-row band needs near-identical signatures to match):
    as a candidate it drops at threshold 0.4 but survives the 0.9 verify —
    the verify stage, not the candidate stage, makes the keep/drop
    decision. (Band-collision outcomes re-pinned for the single-md5
    lo/hi derivation.)"""
    strict = {r["doc_id"] for r in
              D.dedup_funnel(docs, threshold=0.9, bands=16).collect()}
    assert strict == {0, 2, 3, 4, 5}
    loose = {r["doc_id"] for r in
             D.dedup_funnel(docs, threshold=0.4, bands=16).collect()}
    assert loose == {0, 3, 4, 5}
    # at 2 bands the (0,2) pair never reaches the verifier → survives
    low_recall = {r["doc_id"] for r in
                  D.dedup_funnel(docs, threshold=0.4, bands=2).collect()}
    assert low_recall == {0, 2, 3, 4, 5}


def test_language_id_markers(spark, docs):
    out = {r["doc_id"]: r["lang_pred"]
           for r in X.language_id(docs).select("doc_id", "lang_pred").collect()}
    assert out[0] == "en"
    assert out[5] == "de"
    assert out[4] == "und"  # no markers


def test_quality_features_sane(spark, docs):
    r = X.quality_features(docs).filter(F.col("doc_id") == 0).first()
    assert r["q_n_tokens"] == 13
    assert r["q_stopword_ratio"] == pytest.approx(3 / 13)  # 'the' ×3
    assert 0 <= r["q_punct_ratio"] < 0.1


def test_fingerprint_normalization(spark, docs):
    fps = {r["doc_id"]: r["fp"] for r in X.fingerprint(docs).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_contamination_overlap_detects_benchmark_ngrams(spark):
    from hbase_taggregator_spark.operators.dedup import contamination_overlap

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "alpha beta gamma delta epsilon"
            (1, "xx alpha beta gamma delta epsilon yy"),
            (2, "totally unrelated words go here now then"),
            (3, "shrt"),  # < 5 tokens -> 0 shingles
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination_ratio)
        for r in contamination_overlap(corpus, bench, n_shingle=5).collect()
    }
    assert got[1][1] > 0 and got[1][2] > 0.0
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_rare_token_ratio_counts_occurrences(spark):
    from hbase_taggregator_spark.operators.text import rare_token_ratio

    df = spark.createDataFrame(
        [
            (1, "common rare1 common rare1"),  # rare1 df=1 but 2 occurrences
            (2, "common common"),
            (3, "common onlyhere"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_rare) for r in rare_token_ratio(df, max_df=1).collect()
    }
    # 'common' df=3 (not rare); rare1 df=1, onlyhere df=1
    assert got == {1: (4, 2), 2: (2, 0), 3: (2, 1)}
