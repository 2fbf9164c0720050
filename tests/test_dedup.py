import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicates,
    minhash_lsh_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),          # exact dup of 0
        (2, "alpha beta gamma delta epsilon eta"),           # near dup of 0
        (3, "totally different content entirely here now"),
        (4, "alpha beta gamma delta epsilon zeta"),          # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_duplicates(spark, docs):
    groups = exact_duplicates(docs).collect()
    by_keeper = {r["keeper_id"]: r["n_copies"] for r in groups}
    assert by_keeper[0] == 3
    assert by_keeper[2] == 1
    assert by_keeper[3] == 1


def test_drop_exact_duplicates(spark, docs):
    kept = sorted(r["doc_id"] for r in drop_exact_duplicates(docs).collect())
    assert kept == [0, 2, 3]


def test_minhash_identical_docs_same_signature(spark, docs):
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1] == sigs[4]
    assert sigs[0] != sigs[3]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             minhash_lsh_duplicates(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert pairs[(0, 4)] == pytest.approx(1.0)
    # near-dup 0-2 shares 5 of 7 distinct tokens: jaccard 5/7 ≈ 0.7143
    if (0, 2) in pairs:  # found only if they collide in a band
        assert pairs[(0, 2)] == pytest.approx(5 / 7, abs=1e-3)
    assert not any(3 in p for p in pairs)


def test_simhash_close_for_near_dups(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[0] == sigs[1] == sigs[4]
    ham_near = bin(sigs[0] ^ sigs[2]).count("1")
    ham_far = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham_near < ham_far


def test_simhash_candidates_include_dups(spark, docs):
    cands = {(r["a"], r["b"]) for r in
             simhash_candidates(simhash(docs)).collect()}
    assert (0, 1) in cands and (0, 4) in cands and (1, 4) in cands


def test_ngram_jaccard_exact(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.99).collect()}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 3) not in pairs
