import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat of the mat and it is a cat"),
        (1, "der hund ist nicht ein hund und der"),
        (2, "xyzzy qwerty plugh"),
        (3, ""),
        (4, "the  the   the"),  # multi-space
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_token_count(spark, docs):
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert got[0] == 11
    assert got[3] == 0
    assert got[4] == 3


def test_language_id(spark, docs):
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "und"


def test_quality_score_ranges(spark, docs):
    for r in quality_score(docs).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0
    got = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert got[0] > got[2]  # stopword-bearing text scores higher
    assert got[3] == 0.0


def test_fingerprint_order_insensitive(spark):
    rows = [(0, "alpha beta gamma"), (1, "gamma beta alpha alpha"), (2, "delta beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]
