"""Unit tests for BM25 lexical retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest

from spectrify_spark.operators.retrieval import bm25_idf, bm25_topk


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )


def _expected_score(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = bm25_idf(n, df)
    return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    """Scores must equal the scalar Okapi formula on a corpus small
    enough to compute by hand: N=4 (empty doc counts), avgdl=8/4."""
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_corpus(spark), ["apple", "cherry"], k=10).collect()
    }
    n, avgdl = 4, 8 / 4
    exp1 = _expected_score(tf=2, df=1, n=n, dl=3, avgdl=avgdl)
    exp2 = _expected_score(tf=1, df=2, n=n, dl=2, avgdl=avgdl)
    exp3 = _expected_score(tf=2, df=2, n=n, dl=3, avgdl=avgdl)
    assert out[1] == pytest.approx(round(exp1, 4), abs=1e-4)
    assert out[2] == pytest.approx(round(exp2, 4), abs=1e-4)
    assert out[3] == pytest.approx(round(exp3, 4), abs=1e-4)
    assert 4 not in out  # empty doc matches nothing


def test_bm25_rare_term_outranks_common(spark):
    """A doc matching only the rarer term must outrank a doc matching
    only the commoner term at equal tf/dl — the idf ordering."""
    df = spark.createDataFrame(
        [
            (1, "rare filler filler"),
            (2, "common filler filler"),
            (3, "common filler filler"),
            (4, "common other words"),
        ],
        "doc_id bigint, text string",
    )
    rows = bm25_topk(df, ["rare", "common"], k=4).collect()
    assert rows[0]["doc_id"] == 1


def test_bm25_topk_limits_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(1, 8)], "doc_id bigint, text string"
    )
    rows = bm25_topk(df, ["same"], k=3).collect()
    # identical scores: deterministic doc_id ascending tie-break
    assert [r["doc_id"] for r in rows] == [1, 2, 3]


def test_bm25_query_casefold_and_dedup(spark):
    rows1 = bm25_topk(_corpus(spark), ["APPLE", "apple"], k=10).collect()
    rows2 = bm25_topk(_corpus(spark), ["apple"], k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in rows1] == [
        (r["doc_id"], r["score"]) for r in rows2
    ]


def test_bm25_validates_inputs(spark):
    c = _corpus(spark)
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_topk(c, [])
    with pytest.raises(ValueError, match="need k>0"):
        bm25_topk(c, ["a"], k=0)
    with pytest.raises(ValueError, match="need k>0"):
        bm25_topk(c, ["a"], b=1.5)


def test_bm25_idf_positive_even_for_ubiquitous_terms():
    # '+1' smoothing: a term in every doc still gets idf > 0
    assert bm25_idf(100, 100) > 0


# ------------------------------------------------------ property tests

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(texts=st.lists(_doc, min_size=2, max_size=8), q=st.lists(_word, min_size=1, max_size=3))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_bm25_invariants(spark, texts, q):
    """For any corpus/query: scores are positive and descending, every
    hit contains >= 1 query term, and every doc containing a query term
    is a hit (k >= corpus size here, so nothing is cut off)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bm25_topk(df, q, k=len(rows)).collect()
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    qset = {t.lower() for t in q}
    expected_hits = {i for i, t in rows if qset & set(t.split())}
    assert {r["doc_id"] for r in out} == expected_hits


# ---------------------------------------------------------------- RRF


def test_rrf_fuse_hand_computation(spark):
    """Fusion must equal sum of 1/(c+rank) with ranks recomputed from
    scores, independent of the physical row order of the inputs."""
    from spectrify_spark.operators.retrieval import rrf_fuse

    # list A ranks: doc 2 (rank 1), doc 1 (rank 2); rows given in the
    # OPPOSITE physical order to prove rank comes from score
    a = spark.createDataFrame(
        [(1, 0.5), (2, 0.9)], "doc_id bigint, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.1), (3, 0.8)], "doc_id bigint, score double"
    )
    out = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], k=10, c=60.0).collect()}
    assert out[2] == pytest.approx(round(1 / 61 + 1 / 62, 6), abs=1e-6)
    assert out[1] == pytest.approx(round(1 / 62, 6), abs=1e-6)
    assert out[3] == pytest.approx(round(1 / 61, 6), abs=1e-6)


def test_rrf_fuse_tiebreak_by_id(spark):
    """Equal scores rank by id ASC, so fusion is deterministic."""
    from spectrify_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(7, 1.0), (3, 1.0)], "doc_id bigint, score double"
    )
    rows = rrf_fuse([a], k=2).collect()
    assert [r["doc_id"] for r in rows] == [3, 7]


def test_rrf_fuse_validates_inputs(spark):
    from spectrify_spark.operators.retrieval import rrf_fuse

    df = spark.createDataFrame([(1, 1.0)], "doc_id bigint, score double")
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([df], k=0)
    with pytest.raises(ValueError):
        rrf_fuse([df], c=0.0)
