"""Lexical retrieval scoring — BM25 top-k over a document corpus.

The keyword-search complement to the embedding-side similarity
operators (operators/similarity.py): training-data pipelines use BM25
for retrieval-based decontamination (find corpus docs that *retrieve*
for benchmark queries even when n-gram overlap misses them), for
building hard-negative mining sets, and for plain corpus search.

Scale shape (100 TB corpus, constant-size query):
- ONE tokenize pass over the corpus: the doc-level (id, dl, tokens)
  table is persisted (the ``quality.unigram_logprob`` pattern) and
  feeds BOTH the corpus stats (N, avgdl — a 1-row agg) and the
  postings, so the text column is scanned and tokenized once.
- The exploded token stream is immediately filtered to the query's
  terms — a broadcast-literal ``isin`` — so everything downstream of
  the corpus scan is O(matching postings), not O(corpus tokens).
- Document frequencies are a |Q|-row aggregate joined back by broadcast;
  the corpus-wide avgdl rides along as a 1-row broadcast cross join.
- Final score is one doc-keyed aggregation; top-k is
  TakeOrderedAndProject (no global sort).

Shuffles: the (doc, term) tf aggregation and the per-doc score sum —
two, both over postings of the query terms only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Top-``k`` docs by BM25 score for a bag-of-words query.

    Okapi BM25 with the standard '+1' idf smoothing (idf always
    positive): score(d, Q) = sum over t in Q of
    ``ln(1 + (N - df + 0.5)/(df + 0.5)) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl))``.

    Output: ``(id_col, score)`` — score rounded to 4 decimals (fp sum
    order differs across engines), ordered by (score DESC, id ASC) for
    a deterministic top-k under ties.

    Raises ``ValueError`` on an empty query or non-positive k/k1/b
    bounds violations.
    """
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    if k <= 0 or k1 <= 0 or not (0.0 <= b <= 1.0):
        raise ValueError(f"bm25_topk: need k>0, k1>0, 0<=b<=1; got {k} {k1} {b}")
    terms = sorted({t.lower() for t in query_terms})

    # doc-level tokenization, computed ONCE: persisted so the stats leg
    # and the postings leg share one scan+tokenize of the text column
    # (Catalyst does not CSE across an aggregation)
    sized = df.select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda x: x != F.lit(""),
        ).alias("__toks"),
    ).select("__id", F.size("__toks").alias("__dl"), "__toks")
    if persist:
        sized = sized.persist()

    # corpus constants: N docs and avg doc length (empty docs count,
    # matching the dl the postings carry) — one tiny agg, broadcast
    stats = sized.select(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )

    # postings of the query terms only — the broadcast-literal filter is
    # what keeps this O(matching postings) at corpus scale
    post = sized.select(
        "__id", "__dl", F.explode("__toks").alias("__tok")
    ).filter(F.col("__tok").isin(terms))
    tf = post.groupBy("__id", "__dl", "__tok").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    dfreq = tf.groupBy("__tok").agg(F.countDistinct("__id").alias("__df"))

    scored = (
        tf.join(F.broadcast(dfreq), "__tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (F.lit(k1) + 1.0))
            / (
                F.col("__tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(F.round(F.sum("__s"), 4).alias("score"))
        .select(F.col("__id").alias(id_col), "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_idf(n_docs: int, doc_freq: int) -> float:
    """Reference scalar form of the idf used above (unit-test anchor)."""
    return math.log(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def rrf_fuse(
    lists: list[DataFrame],
    k: int = 10,
    c: float = 60.0,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (hybrid
    retrieval: lexical BM25 + embedding cosine, or any mix).

    Each input is a CANDIDATE LIST ``(id_col, score_col)`` — the
    top-k output of another retriever, k rows, not a corpus.  Ranks
    are recomputed here (dense row_number over ``score DESC, id ASC``)
    so fusion never trusts the physical row order of a DataFrame, and
    a doc appearing in several lists sums its ``1/(c + rank)``
    contributions (standard RRF, Cormack et al.).

    Output: ``(id_col, rrf)`` — rrf rounded to 6 decimals, top-``k``
    by (rrf DESC, id ASC).

    Scale shape: the single-partition rank window is over k-row
    candidate lists (bounded by construction — the expensive corpus
    scans already happened inside the upstream retrievers), so the
    union + groupBy moves O(sum of list sizes) rows, not corpus rows.

    Raises ``ValueError`` on no lists or non-positive k/c.
    """
    from pyspark.sql import Window

    if not lists:
        raise ValueError("rrf_fuse requires at least one ranked list")
    if k <= 0 or c <= 0:
        raise ValueError(f"rrf_fuse: need k>0 and c>0; got k={k} c={c}")
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    contribs = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(c)) + F.row_number().over(w))).alias(
                "__contrib"
            ),
        )
        for df in lists
    ]
    allc = contribs[0]
    for other in contribs[1:]:
        allc = allc.unionByName(other)
    return (
        allc.groupBy(id_col)
        .agg(F.round(F.sum("__contrib"), 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )
