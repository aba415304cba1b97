"""Corpus-statistics quality operators.

- ``unigram_logprob``: CCNet-style language-model proxy — score each
  document by the mean log-probability of its tokens under the corpus's
  own unigram distribution.  Low scores flag gibberish / boilerplate /
  out-of-domain text; real pipelines threshold or bucket on this before
  training.  Scale shape: one explode, one token-keyed aggregation for
  the vocabulary, one token-keyed join back (both sides token-keyed —
  co-partitioned; AQE broadcasts the vocab when it is small), one
  doc-keyed aggregation.  No driver-side state: the corpus total rides
  along as a windowless global sum replicated into the vocab rows.

- ``winsorize``: clip a numeric column to its [lo, hi] percentiles —
  outlier taming for numeric features / reward-model targets.  The two
  percentiles are computed exactly in one aggregation and broadcast as
  a one-row dimension (cross join of a scalar), so the data pass is a
  single map-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Per-document mean ln p(token) under the corpus unigram model.

    Output: ``(id_col, n_tokens, avg_logprob)`` — avg_logprob rounded
    to 4 decimals (fp aggregation order differs across engines).
    Empty documents are dropped (no tokens, no score).

    The token table feeds both the vocabulary aggregation and the
    scoring join, and Catalyst does not CSE across an aggregation — so
    it is persisted (``persist=True``, the ``dedup.near_dup_pairs``
    pattern) and the 100 TB text column is scanned and tokenized ONCE.
    Pass ``persist=False`` only when the caller already persists or
    checkpoints the input and prefers the double scan over cache space.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
            )
        ).alias("__tok"),
    )
    if persist:
        toks = toks.persist()
    vocab = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    # total token count replicated onto every vocab row (tiny second agg
    # over the vocab, NOT a second corpus scan)
    total = vocab.agg(F.sum("__c").alias("__total"))
    vocab = vocab.crossJoin(F.broadcast(total))
    scored = toks.join(vocab, on="__tok")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("__c") / F.col("__total"))).alias("__alp"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("__alp"), 4).alias("avg_logprob"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` into its exact [lo, hi] percentile range.

    Adds ``out_col`` (default ``{value_col}_w``) with the clipped value;
    the bounds are one exact-percentile aggregation broadcast back as a
    1-row cross join, so the main pass stays a map-side projection.

    Raises ``ValueError`` unless ``0 <= lo <= hi <= 1`` — percentile
    fractions outside [0,1] (or inverted) would otherwise surface as an
    opaque engine error mid-job.
    """
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError(
            f"winsorize requires 0 <= lo <= hi <= 1, got lo={lo!r} hi={hi!r}"
        )
    out_col = out_col or f"{value_col}_w"
    # backtick-quote so column names needing escaping survive the SQL
    # expression (percentile has no pure-Column exact form)
    q = "`" + value_col.replace("`", "``") + "`"
    bounds = df.agg(
        F.expr(f"percentile({q}, {lo!r})").alias("__lo"),
        F.expr(f"percentile({q}, {hi!r})").alias("__hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def winsorize_grouped(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` into its exact
    [lo, hi] percentile range WITHIN each ``group_col`` — per-domain /
    per-language outlier taming, where one domain's tail is another's
    median.

    Scale shape: the bounds are a one-row-per-group aggregate (tiny)
    joined back onto the data — with ``broadcast_bounds`` the clip pass
    is map-side and the fact never shuffles.  This deliberately avoids
    the window formulation (``percentile(...) OVER (PARTITION BY g)``),
    which shuffles AND buffers entire partitions per group.  For
    group cardinalities too large to broadcast, pass
    ``broadcast_bounds=False`` and AQE picks the join.
    """
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError(
            f"winsorize_grouped requires 0 <= lo <= hi <= 1, got lo={lo!r} hi={hi!r}"
        )
    out_col = out_col or f"{value_col}_w"
    q = "`" + value_col.replace("`", "``") + "`"
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({q}, {lo!r})").alias("__lo"),
        F.expr(f"percentile({q}, {hi!r})").alias("__hi"),
    )
    if broadcast_bounds:
        bounds = F.broadcast(bounds)
    return (
        df.join(bounds, on=group_col)
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Corpus-drift metrics between two corpus versions' unigram
    distributions: KL(A||B), KL(B||A), Jensen-Shannon divergence, and
    total variation distance — the dataset-version monitoring gate (a
    retrain on corpus B should know how far B drifted from A).

    Add-k smoothing (``smoothing`` pseudo-count per vocab entry, over
    the UNION vocabulary) keeps the KLs finite when a token appears in
    only one corpus.  Returns a single row, all metrics rounded to 6
    decimals.

    Scale shape: one tokenize+count aggregation per corpus (token-keyed,
    map-side partial), a full-outer join on token (co-partitioned), one
    global sum.  Nothing driver-side; vocabulary never materializes off
    the executors.
    """

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.filter(
                        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                        lambda x: x != F.lit(""),
                    )
                ).alias("__tok")
            )
            .groupBy("__tok")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca, cb = counts(a, "__ca"), counts(b, "__cb")
    joined = ca.join(cb, "__tok", "full_outer").select(
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    # smoothed probabilities over the union vocabulary: the totals need
    # the vocab size, which is itself an aggregate — compute both in one
    # pass and broadcast the 1-row result back
    tot = joined.agg(
        F.sum("__ca").alias("__na"),
        F.sum("__cb").alias("__nb"),
        F.count(F.lit(1)).alias("__v"),
    )
    s = F.lit(float(smoothing))
    p = (F.col("__ca") + s) / (F.col("__na") + s * F.col("__v"))
    q = (F.col("__cb") + s) / (F.col("__nb") + s * F.col("__v"))
    m = (p + q) / 2
    terms = joined.crossJoin(F.broadcast(tot)).select(
        (p * F.log(p / q)).alias("__kl_ab"),
        (q * F.log(q / p)).alias("__kl_ba"),
        ((p * F.log(p / m) + q * F.log(q / m)) / 2).alias("__js"),
        (F.abs(p - q) / 2).alias("__tv"),
    )
    return terms.agg(
        F.round(F.sum("__kl_ab"), 6).alias("kl_ab"),
        F.round(F.sum("__kl_ba"), 6).alias("kl_ba"),
        F.round(F.sum("__js"), 6).alias("js_divergence"),
        F.round(F.sum("__tv"), 6).alias("total_variation"),
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency discretization: assign each row the quantile bin
    (1..n_bins) of ``value_col`` — feature binning / difficulty
    bucketing for curriculum sampling.  Unlike ``ntile`` (a GLOBAL sort
    window — one single-task shuffle of the entire table), the bin
    edges are ONE exact-percentile aggregation broadcast as a 1-row
    dimension and the assignment is a map-side fold over the edge
    array: the data never shuffles, which is the version that survives
    100 TB.  Ties land in the lowest bin whose upper edge admits them
    (bin = 1 + #edges strictly below the value), so rows with equal
    values always share a bin — ntile's arbitrary tie-splitting is the
    price it pays for exact equal counts.
    """
    if n_bins < 2:
        raise ValueError(f"quantile_bins requires n_bins >= 2, got {n_bins}")
    out_col = out_col or f"{value_col}_bin"
    q = "`" + value_col.replace("`", "``") + "`"
    fracs = ",".join(repr(i / n_bins) for i in range(1, n_bins))
    edges = df.agg(F.expr(f"percentile({q}, array({fracs}))").alias("__edges"))
    return (
        df.crossJoin(F.broadcast(edges))
        .withColumn(
            out_col,
            F.lit(1)
            + F.aggregate(
                F.col("__edges"),
                F.lit(0),
                lambda acc, e: acc
                + F.when(F.col(value_col) > e, 1).otherwise(0),
            ),
        )
        .drop("__edges")
    )


def robust_zscore(
    df: DataFrame,
    value_col: str,
    out_col: str | None = None,
    consistency: float = 1.4826,
) -> DataFrame:
    """Median/MAD robust z-score: ``(x - median) / (MAD * 1.4826)`` —
    outlier scoring that, unlike the mean/stddev z-score, is not itself
    dragged by the outliers it is meant to find (50% breakdown point vs
    0%).  The numeric-cleaning companion to ``winsorize`` for reward /
    score columns.

    Adds ``out_col`` (default ``{value_col}_rz``); rows where MAD is 0
    (constant column) get NULL.  The median and MAD are two exact
    percentile aggregations (the second over map-side |x - median|
    with the 1-row median broadcast); the scoring pass itself is
    map-side — same shape as winsorize, no shuffle of the data.
    """
    out_col = out_col or f"{value_col}_rz"
    q = "`" + value_col.replace("`", "``") + "`"
    med = df.agg(F.expr(f"percentile({q}, 0.5)").alias("__med"))
    mad = (
        df.crossJoin(F.broadcast(med))
        .select(F.abs(F.col(value_col) - F.col("__med")).alias("__ad"), "__med")
        .agg(
            F.expr("percentile(__ad, 0.5)").alias("__mad"),
            F.first("__med").alias("__med"),
        )
    )
    scale = F.col("__mad") * F.lit(float(consistency))
    return (
        df.crossJoin(F.broadcast(mad))
        .withColumn(
            out_col,
            F.when(scale > 0, (F.col(value_col) - F.col("__med")) / scale),
        )
        .drop("__med", "__mad")
    )
