"""Deterministic weighted domain sampling — the "data mixture" step of
a training pipeline: each stratum (source/domain) keeps a stable
hash-fraction of its rows per a target weight.

Determinism comes from the engine-portable md5 hash bucket
(``functions.text.hash_bucket``): a row's membership depends only on
its key, so the sample is reproducible across runs, engines, and
corpus growth — properties ``df.sample()``'s RNG cannot give.

Scale shape: pure map-side filter (a literal map lookup + md5 of the
key); no shuffle, no UDF, fully pushdown-friendly upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spectrify_spark.functions.text import hash_bucket


def weighted_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    ``weights`` maps stratum value -> target keep-fraction in [0, 1];
    strata not listed keep ``default_weight``.  Fractions are resolved
    at bucket granularity (1/buckets), identically in any engine that
    can md5 a string.
    """
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0,1], got {w}")
    if not 0.0 <= default_weight <= 1.0:
        raise ValueError(f"default_weight must be in [0,1], got {default_weight}")
    if weights:
        mapping = F.create_map(
            *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
        )
        w = F.coalesce(mapping[F.col(stratum_col)], F.lit(float(default_weight)))
    else:
        w = F.lit(float(default_weight))
    b = hash_bucket(F.col(key_col), buckets)
    # strict < : weight 0.0 keeps nothing, 1.0 keeps everything
    return df.filter(b < (w * buckets))


def fixed_n_per_stratum(
    df: DataFrame,
    *,
    stratum_col: str,
    key_col: str,
    n: int,
) -> DataFrame:
    """Keep EXACTLY min(n, stratum size) rows per stratum — the "1000
    eval docs per language" shape, where a fraction is the wrong
    contract.  Rows are ranked inside each stratum by (md5(key), key):
    deterministic across runs and engines, unbiased w.r.t. any natural
    ordering of the data, no RNG.

    Scale shape: one shuffle on the stratum key (the rank window).
    Strata counts are usually far larger than n, so the window never
    materializes more than each stratum's rows in one partition — for
    mega-strata combine with ``weighted_sample`` first to pre-thin.
    Unlike the hash-fraction sampler, membership CAN change as the
    corpus grows (new rows may out-rank old ones) — fixed-N and
    grow-stable are mutually exclusive contracts.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    from pyspark.sql import Window

    rank_key = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def rebalance_mixture(
    df: DataFrame,
    *,
    stratum_col: str,
    key_col: str,
    targets: dict[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Downsample strata so the kept rows follow a TARGET MIXTURE.

    ``targets`` gives the desired relative proportions per stratum
    (domain weights for a training mix — only ratios matter, the dict
    need not sum to 1; strata absent from ``targets`` are dropped).
    The operator computes the largest total T such that every stratum
    can supply its share without oversampling — ``T = min_i(count_i /
    target_i)`` — then keeps a deterministic ``target_i * T / count_i``
    hash-fraction of each stratum.  No stratum is upsampled; the
    binding stratum (the min) keeps 100% of its rows.

    Rates are scale-invariant in the target weights (tgt*T/cnt is
    unchanged if all targets are multiplied by a constant), so integer
    weights work and stay float-exact across engines.

    Scale shape: two passes over ``df`` — a column-pruned count
    aggregate (|strata| rows) and the map-side filtered scan; the
    per-stratum rate table is a broadcast join.  Everything is
    declarative (no driver collect), and membership is the same
    engine-portable md5 bucket as ``weighted_sample``.

    Raises ``ValueError`` on empty targets or non-positive weights.
    """
    if not targets:
        raise ValueError("rebalance_mixture requires at least one target")
    for s, t in targets.items():
        if t <= 0:
            raise ValueError(f"target for {s!r} must be positive, got {t}")
    tmap = F.create_map(
        *[F.lit(x) for kv in sorted(targets.items()) for x in (kv[0], float(kv[1]))]
    )
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__tgt", tmap[F.col(stratum_col)])
        .filter(F.col("__tgt").isNotNull())
    )
    cap = counts.agg(
        F.min(F.col("__cnt") / F.col("__tgt")).alias("__T")
    )
    rates = counts.crossJoin(F.broadcast(cap)).select(
        stratum_col,
        (F.col("__tgt") * F.col("__T") / F.col("__cnt")).alias("__rate"),
    )
    b = hash_bucket(F.col(key_col), buckets)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(b < F.col("__rate") * buckets)
        .drop("__rate")
    )


def negative_sample(
    pairs: DataFrame,
    *,
    query_col: str,
    pos_col: str,
    k: int,
    oversample: int = 3,
    corpus: DataFrame = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every distinct query in ``pairs``, draw ``k`` pseudo-random
    candidates from the corpus that are NOT that query's positives.

    No RNG anywhere: draw ``j`` for query ``q`` indexes the corpus at
    ``md5(q ':' j) % N`` over a dense 1..N index built with the
    distributed ``global_row_numbers`` (never a single-partition sort),
    so the sample is reproducible across runs, engines, and partition
    layouts — the property that makes training data auditable.
    Collisions with positives and duplicate draws are dropped, then the
    first ``k`` survivors per query (by draw order, candidate id
    tie-break) are kept; ``oversample`` bounds how many extra draws
    cover those losses (with positives ≪ corpus, k·oversample draws
    leave a vanishing shortfall probability).

    ``corpus`` defaults to the distinct positives universe of ``pairs``
    (in-batch negatives); pass a frame with a ``pos_col`` column to
    sample from a larger pool.

    Scale shape: one distributed numbering of the corpus, one
    equi-join of |Q|·k·oversample draw rows against the index on the
    computed position, one anti-join against the positives, one
    per-query window.  Output: (query, negative, rank 1..k).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    from pyspark.sql import Window

    from spectrify_spark.operators.relational import global_row_numbers

    # The pool-distinct subtree feeds three consumers (count, index
    # numbering, index offsets); persisting it and the index's ranged
    # frame computes each shuffle once instead of per consumer — this
    # took the plan from 11 shuffle exchanges to 8 unique (PERF_NOTES r9).
    # Cache scope is the session (driver-gate sessions are short; call
    # spark.catalog.clearCache() in long-lived ones).
    pool = (
        (corpus if corpus is not None else pairs)
        .select(F.col(pos_col).alias("__cand"))
        .distinct()
        .persist()
    )
    idx = global_row_numbers(
        pool,
        [F.col("__cand")],
        id_col="__rid",
        num_partitions=num_partitions,
        persist=True,
    )
    n_pool = pool.agg(F.count(F.lit(1)).alias("__n"))

    draws = (
        pairs.select(F.col(query_col).alias("__q"))
        .distinct()
        .select(
            "__q",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(k * oversample) - 1))
            ).alias("__j"),
        )
        .crossJoin(F.broadcast(n_pool))
        .select(
            "__q",
            "__j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("__q").cast("string"),
                                F.col("__j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("__n")
                + F.lit(1)
            ).alias("__pos"),
        )
    )
    cand = draws.join(idx, draws["__pos"] == idx["__rid"]).select(
        "__q", "__j", "__cand"
    )
    positives = pairs.select(
        F.col(query_col).alias("__pq"), F.col(pos_col).alias("__pp")
    ).distinct()
    neg = cand.join(
        positives,
        (cand["__q"] == positives["__pq"])
        & (cand["__cand"] == positives["__pp"]),
        "left_anti",
    )
    first = neg.groupBy("__q", "__cand").agg(F.min("__j").alias("__first_j"))
    w = Window.partitionBy("__q").orderBy("__first_j", "__cand")
    return (
        first.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            F.col("__q").alias(query_col),
            F.col("__cand").alias(f"neg_{pos_col}"),
            F.col("__rk").alias("rk"),
        )
    )


def split_temporal(
    df: DataFrame,
    *,
    ts_col: str,
    cutoff,
    embargo_seconds: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-free TEMPORAL split: rows strictly before ``cutoff`` are
    'train', rows at/after ``cutoff + embargo_seconds`` are 'test',
    rows inside the embargo gap are DROPPED.

    The split hash-based samplers cannot give: evaluation data is
    strictly in the future of every training row, and the embargo
    absorbs boundary effects (sessions/documents straddling the cutoff,
    feature windows that look back across it) — without it, a feature
    computed over [t-1h, t] leaks test-period signal into training.
    Map-side filter + literal comparison: pushed to the scan, zero
    shuffle, partition-prunable when the data is date-partitioned.
    """
    cut = F.lit(cutoff).cast("timestamp")
    # constant-folds to a timestamp literal, so BOTH sides of the OR
    # are plain column-vs-literal comparisons
    test_start = F.timestamp_micros(
        F.unix_micros(cut) + F.lit(int(embargo_seconds) * 1_000_000)
    )
    # filter FIRST on the raw timestamp predicates (pushed to the scan
    # / prunes date partitions), then label — filtering on the computed
    # label column would leave the scan unpruned
    in_split = (F.col(ts_col) < cut) | (F.col(ts_col) >= test_start)
    return df.filter(in_split).withColumn(
        out_col,
        F.when(F.col(ts_col) < cut, F.lit("train")).otherwise(F.lit("test")),
    )


def split_grouped(
    df: DataFrame,
    *,
    group_col: str,
    out_col: str = "split",
    train_pct: int = 80,
    val_pct: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """GROUP-AWARE split: every row of a group lands in the SAME split
    (bucket = portable md5 of the group key), so correlated rows — a
    user's events, a near-dup cluster's documents, a session's turns —
    can never straddle train and test.  Row-keyed splits leak: the
    model trains on one copy of a near-duplicate and is scored on the
    other.  Pair with ``dedup.connected_components`` cluster ids as the
    group for dedup-aware corpus splits.

    Map-side expression only (md5 + bucket compare), no shuffle; the
    same engine-portable arithmetic as ``split_assign``/
    ``weighted_sample`` so membership is reproducible anywhere.
    """
    if not (0 <= train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(
            f"invalid split percentages: train={train_pct} val={val_pct}"
        )
    from spectrify_spark.functions.text import hash_bucket

    b = hash_bucket(F.col(group_col).cast("string"), buckets)
    return df.withColumn(
        out_col,
        F.when(b < train_pct * buckets / 100, F.lit("train"))
        .when(b < (train_pct + val_pct) * buckets / 100, F.lit("val"))
        .otherwise(F.lit("test")),
    )
