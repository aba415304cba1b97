"""Mergeable-sketch aggregation — the pre-aggregation pattern that makes
100 TB distinct-count / quantile rollups cheap.

The reference engine has no sketch support (its only aggregate path is
the Spectrum-side SQL it generates); this module is part of the
training-data-pipeline surface: distinct-user counts per shard merged to
global, quantile profiles of document lengths, etc., computed once at a
fine grain and re-aggregated WITHOUT touching raw rows again.

Spark ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, JVM-side, mergeable binary
sketches) and a Greenwald-Khanna-style quantile summary
(``approx_percentile``).  Both are algebraic aggregates: partial
(map-side) combine happens for free, and persisted fine-grain sketch
tables can be rolled up along any dimension hierarchy — the classic
OLAP cube trick for non-additive measures.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Per-group HLL sketches of ``value_col`` (binary, mergeable).

    ``lgk`` = log2 of the number of HLL buckets: 14 (the function's
    ceiling-accuracy default) gives ~0.8% relative standard error at
    ~16 KB per sketch.  The output is the materializable "sketch table"
    — at scale, write it partitioned by the finest grain and serve every
    coarser rollup from it via :func:`hll_rollup`.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, lgk).alias("hll_sketch")
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grain sketches up to ``group_cols`` and estimate.

    Union of HLL sketches is lossless (the merged sketch equals the
    sketch of the unioned inputs), so rolling up a (day, shard) sketch
    table to monthly or global distincts reads only sketches — never the
    raw 100 TB — and still carries the same error bound.
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(estimate_col)
    )


def quantile_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles as one array column.

    ``approx_percentile`` is Spark's bounded-memory quantile summary:
    rank error <= 1/accuracy regardless of input size, partials merge
    map-side.  The exact alternative (``percentile``) buffers per-group
    values and dies at fact-table scale; keep it for small-N validation
    only (see ``q_quantile_sketch``'s self-check).
    """
    probs = "array(" + ",".join(repr(float(p)) for p in probabilities) + ")"
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_percentile({value_col}, {probs}, {accuracy})"
        ).alias("quantiles")
    )


def kll_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 800,
) -> DataFrame:
    """Per-group KLL quantile sketches of ``value_col`` (double).

    Unlike ``approx_percentile`` (a transient aggregate), KLL is a
    MATERIALIZABLE DataSketches binary: write the fine-grain sketch
    table once, serve every coarser quantile rollup from it via
    :func:`kll_rollup` without re-reading raw rows — quantiles get the
    same cube trick :func:`hll_sketches` gives distinct counts.
    ``k`` controls the accuracy/size trade-off: rank error is
    ~1.7%·(200/k)^0.9 at 99% confidence (k=800 -> ~0.5%), a few KB per
    sketch.
    """
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.expr(
            f"kll_sketch_agg_double(CAST({value_col} AS DOUBLE), {int(k)})"
        ).alias("kll_sketch")
    )


def kll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    probabilities: Sequence[float] = (0.25, 0.5, 0.95),
) -> DataFrame:
    """Merge fine-grain KLL sketches up to ``group_cols`` and read
    quantile estimates (plus the EXACT stream length ``n`` the sketch
    tracks losslessly — a free mergeability self-check).

    Merging is lossless in the KLL error model: the merged sketch
    carries the same rank-error bound as a sketch built directly over
    the unioned input, so a (day, shard) sketch table answers monthly
    or global quantiles at full fidelity without touching raw data.
    """
    gb = [F.col(c) for c in group_cols]
    merged = sketches.groupBy(*gb).agg(
        F.expr("kll_merge_agg_double(kll_sketch)").alias("__kll")
    )
    cols = list(group_cols) + [
        F.expr("kll_sketch_get_n_double(__kll)").alias("n"),
    ]
    for p in probabilities:
        cols.append(
            F.expr(
                f"kll_sketch_get_quantile_double(__kll, CAST({float(p)} AS DOUBLE))"
            ).alias(f"p{int(round(p * 100)):02d}")
        )
    return merged.select(*cols)


def theta_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Per-group Theta sketches of ``value_col`` — distinct-count
    sketches that, unlike HLL, support a full SET ALGEBRA: union,
    intersection, and difference of the underlying distinct sets are
    all estimable from the sketches alone (DataSketches Theta).

    The 100 TB use case HLL cannot serve: audience overlap ("distinct
    users active in BOTH periods"), cross-corpus contamination
    estimates, retention without a self-join — computed from a
    per-segment sketch table instead of an n-way distinct join.  Below
    ~2^lgk distinct values the sketch is in exact mode and the
    estimates are exact.
    """
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.expr(f"theta_sketch_agg({value_col}, {int(lgk)})").alias(
            "theta_sketch"
        )
    )


def theta_set_estimates(sketches: DataFrame) -> DataFrame:
    """Collapse a theta-sketch table into one row of set-algebra
    estimates: distinct count of the UNION and of the INTERSECTION of
    all groups' value sets.

    Contract: the sketch table must be NON-EMPTY.  The union of zero
    sets is the empty set (estimate 0), but the intersection of zero
    sets is the infinite set — DataSketches raises
    ``SketchesStateException`` for exactly this reason, and this
    operator passes that through rather than invent a value.  Guard
    with a count when the group list can be empty."""
    return sketches.agg(
        F.expr(
            "theta_sketch_estimate(theta_union_agg(theta_sketch))"
        ).alias("union_distinct"),
        F.expr(
            "theta_sketch_estimate(theta_intersection_agg(theta_sketch))"
        ).alias("intersection_distinct"),
    )


def topk_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 10,
    max_items_tracked: int = 10_000,
) -> DataFrame:
    """Per-group mergeable frequent-items state (``approx_top_k_accumulate``).

    The materializable form of top-k: accumulate per shard/partition
    grain, then :func:`topk_rollup` combines states along any
    hierarchy without re-scanning.  When a group's distinct cardinality
    stays under ``max_items_tracked`` the counts are EXACT — the sketch
    only approximates past that."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.expr(
            f"approx_top_k_accumulate({value_col}, {int(max_items_tracked)})"
        ).alias("topk_state")
    )


def topk_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    k: int = 10,
) -> DataFrame:
    """Combine per-grain top-k states up to ``group_cols`` and emit the
    (item, count) estimates as exploded rows."""
    gb = [F.col(c) for c in group_cols]
    merged = sketches.groupBy(*gb).agg(
        F.expr("approx_top_k_combine(topk_state)").alias("__state")
    )
    return merged.select(
        *group_cols,
        F.explode(
            F.expr(f"approx_top_k_estimate(__state, {int(k)})")
        ).alias("__e"),
    ).select(
        *group_cols,
        F.col("__e.item").alias("item"),
        F.col("__e.count").alias("est_count"),
    )


def cm_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch of ``item_col`` frequencies: ``(d, bucket, cnt)``
    counter matrix, ``depth`` independent hash rows x ``width`` buckets.

    The hash is the engine-portable md5 bucket
    (``functions.text.hash_bucket`` over ``item ':' d``), so the ENTIRE
    sketch — not just its invariants — is replicable by any engine that
    can md5 a string (the DuckDB oracle recomputes every counter and
    every estimate bit-for-bit; the other sketch families can only
    assert bounds).

    Scale shape: one ``groupBy(item)`` count first (items << rows — the
    only pass over raw data), THEN a depth-way explode of the compact
    item-count table into counters: the d-x amplification touches
    |distinct items| rows, never the corpus.  Counters are additive, so
    sketches merge by bucket-wise sum (:func:`cm_merge`) — the algebra
    that lets 100 TB of shards pre-aggregate independently.

    The build ``width`` travels WITH the sketch as a column (the
    sketch is <= depth*width rows, so the constant column is free;
    depth is already recoverable as ``max(d)+1``): a probe against a
    sketch of a different width hashes items into the wrong buckets
    and can silently UNDERcount, breaking the overcount-only
    guarantee — :func:`cm_point_estimates` validates both parameters
    against the sketch itself.
    """
    from spectrify_spark.functions.text import hash_bucket

    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    counts = df.groupBy(F.col(item_col).alias("__item")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    rows = counts.select(
        "__item",
        "__n",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    )
    bucket = hash_bucket(
        F.concat_ws(":", F.col("__item").cast("string"), F.col("d").cast("string")),
        width,
    )
    return (
        rows.select("d", bucket.alias("bucket"), "__n")
        .groupBy("d", "bucket")
        .agg(F.sum("__n").alias("cnt"))
        .withColumn("width", F.lit(width))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (depth, width):
    bucket-wise counter sum — the mergeability that makes per-shard
    sketches a 100 TB rollup primitive.

    ``width`` rides the group key, so merging sketches of DIFFERENT
    widths yields >1 distinct width in the result, which
    :func:`cm_point_estimates` rejects — a width mismatch can never
    silently undercount (the merge itself stays lazy: no extra
    action here)."""
    # if ANY shard predates the width column, drop it everywhere — a
    # half-tagged merge would split counters across (width, NULL) keys
    # and the split minima could undercount
    have_width = all("width" in s.columns for s in sketches)
    parts = [s if have_width else s.drop("width") for s in sketches]
    out = parts[0]
    for s in parts[1:]:
        out = out.unionByName(s)
    key = ["d", "bucket"] + (["width"] if have_width else [])
    return out.groupBy(*key).agg(F.sum("cnt").alias("cnt"))


def cm_point_estimates(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``probes[item_col]``:
    ``est = min over d of counter[d][h_d(item)]`` — the classic CM
    guarantee ``exact <= est <= exact + eps*N`` (overcounts only, never
    under).  A missing counter row reads as 0 (sparse sketch storage),
    so an empty sketch yields ``est = 0`` for every probe, never a
    vanished row.

    ``depth`` and ``width`` must match the build (they parameterize the
    hash family).  Both are taken explicitly so an EMPTY sketch still
    yields est=0 rows, and BOTH are validated against the sketch when
    it is non-empty: a probe depth LARGER than the build's would join
    phantom rows at cnt=0 and min them into a silent total undercount,
    and a mismatched width hashes probes into the WRONG buckets, whose
    counters can be smaller than the item's true count — either way
    the overcount-only guarantee breaks silently.  Depth is recovered
    from ``max(d)+1``; width from the ``width`` column :func:`cm_build`
    stamps on every counter row (>1 distinct width = shards of
    different widths were merged — also rejected; a legacy sketch
    without the column skips the width check).  The validation is one
    aggregate over the sketch, which is bounded (<= depth*width rows)
    by construction.

    The sketch is bounded by construction (<= depth*width counter
    rows), so it broadcasts; probes may be arbitrarily many and stay
    the streamed side of a left join — no shuffle of either input.
    Output: (item, est).
    """
    from spectrify_spark.functions.text import hash_bucket

    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    has_width = "width" in sketch.columns
    aggs = [F.max("d").alias("__maxd")]
    if has_width:
        aggs += [
            F.count_distinct("width").alias("__nw"),
            F.max("width").alias("__w"),
        ]
    stats = sketch.agg(*aggs).collect()[0]
    actual_max_d = stats["__maxd"]
    if actual_max_d is not None and depth != actual_max_d + 1:
        raise ValueError(
            f"cm_point_estimates: probe depth {depth} does not match the "
            f"sketch's build depth {actual_max_d + 1}; a larger probe depth "
            "joins phantom cnt=0 rows and undercounts every item"
        )
    if has_width and actual_max_d is not None:
        if stats["__nw"] > 1:
            raise ValueError(
                "cm_point_estimates: sketch mixes counters of "
                f"{stats['__nw']} different widths — shards of different "
                "widths were merged; rebuild with one width"
            )
        if width != stats["__w"]:
            raise ValueError(
                f"cm_point_estimates: probe width {width} does not match "
                f"the sketch's build width {stats['__w']}; mismatched "
                "widths hash probes into the wrong buckets and can "
                "silently undercount"
            )
    pr = probes.select(F.col(item_col).alias("__item")).distinct()
    pd_rows = pr.select(
        "__item",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    )
    bucket = hash_bucket(
        F.concat_ws(":", F.col("__item").cast("string"), F.col("d").cast("string")),
        width,
    )
    keyed = pd_rows.select("__item", "d", bucket.alias("bucket"))
    return (
        keyed.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("__item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("__item").alias(item_col), "est")
    )
