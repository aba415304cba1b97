"""Incremental aggregate-view maintenance — merge delta partials into
a published rollup instead of rescanning the corpus.

The reference pipeline's only refresh story is full recompute
(reference spectrify/transform.py: every run re-exports and re-converts
the whole table).  At 100 TB the derived views a training pipeline
keeps next to its corpus — per-language doc counts, per-day token
totals, per-source quality stats — cannot be rebuilt by rescanning
everything each time a delta lands.  The classical answer is
incremental view maintenance restricted to SELF-MAINTAINABLE
aggregates under inserts: ``count`` and ``sum`` merge by addition,
``min``/``max`` by min/max — the same algebra Spark's own partial
aggregation (map-side combine) exploits inside a single job, lifted
across jobs: the published rollup IS a persisted partial aggregate,
and a delta refresh costs one scan of the DELTA plus a shuffle of
|keys| + |delta-groups| pre-aggregated rows.  The corpus is never
rescanned.

INSERT-ONLY by construction: deletes and updates are not
self-maintainable for min/max (removing the current minimum requires
knowing the runner-up, which only the base data holds) and would
silently corrupt sums.  Pipelines with updates should route them
through ``relational.merge_changes`` + full recompute of the affected
partitions, or keep the rollup keyed by an immutable ingest partition
and recompute only that partition.

Composes with the versioned publish (catalog/publish.py): each refresh
lands as the next immutable rollup version behind the atomic pointer
flip, so readers never see a half-merged view and the previous rollup
stays time-travelable.  All plain DataFrame ops — no UDFs, one shuffle
per refresh, key-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: measure kind -> (delta partial-agg builder, merge combiner)
_KINDS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _check_specs(specs: dict) -> None:
    if not specs:
        raise ValueError("incremental rollup needs at least one measure")
    for out, (kind, _src) in specs.items():
        if kind not in _KINDS:
            raise ValueError(
                f"measure {out!r}: unknown kind {kind!r} "
                f"(self-maintainable kinds: {sorted(_KINDS)})"
            )


def rollup_delta(
    delta: DataFrame, keys: list[str], specs: dict
) -> DataFrame:
    """Partial aggregate of a DELTA in the rollup's schema: one row per
    key group, one column per measure.  ``specs`` maps output column ->
    ``(kind, source_col)`` with kind in count|sum|min|max (source_col
    is ignored for count).  This is the map-side-combine shape: the
    delta is scanned once and reduced to its group cardinality before
    anything else happens."""
    _check_specs(specs)
    aggs = [
        _KINDS[kind][0](src).alias(out)
        for out, (kind, src) in specs.items()
    ]
    return delta.groupBy(*keys).agg(*aggs)


def merge_rollup(
    base: DataFrame, delta_partial: DataFrame, keys: list[str], specs: dict
) -> DataFrame:
    """Merge a delta's partial aggregate into an existing rollup —
    count/sum add, min/max fold — producing the rollup over base ∪
    delta WITHOUT touching base's underlying rows.  Both inputs carry
    the rollup schema (keys + measure columns, e.g. from
    :func:`rollup_delta`).  One shuffle over |base-groups| +
    |delta-groups| pre-aggregated rows; new keys appear, absent keys
    pass through."""
    _check_specs(specs)
    cols = [*keys, *specs]
    combined = base.select(*cols).unionByName(delta_partial.select(*cols))
    aggs = [
        _KINDS[kind][1](F.col(out)).alias(out)
        for out, (kind, _src) in specs.items()
    ]
    return combined.groupBy(*keys).agg(*aggs)


def maintain_published_rollup(
    spark,
    root: str,
    delta: DataFrame,
    keys: list[str],
    specs: dict,
    keep_versions: int = 2,
) -> int:
    """Refresh the published rollup at ``root`` with ``delta``'s rows:
    the delta partial-aggregates (:func:`rollup_delta`), merges into
    the currently pointed rollup version (:func:`merge_rollup`; a
    first refresh publishes the partial itself), and the result lands
    as the next immutable version behind the atomic pointer flip.
    Cost per refresh: one delta scan + one |groups|-sized shuffle —
    independent of the accumulated corpus size, the property that
    makes a 100 TB corpus's derived views maintainable at all.
    Returns the new version number.  Insert-only (module contract);
    single writer per rollup root, like every publish."""
    from spectrify_spark.catalog.publish import (
        current_version,
        publish,
        read_published,
    )

    part = rollup_delta(delta, keys, specs)
    if current_version(root, spark) is not None:
        part = merge_rollup(
            read_published(spark, root), part, keys, specs
        )
    return publish(part, root, keep_versions=keep_versions)
