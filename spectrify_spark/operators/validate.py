"""Declarative data-quality validation (Deequ-style, Spark-first).

A check suite compiles to ONE aggregation pass over the table — every
row-level constraint (completeness, range, accepted values, uniqueness)
becomes a conditional aggregate column in the same ``agg``, so a suite
of 20 checks costs exactly one scan + one 1-row shuffle at 100 TB.
Referential-integrity checks need a second relation and run as
broadcast/AQE anti-join legs, unioned into the same report.

Output: one row per check — ``(check_name, metric, threshold, passed)`` —
the gate a training-data pipeline asserts on before a run consumes the
table ("fail the job, not the model").

Checks:
- ``not_null(col, max_null_frac)``: NULL fraction <= threshold
- ``in_range(col, lo, hi)``: count of non-NULL values outside [lo, hi]
  must be 0
- ``accepted_values(col, values)``: count of non-NULL values outside
  the set must be 0
- ``unique(col)``: duplicate-key row count must be 0 (exact distinct —
  one extra aggregate in the same pass)
- ``foreign_key(col, dim, dim_key)``: orphaned references must be 0
  (LEFT ANTI join leg; the dim's key column is deduplicated first)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    col: str
    threshold: float = 0.0
    params: dict[str, Any] = field(default_factory=dict)


def not_null(col: str, max_null_frac: float = 0.0) -> Check:
    return Check(f"not_null({col})", "not_null", col, float(max_null_frac))


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(
        f"in_range({col},{lo!r},{hi!r})", "in_range", col, 0.0,
        {"lo": lo, "hi": hi},
    )


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})", "accepted_values", col, 0.0,
        {"values": list(values)},
    )


def unique(col: str) -> Check:
    return Check(f"unique({col})", "unique", col, 0.0)


def foreign_key(col: str, dim: DataFrame, dim_key: str) -> Check:
    return Check(
        f"foreign_key({col}->{dim_key})", "foreign_key", col, 0.0,
        {"dim": dim, "dim_key": dim_key},
    )


def _metric_expr(c: Check, n: Column) -> Column:
    # every metric is NULL-safe on an EMPTY table (SUM over zero rows is
    # NULL): no rows means no violations, so the suite passes — an empty
    # date-slice must not report NULL/unknown check results
    v = F.col(c.col)
    if c.kind == "not_null":
        frac = F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("double") / n
        return F.coalesce(frac, F.lit(0.0))
    if c.kind == "in_range":
        lo, hi = c.params["lo"], c.params["hi"]
        bad = v.isNotNull() & ((v < F.lit(lo)) | (v > F.lit(hi)))
        return F.coalesce(F.sum(F.when(bad, 1).otherwise(0)).cast("double"), F.lit(0.0))
    if c.kind == "accepted_values":
        bad = v.isNotNull() & ~v.isin(c.params["values"])
        return F.coalesce(F.sum(F.when(bad, 1).otherwise(0)).cast("double"), F.lit(0.0))
    if c.kind == "unique":
        return (F.count(v) - F.count_distinct(v)).cast("double")
    raise ValueError(f"unknown check kind {c.kind!r}")


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the suite; returns ``(check_name, metric, threshold, passed)``.

    All single-relation checks share ONE aggregation (one scan, one
    1-row shuffle); each foreign_key check adds an anti-join leg whose
    deduplicated dim key side broadcasts (dims are small; for fact-fact
    FK audits AQE picks the join).  Metrics are exact.
    """
    agg_checks = [c for c in checks if c.kind != "foreign_key"]
    fk_checks = [c for c in checks if c.kind == "foreign_key"]
    legs: list[DataFrame] = []

    if agg_checks:
        n = F.count(F.lit(1))
        row = df.agg(
            *(
                _metric_expr(c, n).alias(f"__m{i}")
                for i, c in enumerate(agg_checks)
            )
        )
        stacked = row.select(
            F.explode(
                F.array(
                    *(
                        F.struct(
                            F.lit(c.name).alias("check_name"),
                            F.round(F.col(f"__m{i}"), 6).alias("metric"),
                            F.lit(c.threshold).alias("threshold"),
                        )
                        for i, c in enumerate(agg_checks)
                    )
                )
            ).alias("r")
        ).select("r.check_name", "r.metric", "r.threshold")
        legs.append(stacked)

    for c in fk_checks:
        dim, dim_key = c.params["dim"], c.params["dim_key"]
        keys = dim.select(F.col(dim_key).alias("__k")).dropDuplicates()
        orphans = (
            df.filter(F.col(c.col).isNotNull())
            .join(keys, F.col(c.col) == F.col("__k"), "left_anti")
            .agg(F.count(F.lit(1)).cast("double").alias("metric"))
        )
        legs.append(
            orphans.select(
                F.lit(c.name).alias("check_name"),
                F.col("metric"),
                F.lit(c.threshold).alias("threshold"),
            )
        )

    if not legs:
        raise ValueError("validate() requires at least one check")
    report = legs[0]
    for leg in legs[1:]:
        report = report.unionByName(leg)
    return report.withColumn("passed", F.col("metric") <= F.col("threshold"))
