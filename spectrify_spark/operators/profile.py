"""Single-pass table profiling — the data-quality scan a pipeline runs
before trusting 100 TB of input (null rates, cardinalities, numeric
ranges per column).

One ``agg`` over the table computes every metric, then a literal
``stack`` unpivots the single result row to long format — so the cost
is ONE scan regardless of column count, and the output is a tiny
(n_cols)-row frame safe to collect/alert on.

Cardinality mode matters at scale: multiple exact ``countDistinct``
aggregates in one pass plan through Catalyst's Expand operator, which
replicates every input row once per distinct-aggregate — column-count ×
table-size row amplification.  The default ``approx=True`` uses
``approx_count_distinct`` (HLL++, no Expand, one pass); exact mode is
for bounded validation runs, like the oracle-checked ``q_profile_table``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = True,
) -> DataFrame:
    """Per-column profile: ``(column, n_nulls, n_distinct, min_val,
    max_val)`` — min/max as DOUBLE for numeric columns, NULL otherwise
    (string min/max formatting is engine-specific and belongs in a
    text-profile pass, not here).
    """
    cols = list(columns) if columns else df.columns
    types = {f.name: f.dataType for f in df.schema.fields}
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(distinct(F.col(c)).alias(f"{c}__distinct"))
        if isinstance(types[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_val, max_val)"
        )
    )
