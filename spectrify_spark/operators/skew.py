"""Skew-handling join strategies.

AQE's skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` — on in our session factory);
``salted_join`` is the explicit fallback for the pathological case AQE
can't fix: a single hot key whose matching build-side rows still
overwhelm one task after splitting.

Salting shape: fact side gets a random salt in [0, n); the dim side is
exploded n-fold with every salt value; the join key becomes
(key, salt), spreading each hot key over n tasks.  Dim replication is
n x |dim| — use only when dim is small-ish but too big (or too skewed)
to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_salts: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with an n-way salt on the fact side.

    The salt hashes fact columns, so it is deterministic across
    recomputation (task retry, stage re-run, executor loss) — a
    ``monotonically_increasing_id`` salt is NOT: ids shift when
    partitions are recomputed, which can duplicate or drop join rows
    mid-failure.  Hashing more than just the join key (which would put a
    hot key entirely in one salt bucket) spreads each hot key's rows
    across all ``num_salts`` tasks.

    ``salt_cols`` bounds WHICH columns feed the hash.  Pass the fact's
    unique/primary key when it has one: a unique column spreads
    perfectly AND keeps the scan pruned — the default (hash every
    column) forces the parquet reader to materialize the full row width
    even when the query projects two columns, which at 100 TB is the
    difference between scanning 2 columns and 30.  MapType columns are
    excluded from the hash (xxhash64 rejects them); the salt stays
    deterministic as long as at least one hashable column exists.

    Caveat: a hot key whose volume comes from *byte-identical repeated
    rows* (common in raw event logs) hashes every copy to the same salt
    bucket and stays skewed — salting spreads distinct rows, not
    duplicates.  For that shape, dedup (or pre-aggregate a count) before
    the join instead of salting harder; any per-copy discriminator that
    survives recomputation would have to be part of the data itself.
    Returns fact columns + dim columns, salt dropped.
    """
    hashable = [
        f_.name
        for f_ in fact.schema.fields
        if not isinstance(f_.dataType, T.MapType)
        and (salt_cols is None or f_.name in salt_cols)
    ] or [fact_key]
    f = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(num_salts)).cast(
            "int"
        ),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
        how,
    )
    return out.drop("__salt")


def explain_skew(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts of the heaviest keys — run this on
    a sample before choosing broadcast / salting / AQE-only."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top_n)
    )


def skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Hot-key report: the ``top_n`` heaviest keys with their
    ``skew_factor`` (key rows / mean rows-per-key) — the number that
    decides the join strategy (factor ~1: plain shuffle join; tens:
    AQE skew split; hundreds+: salt or isolate the key).

    Scale shape: one key-keyed count agg, a 1-row mean broadcast back
    over the (already small) per-key counts, TakeOrderedAndProject
    top-k — no second scan of the data and no global sort."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    mean = counts.agg(F.avg("n_rows").alias("__mean"))
    return (
        counts.crossJoin(F.broadcast(mean))
        .select(
            key,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__mean"), 4).alias("skew_factor"),
        )
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top_n)
    )
