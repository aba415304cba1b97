"""Column-expression casts reproducing the reference's string->typed
conversion semantics (reference spectrify/convert.py:40-79,134-144 and
spectrify/utils/timestamps.py) as Catalyst expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path.

The reference runs a pure-Python per-cell loop it itself calls
inefficient (convert.py:113-119); these expressions are its vectorized
replacement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nullify_empty(col: Column) -> Column:
    """Empty string -> NULL, any type's universal null encoding in the
    reference's CSV transport (reference spectrify/convert.py:140-141)."""
    return F.nullif(col, F.lit(""))


def parse_bool_tf(col: Column, strict: bool = True) -> Column:
    """Postgres-style ``'t'``/``'f'``/``''`` -> True/False/NULL.

    ``strict=True`` raises on any other value, matching the reference's
    ValueError (reference spectrify/convert.py:45-56); ``strict=False``
    maps unknowns to NULL (useful for exploratory loads).
    """
    base = (
        F.when(col == "t", F.lit(True))
        .when(col == "f", F.lit(False))
        .when(col.isNull() | (col == ""), F.lit(None).cast(T.BooleanType()))
    )
    if strict:
        return base.otherwise(
            F.raise_error(F.concat(F.lit("Unknown boolean value: "), col))
        )
    return base.otherwise(F.lit(None).cast(T.BooleanType()))


def parse_iso_timestamp(col: Column) -> Column:
    """ISO-8601 string -> timestamp (reference
    spectrify/utils/timestamps.py:22-32; ns there, µs here — Spark
    TimestampType is µs; see SURVEY §7.4 for the parity note)."""
    return F.to_timestamp(nullify_empty(col))


#: The shapes ciso8601 accepts (reference spectrify/utils/
#: timestamps.py:22-32): space or 'T' separator, optional fractional
#: seconds, optional UTC offset ('+HH:MM' via XXX, '+HHMM' via XX,
#: '+HH'/'Z' via X), reduced-precision forms (minute '12:00' and hour
#: '12'), and bare dates.  ISO-8601's comma fraction separator
#: ('12:00:00,123') is normalized to '.' before the chain (Java datetime
#: patterns can't express it).  Offset-carrying cells resolve to the
#: instant in the session timezone (pin UTC for oracle parity).
_LENIENT_TS_PATTERNS = (
    "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]",
    "yyyy-MM-dd HH:mm:ss[.SSSSSS]XXX",
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX",
    "yyyy-MM-dd HH:mm:ss[.SSSSSS]XX",
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XX",
    "yyyy-MM-dd HH:mm:ss[.SSSSSS]X",
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]X",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd'T'HH:mm",
    "yyyy-MM-dd HH:mmXXX",
    "yyyy-MM-dd'T'HH:mmXXX",
    "yyyy-MM-dd HH:mmXX",
    "yyyy-MM-dd'T'HH:mmXX",
    "yyyy-MM-dd HH:mmX",
    "yyyy-MM-dd'T'HH:mmX",
    "yyyy-MM-dd HH",
    "yyyy-MM-dd'T'HH",
    "yyyy-MM-dd",
)


def parse_timestamp_lenient(col: Column, strict: bool = False) -> Column:
    """ciso8601-equivalent lenient ISO-8601 parse as a try_to_timestamp
    fallback chain — each pattern is a Catalyst expression, so the whole
    chain stays JVM-side and short-circuits via coalesce.

    ``strict=True`` raises on a non-empty unparseable cell (the
    reference's ciso8601 ValueError); default maps it to NULL so loads
    keep going (pair with :func:`spectrify_spark.sources.csv.
    malformed_timestamp_counts` to audit how many cells fell through).
    """
    s = nullify_empty(col)
    # ISO-8601 allows ',' as the fraction separator; a comma is never
    # valid elsewhere in a timestamp cell, so the rewrite only turns
    # otherwise-unparseable cells parseable (error text keeps original).
    s_norm = F.regexp_replace(s, F.lit(","), F.lit("."))
    parsed = F.coalesce(
        *[F.try_to_timestamp(s_norm, F.lit(p)) for p in _LENIENT_TS_PATTERNS]
    )
    if strict:
        return (
            F.when(s.isNull(), F.lit(None).cast(T.TimestampType()))
            .when(parsed.isNotNull(), parsed)
            .otherwise(
                F.raise_error(F.concat(F.lit("Unparseable timestamp: "), s))
            )
        )
    return parsed


def parse_iso_date(col: Column) -> Column:
    """ISO-8601 date string -> date (reference
    spectrify/utils/timestamps.py:35-37)."""
    return F.to_date(nullify_empty(col))


def parse_decimal(col: Column, precision: int = 38, scale: int = 18) -> Column:
    """String -> decimal under the precision-38 cap (reference
    spectrify/convert.py:20-23)."""
    return nullify_empty(col).cast(T.DecimalType(precision, scale))


def typed_projection(df, columns: dict[str, Column]):
    """Apply a dict of name->expression as a single select — the engine's
    'typed projection' operator (reference spectrify/convert.py:134-144,
    one converter per column)."""
    return df.select(*[expr.alias(name) for name, expr in columns.items()])
