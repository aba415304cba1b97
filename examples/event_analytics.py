"""Event analytics: funnel + retention + sessionization in one script.

    python examples/event_analytics.py /root/testdata/sf0.001
"""

from __future__ import annotations

import sys

from spectrify_spark.operators.sessionize import (
    cohort_retention,
    funnel_first_conversion,
    session_stats,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table


def main(sf_dir: str) -> None:
    spark = get_spark("analytics-example")
    events = read_table(spark, f"{sf_dir}/events.parquet")

    print("== signup -> click -> purchase conversions ==")
    funnel = funnel_first_conversion(events, ["signup", "click", "purchase"])
    print(f"{funnel.count()} converting users")

    print("== daily cohort retention (first 10 cells) ==")
    cohort_retention(events, period="day").orderBy(
        "cohort", "period_offset"
    ).show(10, truncate=False)

    print("== session stats (30-minute gap) ==")
    session_stats(events, gap_seconds=1800).orderBy(
        "user_id", "session_id"
    ).show(5, truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
