"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` builds a bare SparkSession (no engine session factory) —
the driver's actual environment.  The engine's read path must carry its
own conventions (NTZ inference off, nanos handling) for this to pass;
the r4 round failed exactly here, so run the window keys vanilla before
each round ends.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from spectrify_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def hash_rows(cols: list[str], rows: list[tuple]) -> str:
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; make_sf.py rehearsal
        # dirs are Spark-written directories -> glob the part files
        import os

        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    n_ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_ran += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(rows)} rows ({dt:.1f}s)")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [c for c in ores.columns]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} duckdb={len(orows)}")
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols spark={sorted(cols)} duckdb={sorted(ocols)}")
        if not problems:
            hs, ho = hash_rows(cols, rows), hash_rows(ocols, orows)
            if hs != ho:
                problems.append(f"hash spark={hs} duckdb={ho}")
                # show a sample diff
                sdict = {}
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                sset = {"|".join(norm_cell(r[i]) for i in order) for r in rows}
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = {"|".join(norm_cell(r[i]) for i in oorder) for r in orows}
                for x in list(sset - oset)[:2]:
                    problems.append(f"  spark-only: {x[:160]}")
                for x in list(oset - sset)[:2]:
                    problems.append(f"  duck-only:  {x[:160]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(rows)} rows match ({dt:.1f}s)")
    print(f"\n{n_ran - len(failures)}/{n_ran} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
