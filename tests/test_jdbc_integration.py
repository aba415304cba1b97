"""JDBC integration: O1/O2's export leg against a REAL JDBC endpoint
(embedded Apache Derby, which ships in Spark's jars), not just parquet
fixtures.

The reference's export stage asks Redshift to UNLOAD to CSV
(reference spectrify/export.py:10-34); our replacement reads the
source table over JDBC directly.  These tests stand up a Derby
database in-process, load it over JDBC, then drive:

- sources.jdbc.read_table plain, partitioned (numPartitions range
  shards), and with a pushed predicate;
- transform.transform end-to-end: JDBC source -> schema whitelist ->
  parquet -> external table -> SQL query, one lineage.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spectrify_spark.sources import jdbc as jdbc_src

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("Derby driver not on the JVM classpath")
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    # seed a source table through Spark's own JDBC writer — Derby's
    # dialect maps the types; ints/doubles/short varchars round-trip
    src = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 7).cast("int").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
        F.concat(F.lit("name_"), F.col("id").cast("string")).alias("name"),
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "SRC")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_read_roundtrip(spark, derby_url):
    df = jdbc_src.read_table(spark, derby_url, "SRC", driver=DRIVER)
    assert df.count() == 1000
    assert {c.lower() for c in df.columns} == {"k", "grp", "val", "name"}


def test_jdbc_partitioned_read_shards_range(spark, derby_url):
    """partitionColumn/bounds split the remote scan into parallel range
    queries — the multi-GB-source scale path.  Shard count must show in
    the RDD and rows must neither drop nor duplicate across shards."""
    df = jdbc_src.read_table(
        spark,
        derby_url,
        "SRC",
        partition_column="K",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        driver=DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.select("K").distinct().count() == 1000


def test_jdbc_predicate_reaches_remote_scan(spark, derby_url):
    df = jdbc_src.read_table(
        spark, derby_url, "SRC", predicate="grp = 3", driver=DRIVER
    )
    rows = df.count()
    assert rows == 143  # ids 3,10,...,997
    # the filter must be pushed into the JDBC relation (remote WHERE),
    # not applied Spark-side after a full-table fetch
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GRP" in plan.upper()


def test_transform_from_jdbc_source_end_to_end(spark, derby_url, tmp_path):
    """The reference's 3-stage transform (export -> convert -> create,
    reference spectrify/transform.py:9-41) as ONE lineage from a real
    JDBC source: read SRC over JDBC, land gzip parquet, register the
    external table, and query it back."""
    from spectrify_spark.transform import transform

    df = jdbc_src.read_table(spark, derby_url, "SRC", driver=DRIVER)
    out = tmp_path / "jdbc_pq"
    table = "jdbc_e2e_src"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ddl = transform(spark, df, table, str(out))
    assert "CREATE EXTERNAL TABLE" in ddl.upper() or "USING PARQUET" in ddl.upper()
    got = spark.sql(
        f"SELECT COUNT(*) AS n, SUM(GRP) AS s FROM {table}"
    ).collect()[0]
    assert got["n"] == 1000
    # sum(grp) over ids 0..999 with grp = id % 7
    assert got["s"] == sum(i % 7 for i in range(1000))
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ------------------------------------------ connection-parameter parity


def test_resolve_connection_flag_env_default_precedence():
    """Reference CLI semantics (spectrify/main.py:16-26): flag beats
    env beats default; db never defaults."""
    flags = {"host": "h1", "port": None, "user": None, "password": "pw", "db": "d"}
    env = {"REDSHIFT_PORT": "5555", "REDSHIFT_USER": "eve"}
    got = jdbc_src.resolve_connection(flags, env=env)
    assert got == {
        "host": "h1",       # flag wins
        "port": "5555",     # env beats the 5439 default
        "user": "eve",      # env beats the 'redshift' default
        "password": "pw",
        "db": "d",
    }
    # defaults when neither flag nor env present
    got = jdbc_src.resolve_connection({"password": "x", "db": "d"}, env={})
    assert (got["host"], got["port"], got["user"]) == ("localhost", "5439", "redshift")


def test_resolve_connection_prompts_only_for_missing_password():
    """The hidden prompt fires IFF the password resolved to nothing —
    click's prompt=True behavior on --password (reference main.py:20)."""
    calls = []

    def fake_prompt():
        calls.append(1)
        return "secret"

    got = jdbc_src.resolve_connection({"db": "d"}, env={}, prompt=fake_prompt)
    assert got["password"] == "secret" and calls == [1]
    # present password (flag or env): no prompt
    jdbc_src.resolve_connection({"db": "d", "password": "p"}, env={}, prompt=fake_prompt)
    jdbc_src.resolve_connection(
        {"db": "d"}, env={"REDSHIFT_PASSWORD": "p"}, prompt=fake_prompt
    )
    assert calls == [1]


def test_resolve_connection_requires_db():
    """db has no prompt in the reference either — it raises
    (utils/redshift.py:10 '{} is required')."""
    with pytest.raises(ValueError, match="db is required"):
        jdbc_src.resolve_connection({"password": "p"}, env={})


def test_connection_url_golden():
    params = {"host": "rs.example", "port": "5439", "user": "u",
              "password": "p", "db": "analytics"}
    assert (
        jdbc_src.connection_url(params)
        == "jdbc:postgresql://rs.example:5439/analytics"
    )
    # credentials are NOT embedded in the URL
    assert "p" != jdbc_src.connection_url(params).split("/")[-1]


def test_cli_export_jdbc_roundtrip(spark, derby_url, tmp_path):
    """The export-jdbc command end-to-end against embedded Derby: live
    table -> UNLOAD-convention gzip CSV + manifest."""
    import json

    from spectrify_spark.cli import main

    out = tmp_path / "csv"
    rc = main([
        "export-jdbc", "SRC", str(out),
        "--jdbc-url", derby_url, "--driver", DRIVER,
    ])
    assert rc in (0, None)
    manifest = json.load(open(out / "manifest"))
    assert manifest["entries"]
    import duckdb

    n = duckdb.sql(
        f"select count(*) from read_csv('{out}/*.csv.gz', delim='|', header=false)"
    ).fetchone()[0]
    assert n == 1000
