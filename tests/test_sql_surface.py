"""Raw-SQL entry point + streaming convert tests."""

from pyspark.sql import types as T

from spectrify_spark.catalog.register import register_tables, sql
from spectrify_spark.sources.csv import write_unload_csv
from spectrify_spark.streaming.events import stream_convert_csv


def test_register_and_sql(spark, sf_dir):
    register_tables(spark, sf_dir)
    out = sql(
        spark,
        """SELECT l_returnflag, count(*) AS n
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY l_returnflag""",
    ).collect()
    assert {r.l_returnflag for r in out} == {"A", "N", "R"}
    # events view must carry the nanos->micros conversion
    ts = sql(spark, "SELECT max(ts) AS m FROM events").collect()[0].m
    assert ts.year == 2024


def test_stream_convert_csv(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    src = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], schema)
    csv_dir = str(tmp_path / "csv")
    write_unload_csv(src, csv_dir)
    q = stream_convert_csv(
        spark,
        csv_dir,
        schema,
        str(tmp_path / "pq"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    back = spark.read.parquet(str(tmp_path / "pq"))
    assert back.count() == 3
    assert back.schema == schema
    # exactly-once: a second availableNow run adds nothing new
    q2 = stream_convert_csv(
        spark, csv_dir, schema, str(tmp_path / "pq"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "pq")).count() == 3
    # incremental resume: NEW shards landing later are converted from
    # the same checkpoint — old shards are not reprocessed, new rows
    # appear exactly once (the cron-replacement contract)
    import glob
    import shutil

    late = spark.createDataFrame([(4, "d"), (5, "e")], schema)
    late_dir = str(tmp_path / "late")
    write_unload_csv(late, late_dir)
    for i, f in enumerate(sorted(glob.glob(f"{late_dir}/*.csv.gz"))):
        shutil.copy(f, f"{csv_dir}/late-{i:04d}.csv.gz")
    q3 = stream_convert_csv(
        spark, csv_dir, schema, str(tmp_path / "pq"), str(tmp_path / "ckpt")
    )
    q3.awaitTermination(120)
    back3 = spark.read.parquet(str(tmp_path / "pq"))
    assert back3.count() == 5
    assert sorted(
        r.id for r in back3.select("id").collect()
    ) == [1, 2, 3, 4, 5]
