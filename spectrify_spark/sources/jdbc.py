"""JDBC source wrapper — Spark-native replacement for the reference's
export stage (reference spectrify/export.py:10-34): instead of asking
Redshift to UNLOAD CSV to S3 and re-parsing it, Spark reads the table
over JDBC into a typed DataFrame directly; predicates and column
projection push into the remote scan via Catalyst (the reference could
only do this by hand-editing the UNLOAD SQL — reference
examples/weekly_partitions.py:77-104).

Integration-tested against a real JDBC endpoint — embedded Apache
Derby, which ships in Spark's jars — in tests/test_jdbc_integration.py:
plain/partitioned/predicate reads plus the full transform() pipeline
from a JDBC source.  The read path itself is the stock
``spark.read.jdbc`` and needs no custom code to be correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicate: str | None = None,
    **options: str,
) -> DataFrame:
    """Read a remote table over JDBC.

    ``partition_column``/bounds/``num_partitions`` shard the remote scan
    into parallel range queries — the scale path for multi-GB source
    tables (the reference's equivalent knob was UNLOAD's implicit
    slice-parallel write).  ``predicate`` is applied as a ``.filter`` so
    Catalyst pushes it into the generated remote SQL (WHERE pushdown,
    parity with reference examples/weekly_partitions.py:85-87).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if predicate:
        df = df.filter(predicate)
    return df


#: flag -> environment-variable fallback, mirroring the reference CLI's
#: click ``envvar=`` bindings (reference spectrify/main.py:17-21)
_CONN_ENV = {
    "host": "REDSHIFT_HOST",
    "port": "REDSHIFT_PORT",
    "user": "REDSHIFT_USER",
    "password": "REDSHIFT_PASSWORD",
    "db": "REDSHIFT_DB",
}

#: reference defaults (spectrify/main.py:17-19); password and db have
#: none — password prompts, db is required
_CONN_DEFAULTS = {"host": "localhost", "port": "5439", "user": "redshift"}


def resolve_connection(
    flags: dict | None = None,
    env: "dict | None" = None,
    prompt=None,
) -> dict:
    """Resolve JDBC connection parameters the way the reference CLI
    does (reference spectrify/main.py:16-26 + utils/redshift.py:4-14):
    flag -> ``REDSHIFT_*`` env var -> default, and — for the PASSWORD
    only — an interactive hidden prompt when still missing (click's
    ``prompt=True, hide_input=True`` on ``--password``).  A missing
    ``db`` has no prompt in the reference either: it raises.

    ``prompt`` is the zero-arg callable used for the password (default
    ``getpass.getpass`` — hidden input); pass a fake in tests.  Returns
    ``{host, port, user, password, db}`` with every value a string.
    """
    import os

    flags = flags or {}
    env = os.environ if env is None else env
    out: dict[str, str] = {}
    for key in ("host", "port", "user", "password", "db"):
        val = flags.get(key)
        if val is None or val == "":
            val = env.get(_CONN_ENV[key]) or _CONN_DEFAULTS.get(key)
        if val is not None:
            out[key] = str(val)
    if "password" not in out:
        if prompt is None:
            import getpass

            prompt = lambda: getpass.getpass("Password: ")  # noqa: E731
        out["password"] = str(prompt())
    if not out.get("db"):
        raise ValueError(
            "db is required (flag --db or REDSHIFT_DB)"
        )  # reference utils/redshift.py:10 wording: '{} is required'
    return out


def connection_url(params: dict, scheme: str = "postgresql") -> str:
    """JDBC URL from resolved connection parameters —
    ``jdbc:postgresql://host:port/db`` (Redshift speaks the postgres
    wire protocol; the reference builds the SQLAlchemy twin of this
    string at utils/redshift.py:19-25).  Credentials are NOT embedded:
    pass them as reader options so they stay out of logs and plans."""
    return f"jdbc:{scheme}://{params['host']}:{params['port']}/{params['db']}"


def jdbc_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Pure option-dict builder (unit-testable without a JDBC endpoint)."""
    opts = {"url": url, "dbtable": table}
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions or 8),
        )
    return opts
