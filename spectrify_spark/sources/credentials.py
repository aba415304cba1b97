"""Cloud-storage credential plumbing — the Spark-side equivalent of
the reference's AWS credential/region injection.

The reference resolves AWS credentials via a boto session and splices
them into the UNLOAD/COPY SQL as a CREDENTIALS/REGION clause
(reference spectrify/export.py:36-53 ``get_credentials``; connection
parameters from env/flags/prompt in reference utils/redshift.py:4-27).
Spark's equivalent is Hadoop S3A configuration: the same three values
(access key, secret, optional session token) plus region land in
``fs.s3a.*`` keys, and every ``s3a://`` read/write in the engine —
manifest scans, CSV exports, parquet sinks — picks them up.  Only
public Hadoop S3A configuration keys are used
(hadoop.apache.org/docs/stable/hadoop-aws/tools/hadoop-aws).

Two application points, matching how Spark consumes Hadoop conf:

- at session build: pass the dict to ``get_spark(extra_conf=...)``
  with keys prefixed ``spark.hadoop.`` (:func:`as_spark_conf`);
- on a live session: :func:`apply_to_session` sets the keys on the
  JVM ``hadoopConfiguration`` directly (new reads see them; no
  restart).
"""

from __future__ import annotations

import os
from collections.abc import Mapping

#: standard AWS environment variables -> S3A configuration keys
_ENV_TO_S3A = {
    "AWS_ACCESS_KEY_ID": "fs.s3a.access.key",
    "AWS_SECRET_ACCESS_KEY": "fs.s3a.secret.key",
    "AWS_SESSION_TOKEN": "fs.s3a.session.token",
}


def s3a_conf(
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    region: str | None = None,
    endpoint: str | None = None,
) -> dict[str, str]:
    """Hadoop S3A configuration dict for explicit credentials.

    A session token switches the credential provider to
    ``TemporaryAWSCredentialsProvider`` (the S3A provider that reads
    all three values), mirroring the reference's token handling in its
    CREDENTIALS clause (reference spectrify/export.py:45-50).
    ``region`` maps to ``fs.s3a.endpoint.region`` — the reference's
    REGION clause (reference spectrify/export.py:52-53).
    """
    conf: dict[str, str] = {}
    if access_key:
        conf["fs.s3a.access.key"] = access_key
    if secret_key:
        conf["fs.s3a.secret.key"] = secret_key
    if session_token:
        conf["fs.s3a.session.token"] = session_token
        conf["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )
    if region:
        conf["fs.s3a.endpoint.region"] = region
    if endpoint:
        conf["fs.s3a.endpoint"] = endpoint
    return conf


def s3a_conf_from_env(env: Mapping[str, str] | None = None) -> dict[str, str]:
    """Resolve the standard AWS environment variables into S3A conf —
    the env half of the reference's env/flag/prompt resolution order
    (reference utils/redshift.py:4-27)."""
    env = os.environ if env is None else env
    conf = s3a_conf(
        access_key=env.get("AWS_ACCESS_KEY_ID"),
        secret_key=env.get("AWS_SECRET_ACCESS_KEY"),
        session_token=env.get("AWS_SESSION_TOKEN"),
        region=env.get("AWS_DEFAULT_REGION") or env.get("AWS_REGION"),
    )
    return conf


def as_spark_conf(hadoop_conf: Mapping[str, str]) -> dict[str, str]:
    """Prefix Hadoop keys with ``spark.hadoop.`` for use at session
    build time (``get_spark(extra_conf=as_spark_conf(...))``)."""
    return {f"spark.hadoop.{k}": v for k, v in hadoop_conf.items()}


def apply_to_session(spark, hadoop_conf: Mapping[str, str]) -> None:
    """Set Hadoop conf keys on a LIVE session's JVM configuration;
    subsequent reads/writes (new RDD/scan creation) observe them."""
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in hadoop_conf.items():
        jconf.set(k, v)


__all__ = [
    "s3a_conf",
    "s3a_conf_from_env",
    "as_spark_conf",
    "apply_to_session",
]
