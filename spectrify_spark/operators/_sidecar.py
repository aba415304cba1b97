"""JSON sidecar IO for materialized index directories.

Both incremental-index families (the MinHash band index in
:mod:`spectrify_spark.operators.dedup` and the IVF embedding index in
:mod:`spectrify_spark.operators.similarity`) persist their build
parameters next to the data so later probes default/validate against
what the index was ACTUALLY built with.  Files start with an
underscore, so Spark's parquet reader ignores them (the _SUCCESS /
_metadata convention); IO goes through the Hadoop FileSystem API, so
any scheme Spark can reach works (local, HDFS, S3A).
"""

from __future__ import annotations


def index_fs(spark, path: str):
    """(Hadoop FileSystem, Path, jvm) for ``path``."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def write_json_sidecar(spark, path: str, filename: str, payload) -> None:
    """Write ``payload`` as JSON to ``<path>/<filename>`` (overwrite)."""
    import json

    fs, _, jvm = index_fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path, filename), True)
    try:
        out.write(bytearray(json.dumps(payload, sort_keys=True).encode()))
    finally:
        out.close()


def read_json_sidecar(spark, path: str, filename: str):
    """Load ``<path>/<filename>`` as JSON, or None if absent."""
    import json

    fs, _, jvm = index_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path, filename)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode())


def copy_sidecars(spark, src: str, dst: str) -> list[str]:
    """Copy every ``_spectrify_*.json`` sidecar from ``src`` to ``dst``
    (overwrite), returning the copied filenames.

    Maintenance operations that rewrite an index directory (compaction,
    relocation) must carry ALL model/parameter sidecars, not the one
    their own index family knows about — an IVF-PQ index compacted by
    a helper that only copies the IVF centroid sidecar loses its PQ
    model and every later probe fails on the new directory.
    """
    import json

    fs, spath, jvm = index_fs(spark, src)
    copied = []
    for status in fs.listStatus(spath):
        name = status.getPath().getName()
        if not (name.startswith("_spectrify_") and name.endswith(".json")):
            continue
        stream = fs.open(status.getPath())
        try:
            data = bytes(stream.readAllBytes())
        finally:
            stream.close()
        payload = json.loads(data.decode())
        write_json_sidecar(spark, dst, name, payload)
        copied.append(name)
    return copied
