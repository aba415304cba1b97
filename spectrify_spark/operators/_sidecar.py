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


#: schemes whose FileContext rename-OVERWRITE is a metadata-atomic
#: in-place swap: ONLY Hdfs overrides AbstractFileSystem.renameInternal
#: with a server-side atomic rename.  The arm is an ALLOWLIST, not a
#: capability probe, twice over: an object store with an
#: AbstractFileSystem binding configured (fs.AbstractFileSystem.s3a.impl
#: on several managed distros) would pass a getFileContext probe yet
#: implement rename as delete+copy, and even Hadoop's own LocalFs
#: inherits the DEFAULT renameInternal — delete dst, then rename —
#: which a concurrent-reader hammer test catches as a vanished pointer
#: (plus the checksum sidecar making it multi-file).  ``file:`` is
#: therefore handled by a plain POSIX ``os.replace`` instead.
_RENAME_ATOMIC_SCHEMES = frozenset(("hdfs",))


def replace_json_sidecar(spark, path: str, filename: str, payload) -> None:
    """REPLACE ``<path>/<filename>`` with no partially-written window.

    ``fs.create(..., overwrite=True)`` truncates the destination in
    place on HDFS and on Hadoop's local filesystems — a concurrent
    reader can observe an empty or partial object between the truncate
    and the close.  For live pointers (the versioned-publish
    ``_spectrify_current.json``) that window breaks the old-or-new
    contract, so on the rename-atomic schemes
    (:data:`_RENAME_ATOMIC_SCHEMES`) this helper writes a dot-prefixed
    temp object and renames over the destination via ``FileContext``
    with ``Options.Rename.OVERWRITE``; a rename failure there RAISES
    (after best-effort temp cleanup) rather than degrading to the
    truncating create.  Every other scheme takes the single-object
    create — the atomic visible-on-close PUT on object stores.  Plain
    sidecars only written before a directory becomes visible can keep
    using :func:`write_json_sidecar`.
    """
    import json

    import os

    fs, _, jvm = index_fs(spark, path)
    dst = jvm.org.apache.hadoop.fs.Path(path, filename)
    scheme = fs.getUri().getScheme() or ""
    if scheme == "file":
        # POSIX rename-over on the underlying local path — the only
        # truly atomic swap here (Hadoop LocalFs's FileContext rename
        # is delete-then-rename).  Any stale Hadoop checksum sidecar
        # from an earlier fs.create-based write must go first, or
        # checksummed readers would verify new bytes against the old
        # crc; removal is safe mid-sequence (a reader sees either the
        # old pair or a plain un-checksummed file).
        local = dst.toUri().getPath()
        crc = os.path.join(
            os.path.dirname(local), "." + os.path.basename(local) + ".crc"
        )
        # UNIQUE temp per write (r16): a fixed shared temp name lets
        # two racing writers truncate each other's in-progress temp,
        # atomically publishing an EMPTY document that crashes every
        # later reader — unique temps keep the final replace
        # last-writer-wins over two complete documents
        import uuid

        tmp_local = os.path.join(
            os.path.dirname(local),
            "." + os.path.basename(local)
            + f".{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp",
        )
        try:
            with open(tmp_local, "w") as fh:
                json.dump(payload, fh, sort_keys=True)
            if os.path.exists(crc):
                os.remove(crc)
            os.replace(tmp_local, local)
        except BaseException:
            try:
                os.remove(tmp_local)
            except OSError:
                pass
            raise
        return
    if scheme not in _RENAME_ATOMIC_SCHEMES:
        write_json_sidecar(spark, path, filename, payload)
        return
    data = bytearray(json.dumps(payload, sort_keys=True).encode())
    # unique temp per write — same two-writer truncation hazard as the
    # local arm above
    import uuid

    tmp = jvm.org.apache.hadoop.fs.Path(
        path, f".{filename}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    )
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri(), spark._jsc.hadoopConfiguration()
        )
        out = fs.create(tmp, True)
        try:
            out.write(data)
        finally:
            out.close()
        overwrite = spark._sc._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        overwrite[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, dst, overwrite)
    except Exception:
        try:
            fs.delete(tmp, False)
        except Exception:
            pass
        raise


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


def partitioned_read_schema(df_schema, partition_cols: list[str]) -> dict:
    """JSON-able schema of a ``partitionBy(partition_cols)`` parquet
    round trip of a frame with ``df_schema``: the data columns in
    their original order minus the partition columns, then the
    partition columns (keeping their ORIGINAL types — an explicit read
    schema makes Spark cast directory values to them).

    Index writers stamp this into their model sidecar (r17 opt round)
    so every later probe can pass ``.schema(...)`` instead of paying a
    schema-inference pass per read — one footer-read job per probe
    locally, a real object-store round trip at scale."""
    from pyspark.sql import types as T

    pset = set(partition_cols)
    fields = [f for f in df_schema.fields if f.name not in pset]
    by_name = {f.name: f for f in df_schema.fields}
    fields += [by_name[c] for c in partition_cols]
    return T.StructType(fields).jsonValue()


def schema_from_payload(payload):
    """``StructType`` for :func:`partitioned_read_schema`'s sidecar
    entry (``payload["read_schema"]``), or None when the sidecar
    predates it (probes fall back to inference)."""
    from pyspark.sql import types as T

    sch = (payload or {}).get("read_schema")
    return T.StructType.fromJson(sch) if sch else None


def read_indexed_parquet(spark, path: str, payload):
    """Read an index directory, skipping schema inference when the
    model sidecar carries the build-time read schema."""
    sch = schema_from_payload(payload)
    if sch is not None:
        return spark.read.schema(sch).parquet(path)
    return spark.read.parquet(path)


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
