"""Copy-on-write partitioned publish — manifest versions that REUSE
unchanged partition directories across versions.

The plain versioned publish (catalog/publish.py) lands a COMPLETE
dataset per version: perfect for bounded outputs, but a derived view
with many key-groups pays |dataset| write cost per refresh even when a
delta touched one partition.  The table-format answer (Iceberg/Delta
do this at file granularity) is a MANIFEST version: each version
directory holds parquet data ONLY for the partitions that changed,
plus a manifest mapping every live partition to the version directory
that actually holds its current data — unchanged partitions keep
pointing at their prior version's immutable files.  A refresh then
costs |touched partitions| in both read and write, independent of the
dataset's total size; that is what makes a 100 TB derived view with
millions of groups maintainable per-delta.

Everything rides the EXISTING publish protocol — a cow version lands
through ``publish_dir`` (same write order: payload -> manifest ->
COMMITTED -> atomic pointer flip; crashed partials swept; time travel
free), and retention rides the EXISTING pin-aware vacuum:
:func:`vacuum_cow` computes the version numbers any RETAINED manifest
still references and passes them as the ``protect=`` set, so a version
directory whose files a live manifest points into is never evicted,
however old.

Layout::

    root/v=3/_spectrify_cow_manifest.json   # part key -> "v=1|v=3"
    root/v=3/p=<enc>/part-*.parquet         # only CHANGED partitions
    root/v=1/p=<enc>/part-*.parquet         # still referenced by v=3

The partition column's VALUE stays in the parquet rows (no Hive
directory encoding, no re-attach on read); the directory name is an
url-safe encoding of the value, used only for addressing.  Readers
resolve the pointer, read ONE manifest, and scan the referenced
immutable directories — optionally only a subset of partitions
(:func:`read_published_cow` ``partitions=``), which is manifest-level
partition pruning: untouched partitions' files are never even listed.

Single writer per root (the publish lock applies, as everywhere).
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame, functions as F

#: per-version manifest: {"schema": <json>, "parts": {enc: "v=K"}}
COW_MANIFEST = "_spectrify_cow_manifest.json"


def _enc_part(value) -> str:
    """Url-safe, collision-free directory token for a partition value
    (json round-trip -> urlsafe base64, padding stripped).  NULL is a
    legal partition value and encodes as JSON ``null``."""
    raw = json.dumps(value, sort_keys=True, default=str).encode()
    return base64.urlsafe_b64encode(raw).decode().rstrip("=")


def _dec_part(enc: str):
    pad = "=" * (-len(enc) % 4)
    return json.loads(base64.urlsafe_b64decode(enc + pad))


def _read_manifest(spark, root: str, version: "int | None" = None) -> dict:
    from spectrify_spark.catalog.publish import (
        _join,
        current_version,
        _check_time_travel_target,
    )
    from spectrify_spark.operators._sidecar import read_json_sidecar

    v = current_version(root, spark) if version is None else int(version)
    if v is None:
        raise FileNotFoundError(
            f"read_published_cow: nothing published at {root!r}"
        )
    if version is not None:
        _check_time_travel_target("read_published_cow", root, v, spark)
    m = read_json_sidecar(spark, _join(root, f"v={v}"), COW_MANIFEST)
    if m is None:
        raise FileNotFoundError(
            f"{root!r} v={v} carries no {COW_MANIFEST} — not a "
            "copy-on-write dataset (plain published datasets read via "
            "read_published)"
        )
    return m


def publish_cow_update(
    spark,
    root: str,
    updates: "DataFrame | None",
    part_col: str,
    drop_partitions: "list | None" = None,
    keep_versions: int = 2,
) -> int:
    """Land the next copy-on-write version: ``updates`` holds the FULL
    new content of every partition value it contains (grouped by
    ``part_col``); partitions absent from ``updates`` carry over from
    the current manifest untouched — their files are never read,
    listed, or rewritten.  ``drop_partitions`` removes partitions from
    the manifest (their files age out with the versions that hold
    them).  Returns the new version number.

    Write cost: |touched partitions| data + one manifest JSON; the
    pointer flip publishes the whole new mapping atomically.  The
    manifest is driver-side state sized |partitions| — the same order
    as a table format's manifest list; beyond ~10^6 partitions use a
    coarser partition key."""
    from spectrify_spark.catalog.publish import (
        _publish_version,
        current_version,
    )
    from spectrify_spark.operators._sidecar import write_json_sidecar

    if updates is None and not drop_partitions:
        raise ValueError(
            "publish_cow_update: nothing to do (no updates, no drops)"
        )
    if updates is not None and part_col not in updates.columns:
        raise ValueError(
            f"publish_cow_update: partition column {part_col!r} not in "
            f"updates columns {updates.columns}"
        )

    cur = current_version(root, spark)
    if cur is not None:
        prior = _read_manifest(spark, root)
        parts: dict = dict(prior["parts"])
        schema_json = prior["schema"]
        prior_part_col = prior.get("part_col", part_col)
        if prior_part_col != part_col:
            raise ValueError(
                f"publish_cow_update: dataset is partitioned by "
                f"{prior_part_col!r}, not {part_col!r}"
            )
    else:
        parts = {}
        schema_json = None

    for value in drop_partitions or ():
        parts.pop(_enc_part(value), None)

    touched: list = []
    if updates is not None:
        touched = [
            r[0]
            for r in updates.select(part_col).distinct().collect()
        ]
        schema_json = updates.schema.jsonValue()
        if schema_json is None:
            raise AssertionError  # unreachable; keeps type checkers calm

    def build(vdir: str) -> None:
        vname = vdir.rstrip("/").rsplit("/", 1)[-1]  # "v=N"
        for value in touched:
            enc = _enc_part(value)
            pdf = updates.filter(
                F.col(part_col).eqNullSafe(F.lit(value))
            )
            pdf.write.mode("overwrite").parquet(f"{vdir}/p={enc}")
            parts[enc] = vname
        write_json_sidecar(
            spark,
            vdir,
            COW_MANIFEST,
            {
                "schema": schema_json,
                "part_col": part_col,
                "parts": parts,
            },
        )

    return _publish_version(
        root, spark, build, keep_versions, caller="publish_cow_update"
    )


def read_published_cow(
    spark,
    root: str,
    version: "int | None" = None,
    partitions: "list | None" = None,
) -> DataFrame:
    """Scan a copy-on-write dataset: resolve the pointer, read ONE
    manifest, union the referenced immutable partition directories.
    ``partitions`` restricts the scan to those partition values —
    manifest-level pruning: unreferenced partitions' files are never
    listed, the cheapest possible partition filter.  An empty (or
    fully pruned) dataset returns an empty frame in the recorded
    schema."""
    from spectrify_spark.catalog.publish import _join
    from pyspark.sql.types import StructType

    m = _read_manifest(spark, root, version=version)
    parts = m["parts"]
    if partitions is not None:
        want = {_enc_part(v) for v in partitions}
        parts = {e: vd for e, vd in parts.items() if e in want}
    dirs = [_join(root, f"{vd}/p={e}") for e, vd in sorted(parts.items())]
    if not dirs:
        schema = StructType.fromJson(m["schema"]) if m["schema"] else None
        if schema is None:
            raise FileNotFoundError(
                f"read_published_cow: {root!r} is empty and carries no "
                "schema"
            )
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*dirs)


def cow_partitions(spark, root: str, version: "int | None" = None) -> list:
    """The live partition VALUES of a cow dataset (decoded from the
    manifest — no file listing)."""
    m = _read_manifest(spark, root, version=version)
    return sorted(
        (_dec_part(e) for e in m["parts"]),
        key=lambda v: (v is None, str(v)),
    )


def cow_referenced_versions(
    spark, root: str, retained_only: bool = True
) -> "set[int]":
    """Version numbers any (retained) manifest still references — the
    set a vacuum must not evict.  Driver-side JSON reads, bounded by
    |versions| x |partitions|."""
    from spectrify_spark.catalog.publish import (
        _is_committed_or_legacy,
        _versions,
    )

    refs: set[int] = set()
    for v in _versions(root, spark):
        if retained_only and not _is_committed_or_legacy(root, v, spark):
            continue
        try:
            m = _read_manifest(spark, root, version=v)
        except FileNotFoundError:
            continue
        for vd in m["parts"].values():
            refs.add(int(vd[2:]))
    return refs


def vacuum_cow(
    root: str, keep_versions: int = 2, spark=None
) -> list[int]:
    """Retention for copy-on-write datasets: the ordinary keep window
    applies to MANIFEST versions, but a version directory whose files
    a retained manifest still references must survive however old —
    exactly the pin-aware vacuum's ``protect=`` contract, so this is a
    thin composition: compute the referenced set, hand it to
    :func:`catalog.publish.vacuum`.  First the keep window trims old
    manifests; the reference set is computed from the manifests that
    REMAIN, so fully-superseded data versions age out naturally on
    the next call once no retained manifest names them."""
    from spectrify_spark.catalog.publish import vacuum

    # pass 1: ordinary window, protecting everything currently
    # referenced (by ANY committed manifest, retained or not — a
    # manifest inside the window may reference an old data version)
    refs = cow_referenced_versions(spark, root)
    removed = vacuum(
        root, keep_versions=keep_versions, spark=spark, protect=refs
    )
    # pass 2: manifests outside the window are gone now — recompute
    # references from the survivors and reclaim newly-unreferenced
    # data versions that sit outside the window
    refs2 = cow_referenced_versions(spark, root)
    removed += vacuum(
        root, keep_versions=keep_versions, spark=spark, protect=refs2
    )
    return sorted(set(removed))
