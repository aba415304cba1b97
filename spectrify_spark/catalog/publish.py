"""Versioned atomic dataset publishing — the pointer-flip pattern.

The reference pipeline's output contract is "overwrite the S3 prefix,
then repoint the external table" (reference spectrify/transform.py:
export -> convert -> create); at 100 TB that window between landing
files and repointing is a correctness hole: a reader mid-scan sees a
half-written dataset.  The CDC snapshot sink (streaming/cdc.py) closes
it with a directory rename-swap, which still un-links a directory a
reader may be scanning.  This module is the stronger, simpler
protocol table formats use under the hood:

- every publish lands a COMPLETE new version directory ``v=N``
  (immutable once the pointer flips — never rewritten, never renamed);
- a tiny pointer file (``_spectrify_current.json``) is then replaced
  ATOMICALLY (``os.replace`` locally; the same pattern is a
  single-object PUT on S3, which is atomic per object);
- readers resolve the pointer first and scan an immutable directory —
  they can never observe a partial write, and a long-running scan of
  version N is undisturbed by the publish of N+1;
- old versions are vacuumed only after ``keep_versions`` newer ones
  exist, giving in-flight readers a grace window plus free time
  travel (``read_published(version=...)``).

Single-writer contract: concurrent publishers would race the version
counter; serialize publishes per dataset (the same contract as the
reference's overwrite-in-place, minus the data loss).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

#: underscore prefix keeps the pointer invisible to any parquet scan
CURRENT_POINTER = "_spectrify_current.json"


def _versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def current_version(root: str) -> int | None:
    """The published version the pointer names, or None if nothing has
    been published yet (landed-but-unflipped version dirs don't
    count — that is the point)."""
    ptr = os.path.join(root, CURRENT_POINTER)
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as fh:
        return int(json.load(fh)["version"])


def publish(
    df: DataFrame,
    root: str,
    partition_by: list[str] | None = None,
    keep_versions: int = 2,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Land ``df`` as the next version of the dataset at ``root`` and
    flip the pointer atomically; returns the new version number.

    The write order IS the protocol: (1) the full version directory
    lands (crash here leaves an orphan ``v=N`` the next publish reuses
    numbering past and vacuum removes — readers never saw it); (2) the
    version's skipping indexes build, if requested; (3) the pointer is
    written to a temp name and ``os.replace``d over the live one
    (atomic on POSIX); (4) versions older than the newest
    ``keep_versions`` are vacuumed.

    ``stats_cols`` / ``bloom_cols`` build the file-skipping indexes
    (``layout.write_file_stats`` / ``write_file_bloom``) INSIDE the
    version directory BEFORE the flip — a published version arrives
    pre-indexed, and because versions are immutable the indexes can
    never go stale (the conservative-staleness machinery still guards
    hand-modified dirs).
    """
    if keep_versions < 1:
        raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
    # overlap guard (the compact_* lesson): publishing a dataset INTO a
    # directory it is being read from would land v=N inside the source
    # — every later plain scan discovers v=N as a partition and returns
    # duplicated rows, and vacuum could delete source data
    import re

    root_abs = os.path.realpath(root)
    src_dirs = {
        os.path.dirname(os.path.realpath(re.sub(r"^file:/+", "/", f)))
        for f in df.inputFiles()
        if "://" not in re.sub(r"^file:/+", "/", f)
    }
    for d in src_dirs:
        # reading FROM root/v=N and publishing v=N+1 into the same root
        # is the legitimate incremental-republish pattern (v=N is
        # immutable; only the keep window can remove it later) — what
        # corrupts data is a source that IS root, or that CONTAINS
        # root: v=N would land inside a directory plain scans read as a
        # whole and be discovered as a phantom partition
        if d == root_abs or root_abs.startswith(d + os.sep):
            raise ValueError(
                f"publish: dataset root {root!r} is (or is inside) the "
                f"DataFrame's own source directory {d!r} — landing a "
                "v=N version inside the source corrupts it; publish to "
                "a sibling path"
            )
    os.makedirs(root, exist_ok=True)
    n = max(_versions(root), default=0) + 1
    vdir = os.path.join(root, f"v={n}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vdir)
    if stats_cols:
        from spectrify_spark.operators.layout import write_file_stats

        write_file_stats(df.sparkSession, vdir, stats_cols)
    if bloom_cols:
        from spectrify_spark.operators.layout import write_file_bloom

        write_file_bloom(df.sparkSession, vdir, bloom_cols)
    tmp = os.path.join(root, f".{CURRENT_POINTER}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": n}, fh)
    os.replace(tmp, os.path.join(root, CURRENT_POINTER))
    vacuum(root, keep_versions=keep_versions)
    return n


def current_path(root: str) -> str:
    """Filesystem path of the pointed version — the value to hand to
    the skipping-index probes (``layout.pruned_scan(spark,
    current_path(root), ...)``) or any external reader."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"current_path: nothing published at {root!r}")
    return os.path.join(root, f"v={v}")


def read_published(spark, root: str, version: int | None = None) -> DataFrame:
    """Scan a published version (default: the one the pointer names).
    Resolving the pointer BEFORE the scan is what makes readers immune
    to concurrent publishes — the resolved directory is immutable."""
    v = current_version(root) if version is None else int(version)
    if v is None:
        raise FileNotFoundError(f"read_published: nothing published at {root!r}")
    vdir = os.path.join(root, f"v={v}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"read_published: version {v} not found at {root!r} "
            f"(have {_versions(root)}; it may have been vacuumed)"
        )
    return spark.read.parquet(vdir)


def vacuum(root: str, keep_versions: int = 2) -> list[int]:
    """Remove version directories older than the newest
    ``keep_versions``, never the pointed one; returns the removed
    version numbers.  Orphans from crashed publishes (landed, never
    pointed) age out the same way."""
    cur = current_version(root)
    vs = _versions(root)
    keep = set(vs[-keep_versions:]) | ({cur} if cur is not None else set())
    removed = []
    for v in vs:
        if v not in keep:
            shutil.rmtree(os.path.join(root, f"v={v}"), ignore_errors=True)
            removed.append(v)
    return removed
