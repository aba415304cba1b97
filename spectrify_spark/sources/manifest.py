"""UNLOAD-style manifest read/write.

The reference consumes the JSON manifest Redshift UNLOAD writes —
``{"entries": [{"url": ...}, ...]}`` — as its work list (reference
spectrify/convert.py:97-99, 221-230) and points external CSV tables at
it (reference spectrify/create.py:134-143).  Spark schedules one task
per file split natively, so the manifest is only an interchange format
here: we can *read* one to get scan paths, and *write* one after a CSV
export so downstream Spectrum/Athena-style consumers still work.

Plain ``json`` + Hadoop-FS-agnostic paths; the manifest is tiny driver
metadata, never data.
"""

from __future__ import annotations

import glob
import json
import os


def read_manifest(path: str) -> list[str]:
    """Return the entry URLs of an UNLOAD manifest JSON file."""
    with open(path) as fh:
        doc = json.load(fh)
    return [e["url"] for e in doc.get("entries", [])]


def write_manifest(csv_dir: str, manifest_path: str | None = None) -> str:
    """Write a manifest listing every data file under ``csv_dir``.

    Mirrors the UNLOAD manifest contract the reference relies on; entry
    order is sorted for determinism.  Returns the manifest path
    (default: ``<csv_dir>/manifest`` — reference spectrify/utils/s3.py:68-69).
    """
    if manifest_path is None:
        manifest_path = os.path.join(csv_dir, "manifest")
    files = sorted(
        p
        for p in glob.glob(os.path.join(csv_dir, "part-*"))
        if not p.endswith((".crc", "_SUCCESS"))
    )
    doc = {"entries": [{"url": p, "mandatory": True} for p in files]}
    with open(manifest_path, "w") as fh:
        json.dump(doc, fh, indent=2)
    return manifest_path
