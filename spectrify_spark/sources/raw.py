"""Raw-file ingestion: the entry points that turn a directory of
files into the engine's typed tables.

- ``read_media_files``: Spark's ``binaryFile`` source — one row per
  file with ``(path, modificationTime, length, content binary)`` —
  projected onto the multimodal MEDIA-style schema.  This is the real
  ingest path for image/audio/video payloads: bytes land as an opaque
  binary column next to typed metadata, and COLUMN PRUNING IS THE
  POINT — a query selecting only metadata never reads the payload
  bytes (binaryFile materializes ``content`` lazily per row-group),
  so "count the corpus" or "filter by extension" touch no media data.

- ``read_text_docs``: line-delimited raw text -> a documents-style
  table ``(doc_id, text, source)``.  doc_id is a content+provenance
  hash (xxhash64 of file path and line text) — deterministic across
  runs, partitionings, and cluster sizes, unlike
  ``monotonically_increasing_id`` whose values shift with the split
  layout.  Collisions (same line in the same file twice) map
  duplicate lines to one id, which downstream exact-dedup treats as
  already-dedup'd — the usual convention for hash-keyed corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Extension -> (kind, mime) for the media projection.
_MEDIA_KINDS = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
}


def read_media_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of media files -> (media_id, kind, mime, payload,
    n_bytes, source_path) rows via the ``binaryFile`` source.

    ``glob`` (e.g. ``"*.png"``) restricts which files are listed —
    pushed to the FILE LISTING, not a post-filter.  Unknown extensions
    ingest as ``kind='binary'`` with a NULL mime rather than being
    dropped: silent input loss is worse than an unknown tag.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = F.lit("binary")
    mime = F.lit(None).cast("string")
    for e, (k, m) in _MEDIA_KINDS.items():
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.col("content").alias("payload"),
        F.col("length").alias("n_bytes"),
        F.col("path").alias("source_path"),
    )


def read_text_docs(
    spark: SparkSession, path: str, min_chars: int = 1
) -> DataFrame:
    """Line-delimited text files -> (doc_id, text, source) documents.

    One document per non-empty line (``min_chars`` gates shorter
    lines); ``source`` is the producing file.  Deterministic hash ids —
    see the module docstring.
    """
    raw = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
    )
    return raw.filter(F.length(F.trim(F.col("text"))) >= min_chars).select(
        F.xxhash64(F.col("source"), F.col("text")).alias("doc_id"),
        "text",
        "source",
    )
