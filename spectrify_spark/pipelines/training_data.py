"""End-to-end training-data curation: the composition the individual
operators exist for, as ONE declarative lineage.

clean -> annotate (lang, quality, token counts) -> gate -> exact dedup
-> near dedup (MinHash-LSH) [-> benchmark decontamination] ->
deterministic split.  Every stage is a
Catalyst expression or a bucketed join from ``functions/text.py`` /
``operators/dedup.py`` — no Python in the row path, so the whole
pipeline plans as a handful of shuffles regardless of corpus size:
one fingerprint window, the LSH signature groupBy + band join, and the
final split projection (free).

The near-dup victim policy is keep-lowest-id: a doc is dropped iff it
is the HIGHER id of some surviving near-dup pair.  One anti-join
against the pair table implements it without iterating (pairs are
emitted with id_a < id_b, so dropping every id_b keeps exactly one doc
per pairwise-connected pair; transitive chains may keep fewer than one
per component, acceptable for dedup where over-dropping near-identical
text is harmless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spectrify_spark.functions import text as TX
from spectrify_spark.operators import dedup as D


def annotate_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    min_tokens: int = 5,
    redact_pii: bool = False,
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """The STATELESS head of the curation pipeline: clean (URL strip +
    whitespace collapse, optional PII redaction) -> annotate (lang-id,
    quality score, token count) -> gate.  Returns one row per passing
    doc: ``(id, text_clean, lang, quality, n_tokens)`` plus any
    ``carry_cols`` passed through untouched (e.g. the event-time
    column a downstream watermark-bounded dedup keys its state
    eviction on — streaming/curation.py::stream_curate_dedup_publish).

    Factored out of :func:`curate` because this half is pure per-row
    Catalyst expressions — no shuffle, no state — so it runs UNCHANGED
    on a Structured Streaming source (streaming/curation.py::
    stream_curate): at 100 TB-ingest scale the gate belongs at the
    edge, where it shrinks the corpus BEFORE the stateful dedup stages
    pay shuffle/state cost on it.
    """
    carry = list(carry_cols or [])
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), r"https?://\S+", " "),
            r"\s+",
            " ",
        )
    )
    if redact_pii:
        cleaned = TX.pii_redact(cleaned)
    base = docs.select(
        F.col(id_col).alias("id"),
        cleaned.alias("text_clean"),
        *carry,
    )
    t = F.col("text_clean")
    return base.select(
        "id",
        "text_clean",
        TX.lang_id(t).alias("lang"),
        F.round(TX.quality_score(t), 4).alias("quality"),
        TX.token_count(t).cast("bigint").alias("n_tokens"),
        *carry,
    ).filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    min_tokens: int = 5,
    near_dup_threshold: float = 0.8,
    split_weights: tuple[int, int, int] = (90, 5, 5),
    bench: DataFrame | None = None,
    decontam_ngram: int = 5,
    decontam_min_overlap: int = 3,
    line_dedup: bool = False,
    redact_pii: bool = False,
    persist_survivors: bool = False,
) -> DataFrame:
    """documents -> curated training corpus with split assignment.

    Returns one row per surviving doc: ``(id, text_clean, lang,
    quality, n_tokens, split)`` where split ∈ {train, valid, test} by
    md5 hash bucket (stable as the corpus grows — rows never migrate
    between splits when new data lands, unlike rand() splits).

    ``bench``, when given, drops survivors sharing >=
    ``decontam_min_overlap`` distinct ``decontam_ngram``-gram shingles
    with it (operators/decontaminate.py) — benchmark grams broadcast,
    so the stage adds zero corpus shuffles.  Decontamination runs after
    dedup on CLEANED text: the same normalization on both sides is
    what makes gram collision meaningful.

    ``line_dedup=True`` prepends C4-style corpus-global line dedup
    (``dedup.dedup_lines``): it must run BEFORE whitespace collapse —
    the cleaner folds newlines away — so it operates on the raw text's
    line structure; docs whose every line was boilerplate are dropped.
    ``redact_pii=True`` masks emails/SSNs/phones/IPs with typed tokens
    (``text.pii_redact``) inside the same map-side cleaning projection.

    ``persist_survivors=True`` caches the exact-dedup survivors, which
    feed BOTH the near-dup pair generation and the final anti-join —
    without it the scan->clean->annotate->gate->window lineage
    executes twice (two full corpus passes).  Opt-in because caching
    the whole cleaned corpus trades executor memory/spill for the
    second pass (measured LOSING on selective-gate corpora —
    PERF_NOTES r13); the persisted handle is exposed as
    ``.cached_survivors`` on the returned DataFrame so callers can
    ``result.cached_survivors.unpersist()`` when done — without it the
    cache would be unreleasable short of ``spark.catalog.clearCache``.
    """
    # 0. optional corpus-global line dedup on the RAW line structure
    src = docs
    if line_dedup:
        ld = D.dedup_lines(docs, id_col=id_col, text_col=text_col)
        src = ld.filter(F.col("n_kept") > 0).select(
            F.col(id_col), F.col("text_clean").alias(text_col)
        )

    # 1.-2. clean -> annotate -> gate (the stateless head, shared with
    # the streaming form — see annotate_gate)
    annotated = annotate_gate(
        src,
        id_col=id_col,
        text_col=text_col,
        min_quality=min_quality,
        min_tokens=min_tokens,
        redact_pii=redact_pii,
    )

    # 3. exact dedup on content fingerprint (keep lowest id per fingerprint)
    with_fp = annotated.withColumn("__fp", TX.fingerprint(F.col("text_clean")))
    exact = D.dedup_exact(
        with_fp, ["__fp"], tie_break=[F.col("id")]
    ).drop("__fp")
    if persist_survivors:
        exact = exact.persist()

    # 4. near dedup: MinHash-LSH pairs over the survivors, drop higher ids
    pairs = D.near_dup_pairs(
        exact.select(F.col("id").alias("doc_id"), F.col("text_clean").alias("text")),
        id_col="doc_id",
        text_col="text",
        threshold=near_dup_threshold,
    )
    # no broadcast hint: in duplicate-heavy corpora the victim set can be
    # a large fraction of the corpus — let AQE pick the join strategy
    victims = pairs.select(F.col("id_b").alias("id")).distinct()
    deduped = exact.join(victims, "id", "left_anti")

    # 4b. optional benchmark decontamination (broadcast gram join over
    # the cleaned text; the flagged-id anti join is AQE-sized)
    if bench is not None:
        from spectrify_spark.operators.decontaminate import ngram_overlap

        flagged = ngram_overlap(
            deduped.select(F.col("id").alias("doc_id"), F.col("text_clean").alias("text")),
            bench,
            n=decontam_ngram,
            id_col="doc_id",
            text_col="text",
            min_overlap=decontam_min_overlap,
        ).select(F.col("doc_id").alias("id"))
        deduped = deduped.join(flagged, "id", "left_anti")

    # 5. deterministic split (engine-portable md5 bucket)
    n_train, n_valid, _ = split_weights
    bucket = TX.hash_bucket(F.col("id"), sum(split_weights))
    result = deduped.select(
        "id",
        "text_clean",
        "lang",
        "quality",
        "n_tokens",
        F.when(bucket < n_train, F.lit("train"))
        .when(bucket < n_train + n_valid, F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    if persist_survivors:
        # hand the cache's lifetime to the caller (see docstring)
        result.cached_survivors = exact
    return result


def curate_chunks(
    docs: DataFrame,
    chunk_size: int = 512,
    overlap: int = 64,
    **curate_kwargs,
) -> DataFrame:
    """``curate`` then explode the survivors into model-ready context
    windows: one row per (doc, chunk) with the doc's split/lang/quality
    annotations carried through.  Chunking is map-side only
    (operators/chunking.py), so this adds zero shuffles to the curation
    lineage — the chunk table is what sequence packing
    (operators/packing.py) consumes.
    """
    from spectrify_spark.operators.chunking import chunk_tokens

    curated = curate(docs, **curate_kwargs)
    return chunk_tokens(
        curated,
        id_col="id",
        text_col="text_clean",
        chunk_size=chunk_size,
        overlap=overlap,
        carry_cols=["lang", "quality", "split"],
    )
