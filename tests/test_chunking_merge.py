"""Unit tests for chunk_tokens (context-window chunking) and
merge_changes (CDC MERGE apply)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spectrify_spark.operators.chunking import chunk_tokens
from spectrify_spark.operators.relational import merge_changes


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "a b c")])
    out = chunk_tokens(df, chunk_size=4, overlap=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_id"], r["n_tokens"], r["chunk_text"]) == (0, 3, "a b c")


def test_chunk_exact_size_doc(spark):
    df = _docs(spark, [(1, "a b c d")])
    out = chunk_tokens(df, chunk_size=4, overlap=1).collect()
    assert len(out) == 1  # no overlap-only trailing chunk


def test_chunk_overlap_content(spark):
    toks = [f"t{i}" for i in range(10)]
    df = _docs(spark, [(1, " ".join(toks))])
    out = {
        r["chunk_id"]: r for r in chunk_tokens(df, chunk_size=4, overlap=2).collect()
    }
    # stride 2: starts 0,2,4,6 (< 10-2=8); each chunk 4 tokens
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t2 t3 t4 t5"
    assert out[3]["chunk_text"] == "t6 t7 t8 t9"
    # every token is covered
    covered = set()
    for r in out.values():
        covered.update(r["chunk_text"].split())
    assert covered == set(toks)


def test_chunk_empty_and_whitespace_docs(spark):
    df = _docs(spark, [(1, ""), (2, "   "), (3, None), (4, "x")])
    out = chunk_tokens(df, chunk_size=4, overlap=1).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in out] == [(4, "x")]


def test_chunk_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_size=4, overlap=4)


def _snapshot(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )


def test_merge_applies_delete_update_insert(spark):
    base = _snapshot(spark)
    changes = spark.createDataFrame(
        [(2, "b2", "U"), (3, None, "D"), (4, "d", "I")],
        "k bigint, v string, op string",
    )
    out = {r["k"]: r["v"] for r in merge_changes(base, changes, key="k").collect()}
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_merge_requires_base_columns(spark):
    base = _snapshot(spark)
    changes = spark.createDataFrame([(1, "D")], "k bigint, op string")
    with pytest.raises(ValueError, match="missing base columns"):
        merge_changes(base, changes, key="k")


def test_merge_is_idempotent_on_empty_changeset(spark):
    base = _snapshot(spark)
    empty = spark.createDataFrame([], "k bigint, v string, op string")
    out = merge_changes(base, empty, key="k")
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


# --------------------------------------------------------- property tests

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_token = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@given(
    toks=st.lists(_token, min_size=0, max_size=60),
    size=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_tokens_invariants(spark, toks, size, overlap_frac):
    """For any doc and any (size, overlap): every token is covered in
    order, non-overlap remainders reconstruct the doc exactly, chunk
    ids are dense from 0, and sizes are bounded."""
    overlap = min(int(size * overlap_frac), size - 1)
    stride = size - overlap
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id bigint, text string")
    rows = sorted(
        chunk_tokens(df, chunk_size=size, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    if not toks:
        assert rows == []
        return
    # dense ids, bounded sizes
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    assert all(1 <= r["n_tokens"] <= size for r in rows)
    # reconstruction: chunk i contributes its tokens after dropping the
    # first `overlap` tokens for i > 0
    rebuilt = []
    for r in rows:
        ts = r["chunk_text"].split(" ")
        assert len(ts) == r["n_tokens"]
        rebuilt.extend(ts if r["chunk_id"] == 0 else ts[overlap:])
    assert rebuilt == toks
    # expected chunk count from the start formula
    import math

    n = len(toks)
    assert len(rows) == math.ceil(max(n - overlap, 1) / stride)


def test_merge_rejects_null_op(spark):
    """A NULL op must fail the job, not silently delete the key (the
    anti join removes it while `op != 'D'` evaluates to NULL and drops
    the row from the upserts)."""
    base = _snapshot(spark)
    changes = spark.createDataFrame(
        [(2, "b2", None)], "k bigint, v string, op string"
    )
    with pytest.raises(Exception, match="invalid op"):
        merge_changes(base, changes, key="k").collect()


def test_merge_rejects_unknown_op(spark):
    base = _snapshot(spark)
    changes = spark.createDataFrame(
        [(2, "b2", "X")], "k bigint, v string, op string"
    )
    with pytest.raises(Exception, match="invalid op"):
        merge_changes(base, changes, key="k").collect()


def test_merge_rejects_delete_op_outside_allowed(spark):
    base = _snapshot(spark)
    changes = spark.createDataFrame(
        [(2, "b2", "U")], "k bigint, v string, op string"
    )
    with pytest.raises(ValueError, match="not in allowed_ops"):
        merge_changes(base, changes, key="k", delete_op="Z")
