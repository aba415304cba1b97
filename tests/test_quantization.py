"""Product quantization: encode/ADC correctness, codebook training,
and the zero-shuffle plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectrify_spark.operators import quantization as Q


def _vecs(spark):
    from spectrify_spark.sources.parquet import read_table

    return read_table(spark, "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_pq_encode_matches_numpy_argmin(spark):
    """Spark's per-subspace argmin fold == NumPy brute-force argmin
    (first index on ties) for every row."""
    import numpy as np

    e = _vecs(spark)
    books = Q.deterministic_codebooks(4, 16, 16)
    got = {
        r.vec_id: list(r.pq_code)
        for r in Q.pq_encode(e, books).select("vec_id", "pq_code").collect()
    }
    cb = np.array(books)  # (4, 16, 16)
    for r in e.collect():
        v = np.array(r.embedding, dtype=np.float64).reshape(4, 16)
        want = [
            int(np.argmin(((cb[m] - v[m]) ** 2).sum(axis=1))) for m in range(4)
        ]
        assert got[r.vec_id] == want


def test_pq_adc_topk_ranks_query_first_and_bounds_error(spark):
    """A corpus vector queried against its own corpus ranks itself
    first under ADC, and ADC distance >= its own quantization cell
    distance (ADC uses the code, not the raw vector)."""
    e = _vecs(spark)
    books = Q.deterministic_codebooks(4, 16, 16)
    enc = Q.pq_encode(e, books)
    qv = [float(x) for x in e.filter(F.col("vec_id") == 7).first().embedding]
    top = Q.pq_adc_topk(enc, books, qv, k=5).collect()
    assert top[0].vec_id == 7
    assert all(
        top[i].adc_dist <= top[i + 1].adc_dist for i in range(len(top) - 1)
    )


def test_pq_train_reduces_reconstruction_mse(spark):
    """Lloyd's-refined codebooks quantize tighter than the seeded
    deterministic ones on the same data."""
    e = _vecs(spark)
    det = Q.deterministic_codebooks(4, 16, 16)
    trained = Q.pq_train(e, 4, 16, iters=2)
    assert Q.reconstruction_mse(e, trained) < Q.reconstruction_mse(e, det)


def test_pq_train_seeds_distinct_vectors(spark):
    """Duplicate input vectors must not seed duplicate codebook
    entries: the first-index argmin tie rule would starve the clones
    forever (dead codes wasting codebook capacity)."""
    import itertools

    base = [
        [float(i), float(i) + 1, float(i) * 2, float(i) * 3] for i in range(4)
    ]
    rows = [(i, v) for i, v in enumerate(itertools.chain(*([b] * 5 for b in base)))]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    books = Q.pq_train(e, m_subspaces=2, n_codes=4, iters=0)
    for book in books:
        entries = [tuple(c) for c in book]
        assert len(set(entries)) == len(entries)
    # only 4 DISTINCT vectors exist: asking for 5 codes now fails loud
    with pytest.raises(ValueError, match="need >= 5"):
        Q.pq_train(e, m_subspaces=2, n_codes=5, iters=0)


def test_pq_encode_plan_has_no_shuffle(spark):
    """Encode + ADC scoring is map-side only: NO shuffle (Exchange
    hashpartitioning / rangepartitioning) appears — the corpus is
    scanned once, in place.  r18: small codebooks/LUTs fold in as
    LITERALS, so there is no join node and no BroadcastExchange
    either (the one-row parameter-table broadcast is gone)."""
    e = _vecs(spark)
    books = Q.deterministic_codebooks(4, 16, 16)
    out = Q.pq_adc_scores(Q.pq_encode(e, books), books, [0.0] * 64)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastExchange" not in plan


def test_pq_validation_errors(spark):
    e = _vecs(spark)
    with pytest.raises(ValueError, match="at least one"):
        Q.pq_encode(e, [])
    with pytest.raises(ValueError, match="divisible"):
        Q.pq_train(e, m_subspaces=5, n_codes=4, iters=1)
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty input"):
        Q.pq_train(empty, 4, 4, iters=1)


def test_ivfpq_index_prunes_and_recalls(spark, tmp_path):
    """IVF-PQ materialized index: the probe scan shows PartitionFilters
    (planning-time pruning), a corpus vector queried with enough
    probes finds itself first, and recall@10 vs exact brute force is
    reasonable for trained codebooks."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators import similarity as SIM
    from spectrify_spark.sources.parquet import read_table

    e = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = SIM.kmeans_refine(e, SIM.choose_centroids(e, n_centroids=8), iters=1)
    books = Q.pq_train(e, 4, 16, iters=1)
    path = str(tmp_path / "ivfpq")
    Q.write_ivfpq_index(e, cents, books, path)

    qv = [float(x) for x in e.filter(F.col("vec_id") == 7).first().embedding]
    got = Q.ivfpq_topk(spark, path, qv, k=10, nprobe=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    rows = got.collect()
    # with ALL cells probed, its own exact code-cell distance is
    # minimal -> the query vector ranks first
    assert rows[0].vec_id == 7

    # fidelity: with every cell probed, the index's top-10 == a NumPy
    # ADC reference over the same model (recall vs EXACT L2 is a
    # property of the data — these synthetic embeddings are near-
    # random, so ADC recall is intrinsically low; the operator's
    # contract is faithful ADC, which this pins end-to-end through
    # the partitioned index)
    import numpy as np

    V = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in e.collect()
    }
    cb = np.array(books)
    m, dsub = cb.shape[0], cb.shape[2]
    qs = np.array(qv).reshape(m, dsub)
    lut = ((qs[:, None, :] - cb) ** 2).sum(axis=2)
    adc = {}
    for i, v in V.items():
        vs = v.reshape(m, dsub)
        codes = [
            int(np.argmin(((cb[mi] - vs[mi]) ** 2).sum(axis=1)))
            for mi in range(m)
        ]
        adc[i] = round(sum(lut[mi][codes[mi]] for mi in range(m)), 6)
    want = sorted(V, key=lambda i: (adc[i], i))[:10]
    assert [r.vec_id for r in rows] == want

    # nprobe=1 scans fewer rows than the full index (pruning is real)
    assert (
        Q.ivfpq_topk(spark, path, qv, k=500, nprobe=1).count()
        < spark.read.parquet(path).count()
    )

    # missing sidecar raises
    import pytest

    with pytest.raises(FileNotFoundError):
        Q.ivfpq_topk(spark, str(tmp_path / "nope"), qv)


def test_ivfpq_rerank_is_exact_l2_over_candidates(spark, tmp_path):
    """rerank_with removes quantization error from the FINAL ranking:
    with all cells probed and rerank_factor covering the corpus, the
    result is EXACTLY the brute-force L2 top-k; with a smaller factor
    it is the exact-L2 re-sort of the ADC candidate pool."""
    import numpy as np
    from pyspark.sql import functions as F

    from spectrify_spark.operators import similarity as SIM
    from spectrify_spark.sources.parquet import read_table

    e = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = e.count()
    cents = SIM.kmeans_refine(e, SIM.choose_centroids(e, n_centroids=8), iters=1)
    books = Q.pq_train(e, 4, 16, iters=1)
    path = str(tmp_path / "ivfpq")
    Q.write_ivfpq_index(e, cents, books, path)
    qv = [float(x) for x in e.filter(F.col("vec_id") == 7).first().embedding]

    # factor large enough to pool the whole corpus -> exact L2 top-k
    got = Q.ivfpq_topk(
        spark, path, qv, k=5, nprobe=8, rerank_with=e,
        rerank_factor=(n // 5) + 1,
    ).collect()
    V = {r.vec_id: np.array(r.embedding, np.float64) for r in e.collect()}
    q = np.array(qv)
    exact = {i: round(float(((v - q) ** 2).sum()), 6) for i, v in V.items()}
    want = sorted(V, key=lambda i: (exact[i], i))[:5]
    assert [r.vec_id for r in got] == want
    for r in got:
        assert abs(r.l2_dist - exact[r.vec_id]) < 1e-6

    # recall@5 with a practical factor is >= the pure-ADC recall
    # (re-sorting a candidate pool by the true metric cannot lose a
    # true neighbour that ADC ranked within the pool)
    adc5 = {r.vec_id for r in Q.ivfpq_topk(spark, path, qv, k=5, nprobe=8).collect()}
    rr5 = {
        r.vec_id
        for r in Q.ivfpq_topk(
            spark, path, qv, k=5, nprobe=8, rerank_with=e, rerank_factor=8
        ).collect()
    }
    truth = set(want)
    assert len(rr5 & truth) >= len(adc5 & truth)

    with pytest.raises(ValueError, match="rerank_factor"):
        Q.ivfpq_topk(spark, path, qv, rerank_with=e, rerank_factor=0)


def test_pq_adc_knn_join_matches_single_query_path(spark):
    """The batched ADC join returns, for each query, exactly what
    pq_adc_topk returns for that query alone (JVM-computed LUTs ==
    driver-computed LUTs bit-for-bit)."""
    from pyspark.sql import functions as F

    e = _vecs(spark)
    books = Q.deterministic_codebooks(4, 16, 16)
    enc = Q.pq_encode(e, books)
    qs = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    batched = {
        (r.q_id, r.vec_id): r.adc_dist
        for r in Q.pq_adc_knn_join(enc, books, qs, k=5).collect()
    }
    single = {}
    for q in qs.collect():
        for r in Q.pq_adc_topk(enc, books, [float(x) for x in q.q_vec], k=5).collect():
            single[(q.q_id, r.vec_id)] = r.adc_dist
    assert batched == single and len(batched) == 15


def test_cli_index_ivfpq_and_ann(spark, tmp_path, capsys):
    """CLI drive of the ANN pair: index-ivfpq trains+writes the
    partitioned code index, ann probes it by a source row's id and
    prints (id, adc_dist) lines; with all cells probed the query ranks
    itself first."""
    from spectrify_spark import cli

    idx = str(tmp_path / "ivfpq_idx")
    src = "/root/testdata/sf0.001/embeddings.parquet"
    assert cli.main(["index-ivfpq", src, idx, "--n-centroids", "4"]) == 0
    capsys.readouterr()
    assert (
        cli.main(["ann", idx, src, "--query-id", "7", "--nprobe", "4"]) == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 10
    first_id, first_dist = out[0].split("\t")
    assert int(first_id) == 7 and float(first_dist) >= 0.0
    # missing query id -> exit 1
    assert (
        cli.main(["ann", idx, src, "--query-id", "999999"]) == 1
    )


def test_append_ivfpq_index_matches_from_scratch(spark, tmp_path):
    """append_ivfpq_index assigns+encodes the delta with the stored
    model: two increments leave the index row-identical to a
    from-scratch build over the full corpus."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators import similarity as SIM

    e = _vecs(spark)
    base = e.filter(F.col("vec_id") < 300)
    d1 = e.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    d2 = e.filter(F.col("vec_id") >= 400)
    cents = SIM.kmeans_refine(base, SIM.choose_centroids(base, 4), iters=1)
    books = Q.deterministic_codebooks(4, 16, 16)
    path = str(tmp_path / "idx")
    Q.write_ivfpq_index(base, cents, books, path)
    Q.append_ivfpq_index(d1, path)
    Q.append_ivfpq_index(d2, path)
    scratch = str(tmp_path / "scratch")
    Q.write_ivfpq_index(e, cents, books, scratch)

    def rowset(p):
        return {
            (r.vec_id, r.ivf_cell, tuple(r.pq_code))
            for r in spark.read.parquet(p).collect()
        }

    assert rowset(path) == rowset(scratch)
    with pytest.raises(FileNotFoundError):
        Q.append_ivfpq_index(d1, str(tmp_path / "nope"))


def test_pq_encode_rejects_wrong_dimension(spark):
    """A vector whose dimension != m_subspaces*dsub must raise at
    evaluation, not emit a poisoned -1 code or drop tail dims."""
    import pytest

    from spectrify_spark.operators import quantization as Q

    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]  # M=2, dsub=2
    bad = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="vector dimension"):
        Q.pq_encode(bad, books).collect()


def test_compact_ivf_index_carries_ivfpq_model(spark, tmp_path):
    """Compacting an IVF-PQ index must carry the PQ model sidecar —
    a compaction that strips it bricks every later probe."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators import quantization as Q
    from spectrify_spark.operators import similarity as SIM
    from spectrify_spark.sources.parquet import read_table

    vecs = read_table(
        spark, "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    cents = SIM.kmeans_refine(vecs, SIM.choose_centroids(vecs, 4), iters=1)
    books = Q.pq_train(vecs, 4, 8, iters=1)
    src = str(tmp_path / "ivfpq_src")
    dst = str(tmp_path / "ivfpq_dst")
    Q.write_ivfpq_index(vecs, cents, books, src)
    SIM.compact_ivf_index(spark, src, dst)
    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 3).first().embedding]
    hits_src = [r.vec_id for r in Q.ivfpq_topk(spark, src, qv, k=5, nprobe=4).collect()]
    hits_dst = [r.vec_id for r in Q.ivfpq_topk(spark, dst, qv, k=5, nprobe=4).collect()]
    assert hits_src == hits_dst and len(hits_dst) == 5


def test_sq_encode_roundtrip_error_bound(spark):
    """SQ8 contract: codes in [0,255]; midpoint reconstruction is
    within one cell step per dimension; degenerate dims code to 0."""
    import numpy as np

    rows = [(i, [float(i), float(i) * 0.5, 7.0]) for i in range(100)]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    model = Q.sq_train(e)
    assert model["mins"][2] == model["maxs"][2] == 7.0  # degenerate dim
    enc = {r.vec_id: r.sq_code for r in Q.sq_encode(e, model).collect()}
    mn, mx = np.array(model["mins"]), np.array(model["maxs"])
    step = np.where(mx > mn, (mx - mn) / 256.0, 0.0)
    for i, v in rows:
        codes = np.array(enc[i])
        assert ((codes >= 0) & (codes <= 255)).all()
        assert codes[2] == 0  # degenerate dim codes to 0
        recon = mn + (codes + 0.5) * step
        err = np.abs(recon - np.array(v))
        assert (err <= np.maximum(step, 1e-9) + 1e-9).all(), (i, err, step)


def test_sq_topk_close_to_exact(spark):
    """Asymmetric SQ scoring: the query vector itself ranks first, and
    top-k overlaps heavily with exact L2 (per-dimension resolution —
    much tighter than PQ on the same data)."""
    import numpy as np
    from pyspark.sql import functions as F

    from spectrify_spark.sources.parquet import read_table

    e = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    model = Q.sq_train(e)
    enc = Q.sq_encode(e, model)
    qv = [float(x) for x in e.filter(F.col("vec_id") == 7).first().embedding]
    got = [r.vec_id for r in Q.sq_topk(enc, model, qv, k=10).collect()]
    assert got[0] == 7
    V = {r.vec_id: np.array(r.embedding, np.float64) for r in e.collect()}
    q = np.array(qv)
    exact = sorted(V, key=lambda i: (float(((V[i] - q) ** 2).sum()), i))[:10]
    assert len(set(got) & set(exact)) >= 7  # SQ8 keeps most neighbours


def test_sq_plan_is_map_side_only(spark):
    """Encode + score plan: no hash/range shuffle of the corpus, and
    (r18) no BroadcastExchange either — the small SQ model folds in
    as literal columns instead of a one-row parameter-table join."""
    rows = [(i, [float(i % 13), float(i % 7)]) for i in range(50)]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    model = Q.sq_train(e)
    out = Q.sq_topk(Q.sq_encode(e, model), model, [1.0, 2.0], k=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastExchange" not in plan


def test_sq_validation(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty input"):
        Q.sq_train(empty)
    with pytest.raises(ValueError, match="mins/maxs"):
        Q._sq_model_frame(spark, {"mins": [1.0], "maxs": []})


def test_sq_knn_join_matches_single_query_path(spark):
    """Batched SQ knn == per-query sq_topk for every query, and the
    plan keeps the corpus map-side (broadcast model + broadcast query
    batch, per-query window top-k only)."""
    e = _vecs(spark)
    model = Q.sq_train(e)
    enc = Q.sq_encode(e, model)
    qids = [3, 7, 11]
    queries = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = Q.sq_knn_join(enc, model, queries, k=5)
    by_q: dict[int, list] = {}
    for r in got.collect():
        by_q.setdefault(r.q_id, []).append((r.sq_dist, r.vec_id))
    assert set(by_q) == set(qids)
    for qid in qids:
        qv = [
            float(x)
            for x in e.filter(F.col("vec_id") == qid).first().embedding
        ]
        single = [
            (r.sq_dist, r.vec_id)
            for r in Q.sq_topk(enc, model, qv, k=5).collect()
        ]
        assert sorted(by_q[qid]) == single, qid
    # AQE toString prints final + initial sections; gate the FINAL one
    plan = (
        got._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # corpus never hash/range-shuffles except the per-query window;
    # the model is a literal (r18) and only the QUERY BATCH broadcasts
    assert plan.count("hashpartitioning") <= 1
    assert "BroadcastExchange" in plan


def test_ivfsq_index_prunes_probes_and_reranks(spark, tmp_path):
    """IVF-SQ composition (r11 item 6): SQ8 as a drop-in inside the
    IVF layout — build writes (id, sq_code) partitioned by cell with a
    self-contained model sidecar; probes partition-prune to nprobe
    cells; full-nprobe recall matches flat SQ; rerank returns exact-L2
    order over the bounded candidate set."""
    from spectrify_spark.operators.similarity import choose_centroids

    e = _vecs(spark)
    model = Q.sq_train(e)
    cents = choose_centroids(e, n_centroids=8)
    path = str(tmp_path / "ivfsq")
    Q.write_ivfsq_index(e, cents, model, path)

    qv = [float(x) for x in e.filter(F.col("vec_id") == 3).first().embedding]
    # full probe == flat SQ top-k over the whole corpus
    got = Q.ivfsq_topk(spark, path, qv, k=10, nprobe=8)
    flat = Q.sq_topk(Q.sq_encode(e, model), model, qv, k=10)
    assert [r.vec_id for r in got.collect()] == [
        r.vec_id for r in flat.collect()
    ]
    # narrow probe: the scan carries PartitionFilters on the cell
    # column (planning-time pruning) and touches fewer rows than the
    # full index
    narrow = Q.ivfsq_topk(spark, path, qv, k=5, nprobe=2)
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    assert (
        Q.ivfsq_topk(spark, path, qv, k=5000, nprobe=1).count()
        < spark.read.parquet(path).count()
    )
    assert narrow.count() == 5
    assert [r.vec_id for r in narrow.collect()][0] == 3

    # rerank: exact L2 over candidates, ascending, k rows
    rr = Q.ivfsq_topk(
        spark, path, qv, k=5, nprobe=8, rerank_with=e, rerank_factor=4
    ).collect()
    assert [r.vec_id for r in rr][0] == 3 and rr[0].l2_dist == 0.0
    assert [r.l2_dist for r in rr] == sorted(r.l2_dist for r in rr)
    with pytest.raises(ValueError, match="rerank_factor"):
        Q.ivfsq_topk(spark, path, qv, rerank_with=e, rerank_factor=0)
    with pytest.raises(FileNotFoundError, match="sidecar"):
        Q.ivfsq_topk(spark, str(tmp_path / "nope"), qv)


def test_append_ivfsq_index_matches_from_scratch(spark, tmp_path):
    """append_ivfsq_index assigns+encodes the delta with the STORED
    model: append(base)+delta == write(all) for every probe."""
    e = _vecs(spark)
    model = Q.sq_train(e)
    from spectrify_spark.operators.similarity import choose_centroids

    cents = choose_centroids(e, n_centroids=4)
    base = e.filter(F.col("vec_id") % 2 == 0)
    delta = e.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "inc")
    scratch = str(tmp_path / "scratch")
    Q.write_ivfsq_index(base, cents, model, path)
    Q.append_ivfsq_index(delta, path)
    Q.write_ivfsq_index(e, cents, model, scratch)
    qv = [float(x) for x in e.filter(F.col("vec_id") == 5).first().embedding]
    inc = [r.vec_id for r in Q.ivfsq_topk(spark, path, qv, k=8, nprobe=4).collect()]
    full = [r.vec_id for r in Q.ivfsq_topk(spark, scratch, qv, k=8, nprobe=4).collect()]
    assert inc == full
    with pytest.raises(FileNotFoundError, match="sidecar"):
        Q.append_ivfsq_index(delta, str(tmp_path / "nope"))


def test_cli_index_ivfsq_and_ann(spark, tmp_path, capsys):
    """CLI drive of the SQ ANN pair: index-ivfsq fits the SQ model +
    coarse centroids and writes the cell-partitioned int8 index; ann
    --codec sq probes it and prints (id, sq_dist) lines; with all
    cells probed the query ranks itself first."""
    from spectrify_spark import cli

    idx = str(tmp_path / "ivfsq_idx")
    src = "/root/testdata/sf0.001/embeddings.parquet"
    assert cli.main(["index-ivfsq", src, idx, "--n-centroids", "4"]) == 0
    capsys.readouterr()
    assert (
        cli.main(
            ["ann", idx, src, "--query-id", "7", "--nprobe", "4", "--codec", "sq"]
        )
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 10
    first_id, first_dist = out[0].split("\t")
    assert int(first_id) == 7 and float(first_dist) >= 0.0


def test_ivfpq_knn_join_full_probe_matches_flat(spark, tmp_path):
    """Batched index ADC join with nprobe=C == the index-less
    pq_adc_knn_join on the same encoded corpus (cells cannot restrict
    anything); with nprobe<C each query's results come only from its
    own probed cells and the scan carries PartitionFilters."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators import similarity as SIM

    e = _vecs(spark)
    cents = SIM.kmeans_refine(e, SIM.choose_centroids(e, n_centroids=8), iters=1)
    books = Q.deterministic_codebooks(4, 16, 16)
    path = str(tmp_path / "ivfpq")
    Q.write_ivfpq_index(e, cents, books, path)
    qs = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    got = {
        (r.q_id, r.vec_id): r.adc_dist
        for r in Q.ivfpq_knn_join(spark, path, qs, k=5, nprobe=8).collect()
    }
    flat = {
        (r.q_id, r.vec_id): r.adc_dist
        for r in Q.pq_adc_knn_join(Q.pq_encode(e, books), books, qs, k=5).collect()
    }
    assert got == flat and len(got) == 15

    narrow = Q.ivfpq_knn_join(spark, path, qs, k=5, nprobe=2)
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    rows = narrow.collect()
    assert {r.q_id for r in rows} == {0, 1, 2}
    # each query still finds itself (it lives in its own top cell)
    for qid in (0, 1, 2):
        best = min((r.adc_dist, r.vec_id) for r in rows if r.q_id == qid)
        assert best[1] == qid

    with pytest.raises(FileNotFoundError, match="sidecar"):
        Q.ivfpq_knn_join(spark, str(tmp_path / "nope"), qs)


def test_ivfsq_knn_join_full_probe_matches_flat(spark, tmp_path):
    """Batched index SQ join with nprobe=C == the index-less
    sq_knn_join on the same model/corpus."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators import similarity as SIM

    e = _vecs(spark)
    model = Q.sq_train(e)
    cents = SIM.choose_centroids(e, n_centroids=8)
    path = str(tmp_path / "ivfsq")
    Q.write_ivfsq_index(e, cents, model, path)
    qs = e.filter(F.col("vec_id").isin([3, 7, 11])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = {
        (r.q_id, r.vec_id): r.sq_dist
        for r in Q.ivfsq_knn_join(spark, path, qs, k=5, nprobe=8).collect()
    }
    flat = {
        (r.q_id, r.vec_id): r.sq_dist
        for r in Q.sq_knn_join(Q.sq_encode(e, model), model, qs, k=5).collect()
    }
    assert got == flat and len(got) == 15
    # narrow probe: every query still ranks itself first
    rows = Q.ivfsq_knn_join(spark, path, qs, k=3, nprobe=2).collect()
    for qid in (3, 7, 11):
        best = min((r.sq_dist, r.vec_id) for r in rows if r.q_id == qid)
        assert best[1] == qid
    with pytest.raises(FileNotFoundError, match="sidecar"):
        Q.ivfsq_knn_join(spark, str(tmp_path / "nope"), qs)


def test_probe_cells_tie_break_matches_jvm_twin():
    """Review regression (r13): the driver-side _probe_cells broke
    centroid-score ties by the centroid LIST order while the batched
    JVM twin (_query_cells_col) breaks them by ascending cell id — on
    duplicate/equidistant centroids the single-query and batched paths
    probed different cell sets.  Both now tie-break by cell id."""
    from spectrify_spark.operators.quantization import _probe_cells

    v = [1.0, 0.0]
    # scrambled list order, identical vectors: pure tie
    centroids = [(5, v), (2, v), (9, v), (0, v)]
    assert _probe_cells(centroids, [1.0, 0.0], 3) == [0, 2, 5]
    # mixed: a strictly-better centroid first, then ties by cid
    centroids = [(7, [0.0, 1.0]), (5, v), (2, v)]
    assert _probe_cells(centroids, [1.0, 0.0], 2) == [2, 5]


def _nonparam_bnlj(plan: str) -> list:
    """BroadcastNestedLoopJoin plan lines that are NOT the one-row
    parameter-table cross joins (those are ', Cross' with no join
    condition beyond the frame columns): the data-sized join the
    shuffle arm exists to avoid shows as an Inner BNLJ carrying the
    array_contains condition."""
    return [
        ln
        for ln in plan.splitlines()
        if "BroadcastNestedLoopJoin" in ln and ", Cross" not in ln
    ]


def test_ivfpq_knn_join_shuffle_arm_matches_broadcast(spark, tmp_path):
    """r14 (VERDICT r13 item 1): the batched index knn join must not be
    bound by the broadcast budget.  The shuffle arm (exploded (cell,
    query) rows equi-joined on the cell key) returns rows IDENTICAL to
    the broadcast arm, its plan is a plain equi-join (no
    BroadcastNestedLoopJoin, no CartesianProduct), it keeps the
    union-of-cells PartitionFilters pruning, and the auto policy
    switches to it when the batch exceeds broadcast_max_queries."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators import similarity as SIM

    e = _vecs(spark)
    cents = SIM.kmeans_refine(e, SIM.choose_centroids(e, n_centroids=8), iters=1)
    books = Q.deterministic_codebooks(4, 16, 16)
    path = str(tmp_path / "ivfpq")
    Q.write_ivfpq_index(e, cents, books, path)
    qs = e.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    def rows(df):
        return sorted((r.q_id, r.vec_id, r.adc_dist) for r in df.collect())

    bc = rows(Q.ivfpq_knn_join(spark, path, qs, k=5, nprobe=3,
                               broadcast_queries=True))
    sh_df = Q.ivfpq_knn_join(spark, path, qs, k=5, nprobe=3,
                             broadcast_queries=False)
    assert rows(sh_df) == bc and len(bc) == 60
    plan = sh_df._jdf.queryExecution().executedPlan().toString()
    # the query<->codes join must be an EQUI-join in the shuffle arm:
    # the only nested-loop joins left are the one-row parameter-table
    # cross joins (centroid/codebook frames) — never the per-pair
    # array_contains evaluation the broadcast arm uses, and never a
    # cartesian product
    assert _nonparam_bnlj(plan) == []
    assert "CartesianProduct" not in plan
    # partition pruning survives the arm switch
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    # auto policy: a batch larger than the cap takes the shuffle arm
    auto_df = Q.ivfpq_knn_join(spark, path, qs, k=5, nprobe=3,
                               broadcast_max_queries=4)
    assert rows(auto_df) == bc
    auto_plan = auto_df._jdf.queryExecution().executedPlan().toString()
    assert _nonparam_bnlj(auto_plan) == []
    # ... and a batch within the cap keeps the broadcast arm
    small_plan = (
        Q.ivfpq_knn_join(spark, path, qs, k=5, nprobe=3,
                         broadcast_max_queries=1_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert _nonparam_bnlj(small_plan) != []


def test_ivfsq_knn_join_shuffle_arm_matches_broadcast(spark, tmp_path):
    """SQ twin of the shuffle-arm invariant: identical rows on both
    arms, equi-join plan shape, partition pruning preserved."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators import similarity as SIM

    e = _vecs(spark)
    model = Q.sq_train(e)
    cents = SIM.choose_centroids(e, n_centroids=8)
    path = str(tmp_path / "ivfsq")
    Q.write_ivfsq_index(e, cents, model, path)
    qs = e.filter(F.col("vec_id").isin([3, 7, 11])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    def rows(df):
        return sorted((r.q_id, r.vec_id, r.sq_dist) for r in df.collect())

    bc = rows(Q.ivfsq_knn_join(spark, path, qs, k=5, nprobe=3,
                               broadcast_queries=True))
    sh_df = Q.ivfsq_knn_join(spark, path, qs, k=5, nprobe=3,
                             broadcast_queries=False)
    assert rows(sh_df) == bc and len(bc) == 15
    plan = sh_df._jdf.queryExecution().executedPlan().toString()
    assert _nonparam_bnlj(plan) == []
    assert "CartesianProduct" not in plan
    assert "PartitionFilters" in plan and "ivf_cell" in plan


def test_indexless_knn_joins_nonbroadcast_arm_matches(spark):
    """pq_adc_knn_join / sq_knn_join with broadcast_queries=False score
    via a partitioned cross join (no broadcast-memory ceiling on the
    batch; the quadratic compute is inherent to index-less exact
    scoring) and must return rows identical to the broadcast arm."""
    from pyspark.sql import functions as F

    e = _vecs(spark).filter(F.col("vec_id") < 200)
    books = Q.deterministic_codebooks(4, 16, 16)
    enc = Q.pq_encode(e, books)
    model = Q.sq_train(e)
    enc_sq = Q.sq_encode(e, model)
    qs = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    bc_pq = sorted(
        (r.q_id, r.vec_id, r.adc_dist)
        for r in Q.pq_adc_knn_join(enc, books, qs, k=5).collect()
    )
    nb_pq = sorted(
        (r.q_id, r.vec_id, r.adc_dist)
        for r in Q.pq_adc_knn_join(
            enc, books, qs, k=5, broadcast_queries=False
        ).collect()
    )
    assert bc_pq == nb_pq and len(bc_pq) == 20

    bc_sq = sorted(
        (r.q_id, r.vec_id, r.sq_dist)
        for r in Q.sq_knn_join(enc_sq, model, qs, k=5).collect()
    )
    nb_sq = sorted(
        (r.q_id, r.vec_id, r.sq_dist)
        for r in Q.sq_knn_join(
            enc_sq, model, qs, k=5, broadcast_queries=False
        ).collect()
    )
    assert bc_sq == nb_sq and len(bc_sq) == 20


def test_residual_failure_keeps_count_baselines(spark, tmp_path, monkeypatch):
    """r16 ADVICE (re-targeted for the r17 one-pass stats read-back): a
    residual-estimator failure records build_residual_mean=None but
    KEEPS build_n / build_cell_sizes, so the count drift tiers survive
    on their own.  The merged pass goes through ``_recon_frame`` —
    breaking it simulates a malformed code row taking down the
    reconstruction (and with it the merged scan), after which the
    counts are re-read footer-only."""
    from spectrify_spark.operators import similarity as SIM
    from spectrify_spark.operators._sidecar import read_json_sidecar

    e = _vecs(spark).limit(64)
    cents = SIM.kmeans_refine(e, SIM.choose_centroids(e, 4), iters=1)
    books = Q.deterministic_codebooks(4, 16, 16)

    def boom(*a, **k):
        raise RuntimeError("malformed code row")

    # r18: stats normally ride the write via observe(); disable that
    # arm so the degradation chain under test (read-back residual
    # failure -> footer-only counts) is actually exercised
    monkeypatch.setattr(Q, "_observed_compressed_stats", boom)
    monkeypatch.setattr(Q, "_recon_frame", boom)
    monkeypatch.setattr(Q, "_compressed_residual_mean", boom)
    idx = str(tmp_path / "ivfpq")
    Q.write_ivfpq_index(e, cents, books, idx)
    stats = read_json_sidecar(spark, idx, Q._IVFPQ_SIDECAR)["stats"]
    assert stats["build_n"] > 0 and stats["build_cell_sizes"]
    assert stats["build_residual_mean"] is None

    model = Q.sq_train(e)
    idx2 = str(tmp_path / "ivfsq")
    Q.write_ivfsq_index(e, cents, model, idx2)
    stats2 = read_json_sidecar(spark, idx2, Q._IVFSQ_SIDECAR)["stats"]
    assert stats2["build_n"] > 0 and stats2["build_cell_sizes"]
    assert stats2["build_residual_mean"] is None


def test_observed_write_stats_match_readback(spark, tmp_path, monkeypatch):
    """r18 opt round: the drift baselines ride the index write via
    observe() — zero read-back scan.  The observed arm must agree with
    the read-back arm exactly on every count and within float-sum
    association noise on the residual mean, for all three writers."""
    from spectrify_spark.operators import similarity as SIM
    from spectrify_spark.operators._sidecar import read_json_sidecar

    e = _vecs(spark).limit(96)
    cents = SIM.kmeans_refine(e, SIM.choose_centroids(e, 4), iters=1)
    books = Q.deterministic_codebooks(4, 16, 16)
    model = Q.sq_train(e)

    cases = [
        ("ivf", lambda d: SIM.write_ivf_index(e, cents, d), SIM._IVF_SIDECAR),
        (
            "ivfpq",
            lambda d: Q.write_ivfpq_index(e, cents, books, d),
            Q._IVFPQ_SIDECAR,
        ),
        (
            "ivfsq",
            lambda d: Q.write_ivfsq_index(e, cents, model, d),
            Q._IVFSQ_SIDECAR,
        ),
    ]
    for name, writer, sidecar in cases:
        d_obs = str(tmp_path / f"{name}_obs")
        writer(d_obs)
        obs = read_json_sidecar(spark, d_obs, sidecar)["stats"]

        def boom(*a, **k):
            raise RuntimeError("observe disabled")

        monkeypatch.setattr(SIM, "_observed_build_stats", boom)
        try:
            d_rb = str(tmp_path / f"{name}_rb")
            writer(d_rb)
            rb = read_json_sidecar(spark, d_rb, sidecar)["stats"]
        finally:
            monkeypatch.undo()
        assert obs["build_n"] == rb["build_n"] > 0, name
        assert obs["build_cell_sizes"] == rb["build_cell_sizes"], name
        assert obs["residual_n"] == rb["residual_n"], name
        assert obs["build_residual_mean"] == pytest.approx(
            rb["build_residual_mean"], abs=1e-9
        ), name
