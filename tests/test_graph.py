"""PageRank tests (operators/graph.py) against a pure-Python
reference implementation of the same fixed-iteration, unnormalized,
dangling-mass-ignored formulation."""

from __future__ import annotations

import pytest

from spectrify_spark.operators.graph import pagerank


def _py_pagerank(edges, iters=3, d=0.85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iters):
        inc = {n: 0.0 for n in nodes}
        for s, t in edges:
            inc[t] += ranks[s] / outdeg[s]
        ranks = {n: (1.0 - d) + d * inc[n] for n in nodes}
    return ranks


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.id: r.rank for r in pagerank(df, **kw).collect()}


def test_cycle_is_stationary(spark):
    """A 3-cycle is already the fixed point: every rank stays 1.0."""
    out = _run(spark, [(1, 2), (2, 3), (3, 1)], iters=3)
    assert out == {1: pytest.approx(1.0), 2: pytest.approx(1.0), 3: pytest.approx(1.0)}


def test_star_matches_reference(spark):
    """Hub with two leaves, edges both ways — ranks after 3 rounds must
    match the Python reference to FP precision."""
    edges = [(0, 1), (0, 2), (1, 0), (2, 0)]
    ref = _py_pagerank(edges, iters=3)
    out = _run(spark, edges, iters=3)
    assert set(out) == set(ref)
    for n in ref:
        assert out[n] == pytest.approx(ref[n], abs=1e-12)
    # the hub outranks the leaves
    assert out[0] > out[1] == pytest.approx(out[2])


def test_dangling_and_sourceless_nodes(spark):
    """A -> B only: B is dangling (contributes nothing), A has no
    in-edges and settles at 1 - d; both still appear in the output."""
    out = _run(spark, [(10, 20)], iters=3)
    ref = _py_pagerank([(10, 20)], iters=3)
    assert out[10] == pytest.approx(0.15)
    assert out[20] == pytest.approx(ref[20], abs=1e-12)


def test_duplicate_edges_deduped(spark):
    """Duplicate input edges must not double-count contributions."""
    once = _run(spark, [(1, 2), (2, 1)], iters=2)
    dup = _run(spark, [(1, 2), (1, 2), (2, 1)], iters=2)
    assert once == dup


def test_iters_zero_returns_init(spark):
    out = _run(spark, [(1, 2)], iters=0)
    assert out == {1: 1.0, 2: 1.0}


def _py_hits(edges, iters=2):
    edges = sorted(set(edges))
    hubs = {s: 1.0 for s, _ in edges}
    auths = None
    for _ in range(iters):
        auths = {}
        for s, t in edges:
            auths[t] = auths.get(t, 0.0) + hubs[s]
        tot = sum(auths.values())
        auths = {k: v / tot for k, v in auths.items()}
        hubs = {}
        for s, t in edges:
            hubs[s] = hubs.get(s, 0.0) + auths[t]
        tot = sum(hubs.values())
        hubs = {k: v / tot for k, v in hubs.items()}
    return hubs, auths


def test_hits_matches_reference_and_ranks_hub(spark):
    """Supplier 1 buys three parts, supplier 2 buys one shared part:
    scores must match the Python reference, hub/authority L1 sums are
    1, and the busier supplier is the better hub."""
    from spectrify_spark.operators.graph import hits

    edges = [(1, 10), (1, 11), (1, 12), (2, 10)]
    ref_h, ref_a = _py_hits(edges, iters=2)
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = hits(df, iters=2).collect()
    got_h = {r.id: r.score for r in out if r.kind == "hub"}
    got_a = {r.id: r.score for r in out if r.kind == "authority"}
    assert set(got_h) == set(ref_h) and set(got_a) == set(ref_a)
    for k in ref_h:
        assert got_h[k] == pytest.approx(ref_h[k], abs=1e-12)
    for k in ref_a:
        assert got_a[k] == pytest.approx(ref_a[k], abs=1e-12)
    assert sum(got_h.values()) == pytest.approx(1.0)
    assert sum(got_a.values()) == pytest.approx(1.0)
    assert got_h[1] > got_h[2]
    # the shared part 10 is the strongest authority
    assert got_a[10] == max(got_a.values())


def test_hits_rejects_zero_iters(spark):
    from spectrify_spark.operators.graph import hits

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        hits(df, iters=0)


def test_pagerank_weighted_reduces_to_uniform_and_respects_weights(spark):
    """Equal weights reproduce the unweighted ranks exactly; a heavier
    edge pulls proportionally more rank to its target."""
    from spectrify_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 1), (3, 1)]
    base = _run(spark, edges, iters=3)
    wdf = spark.createDataFrame(
        [(s, t, 1.0) for s, t in edges], ["src", "dst", "w"]
    )
    uniform = {
        r.id: r.rank for r in pagerank(wdf, iters=3, weight="w").collect()
    }
    for n in base:
        assert uniform[n] == pytest.approx(base[n], abs=1e-12)
    # now 1 -> 2 carries 3x the weight of 1 -> 3
    skew = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    ranks = {r.id: r.rank for r in pagerank(skew, iters=3, weight="w").collect()}
    assert ranks[2] > ranks[3]
    # duplicate weighted edges sum: (1->2, 1.5) twice == (1->2, 3.0)
    dup = spark.createDataFrame(
        [(1, 2, 1.5), (1, 2, 1.5), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    ranks_dup = {r.id: r.rank for r in pagerank(dup, iters=3, weight="w").collect()}
    for n in ranks:
        assert ranks_dup[n] == pytest.approx(ranks[n], abs=1e-12)


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles; adding a pendant edge changes nothing;
    duplicate and reversed edges must not double-count."""
    from spectrify_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 9)] + [(b, a) for a, b in k4] + k4  # dupes + reversed
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    assert triangle_count(df).collect()[0].n_triangles == 4


def test_triangle_count_assume_canonical_parity(spark):
    """r17 opt round: assume_canonical=True (input already src<dst and
    distinct — the cooccurrence_edges contract) must count identically
    to the default canonicalizing arm; it only skips the dedup shuffle
    of already-deduped data."""
    from spectrify_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    canon = spark.createDataFrame(
        k4 + [(3, 9)], "src bigint, dst bigint"
    )
    base = triangle_count(canon).collect()[0].n_triangles
    fast = triangle_count(
        canon, assume_canonical=True
    ).collect()[0].n_triangles
    assert base == fast == 4


def test_triangle_count_triangle_free(spark):
    from spectrify_spark.operators.graph import triangle_count

    # bipartite (star) graph: no triangles
    df = spark.createDataFrame([(0, i) for i in range(1, 6)], "src bigint, dst bigint")
    assert triangle_count(df).collect()[0].n_triangles == 0


def test_triangle_count_celebrity_hub(spark):
    """Mid-id celebrity vertex: the shape where id-ordered wedge
    enumeration blows up quadratically (PERF_NOTES r9); degree
    orientation must return the exact count (hub-ring graph: one
    triangle per ring edge whose BOTH endpoints touch the hub)."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators.graph import triangle_count

    hub = 500
    edges = (
        spark.range(1, 1001)
        .filter(F.col("id") != hub)
        .select(F.col("id").alias("src"), F.lit(hub).cast("long").alias("dst"))
        .unionByName(
            spark.range(1, 1000).select(
                F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
            )
        )
    )
    # ring edges: (i, i+1) for i in 1..999; both endpoints hub-adjacent
    # except the two edges touching the hub itself -> 999 - 2 = 997
    assert triangle_count(edges).collect()[0].n_triangles == 997


def test_pagerank_dangling_redistribution(spark):
    """redistribute_dangling=True matches a hand-iterated reference on
    a small graph with a dangling node, and conserves total mass at
    N * (1-d) + d * N = N (no damping leak when mass is recycled)."""
    from spectrify_spark.operators.graph import pagerank

    # 1 -> 2, 1 -> 3, 2 -> 3 ; 3 is dangling
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src bigint, dst bigint"
    )
    d, n = 0.85, 3.0
    r = {1: 1.0, 2: 1.0, 3: 1.0}
    for _ in range(3):
        dm = r[3]
        r = {
            1: (1 - d) + d * (dm / n),
            2: (1 - d) + d * (r[1] / 2 + dm / n),
            3: (1 - d) + d * (r[1] / 2 + r[2] + dm / n),
        }
    got = {
        row.id: row.rank
        for row in pagerank(
            edges, iters=3, damping=0.85, redistribute_dangling=True
        ).collect()
    }
    assert got.keys() == r.keys()
    for k in r:
        assert abs(got[k] - r[k]) < 1e-12
    assert abs(sum(got.values()) - n) < 1e-9
    # default (no redistribution) loses the dangling mass: sum < N
    got0 = {
        row.id: row.rank
        for row in pagerank(edges, iters=3, damping=0.85).collect()
    }
    assert sum(got0.values()) < n - 0.1


# ---------------------------------------------------------------------------
# connected_components (large-star / small-star contraction)


def _py_components(edges):
    """Union-find ground truth: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(spark, edges, **kw):
    from spectrify_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.id: r.component for r in connected_components(df, **kw).collect()}


def test_cc_two_components_and_singleton_edge(spark):
    out = _run_cc(spark, [(1, 2), (2, 3), (10, 11), (20, 20)])
    # the self-loop node 20 still appears, labeled by itself
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_cc_high_diameter_chain_converges_in_log_rounds(spark):
    """A 256-hop chain: label propagation needs 256 rounds; star
    contraction must finish inside the default 25-round budget (it
    takes ~log n) and label every node with the chain head."""
    edges = [(i, i + 1) for i in range(256)]
    out = _run_cc(spark, edges)
    assert set(out.values()) == {0}
    assert len(out) == 257


def test_cc_matches_union_find_on_random_graphs(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expected = _py_components(edges)
        assert _run_cc(spark, edges) == expected


def test_cc_duplicate_and_reversed_edges(spark):
    out = _run_cc(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert out == {1: 1, 2: 1, 3: 1}


def test_cc_string_ids(spark):
    out = _run_cc(spark, [("b", "a"), ("c", "b"), ("x", "y")])
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_agrees_with_propagation_kernel(spark):
    """The two CC implementations (star contraction here, min-label
    propagation in dedup.py) must agree on a graph shallow enough for
    both."""
    from spectrify_spark.operators.dedup import (
        connected_components as prop_cc,
    )

    edges = [(1, 5), (5, 9), (2, 6), (6, 2), (9, 3)]
    star = _run_cc(spark, edges)
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    prop = {r.id: r.cluster_id for r in prop_cc(pairs).collect()}
    assert star == prop


def test_cc_raises_on_exhausted_round_budget(spark):
    from spectrify_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(256)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(df, max_iters=2).collect()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_cc_property_matches_union_find(spark, edges):
    """Star contraction equals union-find ground truth on arbitrary
    random multigraphs (self-loops, duplicates, reversed edges)."""
    expected = _py_components([(a, b) for a, b in edges if a != b])
    # self-loop-only nodes are isolated singletons in the output
    for a, b in edges:
        if a == b:
            expected.setdefault(a, a)
    assert _run_cc(spark, edges) == expected


def test_cc_incremental_star_forest_plus_delta(spark):
    """Incremental maintenance: contracting (previous run's star edges
    UNION the delta edges) equals a full recomputation over all raw
    edges — the 100 TB pattern where the raw edge set is never
    rescanned; the star forest (one edge per non-root node) stands in
    for it."""
    from spectrify_spark.operators.graph import connected_components

    base = [(1, 2), (2, 3), (10, 11), (20, 21)]
    delta = [(3, 10), (30, 31)]  # merges {1,2,3} with {10,11}; new comp
    full = _run_cc(spark, base + delta)

    comp0 = connected_components(
        spark.createDataFrame(base, ["src", "dst"])
    )
    star_edges = comp0.filter("id != component").select(
        comp0.id.alias("src"), comp0.component.alias("dst")
    )
    merged = star_edges.unionByName(
        spark.createDataFrame(delta, ["src", "dst"])
    )
    incr = {
        r.id: r.component for r in connected_components(merged).collect()
    }
    # the star forest drops isolated singletons (they have no edge);
    # full recompute keeps them — compare on the star-covered nodes
    assert incr == {k: v for k, v in full.items() if k in incr}
    assert incr[11] == 1 and incr[30] == 30  # merged + new component


# ----------------------------------------------------- cooccurrence guard


def _cooc_df(spark, rows):
    return spark.createDataFrame(rows, ["g", "item"])


def test_cooccurrence_edges_known_pairs(spark):
    from spectrify_spark.operators.graph import cooccurrence_edges

    rows = [
        ("g1", 1), ("g1", 2), ("g1", 3),
        ("g2", 1), ("g2", 2),
        ("g3", 1), ("g3", 2), ("g3", 2),  # in-group repeat: no effect
    ]
    out = cooccurrence_edges(
        _cooc_df(spark, rows), "g", "item", min_count=2
    ).collect()
    assert {(r.src, r.dst) for r in out} == {(1, 2)}


def test_cooccurrence_edges_raises_on_oversized_group(spark):
    """A planted group over the cap fails LOUD before the quadratic
    explode — the single-task-OOM shape at 100 TB (one bot basket's
    pair blowup lives inside one row, which AQE cannot split)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from spectrify_spark.operators.graph import cooccurrence_edges

    rows = [("bot", i) for i in range(50)] + [("ok", 1), ("ok", 2)]
    guarded = cooccurrence_edges(
        _cooc_df(spark, rows), "g", "item", max_group_size=10
    )
    with pytest.raises(SparkRuntimeException, match="max_group_size=10"):
        guarded.collect()


def test_cooccurrence_edges_drop_mode_filters_and_counts(spark):
    from spectrify_spark.operators.graph import cooccurrence_edges

    rows = (
        [("bot", i) for i in range(50)]
        + [("g1", 1), ("g1", 2), ("g2", 1), ("g2", 2)]
    )
    out = cooccurrence_edges(
        _cooc_df(spark, rows),
        "g",
        "item",
        min_count=2,
        max_group_size=10,
        on_oversize="drop",
    )
    assert {(r.src, r.dst) for r in out.collect()} == {(1, 2)}
    # the no-silent-caps count rides the same action via observe
    # (metric name cooccurrence_oversized_* -> value 1); surfacing it
    # needs a QueryExecutionListener, so here we pin the semantics:
    # guard ON drops the bot pairs, guard OFF keeps them
    full = cooccurrence_edges(
        _cooc_df(spark, rows), "g", "item", min_count=1, max_group_size=None
    )
    # bot items are range(50), so (1,2) is already among the C(50,2)
    # bot pairs — the unguarded pair count is exactly C(50,2)
    assert full.count() == 50 * 49 // 2


def test_cooccurrence_edges_rejects_bad_mode(spark):
    from spectrify_spark.operators.graph import cooccurrence_edges

    with pytest.raises(ValueError, match="on_oversize"):
        cooccurrence_edges(
            _cooc_df(spark, [("g", 1)]), "g", "item", on_oversize="ignore"
        )


# ------------------------------------------------------ label propagation


def _py_lpa(edges, iters):
    """Synchronous min-tie LPA reference."""
    adj: dict = {}
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    lab = {n: n for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            counts: dict = {}
            for nb in adj.get(n, ()):
                counts[lab[nb]] = counts.get(lab[nb], 0) + 1
            if not counts:
                nxt[n] = lab[n]
            else:
                nxt[n] = min(
                    counts, key=lambda c: (-counts[c], c)
                )
        lab = nxt
    return lab


def _run_lpa(spark, edges, iters):
    from spectrify_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.id: r.label
        for r in label_propagation(df, iters=iters).collect()
    }


def test_lpa_matches_reference_on_bridged_clusters(spark):
    """Two triangles joined by one bridge: connected components fuse
    them into one; LPA keeps two communities — per-iteration output
    equals the synchronous min-tie Python reference exactly."""
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (7, 7)]
    for iters in (0, 1, 2, 3):
        assert _run_lpa(spark, edges, iters) == _py_lpa(edges, iters), iters
    final = _run_lpa(spark, edges, 3)
    assert final[1] == final[2] == final[3]
    assert final[4] == final[5] == final[6]
    assert final[1] != final[4]  # bridge did NOT merge the communities
    assert final[7] == 7  # self-loop-only node keeps its own label


def test_lpa_matches_reference_on_random_graphs(spark):
    import random

    rng = random.Random(11)
    for trial in range(3):
        n = 12
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(20)
        ]
        assert _run_lpa(spark, edges, 2) == _py_lpa(edges, 2), (trial, edges)


def test_lpa_validates_iters(spark):
    import pytest

    from spectrify_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="iters"):
        label_propagation(df, iters=-1)


# ------------------------------------------- r13 guard/hygiene regressions


def test_cooccurrence_default_is_unguarded(spark):
    """ADVICE fix (r12): the guard is opt-in — with no max_group_size
    the full pair set is produced (no silent cap, no failing default);
    callers at production scale set the cap explicitly."""
    from spectrify_spark.operators.graph import cooccurrence_edges

    rows = [("big", i) for i in range(50)]
    out = cooccurrence_edges(_cooc_df(spark, rows), "g", "item", min_count=1)
    assert out.count() == 50 * 49 // 2


def test_cc_shuffle_partitions_is_plan_local(spark):
    """r11 item 4: shuffle_partitions must size the contraction plan
    via repartition(), NOT mutate the session-global
    spark.sql.shuffle.partitions (a shared session's concurrent
    queries would see the reduced value mid-loop).  Pins both the
    no-conf-mutation contract and result correctness under the knob."""
    from spectrify_spark.operators.graph import connected_components

    calls = []
    orig = spark.conf.set

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    spark.conf.set = spy
    try:
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["src", "dst"]
        )
        comp = {
            r.id: r.component
            for r in connected_components(df, shuffle_partitions=3).collect()
        }
    finally:
        spark.conf.set = orig
    assert not [c for c in calls if "shuffle.partitions" in str(c)]
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_lpa_degree_guard_raises_and_drops(spark):
    """r11 item 5: the per-node vote window has no skew escape — a
    celebrity node concentrates its whole neighborhood in ONE window
    partition.  Planted hub (degree 20) over max_degree=10: raise
    names the node; drop removes only the hub's INCOMING votes (hub
    keeps its own label, leaves still adopt the hub's), one row per
    node either way."""
    from spectrify_spark.operators.graph import label_propagation

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 21)], ["src", "dst"]
    )
    with pytest.raises(ValueError, match="max_degree=10"):
        label_propagation(star, iters=1, max_degree=10)

    out = {
        r.id: r.label
        for r in label_propagation(
            star, iters=1, max_degree=10, on_oversize="drop"
        ).collect()
    }
    assert len(out) == 21
    assert out[0] == 0  # hub kept its own label (votes into it dropped)
    assert all(out[i] == 0 for i in range(1, 21))  # leaves adopt hub's

    # unguarded: the hub ADOPTS the smallest neighbor label instead
    full = {
        r.id: r.label for r in label_propagation(star, iters=1).collect()
    }
    assert full[0] == 1

    with pytest.raises(ValueError, match="on_oversize"):
        label_propagation(star, iters=1, max_degree=10, on_oversize="x")
