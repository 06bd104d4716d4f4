"""Per-partition Vamana graph micro-index (M3/M4): build + beam search.

Reference semantics under test:
- RobustPrune diversity (graph/diversity/VamanaDiversityProvider.java:45-99)
- backlink + overflow + enforceDegree (graph/ConcurrentNeighborMap.java:56-223)
- beam search with exact rerank (graph/GraphSearcher.java:222-507)
- two-phase delete: tombstoned nodes traversed, filtered from results
  (graph/GraphIndexBuilder.java markDeleted -> removeDeletedNodes)
"""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from jvector_spark.operators import exact
from jvector_spark.operators.graph import (
    _batch_beam,
    _build_partition_graph,
    _exact_sims_block,
    _exact_sims_gathered,
    _knn_candidates,
    _pair_sims,
    _pilot_entries,
    _retain_diverse_batch,
    graph_meta,
)
from jvector_spark.operators.index import IVFIndexBuilder


# ------------------------------------------------------------- numpy core
def test_retain_diverse_semantics():
    """Hand-checkable RobustPrune: collinear near points crowd each other
    out; the alpha sweep admits a crowded-but-near candidate only after
    farther diverse ones at alpha=1."""
    # owner at origin; candidates: two near-duplicates east, one north
    x = np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.05, 0.0], [0.0, 1.2]], dtype=np.float32
    )
    cand = np.array([[1, 2, 3]])  # score-desc for EUCLIDEAN distances
    sc = 1.0 / (
        1.0 + np.sum((x[cand[0]] - x[0]) ** 2, axis=1, dtype=np.float64)
    ).astype(np.float32)[None, :]
    sims = _pair_sims("EUCLIDEAN", x[cand])
    sel = _retain_diverse_batch(sims, sc, np.ones_like(cand, bool), 2, 1.2)
    # nearest (node 1) always kept; node 2 is dominated by node 1
    # (sim(2,1) >> sim(2,owner)); node 3 is diverse
    assert sel[0].tolist() == [True, False, True]


def test_retain_diverse_degree_cap():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    idx, sc = _knn_candidates(x, 20, "COSINE")
    sims = _pair_sims("COSINE", x[idx])
    sel = _retain_diverse_batch(sims, sc, np.ones_like(idx, bool), 5, 1.2)
    assert (sel.sum(axis=1) <= 5).all()
    assert (sel.sum(axis=1) >= 1).all()  # the nearest is always diverse


@pytest.mark.parametrize("met", ["COSINE", "EUCLIDEAN", "DOT_PRODUCT"])
def test_build_partition_graph_invariants(met):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 12)).astype(np.float32)
    nbrs, entry = _build_partition_graph(
        x, degree=12, alpha=1.2, overflow=1.2, ef_c=24, met=met
    )
    assert 0 <= entry < 300
    for i, a in enumerate(nbrs):
        assert len(a) <= 12  # enforceDegree (M4)
        assert len(np.unique(a)) == len(a)  # no duplicate edges
        assert i not in a  # no self edges
    # connectivity: beam search must be able to reach ~everything
    seen, frontier = {entry}, [entry]
    while frontier:
        frontier = [
            int(v) for u in frontier for v in nbrs[u] if int(v) not in seen
        ]
        seen.update(frontier)
    assert len(seen) >= 295  # near-total reachability from the entry


def test_batch_beam_exact_steering_recall():
    """With exact similarity steering the beam, recall@10 should be ~1
    (the graph, not the scorer, is then the only approximation)."""
    rng = np.random.default_rng(2)
    n, k, ef = 1500, 10, 48
    x = rng.normal(size=(n, 24)).astype(np.float32)
    nbrs, entry = _build_partition_graph(
        x, degree=20, alpha=1.2, overflow=1.2, ef_c=40, met="COSINE"
    )
    deg = max(len(a) for a in nbrs)
    nbr_mat = np.full((n, deg), -1, np.int64)
    for i, a in enumerate(nbrs):
        nbr_mat[i, : len(a)] = a
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    q = xn[:24]
    sims = ((1 + q @ xn.T) / 2).astype(np.float32)

    def score_fn(aq, cand):
        return sims[aq[:, None], np.maximum(cand, 0)]

    beams = _batch_beam(score_fn, nbr_mat, np.array([entry]), 24, n, ef)
    gt = np.argsort(-sims, axis=1)[:, :k]
    hits = sum(
        len(set(gt[i]) & set(beams[i][beams[i] >= 0].tolist()))
        for i in range(24)
    )
    assert hits / (24 * k) >= 0.95


@pytest.mark.parametrize("met", ["COSINE", "EUCLIDEAN"])
def test_incremental_build_invariants_and_recall(met):
    """The batched-insert builder (GraphIndexBuilder.java:436 addGraphNode,
    batched) keeps the exact builder's structural invariants and lands
    within a few recall points of it under identical beam search."""
    from jvector_spark.operators.graph import (
        _build_partition_graph_incremental,
    )

    rng = np.random.default_rng(4)
    n, d = 6000, 24
    centers = rng.normal(size=(12, d))
    x = (centers[rng.integers(0, 12, n)] +
         0.3 * rng.normal(size=(n, d))).astype(np.float32)
    nbrs_i, e_i = _build_partition_graph_incremental(
        x, degree=16, alpha=1.2, overflow=1.2, ef_c=32, met=met,
        seed_n=1024, batch=512,
    )
    assert ((e_i >= 0) & (e_i < n)).all()  # multi-entry spread
    # overflow cap + the bounded append-only reconnection reserve
    cap_total = int(np.ceil(16 * 1.2)) + 8
    for i, a in enumerate(nbrs_i):
        assert len(a) <= cap_total
        assert len(np.unique(a)) == len(a)
        assert i not in a
        assert (a >= 0).all() and (a < n).all()
    # reconnection contract: near-total reachability from the entries
    seen = set(int(e) for e in e_i)
    frontier = list(seen)
    while frontier:
        frontier = [
            int(v) for u in frontier for v in nbrs_i[u] if int(v) not in seen
        ]
        seen.update(frontier)
    assert len(seen) >= 0.97 * n

    def beam_recall(nbrs, entry):
        entry = np.atleast_1d(np.asarray(entry, dtype=np.int64))
        deg = max(len(a) for a in nbrs)
        nbr_mat = np.full((n, deg), -1, np.int64)
        for i, a in enumerate(nbrs):
            nbr_mat[i, : len(a)] = a
        nq = 48
        q = x[rng.choice(n, nq, replace=False)] + 0.05 * rng.normal(
            size=(nq, d)
        ).astype(np.float32)
        q = q.astype(np.float32)
        if met == "COSINE":
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = ((1 + qn @ xn.T) / 2).astype(np.float32)
        else:
            d2 = (
                np.einsum("ij,ij->i", q, q)[:, None]
                + np.einsum("ij,ij->i", x, x)[None, :]
                - 2.0 * (q @ x.T)
            )
            sims = (1.0 / (1.0 + np.maximum(d2, 0))).astype(np.float32)

        def score_fn(aq, cand):
            return sims[aq[:, None], np.maximum(cand, 0)]

        beams = _batch_beam(score_fn, nbr_mat, entry, nq, n, 64)
        gt = np.argsort(-sims, axis=1)[:, :10]
        return sum(
            len(set(gt[i]) & set(beams[i][beams[i] >= 0].tolist()))
            for i in range(nq)
        ) / (nq * 10)

    r_inc = beam_recall(nbrs_i, e_i)
    nbrs_e, e_e = _build_partition_graph(
        x, degree=16, alpha=1.2, overflow=1.2, ef_c=32, met=met
    )
    r_ex = beam_recall(nbrs_e, e_e)
    # this corpus is 12 SEPARATED islands — adversarial for any
    # single-entry Vamana (the exact builder's graph is disconnected by
    # construction and collapses to ~1/islands recall). The incremental
    # builder's insert-search edges + multi-entry + reconnection must
    # beat it by a wide margin and clear an absolute floor.
    assert r_inc >= r_ex + 0.3, (r_inc, r_ex)
    assert r_inc >= 0.6, (r_inc, r_ex)


# ------------------------------------------------------------- Spark e2e
def _corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


def _recall(res_rows, gt_rows):
    gtr = {(r["qid"], r["id"]) for r in gt_rows}
    return sum((r["qid"], r["id"]) in gtr for r in res_rows) / max(len(gtr), 1)


@pytest.fixture(scope="module")
def graph_index(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_idx_")
    idx = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=8).fit(
        corpus, tmp
    )
    idx.build_graph(degree=16, ef_construction=32)
    return idx, corpus


def test_build_graph_incremental_method_e2e(spark, sf_dir):
    """method='incremental' flows through the Spark builder: meta records
    it and the traversal route returns exact-scored results."""
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_incr_")
    idx = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=4).fit(
        corpus, tmp
    )
    idx.build_graph(degree=16, ef_construction=32, method="incremental")
    meta = graph_meta(idx, idx.manifest.segments[0].name)
    assert meta["method"] == "incremental"
    q = corpus.limit(8).selectExpr("id as qid", "vec")
    res = idx.search_graph(q, k=5, n_probe=4, ef_search=64)
    rows = res.collect()
    assert len(rows) == 40
    gt = exact.knn_join(corpus, q, 5, metric="COSINE", strategy="numpy")
    assert _recall(rows, gt.collect()) >= 0.9


def test_graph_search_exact_steer(spark, graph_index):
    """steer='exact': fp32-steered beams, no second pass — recall is
    graph-limited, and the broadcast/distributed routes agree
    bit-for-bit (same kernel, same score space)."""
    idx, corpus = graph_index
    q = corpus.limit(8).selectExpr("id as qid", "vec")
    gt = exact.knn_join(corpus, q, 5, metric="COSINE", strategy="numpy")
    r_b = idx.search_graph(q, 5, n_probe=8, ef_search=64, steer="exact")
    rows_b = r_b.collect()
    assert _recall(rows_b, gt.collect()) >= 0.9
    r_d = idx.search_graph(
        q, 5, n_probe=8, ef_search=64, steer="exact",
        strategy="distributed", m_hint=10**9,
    )
    assert sorted(map(tuple, rows_b)) == sorted(map(tuple, r_d.collect()))
    with pytest.raises(ValueError, match="steer"):
        idx.search_graph(q, 5, steer="cosine-ish")


def test_graph_search_recall_and_exact_scores(spark, graph_index):
    idx, corpus = graph_index
    queries = corpus.filter(F.col("id") < 16).selectExpr("id as qid", "vec")
    res = idx.search_graph(queries, k=10, n_probe=4, ef_search=40).collect()
    gt = exact.knn_join(
        corpus, queries, k=10, metric="COSINE", strategy="numpy"
    ).collect()
    assert _recall(res, gt) >= 0.8
    # reported scores are EXACT for true-positive rows (fp32 rerank)
    gts = {(r["qid"], r["id"]): r["score"] for r in gt}
    for r in res:
        if (r["qid"], r["id"]) in gts:
            assert r["score"] == pytest.approx(gts[(r["qid"], r["id"])], abs=1e-12)
    # per-query fill + rank ordering
    per_q = {}
    for r in res:
        per_q.setdefault(r["qid"], []).append((r["rank"], r["score"]))
    for rows in per_q.values():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        assert all(rows[i][1] >= rows[i + 1][1] for i in range(len(rows) - 1))


def test_graph_meta_and_missing_graph_raises(spark, graph_index, sf_dir):
    idx, corpus = graph_index
    meta = graph_meta(idx, idx.manifest.segments[0].name)
    assert meta["degree"] == 16 and meta["metric"] == "COSINE"
    # an index without a graph refuses the traversal route loudly
    tmp = tempfile.mkdtemp(prefix="jvs_nograph_")
    bare = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=4).fit(
        corpus, tmp
    )
    queries = corpus.filter(F.col("id") < 4).selectExpr("id as qid", "vec")
    with pytest.raises(ValueError, match="no graph"):
        bare.search_graph(queries, k=5)


def test_graph_search_tombstones_filtered(spark, sf_dir):
    """Two-phase delete on the graph route: deleted ids still route
    traversal but never appear in results."""
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_del_")
    idx = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=4).fit(
        corpus, tmp
    )
    idx.build_graph(degree=16, ef_construction=32)
    queries = corpus.filter(F.col("id") < 8).selectExpr("id as qid", "vec")
    # queries ARE corpus rows: their own id is the top-1 hit -> delete them
    idx.delete(list(range(8)))
    res = idx.search_graph(queries, k=5, n_probe=4, ef_search=40).collect()
    assert res and all(r["id"] >= 8 for r in res)
    per_q = {}
    for r in res:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
    assert all(v == 5 for v in per_q.values())  # refill from the beam


def test_graph_search_residual_and_slim(spark, sf_dir):
    """The traversal route composes with residual PQ steering and with
    slim (NVQ-rerank, no fp32) storage — built from NVQ reconstructions."""
    corpus = _corpus(spark, sf_dir)
    queries = corpus.filter(F.col("id") < 8).selectExpr("id as qid", "vec")
    gt = exact.knn_join(
        corpus, queries, k=10, metric="COSINE", strategy="numpy"
    ).collect()
    for kw in (
        dict(pq_residual=True),
        dict(store_fp32="none", rerank="nvq", pq_residual=False),
    ):
        tmp = tempfile.mkdtemp(prefix="jvs_graph_var_")
        idx = IVFIndexBuilder(
            metric="COSINE", pq_m=8, n_partitions=8, **kw
        ).fit(corpus, tmp)
        idx.build_graph(degree=16, ef_construction=32)
        res = idx.search_graph(queries, k=10, n_probe=4, ef_search=48).collect()
        assert _recall(res, gt) >= 0.7, kw


def test_graph_search_bq_first_pass(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_bq_")
    idx = IVFIndexBuilder(
        metric="COSINE", first_pass="bq", n_partitions=8
    ).fit(corpus, tmp)
    idx.build_graph(degree=16, ef_construction=32)
    queries = corpus.filter(F.col("id") < 8).selectExpr("id as qid", "vec")
    res = idx.search_graph(queries, k=10, n_probe=4, ef_search=64).collect()
    gt = exact.knn_join(
        corpus, queries, k=10, metric="COSINE", strategy="numpy"
    ).collect()
    assert _recall(res, gt) >= 0.5  # hamming steering is coarser


def test_graph_survives_append_with_rebuild(spark, sf_dir):
    """append() creates a graph-less segment; build_graph() covers only
    the new one (existing graphs are kept unless rebuild=True)."""
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_app_")
    idx = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=4).fit(
        corpus.filter(F.col("id") < 400), tmp
    )
    idx.build_graph(degree=16, ef_construction=32)
    idx.append(corpus.filter(F.col("id") >= 400))
    names = [s.name for s in idx.manifest.segments]
    assert graph_meta(idx, names[0]) is not None
    assert graph_meta(idx, names[1]) is None
    queries = corpus.filter(F.col("id") < 4).selectExpr("id as qid", "vec")
    with pytest.raises(ValueError, match=names[1]):
        idx.search_graph(queries, k=5)
    idx.build_graph(degree=16, ef_construction=32)  # fills only the gap
    res = idx.search_graph(queries, k=10, n_probe=4, ef_search=40).collect()
    gt = exact.knn_join(
        corpus, queries, k=10, metric="COSINE", strategy="numpy"
    ).collect()
    assert _recall(res, gt) >= 0.7


def test_compact_rebuilds_graph(spark, sf_dir):
    """M6 refinement analog: a compaction of all-graphed segments rebuilds
    the merged segment's graph with the same parameters — graph_search
    keeps working with no manual build_graph() call, and tombstoned rows
    are now physically gone."""
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_cmp_")
    idx = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=4).fit(
        corpus.filter(F.col("id") < 400), tmp
    )
    idx.build_graph(degree=16, ef_construction=32)
    idx.append(corpus.filter(F.col("id") >= 400))
    idx.build_graph(degree=16, ef_construction=32)  # graph the new segment
    idx.delete([0, 1])
    idx = idx.compact()
    names = [s.name for s in idx.manifest.segments]
    assert len(names) == 1
    meta = graph_meta(idx, names[0])
    assert meta is not None and meta["degree"] == 16
    queries = corpus.filter(F.col("id") < 8).selectExpr("id as qid", "vec")
    res = idx.search_graph(queries, k=10, n_probe=4, ef_search=40).collect()
    assert res and all(r["id"] >= 2 for r in res)
    gt = exact.knn_join(
        corpus.filter(F.col("id") >= 2), queries, k=10, metric="COSINE",
        strategy="numpy",
    ).collect()
    assert _recall(res, gt) >= 0.7


def test_compact_graphless_stays_graphless(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_cmp2_")
    idx = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=4).fit(
        corpus.filter(F.col("id") < 400), tmp
    )
    idx.append(corpus.filter(F.col("id") >= 400))
    idx = idx.compact()
    assert graph_meta(idx, idx.manifest.segments[0].name) is None


def test_tune_graph_route(spark, graph_index):
    """route='graph' Grid sweep: cheapest (n_probe, ef) meeting the
    target, ef ladder early-stopped, IO bound monotone in both knobs."""
    idx, corpus = graph_index
    out = idx.tune(route="graph", k=5, target_recall=0.6, sample=16)
    assert out["route"] == "graph"
    assert out["best"] is not None
    assert out["best"]["recall"] >= 0.6
    assert out["best"]["ef_search"] >= 10
    # the walk is cheapest-first: evaluated points' bounds never decrease
    # within one n_probe shape's ladder
    for a, b in zip(out["evaluated"], out["evaluated"][1:]):
        if a["n_probe"] == b["n_probe"]:
            assert b["visited_bound"] >= a["visited_bound"]
    # graph-less index refuses
    import tempfile as _tf

    bare = IVFIndexBuilder(metric="COSINE", pq_m=8, n_partitions=4).fit(
        corpus, _tf.mkdtemp(prefix="jvs_tune_nograph_")
    )
    with pytest.raises(ValueError, match="no graph"):
        bare.tune(route="graph", k=5)


def test_graph_search_distributed_route_parity(spark, graph_index):
    """The distributed (bulk) graph route returns IDENTICAL rows to the
    broadcast route — same traversal core, same rerank kernel, the only
    difference is where stage-1 payloads are computed."""
    idx, corpus = graph_index
    queries = corpus.filter(F.col("id") < 32).selectExpr("id as qid", "vec")
    a = idx.search_graph(
        queries, k=10, n_probe=4, ef_search=40, strategy="broadcast"
    ).collect()
    b = idx.search_graph(
        queries, k=10, n_probe=4, ef_search=40, strategy="distributed"
    ).collect()
    ka = sorted((r["qid"], r["id"], round(r["score"], 12)) for r in a)
    kb = sorted((r["qid"], r["id"], round(r["score"], 12)) for r in b)
    assert ka == kb


def test_graph_search_route_parity_tiny_partitions(spark):
    """Route parity where refill WOULD have engaged (r7 ADVICE): many
    partitions each far smaller than ef_search, so every query's beam
    holds fewer than rerank_k members. strict_mask restricts each query's
    candidates to ITS OWN beam, so chunk composition (which differs
    between routes) can no longer leak other queries' beam members in —
    the two routes must return bit-identical rows."""
    n, dim = 400, 8
    # private rng: the shared session-scoped `rng` fixture feeds later
    # modules' corpora — consuming draws here would shift their data and
    # flip marginal recall assertions (found the hard way, r8)
    mat = np.random.default_rng(1234).normal(size=(n, dim))
    corpus = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(n)],
        "id long, vec array<float>",
    )
    tmp = tempfile.mkdtemp(prefix="jvs_graph_tinyp_")
    # 32 partitions of ~12 rows each << ef_search=64
    idx = IVFIndexBuilder(metric="COSINE", pq_m=4, n_partitions=32).fit(
        corpus, tmp
    )
    idx.build_graph(degree=8, ef_construction=16)
    queries = corpus.filter(F.col("id") < 48).selectExpr("id as qid", "vec")
    a = idx.search_graph(
        queries, k=10, n_probe=6, ef_search=64, strategy="broadcast"
    ).collect()
    b = idx.search_graph(
        queries, k=10, n_probe=6, ef_search=64, strategy="distributed"
    ).collect()
    ka = sorted((r["qid"], r["id"], round(r["score"], 12)) for r in a)
    kb = sorted((r["qid"], r["id"], round(r["score"], 12)) for r in b)
    assert ka == kb
    assert len(ka) > 0


def test_graph_bulk_auto_routes_to_tile_on_small_partitions(spark, graph_index):
    """r7 VERDICT item 3: strategy='auto' with a bulk query load over
    SMALL partitions must not pay the 3-10x traversal penalty — it routes
    to the fused tile scan (same rerank kernels, recall >= the beam's).
    The sf fixtures' partitions (~hundreds of rows) sit far below the
    16x beam-visit threshold, so auto+large m_hint takes the tile path;
    results must carry the same schema and fill k rows per query."""
    from jvector_spark.operators.graph import _bulk_traversal_pays

    idx, corpus = graph_index
    assert not _bulk_traversal_pays(idx, ef=40)
    queries = corpus.filter(F.col("id") < 24).selectExpr("id as qid", "vec")
    res = idx.search_graph(
        queries, k=5, n_probe=8, ef_search=40, m_hint=10_000_000
    )
    rows = res.collect()
    assert {r["qid"] for r in rows} == set(range(24))
    assert all(r["rank"] <= 5 for r in rows)
    # exact-score contract holds on the tile path too
    gt = exact.knn_join(
        corpus, queries, k=5, metric="COSINE", strategy="numpy"
    ).collect()
    assert _recall(rows, gt) >= 0.8
    # a huge-partition estimate flips the decision arithmetic
    class _FakeSeg:
        n_rows = 50_000_000
        n_partitions = 10
        name = idx.manifest.segments[0].name

    class _FakeManifest:
        segments = [_FakeSeg()]
        spill = 1

    class _FakeIdx:
        manifest = _FakeManifest()
        _segments = idx._segments
        path = idx.path

    assert _bulk_traversal_pays(_FakeIdx(), ef=40)


def test_graph_emit_k_reduction_is_lossless(spark, graph_index):
    """A/B the per-partition emission cut: without tombstones the route
    emits top-k per partition; WITH a tombstone it emits the full rerank
    pool (k_ret). Deleting an id that sits in no query's candidate pool
    flips the code path without changing any correct answer — the two
    runs must return identical rows (the proof the k-cut is lossless)."""
    idx, corpus = graph_index
    queries = corpus.filter(F.col("id") < 16).selectExpr("id as qid", "vec")
    kw = dict(k=10, n_probe=4, ef_search=60, overquery=6.0)
    res_cut = idx.search_graph(queries, **kw).collect()  # emit k
    # pick a victim no query's top-60 pool contains
    gt = exact.knn_join(
        corpus, queries, k=60, metric="COSINE", strategy="numpy"
    ).collect()
    in_pools = {r["id"] for r in gt}
    victim = max(
        r["id"] for r in corpus.select("id").collect() if r["id"] not in in_pools
    )
    idx.delete([victim])  # tombstone => emit k_ret (full pool)
    res_full = idx.search_graph(queries, **kw).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["qid"], r["rank"], r["id"], round(r["score"], 12)) for r in rows
    )
    assert key(res_cut) == key(res_full)
    assert len(res_cut) == 16 * 10


def test_graph_search_ef_below_k_raises(spark, graph_index):
    """ef_search < k would silently under-fill per-partition contributions
    (r7 ADVICE) — must raise like the probe_ratio validation does."""
    idx, corpus = graph_index
    queries = corpus.filter(F.col("id") < 4).selectExpr("id as qid", "vec")
    with pytest.raises(ValueError, match="ef_search"):
        idx.search_graph(queries, k=10, ef_search=5)


def test_graph_search_distributed_bulk(spark, sf_dir):
    """Corpus-as-queries through the distributed graph route (residual
    index): recall vs the exact self-join on a sampled slice."""
    corpus = _corpus(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="jvs_graph_bulk_")
    idx = IVFIndexBuilder(
        metric="COSINE", pq_m=8, n_partitions=8, pq_residual=True
    ).fit(corpus, tmp)
    idx.build_graph(degree=16, ef_construction=32)
    queries = corpus.selectExpr("id as qid", "vec")
    res = idx.search_graph(
        queries, k=5, n_probe=4, ef_search=40, strategy="distributed",
        m_hint=1_000_000,  # force the bulk route regardless of size
    )
    sample = res.filter(F.col("qid") < 16).collect()
    gt = exact.knn_join(
        corpus, corpus.filter(F.col("id") < 16).selectExpr("id as qid", "vec"),
        k=5, metric="COSINE", strategy="numpy",
    ).collect()
    assert _recall(sample, gt) >= 0.7


def test_pilot_entries_caps():
    """Pilot set: strided spread capped at n_local//16 (small partitions
    keep graph-route character), always a superset of stored entries."""
    ent = np.array([5, 900], dtype=np.int64)
    # large partition: 4*ef pilots
    pil = _pilot_entries(ent, 100_000, 64)
    assert len(pil) <= 256 + len(ent)
    assert set(ent).issubset(set(pil.tolist()))
    assert pil.max() < 100_000
    # small partition: cap n_local//16 binds (but never below entries)
    pil_s = _pilot_entries(ent, 320, 64)
    assert len(pil_s) <= max(320 // 16, len(ent)) + len(ent)
    # tiny: unchanged entries
    assert np.array_equal(_pilot_entries(ent, 16, 64), ent)


def test_exact_sims_block_bitwise_matches_gathered():
    """Seed scores must be BIT-identical to hop scores (route parity:
    the broadcast/distributed routes chunk queries differently, so any
    shape-dependent reduction order would drift the reported scores)."""
    rng = np.random.default_rng(0)
    c = rng.normal(size=(113, 64)).astype(np.float32)
    cn = np.einsum("ij,ij->i", c, c)
    for b_n in (1, 3, 257):
        q = rng.normal(size=(b_n, 64)).astype(np.float32)
        qn = np.einsum("ij,ij->i", q, q)
        for met in ("COSINE", "DOT_PRODUCT", "EUCLIDEAN"):
            blk = _exact_sims_block(met, q, c, qn, cn)
            gat = _exact_sims_gathered(
                met, q,
                np.broadcast_to(c, (b_n, 113, 64)).copy(),
                qn, np.broadcast_to(cn, (b_n, 113)).copy(),
            )
            assert np.array_equal(blk, gat)


def test_batch_beam_pilot_seeding_topef():
    """entries > ef: each query's beam seeds from ITS top-ef pilots, and
    the pilot-seeded beam finds the same best rows as the medoid-seeded
    one on a connected graph."""
    rng = np.random.default_rng(3)
    n, d, ef = 2000, 16, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    xnn = np.einsum("ij,ij->i", x, x)
    nbrs, entry = _build_partition_graph(x, 12, 1.2, 1.2, 32, "COSINE")
    width = max(len(a) for a in nbrs)
    nbr_mat = np.full((n, width), -1, np.int64)
    for i, a in enumerate(nbrs):
        nbr_mat[i, : len(a)] = a
    q = x[:8]
    qnn = xnn[:8]

    def score_fn(aq, cand):
        return _exact_sims_gathered(
            "COSINE", q[aq], x[np.maximum(cand, 0)], qnn[aq],
            xnn[np.maximum(cand, 0)],
        )

    ents = np.atleast_1d(np.asarray(entry, dtype=np.int64))
    base, base_sc = _batch_beam(
        score_fn, nbr_mat, ents, 8, n, ef, return_scores=True
    )
    pil = _pilot_entries(ents, n, ef)
    assert len(pil) > ef  # the seeding path under test
    psc = _exact_sims_block("COSINE", q, x[pil], qnn, xnn[pil])
    seeded, seeded_sc = _batch_beam(
        score_fn, nbr_mat, pil, 8, n, ef, seed_sc=psc, return_scores=True
    )
    # each query's own row is its best hit on both paths (self top-1)
    assert np.array_equal(base[:, 0], np.arange(8))
    assert np.array_equal(seeded[:, 0], np.arange(8))
    # pilot seeding never lands a WORSE beam: per-query best-5 mean score
    assert float(seeded_sc[:, :5].mean()) >= float(base_sc[:, :5].mean()) - 1e-6
