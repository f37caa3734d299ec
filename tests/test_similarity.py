"""ANN operator tests: LSH recall on clustered data (its design target)
and score agreement between the approximate and exact paths."""

from __future__ import annotations

import math
import random

import pytest

from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 12


@pytest.fixture(scope="module")
def clustered(spark):
    """Deterministic clustered corpus: cluster centers + small noise, so
    true nearest neighbors share a cluster (what near-dup ANN targets)."""
    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        center = [rng.uniform(-1, 1) for _ in range(DIM)]
        for _ in range(PER_CLUSTER):
            vec = [x + rng.uniform(-0.05, 0.05) for x in center]
            rows.append((vid, [float(x) for x in vec], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_bruteforce_topk_ranks_own_cluster_first(clustered):
    out = cosine_topk_bruteforce(clustered, [0], k=5).collect()
    assert len(out) == 5
    # all top-5 neighbors of vec 0 are from cluster 0 (ids 1..11)
    assert all(1 <= r.cand_id < PER_CLUSTER for r in out)
    assert all(out[i].cosine >= out[i + 1].cosine for i in range(4))


def test_lsh_recall_on_clusters(clustered):
    qids = [0, PER_CLUSTER, 2 * PER_CLUSTER]
    exact = cosine_topk_bruteforce(clustered, qids, k=5).collect()
    approx = cosine_topk_lsh(clustered, qids, k=5, n_planes=4, dim=DIM).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    approx_sets = {}
    approx_scores = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.cand_id)
        approx_scores[(r.query_id, r.cand_id)] = r.cosine
    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
    )
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.6  # tight clusters land in the same bucket

    # scores of common pairs agree exactly with the brute-force path
    for r in exact:
        key = (r.query_id, r.cand_id)
        if key in approx_scores:
            assert approx_scores[key] == r.cosine


def test_ivf_recall_on_clusters(clustered):
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_topk,
        ivf_train,
    )

    centroids = ivf_train(clustered, n_centroids=N_CLUSTERS, iters=3)
    assert len(centroids) == N_CLUSTERS and len(centroids[0]) == DIM
    qids = [0, PER_CLUSTER, 2 * PER_CLUSTER]
    exact = cosine_topk_bruteforce(clustered, qids, k=5).collect()
    approx = ivf_topk(clustered, qids, centroids, k=5, nprobe=2).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.8  # tight clusters -> IVF cells align


def test_multiprobe_lsh_recall_dominates_single(clustered):
    qids = [0, PER_CLUSTER, 2 * PER_CLUSTER]
    exact = cosine_topk_bruteforce(clustered, qids, k=5).collect()
    single = cosine_topk_lsh(clustered, qids, k=5, n_planes=4, dim=DIM).collect()
    multi = cosine_topk_lsh(
        clustered, qids, k=5, n_planes=4, dim=DIM, multi_probe=True
    ).collect()

    def recall(rows):
        es, rs = {}, {}
        for r in exact:
            es.setdefault(r.query_id, set()).add(r.cand_id)
        for r in rows:
            rs.setdefault(r.query_id, set()).add(r.cand_id)
        hits = sum(len(es[q] & rs.get(q, set())) for q in es)
        return hits / sum(len(s) for s in es.values())

    assert recall(multi) >= recall(single)
    assert recall(multi) >= 0.8


def test_ivf_index_persistence_roundtrip(spark, tmp_path):
    """A persisted quantizer must serve identical results to the
    freshly trained one (index-as-artifact contract)."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_load_index,
        ivf_save_index,
        ivf_topk,
        ivf_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_train(emb, n_centroids=8, iters=1, sample_mod=3)
    path = str(tmp_path / "ivf_index")
    ivf_save_index(spark, cents, path, meta={"n_centroids": 8, "iters": 1})
    loaded = ivf_load_index(spark, path)
    assert loaded == cents

    qids = [r[0] for r in emb.select("vec_id").orderBy("vec_id").limit(3).collect()]
    fresh = ivf_topk(emb, qids, cents, k=5, nprobe=2).collect()
    served = ivf_topk(emb, qids, loaded, k=5, nprobe=2).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, served))


def test_neardup_lsh_pairs_recall_and_precision(clustered):
    """Banded near-dup pairs: every returned pair truly clears the
    threshold (precision 1.0 — exact in-bucket rescoring), and recall
    vs the exact threshold-pair set is high on clustered data (near-
    dups agree on hyperplane signs with high probability)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        dot_scaled,
        cosine_scaled,
        embedding_neardup_lsh,
        with_scaled,
    )

    thresh = 0.95
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_lsh(
            clustered, threshold=thresh, n_planes=4, dim=DIM
        ).collect()
    }

    # exact pair set via brute force
    base = with_scaled(clustered, "vec_id", "embedding")
    a = base.select(
        F.col("id").alias("id_a"), F.col("sv").alias("sv_a"),
        F.col("n2").alias("n2_a"),
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("sv").alias("sv_b"),
        F.col("n2").alias("n2_b"),
    )
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_scaled(
                dot_scaled(F.col("sv_a"), F.col("sv_b")),
                F.col("n2_a"), F.col("n2_b"),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= thresh)
        .collect()
    }

    # precision 1.0: every banded pair is a true pair with the exact score
    assert set(got) <= set(exact)
    assert all(exact[p] == got[p] for p in got)
    # recall: clustered near-dups mostly share the 4-bit signature
    assert len(exact) > 50
    assert len(got) / len(exact) >= 0.5


def test_pq_adc_recall_and_exact_arithmetic(clustered):
    """PQ-ADC top-k (operators/similarity.py:pq_topk): on clustered
    data the compressed-domain search keeps most true neighbors, codes
    stay in [0, k), and the Spark-side adist of every returned row
    equals a driver-side exact-int recomputation from the same
    codebooks (the PQ distance is deterministic integer arithmetic,
    which is what lets sim8 carry a full value-hash oracle)."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_train,
        pq_codebooks,
        pq_encode,
        pq_topk,
        with_scaled,
    )

    m = 4  # dsub=4 over DIM=16
    cents = ivf_train(clustered, n_centroids=N_CLUSTERS, iters=3)
    books = pq_codebooks(cents, m)
    qids = [0, PER_CLUSTER, 2 * PER_CLUSTER]

    exact = cosine_topk_bruteforce(clustered, qids, k=5).collect()
    approx = pq_topk(clustered, qids, cents, k=5, m=m).collect()
    es, rs = {}, {}
    for r in exact:
        es.setdefault(r.query_id, set()).add(r.cand_id)
    for r in approx:
        rs.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(es[q] & rs.get(q, set())) for q in es)
    assert hits / sum(len(s) for s in es.values()) >= 0.6

    codes = {r.id: [r.c0, r.c1, r.c2, r.c3] for r in
             pq_encode(clustered, books).collect()}
    assert all(
        0 <= c < N_CLUSTERS for cs in codes.values() for c in cs
    )
    sv = {r.id: list(r.sv) for r in
          with_scaled(clustered, "vec_id", "embedding").collect()}
    dsub = DIM // m
    for r in approx:
        want = 0
        for mm in range(m):
            q = sv[r.query_id][mm * dsub:(mm + 1) * dsub]
            c = books[mm][codes[r.cand_id][mm]]
            want += sum((x - y) ** 2 for x, y in zip(q, c))
        assert r.adist == want, (r.query_id, r.cand_id)


def test_ivfpq_composes_ivf_pruning_with_pq_scoring(clustered):
    """IVF-PQ (operators/similarity.py:ivfpq_topk): probing EVERY cell
    must reproduce plain PQ-ADC exactly (the IVF stage only prunes —
    scoring is identical), and partial probing keeps most true
    neighbors on clustered data."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_train,
        ivfpq_topk,
        pq_topk,
    )

    m = 4
    cents = ivf_train(clustered, n_centroids=N_CLUSTERS, iters=3)
    qids = [0, PER_CLUSTER, 2 * PER_CLUSTER]

    full_probe = {
        (r.query_id, r.cand_id, r.adist, r.rk)
        for r in ivfpq_topk(
            clustered, qids, cents, k=5, m=m, nprobe=N_CLUSTERS
        ).collect()
    }
    pq_only = {
        (r.query_id, r.cand_id, r.adist, r.rk)
        for r in pq_topk(clustered, qids, cents, k=5, m=m).collect()
    }
    assert full_probe == pq_only

    exact = cosine_topk_bruteforce(clustered, qids, k=5).collect()
    pruned = ivfpq_topk(clustered, qids, cents, k=5, m=m, nprobe=2).collect()
    es, rs = {}, {}
    for r in exact:
        es.setdefault(r.query_id, set()).add(r.cand_id)
    for r in pruned:
        rs.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(es[q] & rs.get(q, set())) for q in es)
    assert hits / sum(len(s) for s in es.values()) >= 0.6


def test_pq_refine_improves_or_matches_adc_recall(clustered):
    """Two-stage search (pq_topk_refined): the exact re-rank of the
    ADC shortlist must (a) emit exact squared-L2 distances (verified
    against a driver-side int recomputation), and (b) reach recall at
    least as high as the plain ADC top-k — the shortlist can only be
    re-ordered toward the truth, never away from it, when the
    shortlist is large enough to contain the true neighbors."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_train,
        pq_topk,
        pq_topk_refined,
        with_scaled,
    )

    m = 4
    cents = ivf_train(clustered, n_centroids=N_CLUSTERS, iters=3)
    qids = [0, PER_CLUSTER, 2 * PER_CLUSTER]

    exact = cosine_topk_bruteforce(clustered, qids, k=5).collect()
    adc = pq_topk(clustered, qids, cents, k=5, m=m).collect()
    ref = pq_topk_refined(
        clustered, qids, cents, k=5, shortlist=20, m=m
    ).collect()

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.cand_id)
        es = {}
        for r in exact:
            es.setdefault(r.query_id, set()).add(r.cand_id)
        return sum(len(es[q] & got.get(q, set())) for q in es) / sum(
            len(s) for s in es.values()
        )

    assert recall(ref) >= recall(adc)

    sv = {r.id: list(r.sv) for r in
          with_scaled(clustered, "vec_id", "embedding").collect()}
    for r in ref:
        q, c = sv[r.query_id], sv[r.cand_id]
        want = sum((a - b) * (a - b) for a, b in zip(q, c))
        assert r.dist == want


def test_sq8_recall_and_code_range(clustered):
    """Int8 scalar quantization: codes stay in [-127, 127], the max
    component hits exactly +/-127 (symmetric max-abs contract), and
    compressed-domain top-k recalls the exact top-k on clustered data
    (quantization noise ~1/254 of max — far below cluster separation)."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        sq8_topk,
        with_sq8,
    )

    codes = with_sq8(clustered).collect()
    for r in codes:
        assert all(-127 <= v <= 127 for v in r.q)
        assert max(abs(v) for v in r.q) == 127
    qids = [0, PER_CLUSTER, 2 * PER_CLUSTER]
    exact = cosine_topk_bruteforce(clustered, qids, k=5).collect()
    approx = sq8_topk(clustered, qids, k=5).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(exact_sets[q] & approx_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.8


def test_knn_graph_neighbors_stay_in_cluster(clustered):
    """kNN-graph recall on clustered data: every node gets neighbors,
    and for a sampling of nodes the in-bucket top-k matches cluster
    membership (tight clusters land in one hyperplane bucket)."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        knn_graph,
    )

    g = knn_graph(clustered, k=3, n_planes=4, dim=DIM).collect()
    by_src: dict[int, list] = {}
    for r in g:
        by_src.setdefault(r.src_id, []).append(r)
    # most nodes find neighbors (clusters are far larger than k)
    assert len(by_src) >= N_CLUSTERS * PER_CLUSTER * 0.8
    same_cluster = sum(
        1
        for rows in by_src.values()
        for r in rows
        if r.src_id // PER_CLUSTER == r.dst_id // PER_CLUSTER
    )
    total = sum(len(v) for v in by_src.values())
    assert same_cluster / total >= 0.9
    for rows in by_src.values():
        rks = sorted(r.rk for r in rows)
        assert rks == list(range(1, len(rks) + 1))  # dense top-k ranks


def test_knn_graph_bucket_cap_bounds_candidates(clustered):
    """max_bucket drops mega-buckets wholesale (the IVF bounded-list
    rule): capped output is a subset of the uncapped graph's edges
    restricted to surviving buckets, and a cap below every bucket
    size empties the graph."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        knn_graph,
    )

    full = knn_graph(clustered, k=3, n_planes=4, dim=DIM).collect()
    capped = knn_graph(
        clustered, k=3, n_planes=4, dim=DIM, max_bucket=PER_CLUSTER * 2
    ).collect()
    full_edges = {(r.src_id, r.dst_id) for r in full}
    capped_edges = {(r.src_id, r.dst_id) for r in capped}
    assert capped_edges <= full_edges
    none = knn_graph(
        clustered, k=3, n_planes=4, dim=DIM, max_bucket=1
    ).collect()
    assert none == []


def test_knn_graph_multi_probe_dominates_single(clustered):
    """Hamming-1 probing graph-wide: every node reached by the single-
    probe graph is still reached, per-node neighbor quality does not
    drop (same-cluster edge rate >= single-probe), and nodes isolated
    in sparse buckets can only GAIN neighbors."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        knn_graph,
    )

    single = knn_graph(clustered, k=3, n_planes=4, dim=DIM).collect()
    multi = knn_graph(
        clustered, k=3, n_planes=4, dim=DIM, multi_probe=True
    ).collect()
    nodes_s = {r.src_id for r in single}
    nodes_m = {r.src_id for r in multi}
    assert nodes_s <= nodes_m

    def cluster_rate(rows):
        same = sum(
            1 for r in rows if r.src_id // PER_CLUSTER == r.dst_id // PER_CLUSTER
        )
        return same / len(rows)

    assert cluster_rate(multi) >= cluster_rate(single) - 0.05
    assert len(multi) >= len(single)


def test_rrf_fuse_hand_computed_and_n_retrievers(spark):
    """RRF fusion against a hand-computed example: a candidate ranked
    by BOTH retrievers must outrank one ranked #1 by a single
    retriever when 1/(60+r_a)+1/(60+r_b) says so; missing ranks
    contribute 0; and the operator generalizes past two retrievers."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        rrf_fuse,
    )

    r1 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, cand_id long, rk long",
    )
    r2 = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, cand_id long, rk long",
    )
    got = {
        r.cand_id: (r.rrf, r.rk)
        for r in rrf_fuse([r1, r2], k=10).collect()
    }
    want = {
        10: 1 / 61,
        11: 1 / 62 + 1 / 61,  # both retrievers -> top
        12: 1 / 63,
        13: 1 / 62,
    }
    order = sorted(want, key=lambda c: (-want[c], c))
    assert [c for c, _ in sorted(got.items(), key=lambda kv: kv[1][1])] == order
    for c in want:
        assert abs(got[c][0] - want[c]) < 1e-15

    # three retrievers: the triple-hit dominates
    r3 = spark.createDataFrame(
        [(0, 12, 1), (0, 11, 5)], "query_id long, cand_id long, rk long"
    )
    top = rrf_fuse([r1, r2, r3], k=1).collect()[0]
    assert top.cand_id == 11  # hit by all three


def test_versioned_ivf_time_travel(spark, sf_dir, tmp_path):
    """An IVF rebuild is a snapshot commit: after rebuilding over a
    half corpus, a v0-pinned search still equals ivf_topk over the
    FULL corpus (centroids loaded from the pinned manifest), the
    latest search equals ivf_topk over the half corpus, and history
    shows two versions."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_topk,
        versioned_ivf_topk,
        versioned_ivf_write,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_history,
    )
    from end_to_end_data_engineering_pipeline_spark.queries.similarity import (
        QUERY_IDS,
        _centroids_for,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    half = emb.where(F.col("vec_id") % 2 == 0)
    queries = emb.where(F.col("vec_id").isin(QUERY_IDS))
    store = str(tmp_path / "index")

    v0 = versioned_ivf_write(spark, emb, cents, store)
    v1 = versioned_ivf_write(spark, half, cents, store)
    assert (v0, v1) == (0, 1)
    assert [h["version"] for h in snapshot_history(store)] == [0, 1]

    def key(df):
        return sorted(
            (r.query_id, r.cand_id, r.cosine, r.rk) for r in df.collect()
        )

    pinned = versioned_ivf_topk(spark, store, queries, k=10, nprobe=3, version=0)
    assert key(pinned) == key(ivf_topk(emb, QUERY_IDS, cents, k=10, nprobe=3))
    even_ids = [i for i in QUERY_IDS if i % 2 == 0]
    latest = versioned_ivf_topk(
        spark, store, queries.where(F.col("vec_id") % 2 == 0), k=10, nprobe=3
    )
    assert key(latest) == key(ivf_topk(half, even_ids, cents, k=10, nprobe=3))
    assert key(pinned) != key(latest)  # the rebuild really diverged


def test_ivf_delete_refresh_serves_survivors(spark, sf_dir, tmp_path):
    """sim19's contract: a snapshot_delete through the versioned IVF
    store (1) removes every deleted id from a current-version search,
    (2) leaves a v0-pinned search byte-identical to the pre-delete
    index, (3) preserves the manifest centroids (no rebuild), and
    (4) copy-on-writes only the touched cells' files — untouched
    inverted-list files carry by reference."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        versioned_ivf_topk,
        versioned_ivf_write,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_manifest,
    )
    from end_to_end_data_engineering_pipeline_spark.queries.similarity import (
        QUERY_IDS,
        _centroids_for,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    queries = emb.where(F.col("vec_id").isin(QUERY_IDS))
    store = str(tmp_path / "index")

    v0 = versioned_ivf_write(spark, emb, cents, store)
    before = versioned_ivf_topk(spark, store, queries, k=10, nprobe=3)
    collected = before.collect()
    before_rows = sorted(
        (r.query_id, r.cand_id, r.cosine, r.rk) for r in collected
    )
    # erase one observed hit: touches exactly its cell's file(s), so
    # the other cells' files must carry by reference even on the tiny
    # sf0.001 fixture
    victim = min(r.cand_id for r in collected if r.cand_id not in QUERY_IDS)

    m0 = snapshot_manifest(store, v0)
    v1 = snapshot_delete(
        spark,
        store,
        emb.where(F.col("vec_id") == victim).select("vec_id"),
        ["vec_id"],
    )
    m1 = snapshot_manifest(store, v1)
    # centroids carried; some files carried by reference (name identity)
    assert m1["extra"]["centroids"] == m0["extra"]["centroids"]
    carried = set(m0["files"]) & set(m1["files"])
    assert carried, "untouched inverted-list files must carry by name"

    after = versioned_ivf_topk(spark, store, queries, k=10, nprobe=3)
    after_ids = {r.cand_id for r in after.collect()}
    assert victim not in after_ids
    # every previously-returned survivor is still served
    pinned = versioned_ivf_topk(
        spark, store, queries, k=10, nprobe=3, version=v0
    )
    assert (
        sorted((r.query_id, r.cand_id, r.cosine, r.rk) for r in pinned.collect())
        == before_rows
    )


def test_ivf_append_increment_matches_one_shot(spark, sf_dir, tmp_path):
    """sim20's contract: versioned_ivf_append (1) assigns the
    increment under the COMMITTED centroids, (2) carries every base
    inverted-list file by reference (name identity), (3) makes the
    post-append search equal a one-shot build over the full corpus,
    and (4) leaves the pre-append version pinnable."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        versioned_ivf_append,
        versioned_ivf_topk,
        versioned_ivf_write,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_manifest,
    )
    from end_to_end_data_engineering_pipeline_spark.queries.similarity import (
        QUERY_IDS,
        _centroids_for,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    queries = emb.where(F.col("vec_id").isin(QUERY_IDS))

    def key(df):
        return sorted(
            (r.query_id, r.cand_id, r.cosine, r.rk) for r in df.collect()
        )

    inc_store = str(tmp_path / "incremental")
    v0 = versioned_ivf_write(
        spark, emb.where(F.col("vec_id") % 3 != 0), cents, inc_store
    )
    before = key(versioned_ivf_topk(spark, inc_store, queries, k=10, nprobe=3))
    m0 = snapshot_manifest(inc_store, v0)
    v1 = versioned_ivf_append(
        spark, emb.where(F.col("vec_id") % 3 == 0), inc_store
    )
    m1 = snapshot_manifest(inc_store, v1)
    assert set(m0["files"]) <= set(m1["files"])  # base carried by name
    assert m1["extra"]["centroids"] == m0["extra"]["centroids"]

    one_shot_store = str(tmp_path / "oneshot")
    versioned_ivf_write(spark, emb, cents, one_shot_store)
    assert key(
        versioned_ivf_topk(spark, inc_store, queries, k=10, nprobe=3)
    ) == key(
        versioned_ivf_topk(spark, one_shot_store, queries, k=10, nprobe=3)
    )
    # pre-append pin still serves the base-only index
    assert (
        key(
            versioned_ivf_topk(
                spark, inc_store, queries, k=10, nprobe=3, version=v0
            )
        )
        == before
    )


def test_mmr_topk_diversifies_near_dup_cluster(spark):
    """Plain top-k returns the near-dup cluster k times; MMR picks ONE
    cluster representative, then genuinely distinct vectors — the
    whole point of the operator. Hand-built geometry: ids 1-3 are a
    tight cluster around the query, id 4 is orthogonal, id 5 is a
    45-degree moderate match."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        mmr_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),      # query
        (1, [1.0, 0.010, 0.0, 0.0]),    # cluster
        (2, [1.0, 0.011, 0.0, 0.0]),    # cluster
        (3, [1.0, 0.012, 0.0, 0.0]),    # cluster
        (4, [0.0, 0.0, 1.0, 0.0]),      # orthogonal to everything above
        (5, [1.0, 1.0, 0.0, 0.0]),      # 45 degrees off the query
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = cosine_topk_bruteforce(emb, [0], k=3).collect()
    assert {r.cand_id for r in brute} == {1, 2, 3}  # k near-dup copies
    out = mmr_topk(emb, [0], k=3, pool=5, lam=0.3, mu=0.7)
    got = {r.mmr_rank: r.cand_id for r in out.collect()}
    # rank 1 = best cluster member; rank 2 = orthogonal (zero rel but
    # zero penalty beats the cluster's ~1.0 penalty); rank 3 = the
    # 45-degree vector; the two remaining near-dups never selected
    assert got == {1: 1, 2: 4, 3: 5}


def test_mmr_rank1_equals_bruteforce_rank1(spark, sf_dir):
    """MMR's first pick is by construction the plain top-1."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        mmr_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    qids = [0, 1, 2]
    top1 = {
        r.query_id: r.cand_id
        for r in cosine_topk_bruteforce(emb, qids, k=1).collect()
    }
    mmr1 = {
        r.query_id: r.cand_id
        for r in mmr_topk(emb, qids, k=4, pool=12).where(
            "mmr_rank = 1"
        ).collect()
    }
    assert mmr1 == top1
    # and each query yields k DISTINCT candidates
    out = mmr_topk(emb, qids, k=4, pool=12)
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 4 for r in per_q)
    assert out.select("query_id", "cand_id").distinct().count() == out.count()


def test_filtered_ann_results_all_satisfy_predicate(spark, sf_dir):
    """Pre-filtered search: every returned candidate satisfies the
    predicate, queries come from the full set, and sim1-style
    unfiltered search would have returned disqualified candidates."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_topk,
        ivf_train,
    )
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    cents = ivf_train(emb, n_centroids=8, iters=1)
    filt = ivf_topk(
        emb, [0, 1], cents, k=5, nprobe=8,
        corpus_emb=emb.where(F.col("label") % 2 == 1),
    )
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = filt.collect()
    assert rows, "filtered search returned nothing"
    assert all(labels[r.cand_id] % 2 == 1 for r in rows)
    # unfiltered (same cells, nprobe=all) DOES return even-label hits,
    # so the filter is doing real work
    unfilt = ivf_topk(emb, [0, 1], cents, k=5, nprobe=8)
    assert any(labels[r.cand_id] % 2 == 0 for r in unfilt.collect())
