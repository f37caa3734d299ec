"""Plan-regression tests: the physical-plan properties the engine's
scale story depends on, asserted so refactors can't silently lose them
(SURVEY §4.2 — pushdown/pruning/broadcast are free ONLY while the plan
stays declarative)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from end_to_end_data_engineering_pipeline_spark.queries import all_queries

QUERIES = all_queries()


def _plan_df(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _plan(spark, sf_dir, name) -> str:
    return _plan_df(QUERIES[name](spark, sf_dir))


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in pushed and "LessThan" in pushed
    schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # projection pruning: only the 7 referenced columns reach the scan
    assert "l_orderkey" not in schema and "l_suppkey" not in schema


def test_q4_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_star_join_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q13_topk_avoids_total_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q13_global_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort operator


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # two HashAggregates (partial + final) around one Exchange:
    # map-side combine before the shuffle
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"HashAggregate", tree)) == 2
    assert len(re.findall(r"\bExchange\b", tree)) == 1


def test_e5_single_shuffle_for_window_dedup(spark, sf_dir):
    tree = _plan(spark, sf_dir, "e5_keyed_dedup_keep_first").split("\n\n")[0]
    # keep-first dedup = exactly one hash Exchange (the window's)
    assert len(re.findall(r"\bExchange\b", tree)) == 1


def test_no_cartesian_products_anywhere(spark, sf_dir):
    # every registered query must avoid nested-loop cross joins --
    # the one O(n^2)-shuffle shape that cannot survive scale
    bad = []
    for name in sorted(QUERIES):
        tree = _plan(spark, sf_dir, name).split("\n\n")[0]
        if "CartesianProduct" in tree:
            bad.append(name)
    assert not bad, f"cartesian products in: {bad}"


def test_q59_all_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q59_forecast_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed
    schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # 4-column projection out of 11
    assert "l_orderkey" not in schema and "l_returnflag" not in schema


def test_q61_all_dims_broadcast(spark, sf_dir):
    tree = _plan(spark, sf_dir, "q61_local_supplier_volume").split("\n\n")[0]
    # region/nation/supplier/customer all broadcast; no shuffle-join
    # for any dimension
    assert len(re.findall(r"BroadcastHashJoin", tree)) >= 4
    assert "CartesianProduct" not in tree


def test_q62_sample_filter_no_extra_shuffle(spark, sf_dir):
    tree = _plan(spark, sf_dir, "q62_deterministic_sample").split("\n\n")[0]
    # hash-bucket Bernoulli sampling is a scan predicate: the only
    # Exchange is the aggregate's
    assert len(re.findall(r"\bExchange\b", tree)) == 1


def test_t15_df_join_broadcasts(spark, sf_dir):
    tree = _plan(spark, sf_dir, "t15_distinctive_terms").split("\n\n")[0]
    # corpus df table joins the doc-term matrix as a broadcast
    assert "BroadcastHashJoin" in tree


def test_sim3_no_forced_corpus_broadcast(spark, sf_dir):
    # sim3 attaches the (corpus-sized) vector relation with PLAIN
    # equi-joins: any broadcast must come from AQE's size estimate,
    # never a hint — a forced broadcast OOMs at 100 TB. With the
    # size-based threshold disabled, a hint is the only thing that
    # could still produce a BroadcastExchange; assert there is none.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        tree = _plan(spark, sf_dir, "sim3_embedding_neardup_pairs").split("\n\n")[0]
        assert "BroadcastExchange" not in tree
        assert "CartesianProduct" not in tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_minhash_signatures_no_shuffle(spark, sf_dir):
    """The per-doc signature stage (shingle -> hash -> array_min per
    affine rehash) must stay partition-local: no Exchange may appear
    below the LSH band self-join's input. Regression guard for the
    per-row reformulation (an explode + groupBy here shuffles every
    (doc, shingle) row — the largest intermediate of the pipeline)."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        _rowwise_sig,
        shingled_docs,
    )

    docs = load(spark, sf_dir, "documents")
    sig = _rowwise_sig(shingled_docs(docs), n_hashes=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sig.explain("formatted")
    plan = buf.getvalue()
    # fan_out's explicit round-robin repartition is the ONLY exchange
    # allowed (compute-spreading guard, not a keyed shuffle)
    assert "hashpartitioning" not in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_simhash_table_no_shuffle(spark, sf_dir):
    """simhash_table computes per-row (staged token-hash array +
    bit-vote folds); the corpus token rows must never shuffle."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        simhash_table,
    )

    docs = load(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        simhash_table(docs).explain("formatted")
    plan = buf.getvalue()
    assert "hashpartitioning" not in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_pq_encode_no_shuffle(spark, sf_dir):
    """PQ corpus encoding (operators/similarity.py:pq_encode) is a
    per-row codegen projection — every subspace argmin is array
    arithmetic over the scan; no Exchange may appear. At 100 TB this
    stage touches every vector, so a shuffle here would dominate the
    whole ANN pipeline."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_train,
        pq_codebooks,
        pq_encode,
    )

    emb = load(spark, sf_dir, "embeddings")
    books = pq_codebooks(
        ivf_train(emb, n_centroids=16, iters=1, sample_mod=5), m=8
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pq_encode(emb, books).explain("formatted")
    plan = buf.getvalue()
    assert "hashpartitioning" not in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_ivfpq_only_shuffle_is_topk_window(spark, sf_dir):
    """ivfpq_topk's corpus side (cell + codes) is one per-row
    projection and candidates come from a broadcast join — the ONLY
    exchange in the whole plan is the final per-query top-k window's
    hashpartitioning(query_id)."""
    import re

    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_train,
        ivfpq_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = ivf_train(emb, n_centroids=16, iters=1, sample_mod=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivfpq_topk(emb, [0, 1, 2], cents, k=5).explain("formatted")
    plan = buf.getvalue().lower()
    parts = re.findall(r"hashpartitioning\(([a-z_0-9#]+)", plan)
    assert parts and all(p.startswith("query_id") for p in parts), parts
    assert "rangepartitioning" not in plan, plan


def test_t19_benchmark_broadcast_corpus_unshuffled(spark, sf_dir):
    """Decontamination must broadcast the benchmark gram set — the
    100 TB corpus side may shuffle only the per-doc hit counts
    (one aggregate Exchange), never its exploded grams."""
    plan = _plan(spark, sf_dir, "t19_decontamination")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    # the only KEY shuffles are the benchmark distinct's and the
    # count_distinct pair ((id, g) dedup + (id) count) which see ONLY
    # the rare post-join hit rows; the corpus side's Exchange is
    # fan_out's round-robin spread, which skips itself on well-split
    # inputs — no corpus-sized gram exchange may appear
    details = plan.split("\n\n", 1)[1]
    hash_exchanges = [
        ln for ln in details.splitlines()
        if ln.startswith("Arguments: hashpartitioning")
    ]
    assert len(hash_exchanges) == 3


def test_t20_budget_prefix_single_shuffle(spark, sf_dir):
    """The token-budget prefix is ONE shuffle on the group key: both
    windows (running sum + group total) and the boundary filter must
    reuse the same hash partitioning."""
    tree = _plan(spark, sf_dir, "t20_token_budget_mix").split("\n\n")[0]
    assert len(re.findall(r"\bExchange\b", tree)) == 1


def test_t26_vocab_broadcast_and_distributed_topk(spark, sf_dir):
    """The corpus vocabulary must reach the scoring join as a
    BROADCAST (the token stream never shuffles for the join) and the
    top-100 cut must plan TakeOrderedAndProject — not a global
    single-partition window sort."""
    tree = _plan(spark, sf_dir, "t26_common_token_fraction").split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "TakeOrderedAndProject" in tree
    assert "Window" not in tree


def test_sq8_quantization_no_shuffle(spark, sf_dir):
    """SQ8 code generation (operators/similarity.py:with_sq8) is a
    per-row projection chain — scale, staged max-abs, integer
    quantize, norm — with NO Exchange anywhere: at 100 TB this stage
    touches every vector, so a shuffle here would dominate the
    compressed-scan savings the codes exist to provide."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        with_sq8,
    )

    emb = load(spark, sf_dir, "embeddings")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with_sq8(emb).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan


def test_t28_chunk_dedup_exactly_two_shuffles(spark, sf_dir):
    """Sub-document dedup's scale contract: exactly TWO Exchanges —
    the keep-first window keyed on the chunk hash and the per-doc
    reassembly aggregate — with a map-side partial aggregate before
    the second (nothing crosses the network un-combined). A third
    shuffle (e.g. an explode+join formulation) would move the chunk
    stream twice more."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        dedup_chunks,
    )

    docs = load(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dedup_chunks(docs).explain("formatted")
    plan = buf.getvalue()
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 2, plan
    # partial (ObjectHashAggregate) below the final-agg exchange
    assert plan.count("ObjectHashAggregate") >= 2, plan


def test_bucketed_pair_joins_with_zero_exchange(spark, sf_dir, tmp_path):
    """The 100 TB broadcast-cliff fallback (docs/SCALE.md): two tables
    bucketed on the join key with the same bucket count must
    sort-merge-join with ZERO Exchange — the bucketed scans themselves
    satisfy the join's HashPartitioning requirement. This is the plan
    p13_bucketed_colocated_join demonstrates; pinned here at the join
    level so a config or writer regression can't silently reintroduce
    the shuffle."""
    import uuid

    from end_to_end_data_engineering_pipeline_spark.operators.partitioning import (
        write_bucketed,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    token = uuid.uuid4().hex[:8]
    t_o, t_c = f"plans_o_{token}", f"plans_c_{token}"
    try:
        write_bucketed(o, t_o, ["o_custkey"], 8, path=str(tmp_path / "o"))
        write_bucketed(c, t_c, ["c_custkey"], 8, path=str(tmp_path / "c"))
        bo, bc = spark.table(t_o), spark.table(t_c)
        join = bo.hint("merge").join(bc, bo["o_custkey"] == bc["c_custkey"])
        tree = _plan_df(join).split("\n\n")[0]
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree, tree
        # the scans really are bucket-aware (not plain parquet reads)
        assert "Bucketed: true" in _plan_df(join)
        # and the join result is correct (content-neutral round-trip)
        assert join.count() == o.join(
            c, o["o_custkey"] == c["c_custkey"]
        ).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def test_sim14_store_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The IVF-as-layout store (operators/similarity.py
    ivf_partitioned_write/-_topk) must restrict candidates at the
    SCAN: the probed cell set appears as PartitionFilters on the
    parquet read, so unprobed cell directories are never listed or
    opened — IO pruning, not post-scan compute pruning. A regression
    here (e.g. cell becoming a data column) would silently read the
    whole corpus again."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_partitioned_topk,
        ivf_partitioned_write,
        ivf_train,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_train(emb, n_centroids=16, iters=1, sample_mod=5)
    store = str(tmp_path / "store")
    ivf_partitioned_write(emb, cents, store)
    out = ivf_partitioned_topk(
        spark, store, emb.where(F.col("vec_id") < 3), cents, k=5, nprobe=2
    )
    plan = _plan_df(out)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    # the corpus scan carries a non-empty cell partition filter
    assert any("cell" in l and "IN" in l.upper() for l in pf), plan
    # results equal the join-pruned ivf_topk formulation exactly
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        ivf_topk,
    )

    want = sorted(
        map(
            tuple,
            ivf_topk(emb, [0, 1, 2], cents, k=5, nprobe=2)
            .select("query_id", "cand_id", "rk")
            .collect(),
        )
    )
    got = sorted(
        map(tuple, out.select("query_id", "cand_id", "rk").collect())
    )
    assert got == want and len(got) > 0


def test_t37_dup_span_narrow_shuffles(spark, sf_dir):
    """Span coverage's scale contract: the gram stream shuffles as
    (md5 hash, id, start) — the full token ARRAY must never reach an
    Exchange (gram text collapses to its hash BEFORE the window), and
    there is no position-explode join back to the corpus. Bounded
    Exchange count: gram-hash window + per-doc lag window/agg + the
    doc-stats join."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        dup_span_stats,
    )

    docs = load(spark, sf_dir, "documents")
    plan = _plan_df(dup_span_stats(docs, n=5))
    for ex in re.finditer(r"\(\d+\) Exchange.*", plan):
        assert "__toks" not in ex.group(0), plan
    assert "CartesianProduct" not in plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 5, plan


def test_t38_weights_join_is_broadcast(spark, sf_dir):
    """Model inference's scale contract: the weight table rides a
    BroadcastHashJoin (artifact = executor metadata, the token stream
    never shuffles for the join) and the per-doc score aggregates
    map-side before its single Exchange."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        quality_score_linear,
    )

    docs = load(spark, sf_dir, "documents")
    plan = _plan_df(quality_score_linear(docs))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    # one broadcast exchange (weights) + one hash exchange (doc agg)
    assert n_exchange <= 2, plan


def test_e22_skew_audit_uses_takeordered_not_global_window(spark, sf_dir):
    """The skew audit of a billion-key column must not itself be the
    skew problem: top-n selection plans TakeOrderedAndProject
    (per-partition heaps), and the only window in the plan runs over
    the top_n survivors, never the full distinct-key stream."""
    plan = _plan(spark, sf_dir, "e22_skew_audit")
    assert "TakeOrderedAndProject" in plan, plan


def test_pin_result_caps_driver_sized_results(spark):
    """pin_result is the query layer's only sanctioned driver collect
    (mutation-style queries pin their aggregate summary so scratch
    tempdirs can be deleted before return): it must round-trip a
    small frame exactly — schema included — and raise loudly when a
    future edit makes the pinned result data-sized, instead of
    shipping an unbounded collect to the driver."""
    import pytest
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.catalog import pin_result

    small = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    pinned = pin_result(small, max_rows=10)
    assert pinned.schema == small.schema
    assert sorted((r.k, r.v) for r in pinned.collect()) == [
        (i, 2 * i) for i in range(5)
    ]
    # lineage is detached: the pin is a LocalRelation, not the range scan
    assert "Range" not in pinned._jdf.queryExecution().optimizedPlan().toString()
    with pytest.raises(ValueError, match="max_rows"):
        pin_result(spark.range(0, 100), max_rows=99)


def test_t49_topk_via_takeordered_no_global_sort(spark, sf_dir):
    """The search's top-20 must flow through TakeOrderedAndProject
    (per-partition heaps); the only window sorts the 20 survivors.
    The doc-count side must broadcast, never shuffle the postings."""
    plan = _plan(spark, sf_dir, "t49_inverted_index_search")
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastExchange" in tree
    assert "CartesianProduct" not in tree


def test_t48_encode_join_no_corpus_resort(spark, sf_dir):
    """The encode re-attach is a word-keyed join feeding one
    low-cardinality aggregate — no global Sort node may appear over
    corpus-sized data (the BPE loop's windows are word-partitioned)."""
    plan = _plan(spark, sf_dir, "t48_bpe_encode_corpus")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    # every Sort in the plan is window machinery partitioned by word
    # (or the 1-row top1 pick); a global corpus sort would show as a
    # Sort directly under a rangepartitioning Exchange
    assert "rangepartitioning" not in plan.lower()


def test_p27_point_read_opens_fewer_files(spark, sf_dir, tmp_path):
    """The bloom path's 100-TB claim, pinned at plan level: the
    point-read DataFrame's scan lists ONLY admitted files (file list
    resolved before the plan exists), so pruning is structural, not a
    runtime filter."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        bloom_prune_files,
        snapshot_read_point,
        snapshot_write_bloom,
    )

    t = str(tmp_path / "t")
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id")
        .repartition(12)
    )
    snapshot_write_bloom(spark, t, df, "user_id", m_bits=1 << 15, k=3)
    _, admitted, total = bloom_prune_files(spark, t, 3)
    got = snapshot_read_point(spark, t, 3)
    # the scan's input files == the admitted list, not the full table
    n_inputs = len(got.inputFiles())
    assert n_inputs == len(admitted) <= total
    # and the result is still exact
    want = df.where(F.col("user_id") == 3).count()
    assert got.count() == want


def test_t52_t53_term_predicates_push_into_persisted_scan(
    spark, sf_dir, tmp_path
):
    """The search surface's 100-TB claim: a disjunctive query reads
    ONLY its terms' posting lists and a phrase query ONLY its two
    terms' position lists — the isin/equality predicates must reach
    the persisted parquet scan as PushedFilters, and top-k must flow
    through TakeOrderedAndProject (no global sort)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_read,
        snapshot_write,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        tokenize_tf,
    )
    from end_to_end_data_engineering_pipeline_spark.queries.textops import (
        search_disjunctive,
        search_phrase,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "idx")
    tf = tokenize_tf(docs)
    snapshot_write(spark, store + "/postings", tf)
    snapshot_write(
        spark,
        store + "/dfreq",
        tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df")),
    )
    snapshot_write(
        spark,
        store + "/meta",
        docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
    )
    snapshot_write(
        spark,
        store + "/positions",
        docs.select(
            "doc_id",
            F.posexplode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("pos", "w"),
        ).where(F.length("w") >= 2),
    )

    dis = search_disjunctive(
        snapshot_read(spark, store + "/postings"),
        snapshot_read(spark, store + "/dfreq"),
        snapshot_read(spark, store + "/meta"),
        ("vector", "merge", "customer"),
    )
    plan = _plan_df(dis)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("In(w" in l or "EqualTo(w" in l for l in pushed), pushed
    assert "TakeOrderedAndProject" in plan

    ph = search_phrase(
        snapshot_read(spark, store + "/positions"), "fast", "scan"
    )
    plan = _plan_df(ph)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("EqualTo(w,fast)" in l for l in pushed), pushed
    assert any("EqualTo(w,scan)" in l for l in pushed), pushed
    assert "TakeOrderedAndProject" in plan


def test_t54_bm25_term_predicate_pushed_no_doclen_join(
    spark, sf_dir, tmp_path
):
    """BM25's 100-TB claim: because posting rows CARRY the document
    length, the query is one term-pushed postings scan plus a
    broadcast of the 1-row meta — no corpus-sized doclen join, no
    global sort. The isin predicate must reach the persisted parquet
    scan and top-k must flow through TakeOrderedAndProject."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_read,
        snapshot_write,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        tokenize_tf,
    )
    from end_to_end_data_engineering_pipeline_spark.queries.textops import (
        search_bm25,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "idx")
    tf = tokenize_tf(docs)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    snapshot_write(spark, store + "/postings", tf.join(dl, "doc_id"))
    snapshot_write(
        spark,
        store + "/dfreq",
        tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df")),
    )
    snapshot_write(
        spark,
        store + "/meta",
        docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).crossJoin(
            tf.agg(F.sum("tf").cast("long").alias("tl"))
        ),
    )

    out = search_bm25(
        snapshot_read(spark, store + "/postings"),
        snapshot_read(spark, store + "/dfreq"),
        snapshot_read(spark, store + "/meta"),
        ("query", "join", "batch"),
    )
    plan = _plan_df(out)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("In(w" in l for l in pushed), pushed
    assert "TakeOrderedAndProject" in plan
    # the 1-row meta broadcasts; nothing cartesian, no range sort
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_unpartitioned_windows_are_annotated_bounded():
    """Lint pin (r13 verdict 'what's wrong' #3): every unpartitioned
    window in the package must be PROVEN bounded — either routed
    through operators/partitioning.py's bounded_rank_topk (the
    limit(k) makes the single-partition sort k rows by construction)
    or carrying a `# bounded-window:` annotation naming its bound
    within the five preceding lines. A new Window.orderBy with
    neither fails here, so 'WindowExec: No Partition Defined'
    warnings in a bench tail always have an on-file adjudication and
    an unbounded global window can't land silently (those must use
    global_rank / scalable_ntile)."""
    import re
    from pathlib import Path

    import end_to_end_data_engineering_pipeline_spark as pkg

    root = Path(pkg.__file__).parent
    offenders = []
    # Multiline scan over the WHOLE file text (r14 advice): a
    # per-line match lets `Window\n  .orderBy(...)` escape the lint,
    # and bench.py silences WindowExec's single-partition warning
    # session-wide, so an evading unbounded window would be invisible
    # at bench time too. \s spans newlines, so the chain is caught
    # however black wraps it; a partitionBy between Window and
    # .orderBy breaks the match, which is exactly the bounded case.
    for py in sorted(root.rglob("*.py")):
        text = py.read_text()
        lines = text.splitlines()
        for m in re.finditer(r"\bWindow\s*\.\s*orderBy\(", text):
            i = text.count("\n", 0, m.start())
            end = text.count("\n", 0, m.end())
            ctx = "\n".join(lines[max(0, i - 5) : end + 1])
            if "bounded-window" not in ctx:
                offenders.append(f"{py.relative_to(root)}:{i + 1}")
    assert offenders == [], (
        "unpartitioned windows without a bounded-window annotation "
        f"(use bounded_rank_topk or global_rank): {offenders}"
    )


def test_no_inferred_filter_reevaluates_expensive_chain(spark, sf_dir):
    """Catalyst's InferFiltersFromGenerate synthesizes `size(e) > 0`
    under a non-outer explode and pushes it through project chains —
    re-evaluating the WHOLE generator expression interpreted, per
    input row, inside a Filter: measured 15x on the t58 shingle
    postings at sf1.0 (r15). A session-wide excludedRules fix was
    measured to regress OTHER keys (the inferred filters genuinely
    help some plans), so the defense is surgical — explode_outer at
    expensive-generator sites — and this test scans EVERY registered
    query's physical plan for the hazard signature: a Filter whose
    condition contains an interpreted higher-order lambda
    (`lambdafunction`) over a regex/hash/concat chain. Cheap
    deliberate HOF predicates (p18's CASE-array quality gate) carry
    none of those markers and pass."""
    expensive = ("regexp_replace", "md5(", "xxhash64(", "concat_ws(")
    offenders = []
    for name in sorted(QUERIES):
        plan = _plan(spark, sf_dir, name)
        for block in plan.split("\n\n"):
            first = block.strip().splitlines()[0] if block.strip() else ""
            if (
                ") Filter" in first
                and "lambdafunction" in block
                and any(m in block for m in expensive)
            ):
                offenders.append(name)
                break
    assert offenders == [], offenders
