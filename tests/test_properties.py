"""Property-based tests (hypothesis) for the engine's custom operators:
merge-upsert and keep-first dedup must match their dictionary-semantics
models on arbitrary keyed inputs.

Examples are kept small and few — each example is a Spark job — but
hypothesis explores the edge shapes (empty updates, all-duplicate keys,
single row) that fixed fixtures miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_data_engineering_pipeline_spark.operators import (
    dedup_keep_first,
    merge_upsert,
)

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.text(alphabet="abc", min_size=1, max_size=3)

rows_strategy = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)


@settings(
    derandomize=True,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=rows_strategy, upd=rows_strategy)
def test_merge_upsert_matches_dict_model(spark, tmp_path_factory, base, upd):
    path = str(tmp_path_factory.mktemp("merge") / "t")
    # model: dict update, updates win; within one batch the LAST row per
    # key in the dedup order wins — pre-dedup both sides deterministically
    # (merge_upsert's contract requires key-unique inputs)
    base_d = {}
    for k, v in base:
        base_d.setdefault(k, v)
    upd_d = {}
    for k, v in upd:
        upd_d.setdefault(k, v)

    def df_of(d):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [], "k int, v string"
        )

    if base_d:
        merge_upsert(spark, path, df_of(base_d), ["k"])
    if upd_d:
        merge_upsert(spark, path, df_of(upd_d), ["k"])
    expect = {**base_d, **upd_d}
    if not expect:
        return
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == expect


@settings(
    derandomize=True,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(KEYS, st.integers(0, 50)), min_size=1, max_size=15))
def test_dedup_keep_first_matches_min_model(spark, rows):
    df = spark.createDataFrame(rows, "k int, ord int")
    out = {(r.k): r.ord for r in dedup_keep_first(df, ["k"], ["ord"]).collect()}
    model = {}
    for k, o in rows:
        model[k] = min(model.get(k, o), o)
    assert out == model


# --- CDC apply_changes: random I/U/D logs vs a dict fold -------------
#
# The operator family where a silent edge case (seq ties resolved
# differently per run, delete-then-insert in one batch, NULL non-key
# columns) would corrupt a 100 TB table. Change rows arrive in LIST
# order but carry a PERMUTED unique seq (out-of-order delivery); the
# model folds them per key by max-seq. Unique seqs are part of the
# operator's contract — latest_wins breaks ties arbitrarily.

_change_rows = st.lists(
    st.tuples(
        KEYS,
        st.sampled_from(["I", "U", "D"]),
        st.one_of(st.none(), VALS),  # NULL non-key columns included
    ),
    min_size=0,
    max_size=12,
)


def _fold_batch(table: dict, rows, seqs) -> None:
    latest = {}
    for (k, op, v), s in zip(rows, seqs):
        if k not in latest or s > latest[k][0]:
            latest[k] = (s, op, v)
    for k, (_, op, v) in latest.items():
        if op == "D":
            table.pop(k, None)
        else:
            table[k] = v


def _changes_df(spark, rows, seqs, seq_base, with_part):
    part = (lambda k: str(k % 2)) if with_part else (lambda k: "x")
    data = [
        (k, part(k), v, op, seq_base + s)
        for (k, op, v), s in zip(rows, seqs)
    ]
    return spark.createDataFrame(
        data, "k int, part string, v string, op string, seq int"
    )


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch1=_change_rows,
    batch2=_change_rows,
    data=st.data(),
)
def test_apply_changes_matches_fold_model(
    spark, tmp_path_factory, batch1, batch2, data
):
    from end_to_end_data_engineering_pipeline_spark.operators.merge import (
        apply_changes,
    )

    seqs1 = data.draw(st.permutations(range(len(batch1)))) if batch1 else []
    seqs2 = data.draw(st.permutations(range(len(batch2)))) if batch2 else []
    path = str(tmp_path_factory.mktemp("cdc") / "t")

    model: dict = {}
    for rows, seqs, base in ((batch1, seqs1, 0), (batch2, seqs2, 1000)):
        if not rows:
            continue
        apply_changes(
            spark,
            path,
            _changes_df(spark, rows, seqs, base, with_part=False),
            ["k"],
            "seq",
        )
        _fold_batch(model, rows, seqs)

    import os

    if not os.path.isdir(path):
        assert not model
        return
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {k: v for k, v in model.items()}


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch1=_change_rows,
    batch2=_change_rows,
    data=st.data(),
)
def test_apply_changes_partitioned_equals_unpartitioned(
    spark, tmp_path_factory, batch1, batch2, data
):
    """The partition-scoped apply (partition determined by the key,
    k % 2) must land on exactly the same final table as the plain
    apply over the same change stream — including fully-deleted
    partitions disappearing."""
    from end_to_end_data_engineering_pipeline_spark.operators.merge import (
        apply_changes,
    )

    seqs1 = data.draw(st.permutations(range(len(batch1)))) if batch1 else []
    seqs2 = data.draw(st.permutations(range(len(batch2)))) if batch2 else []
    root = tmp_path_factory.mktemp("cdc_pv")
    flat, part = str(root / "flat"), str(root / "part")

    for rows, seqs, base in ((batch1, seqs1, 0), (batch2, seqs2, 1000)):
        if not rows:
            continue
        df = _changes_df(spark, rows, seqs, base, with_part=True)
        apply_changes(spark, flat, df, ["k"], "seq")
        apply_changes(
            spark, part, df, ["k"], "seq", partition_col="part"
        )

    import os

    if not os.path.isdir(flat):
        assert not os.path.isdir(part)
        return
    got_flat = {
        (r.k, r.part, r.v) for r in spark.read.parquet(flat).collect()
    }
    got_part = (
        {(r.k, str(r.part), r.v) for r in spark.read.parquet(part).collect()}
        if os.path.isdir(part)
        else set()
    )
    assert got_part == got_flat


# ---------------------------------------------------------------------------
# scd2_history: record boundaries vs a per-key sort model
# ---------------------------------------------------------------------------


def _scd2_model(rows):
    """rows: [(k, op, v, seq)] with seq unique per key. Returns
    {(k, v, valid_from, valid_to, is_current)} and the final
    latest-state dict for the current-view cross-check."""
    by_key: dict = {}
    for k, op, v, s in rows:
        by_key.setdefault(k, []).append((s, op, v))
    records = set()
    state = {}
    for k, changes in by_key.items():
        changes.sort()
        for i, (s, op, v) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            if op != "D":
                records.add((k, v, s, nxt, nxt is None))
        last_op, last_v = changes[-1][1], changes[-1][2]
        if last_op != "D":
            state[k] = last_v
    return records, state


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_change_rows)
def test_scd2_history_matches_sort_model(spark, rows):
    """scd2_history must reproduce the per-key sorted-fold record
    boundaries exactly: every non-delete change opens a record closed
    by the NEXT change's seq (U re-versions, D closes without a
    record), and the current view equals the latest-wins state minus
    deleted keys — the e15/e16 consistency contract."""
    from end_to_end_data_engineering_pipeline_spark.operators.merge import (
        scd2_history,
    )

    # globally unique seq satisfies the per-key uniqueness precondition
    data = [(k, op, v, i + 1) for i, (k, op, v) in enumerate(rows)]
    if not data:
        return
    df = spark.createDataFrame(
        [(k, v, op, s) for (k, op, v, s) in data],
        "k int, v string, op string, seq int",
    )
    hist = scd2_history(df, ["k"], "seq", "op").collect()
    got = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in hist
    }
    expect_records, expect_state = _scd2_model(data)
    assert got == expect_records
    current = {r.k: r.v for r in hist if r.is_current}
    assert current == expect_state


# ---------------------------------------------------------------------------
# token_budget_prefix: hash-order prefix model + nesting
# ---------------------------------------------------------------------------


def _hash32_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


_budget_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # group
        st.integers(min_value=0, max_value=50),  # id
        st.integers(min_value=1, max_value=9),   # weight
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda t: t[1],
)


def _budget_model(rows, numer, denom):
    by_g: dict = {}
    for g, i, w in rows:
        by_g.setdefault(g, []).append((i, w))
    kept = set()
    for g, docs in by_g.items():
        docs.sort(key=lambda t: (_hash32_py(str(t[0])), t[0]))
        total = sum(w for _, w in docs)
        cum = 0
        for i, w in docs:
            if cum * denom < numer * total:
                kept.add(i)
            cum += w
    return kept


@settings(
    derandomize=True,
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_budget_rows)
def test_token_budget_prefix_matches_model_and_nests(spark, rows):
    """token_budget_prefix must keep exactly the hash-order prefix the
    Python model keeps (boundary doc included iff it STARTS before the
    budget), and smaller budgets must select subsets of larger ones
    (nested mixes for scaling-law curves)."""
    from end_to_end_data_engineering_pipeline_spark.operators.sampling import (
        token_budget_prefix,
    )

    if not rows:
        return
    df = spark.createDataFrame(rows, "g int, id int, w int")
    kept_sets = {}
    for numer in (1, 3, 10):
        out = token_budget_prefix(df, "g", "w", numer, 10, "id")
        kept_sets[numer] = {r.id for r in out.collect()}
        assert kept_sets[numer] == _budget_model(rows, numer, 10)
    assert kept_sets[1] <= kept_sets[3] <= kept_sets[10]
    assert kept_sets[10] == {i for _, i, _w in rows}


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch1=_change_rows, batch2=_change_rows)
def test_scd2_apply_sequential_equals_one_shot(
    spark, tmp_path_factory, batch1, batch2
):
    """Incremental SCD2 (scd2_apply per batch) must land on exactly
    the table the one-shot scd2_history rebuild produces over the
    concatenated log — close-at-batch-boundary, delete-closes, and
    reopen-after-delete all consistent."""
    from end_to_end_data_engineering_pipeline_spark.operators.merge import (
        scd2_apply,
        scd2_history,
    )

    # increasing seq across batches (the ordering contract); unique per key
    rows1 = [(k, v, op, i + 1) for i, (k, op, v) in enumerate(batch1)]
    rows2 = [
        (k, v, op, 1000 + i) for i, (k, op, v) in enumerate(batch2)
    ]
    if not rows1 and not rows2:
        return
    schema = "k int, v string, op string, seq int"
    path = str(tmp_path_factory.mktemp("scd2") / "t")
    for rows in (rows1, rows2):
        if rows:
            scd2_apply(spark, path, spark.createDataFrame(rows, schema), ["k"])
    one_shot = scd2_history(
        spark.createDataFrame(rows1 + rows2, schema), ["k"]
    )
    got = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in spark.read.parquet(path).collect()
    }
    expect = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in one_shot.collect()
    }
    assert got == expect


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch1=_change_rows, batch2=_change_rows)
def test_scd2_apply_partitioned_equals_unpartitioned(
    spark, tmp_path_factory, batch1, batch2
):
    """Partition-scoped incremental SCD2 (partition = f(key), k % 2)
    must land on exactly the same history as the flat apply over the
    same batches — close-at-boundary across partition boundaries
    included."""
    from end_to_end_data_engineering_pipeline_spark.operators.merge import (
        scd2_apply,
    )

    rows1 = [(k, str(k % 2), v, op, i + 1) for i, (k, op, v) in enumerate(batch1)]
    rows2 = [
        (k, str(k % 2), v, op, 1000 + i) for i, (k, op, v) in enumerate(batch2)
    ]
    if not rows1 and not rows2:
        return
    schema = "k int, part string, v string, op string, seq int"
    root = tmp_path_factory.mktemp("scd2_pv")
    flat, part = str(root / "flat"), str(root / "part")
    for rows in (rows1, rows2):
        if not rows:
            continue
        df = spark.createDataFrame(rows, schema)
        scd2_apply(spark, flat, df, ["k"])
        scd2_apply(spark, part, df, ["k"], partition_col="part")

    import os

    if not os.path.isdir(flat):
        assert not os.path.isdir(part)
        return
    got_flat = {
        (r.k, str(r.part), r.v, r.valid_from, r.valid_to, r.is_current)
        for r in spark.read.parquet(flat).collect()
    }
    got_part = {
        (r.k, str(r.part), r.v, r.valid_from, r.valid_to, r.is_current)
        for r in spark.read.parquet(part).collect()
    }
    assert got_part == got_flat


# ---------------------------------------------------------------------------
# retention + split assignment: closed-form models
# ---------------------------------------------------------------------------

_dates = st.sampled_from(
    [f"2024-{m:02d}-{d:02d}" for m in (1, 2, 3) for d in (1, 11, 21)]
)


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), _dates), min_size=1, max_size=15,
        unique_by=lambda t: t[0],
    ),
    cutoff=_dates,
)
def test_expire_partitions_matches_filter_model(
    spark, tmp_path_factory, rows, cutoff
):
    """Expiring partitions below a cutoff must leave exactly the rows
    a plain `d >= cutoff` filter keeps, report exactly the removed
    values, and be idempotent."""
    from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
        expire_partitions,
    )

    path = str(tmp_path_factory.mktemp("ttl") / "t")
    df = spark.createDataFrame(rows, "id int, d string")
    df.write.mode("overwrite").partitionBy("d").parquet(path)

    removed = expire_partitions(path, "d", cutoff)
    assert removed == sorted({d for _, d in rows if d < cutoff})
    expect_ids = {i for i, d in rows if d >= cutoff}
    if expect_ids:
        got = {r.id for r in spark.read.parquet(path).collect()}
        assert got == expect_ids
    assert expire_partitions(path, "d", cutoff) == []


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True))
def test_assign_split_matches_hash_model_and_is_stable(spark, rows):
    """Split assignment must equal the closed-form hash rule per row,
    and adding MORE rows must never change existing rows' splits (the
    anti-contamination property)."""
    import hashlib

    from end_to_end_data_engineering_pipeline_spark.operators.sampling import (
        SAMPLE_BUCKETS,
        assign_split,
    )

    def model(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % SAMPLE_BUCKETS
        return "train" if b < 900000 else ("val" if b < 950000 else "test")

    df = spark.createDataFrame([(i,) for i in rows], "id int")
    got = {
        r.id: r.split
        for r in assign_split(
            df, [("train", 900000), ("val", 950000)], "test", "id"
        ).collect()
    }
    assert got == {i: model(i) for i in rows}

    # growth stability: assignments over a SUPERSET agree on the subset
    df2 = spark.createDataFrame(
        [(i,) for i in rows + [max(rows) + 1 + k for k in range(5)]], "id int"
    )
    got2 = {
        r.id: r.split
        for r in assign_split(
            df2, [("train", 900000), ("val", 950000)], "test", "id"
        ).collect()
    }
    assert all(got2[i] == got[i] for i in rows)


# ---------------------------------------------------------------------------
# decontamination: shingle-overlap model
# ---------------------------------------------------------------------------

_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_texts = st.lists(_words, min_size=1, max_size=8).map(" ".join)


def _shingles_py(text: str, k: int = 3):
    toks = text.lower().strip().split()
    n = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i : i + k]) for i in range(n)}


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(_texts, min_size=1, max_size=8),
    bench=st.lists(_texts, min_size=1, max_size=4),
)
def test_contamination_hits_matches_shingle_model(spark, corpus, bench):
    """contamination_hits must report, for every corpus doc, exactly
    |distinct-shingles(doc) ∩ union-of-bench-shingles| and omit clean
    docs — pinned against a pure-Python shingle model so the
    position-explode rewrite (and any future one) can't drift the
    semantics."""
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        contamination_hits,
    )

    cdf = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)],
        "doc_id long, text string",
    )
    bench_set = set().union(*(_shingles_py(t) for t in bench))
    expect = {}
    for i, t in enumerate(corpus):
        n = len(_shingles_py(t) & bench_set)
        if n:
            expect[i] = n
    got = {r.id: r.n_hits for r in contamination_hits(cdf, bdf).collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# dedup_chunks vs a pure-Python keep-first model
# ---------------------------------------------------------------------------

_WORDS = st.integers(min_value=0, max_value=3).map(lambda i: f"w{i}")
_DOC_TEXT = st.lists(_WORDS, min_size=1, max_size=9).map(" ".join)


@settings(
    derandomize=True,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_DOC_TEXT, min_size=1, max_size=6))
def test_dedup_chunks_matches_keep_first_model(spark, texts):
    """Sub-document dedup equals the obvious sequential fold: walk docs
    in id order, chunk each into fixed token windows, keep a chunk iff
    its text was never seen before, reassemble in order. The tiny
    2-word alphabet forces heavy cross-doc chunk collisions."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        dedup_chunks,
    )

    chunk = 2
    docs = [(i, t) for i, t in enumerate(texts)]
    seen: set[str] = set()
    model = {}
    for i, t in docs:
        toks = t.split()
        pieces = [
            " ".join(toks[s : s + chunk]) for s in range(0, len(toks), chunk)
        ]
        kept = []
        for p in pieces:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        model[i] = (len(pieces), len(kept), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.dedup_text)
        for r in dedup_chunks(df, chunk_tokens=chunk).collect()
    }
    assert got == model


# ---------------------------------------------------------------------------
# snapshot_merge vs a dict-fold model (CoW MERGE correctness under
# arbitrary batch sequences)
# ---------------------------------------------------------------------------

_SNAP_BATCH = st.lists(
    st.tuples(st.integers(0, 6), st.text(alphabet="xyz", min_size=1, max_size=2)),
    min_size=1,
    max_size=6,
)


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(_SNAP_BATCH, min_size=1, max_size=4))
def test_snapshot_merge_matches_dict_model(
    spark, tmp_path_factory, batches
):
    """A sequence of CoW merges equals the dict fold (last write per
    key wins within and across batches), AND every intermediate
    version remains readable as the fold's state at that point —
    time travel is part of the contract, not just the final state.
    Batches are pre-deduped per key (merge requires key-unique
    updates), keeping the LAST pair per key like the fold does."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_merge,
        snapshot_read,
    )

    t = str(tmp_path_factory.mktemp("snap") / "t")
    model: dict[int, str] = {}
    states: list[dict[int, str]] = []
    for batch in batches:
        dedup: dict[int, str] = {}
        for k, v in batch:
            dedup[k] = v
        df = spark.createDataFrame(
            sorted(dedup.items()), "k long, v string"
        )
        snapshot_merge(spark, t, df, keys=["k"])
        model.update(dedup)
        states.append(dict(model))
    for v, state in enumerate(states):
        got = sorted(
            (r.k, r.v) for r in snapshot_read(spark, t, version=v).collect()
        )
        assert got == sorted(state.items())


# ---------------------------------------------------------------------------
# dup_span_stats vs brute-force covered-position-set model
# ---------------------------------------------------------------------------

TOKS = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10
)


@settings(
    derandomize=True,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(TOKS, min_size=1, max_size=5))
def test_dup_span_stats_matches_position_set_model(spark, docs):
    """The lag-window interval-union trick must equal the brute-force
    model: a token position is covered iff it lies inside ANY
    length-n window whose gram occurs >= 2 times corpus-wide.
    Tiny 4-letter alphabet forces heavy within- and cross-doc
    repetition (the overlap-chain's hard case)."""
    from collections import Counter

    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        dup_span_stats,
    )

    n = 3
    texts = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict() for r in dup_span_stats(df, n=n).collect()
    }

    grams = Counter()
    for toks in docs:
        for i in range(len(toks) - n + 1):
            grams[tuple(toks[i : i + n])] += 1
    for doc_id, toks in enumerate(docs):
        covered: set[int] = set()
        n_dup = 0
        for i in range(len(toks) - n + 1):
            if grams[tuple(toks[i : i + n])] >= 2:
                n_dup += 1
                covered.update(range(i, i + n))
        # whitespace_tokens of "" is [""] (size 1): the operator's
        # n_tokens for an empty doc is 1 — mirror that in the model
        n_tokens = max(len(toks), 1)
        assert got[doc_id]["n_dup_grams"] == n_dup
        assert got[doc_id]["dup_covered_tokens"] == len(covered)
        assert got[doc_id]["n_tokens"] == n_tokens
        assert got[doc_id]["dup_fraction"] == round(
            len(covered) / n_tokens, 6
        )


# ---------------------------------------------------------------------------
# rrf_fuse vs per-candidate fold model
# ---------------------------------------------------------------------------

RANKING = st.lists(
    st.integers(min_value=10, max_value=15), min_size=0, max_size=5, unique=True
)


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rankings=st.lists(RANKING, min_size=1, max_size=3))
def test_rrf_fuse_matches_fold_model(spark, rankings):
    """RRF against the obvious Python model: score(cand) =
    sum over retrievers of 1/(60 + rank), missing -> 0; top-k by
    (score desc, cand_id). Random overlapping candidate lists
    exercise every full-outer-join null pattern."""
    from end_to_end_data_engineering_pipeline_spark.operators.similarity import (
        rrf_fuse,
    )

    dfs = []
    for cands in rankings:
        rows = [(0, c, i + 1) for i, c in enumerate(cands)]
        dfs.append(
            spark.createDataFrame(
                rows or [], "query_id long, cand_id long, rk long"
            )
        )
    k = 4
    got = [
        (r.cand_id, r.rrf, r.rk)
        for r in sorted(rrf_fuse(dfs, k=k).collect(), key=lambda r: r.rk)
    ]

    score: dict[int, float] = {}
    for cands in rankings:
        for i, c in enumerate(cands):
            score[c] = score.get(c, 0.0) + 1.0 / (60 + i + 1)
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(g[0], g[2]) for g in got] == [
        (c, i + 1) for i, (c, _) in enumerate(want)
    ]
    for (_, ws), (_, gs, _) in zip(want, got):
        assert abs(gs - ws) < 1e-12


def test_ancestors_by_doubling_deep_chain(spark):
    """A depth-60 chain resolves with 6 doubling rounds' reach (2^6=64)
    and exact depths; branching forest roots resolve per-tree."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.graph import (
        ancestors_by_doubling,
    )

    # chain 0<-1<-2<-...<-60  (parent = k-1), plus a second tree:
    # 100 <- {101, 102}, 101 <- 103
    chain = [(k, k - 1) for k in range(1, 61)]
    tree = [(101, 100), (102, 100), (103, 101)]
    edges = spark.createDataFrame(chain + tree, "child long, parent long")
    got = {
        r.node: (r.root, r.depth)
        for r in ancestors_by_doubling(edges, max_depth=64).collect()
    }
    assert got[60] == (0, 60)
    assert got[1] == (0, 1)
    assert got[30] == (0, 30)
    assert got[101] == (100, 1)
    assert got[103] == (100, 2)
    assert len(got) == 63  # every child node, roots excluded


@settings(
    derandomize=True,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 50)),  # heavy ties + nulls
            st.booleans(),
        ),
        min_size=0,
        max_size=60,
    ),
    k=st.integers(1, 9),
    desc=st.booleans(),
)
def test_global_rank_and_ntile_match_window_functions(spark, rows, k, desc):
    """Property (r10): for ANY value multiset (duplicates, nulls,
    empty), any direction, any k — global_rank equals ROW_NUMBER and
    scalable_ntile equals NTILE over the same total order. This is
    the cross-implementation oracle for the literal-bucket rank
    machinery on shapes a fixed fixture can't enumerate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.partitioning import (
        global_rank,
        scalable_ntile,
    )

    data = [(i, v) for i, (v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, v long").repartition(5)
    order = [(F.col("v"), desc), (F.col("id"), False)]
    sort = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
    got = scalable_ntile(
        global_rank(df, order, rank_col="rk"), k, order, bucket_col="b"
    )
    ref = df.select(
        "id",
        F.row_number().over(Window.orderBy(*sort)).cast("long").alias("rk2"),
        F.ntile(k).over(Window.orderBy(*sort)).alias("b2"),
    )
    bad = (
        got.join(ref, "id")
        .where((F.col("rk") != F.col("rk2")) | (F.col("b") != F.col("b2")))
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------------------------
# bloom point lookups vs dict model through a full op sequence
# ---------------------------------------------------------------------------


@settings(
    derandomize=True,
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=10),
    upd=st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=6),
    dele=st.lists(KEYS, max_size=3),
    probes=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=5),
)
def test_bloom_point_reads_match_dict_model(
    spark, tmp_path_factory, base, upd, dele, probes
):
    """snapshot_read_point through write_bloom -> merge -> delete ->
    compact must equal the dict fold for EVERY probe — present keys,
    deleted keys, and never-present keys alike. This is the
    no-false-negatives contract under the operations that rewrite
    files and therefore recompute bitmaps."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_delete,
        snapshot_merge,
        snapshot_read_point,
        snapshot_write_bloom,
    )

    t = str(tmp_path_factory.mktemp("bloomsnap") / "t")
    model: dict[int, str] = {}
    for k, v in base:
        model[k] = v
    snapshot_write_bloom(
        spark,
        t,
        spark.createDataFrame(sorted(model.items()), "k long, v string"),
        "k",
        m_bits=256,  # deliberately small: force false positives
        k=2,
    )
    if upd:
        dd: dict[int, str] = {}
        for k, v in upd:
            dd[k] = v
        snapshot_merge(
            spark,
            t,
            spark.createDataFrame(sorted(dd.items()), "k long, v string"),
            ["k"],
        )
        model.update(dd)
    if dele:
        ks = sorted(set(dele))
        snapshot_delete(
            spark,
            t,
            spark.createDataFrame([(k,) for k in ks], "k long"),
            ["k"],
        )
        for k in ks:
            model.pop(k, None)
    snapshot_compact(spark, t, small_file_bytes=1 << 30)
    for p in probes:
        got = sorted(
            (r.k, r.v) for r in snapshot_read_point(spark, t, p).collect()
        )
        want = [(p, model[p])] if p in model else []
        assert got == want, f"probe {p}: {got} != {want}"


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.tuples(
            st.booleans(),  # which spec this batch appends under
            st.lists(
                st.tuples(
                    st.integers(0, 3),       # cell (spec A)
                    st.sampled_from("xyz"),  # tag (spec B)
                    st.integers(0, 99),      # payload
                ),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_partition_evolution_union_matches_bag_model(
    spark, tmp_path_factory, batches
):
    """Partition-spec evolution, model-checked on arbitrary commit
    histories: appending batches under ALTERNATING specs must read
    back (union, per-spec filtered) exactly as the bag union of the
    batches — whichever spec each batch landed under, and regardless
    of spec order or how many times the table evolved back and
    forth."""
    from collections import Counter

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    path = str(tmp_path_factory.mktemp("evo") / "t")
    all_rows: list[tuple] = []
    rid = 0
    for i, (use_b, rows) in enumerate(batches):
        # unique row ids so the bag comparison is exact
        batch = [(rid + j, c, t, v) for j, (c, t, v) in enumerate(rows)]
        rid += len(rows)
        all_rows.extend(batch)
        df = spark.createDataFrame(
            batch, "id long, cell int, tag string, v long"
        )
        col = "tag" if use_b else "cell"
        snapshot_write_partitioned(
            spark,
            path,
            df,
            col,
            mode="overwrite" if i == 0 else "append",
            evolve=True,
        )
    got = Counter(
        (r.id, r.cell, r.tag, r.v)
        for r in snapshot_read_partitioned(spark, path).collect()
    )
    assert got == Counter(all_rows)
    # per-spec filtered reads match a plain filter of the bag —
    # including the residual over files committed under the OTHER
    # spec. Only specs the history actually committed are probeable
    # (a never-evolved table stays single-spec and refuses other
    # columns by contract).
    committed = {"tag" if b else "cell" for b, _ in batches}
    if "cell" in committed:
        got_cell = Counter(
            (r.id, r.cell, r.tag, r.v)
            for r in snapshot_read_partitioned(
                spark, path, values=[0, 2], col="cell"
            ).collect()
        )
        assert got_cell == Counter(
            r for r in all_rows if r[1] in (0, 2)
        )
    if "tag" in committed:
        got_tag = Counter(
            (r.id, r.cell, r.tag, r.v)
            for r in snapshot_read_partitioned(
                spark, path, values=["x"], col="tag"
            ).collect()
        )
        assert got_tag == Counter(r for r in all_rows if r[2] == "x")


# --- merge-on-read DML model check -----------------------------------
# Arbitrary interleavings of the whole MoR surface (plain appends,
# position deletes, equality deletes, one-commit equality upserts,
# MoR merges, materializing compactions) must match a multiset fold,
# at the head AND at every time-travelable version. This is where
# flavor interactions live (a position vector over a file an equality
# tombstone also covers; a tombstone older than an appended file; a
# compact in the middle of the history) — fixed fixtures can't
# enumerate them.

_MOR_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(
                st.tuples(
                    st.integers(0, 5), st.integers(0, 9)
                ),
                min_size=1,
                max_size=4,
            ),
        ),
        st.tuples(
            st.just("delete_mor"),
            st.lists(st.integers(0, 5), min_size=1, max_size=3),
        ),
        st.tuples(
            st.just("delete_eq"),
            st.lists(st.integers(0, 5), min_size=1, max_size=3),
        ),
        st.tuples(
            st.just("upsert_eq"),
            st.lists(
                st.tuples(st.integers(0, 5), st.integers(0, 9)),
                min_size=1,
                max_size=3,
                unique_by=lambda t: t[0],  # writer contract: key-unique
            ),
        ),
        st.tuples(
            st.just("merge_mor"),
            st.lists(
                st.tuples(st.integers(0, 5), st.integers(0, 9)),
                min_size=1,
                max_size=3,
                unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(st.just("compact"), st.just(None)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_MOR_OPS)
def test_mor_dml_interleavings_match_multiset_model(
    spark, tmp_path_factory, ops
):
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_delete_eq,
        snapshot_delete_mor,
        snapshot_merge_mor,
        snapshot_read,
        snapshot_upsert_eq,
        snapshot_write,
    )

    path = str(tmp_path_factory.mktemp("mor") / "t")

    def df_rows(rows):
        return spark.createDataFrame(rows, "k long, v long")

    def df_keys(keys):
        return spark.createDataFrame([(k,) for k in keys], "k long")

    # model: a multiset of (k, v) rows — every delete flavor removes
    # ALL current rows with the key (equality deletes resolve to
    # exactly this at apply time: mask everything older), upserts
    # remove-then-add
    model: list[tuple[int, int]] = [(0, 0), (1, 1)]
    snapshot_write(spark, path, df_rows(model).repartition(2))
    history = {0: sorted(model)}

    for op, arg in ops:
        if op == "append":
            v = snapshot_write(spark, path, df_rows(arg), mode="append")
            model = model + list(arg)
        elif op == "delete_mor":
            v = snapshot_delete_mor(spark, path, df_keys(arg), ["k"])
            model = [(k, x) for k, x in model if k not in set(arg)]
        elif op == "delete_eq":
            v = snapshot_delete_eq(spark, path, df_keys(arg), ["k"])
            model = [(k, x) for k, x in model if k not in set(arg)]
        elif op in ("upsert_eq", "merge_mor"):
            fn = snapshot_upsert_eq if op == "upsert_eq" else snapshot_merge_mor
            v = fn(spark, path, df_rows(arg), ["k"])
            ks = {k for k, _ in arg}
            model = [(k, x) for k, x in model if k not in ks] + list(arg)
        else:
            v = snapshot_compact(spark, path)
            # content-neutral; v may equal the previous version when
            # there was nothing to do
        got = sorted(
            (r.k, r.v) for r in snapshot_read(spark, path).collect()
        )
        assert got == sorted(model), (op, arg)
        history[v] = sorted(model)

    # every retained version time-travels to its recorded state
    for v, want in history.items():
        got = sorted(
            (r.k, r.v)
            for r in snapshot_read(spark, path, version=v).collect()
        )
        assert got == want, f"version {v}"


# --- evolved-table DML model check ------------------------------------
# The r14 completion of the DML x layout matrix: arbitrary
# interleavings of partition-spec evolution (appends under
# alternating spec columns), COPY-ON-WRITE delete/merge (which
# lazily migrate touched files to the default spec and may collapse
# the manifest back to single-spec), the merge-on-read flavors, and
# compaction must all match the same multiset fold — at the head and
# at every retained version. When a CoW op refuses because
# merge-on-read deletes are in force, the documented compact-first
# recipe is applied and must make the retry succeed: the recipe is
# part of the contract under test.

_EVO_ROWS = st.tuples(
    st.integers(0, 5),  # k
    st.integers(0, 2),  # a (spec A: int partition col)
    st.sampled_from(["x", "y"]),  # b (spec B: string partition col)
    st.integers(0, 9),  # v
)

_EVO_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["append_a", "append_b"]),
            st.lists(_EVO_ROWS, min_size=1, max_size=3),
        ),
        st.tuples(
            st.sampled_from(["cow_delete", "delete_mor", "delete_eq"]),
            st.lists(st.integers(0, 5), min_size=1, max_size=3),
        ),
        st.tuples(
            st.sampled_from(["cow_merge", "upsert_eq", "merge_mor"]),
            st.lists(
                _EVO_ROWS,
                min_size=1,
                max_size=3,
                unique_by=lambda t: t[0],  # writer contract: key-unique
            ),
        ),
        st.tuples(st.just("compact"), st.just(None)),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_EVO_OPS)
def test_evolved_dml_interleavings_match_multiset_model(
    spark, tmp_path_factory, ops
):
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_delete,
        snapshot_delete_eq,
        snapshot_delete_mor,
        snapshot_merge,
        snapshot_merge_mor,
        snapshot_read_partitioned,
        snapshot_upsert_eq,
        snapshot_write_partitioned,
    )

    path = str(tmp_path_factory.mktemp("evo") / "t")
    schema = "k long, a long, b string, v long"

    def df_rows(rows):
        return spark.createDataFrame(rows, schema)

    def df_keys(keys):
        return spark.createDataFrame([(k,) for k in keys], "k long")

    def cow_with_recipe(fn, *args):
        # the documented contract: CoW on a table with in-force MoR
        # deletes refuses loudly; compact materializes them and the
        # retry must succeed
        try:
            return fn(spark, path, *args)
        except ValueError as e:
            assert "snapshot_compact" in str(e)
            snapshot_compact(spark, path)
            return fn(spark, path, *args)

    model: list[tuple] = [(0, 0, "x", 0), (1, 1, "y", 1)]
    snapshot_write_partitioned(spark, path, df_rows(model), "a")
    history = {0: sorted(model)}

    for op, arg in ops:
        if op in ("append_a", "append_b"):
            col = "a" if op == "append_a" else "b"
            v = snapshot_write_partitioned(
                spark, path, df_rows(arg), col, mode="append", evolve=True
            )
            model = model + list(arg)
        elif op == "cow_delete":
            v = cow_with_recipe(snapshot_delete, df_keys(arg), ["k"])
            model = [r for r in model if r[0] not in set(arg)]
        elif op == "delete_mor":
            v = snapshot_delete_mor(spark, path, df_keys(arg), ["k"])
            model = [r for r in model if r[0] not in set(arg)]
        elif op == "delete_eq":
            v = snapshot_delete_eq(spark, path, df_keys(arg), ["k"])
            model = [r for r in model if r[0] not in set(arg)]
        elif op == "cow_merge":
            v = cow_with_recipe(snapshot_merge, df_rows(arg), ["k"])
            ks = {r[0] for r in arg}
            model = [r for r in model if r[0] not in ks] + list(arg)
        elif op == "compact":
            v = snapshot_compact(spark, path)
            # content-neutral; v may equal the previous version when
            # there was nothing to do
        else:
            fn = snapshot_upsert_eq if op == "upsert_eq" else snapshot_merge_mor
            v = fn(spark, path, df_rows(arg), ["k"])
            ks = {r[0] for r in arg}
            model = [r for r in model if r[0] not in ks] + list(arg)
        got = sorted(
            (r.k, r.a, r.b, r.v)
            for r in snapshot_read_partitioned(spark, path).collect()
        )
        assert got == sorted(model), (op, arg)
        history[v] = sorted(model)

    for v, want in history.items():
        got = sorted(
            (r.k, r.a, r.b, r.v)
            for r in snapshot_read_partitioned(
                spark, path, version=v
            ).collect()
        )
        assert got == want, f"version {v}"


# --- bloom-layout DML model check -------------------------------------
# Same multiset fold over a BLOOM-INDEXED table keyed on the indexed
# column, so r14's _bloom_dml_prune engages on every MoR position
# scan (delete_mor / merge_mor): bitmap pruning must never lose a
# position (false positives only), re-deletes must stay idempotent
# over pruned candidate sets, appended files must get fresh bitmaps
# under every flavor, and CoW ops compose via the compact-first
# recipe when vectors/tombstones are in force.


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_MOR_OPS)
def test_bloom_dml_interleavings_match_multiset_model(
    spark, tmp_path_factory, ops
):
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_delete,
        snapshot_delete_eq,
        snapshot_delete_mor,
        snapshot_merge_mor,
        snapshot_read,
        snapshot_read_point,
        snapshot_upsert_eq,
        snapshot_write_bloom,
    )

    path = str(tmp_path_factory.mktemp("bloomdml") / "t")

    def df_rows(rows):
        return spark.createDataFrame(rows, "k long, v long")

    def df_keys(keys):
        return spark.createDataFrame([(k,) for k in keys], "k long")

    model: list[tuple[int, int]] = [(0, 0), (1, 1)]
    snapshot_write_bloom(spark, path, df_rows(model).repartition(2), "k")
    history = {0: sorted(model)}

    for op, arg in ops:
        if op == "append":
            v = snapshot_write_bloom(
                spark, path, df_rows(arg), "k", mode="append"
            )
            model = model + list(arg)
        elif op == "delete_mor":
            v = snapshot_delete_mor(spark, path, df_keys(arg), ["k"])
            model = [(k, x) for k, x in model if k not in set(arg)]
        elif op == "delete_eq":
            v = snapshot_delete_eq(spark, path, df_keys(arg), ["k"])
            model = [(k, x) for k, x in model if k not in set(arg)]
        elif op in ("upsert_eq", "merge_mor"):
            fn = snapshot_upsert_eq if op == "upsert_eq" else snapshot_merge_mor
            v = fn(spark, path, df_rows(arg), ["k"])
            ks = {k for k, _ in arg}
            model = [(k, x) for k, x in model if k not in ks] + list(arg)
        else:
            v = snapshot_compact(spark, path)
        got = sorted(
            (r.k, r.v) for r in snapshot_read(spark, path).collect()
        )
        assert got == sorted(model), (op, arg)
        history[v] = sorted(model)
        # the point-lookup index stays exact through every flavor:
        # probe one present and one absent key via the bitmaps
        present = {k for k, _ in model}
        probe = min(present) if present else 0
        want = sorted(x for k, x in model if k == probe)
        assert (
            sorted(
                r.v
                for r in snapshot_read_point(spark, path, probe).collect()
            )
            == want
        ), (op, arg, "point", probe)
        assert snapshot_read_point(spark, path, 12345).count() == 0

    # CoW delete on the final state composes via the compact-first
    # recipe when merge-on-read metadata is in force — and the bloom
    # index survives it (fresh bitmaps for rewritten files)
    try:
        v = snapshot_delete(spark, path, df_keys([0, 2]), ["k"])
    except ValueError as e:
        assert "snapshot_compact" in str(e)
        snapshot_compact(spark, path)
        v = snapshot_delete(spark, path, df_keys([0, 2]), ["k"])
    model = [(k, x) for k, x in model if k not in (0, 2)]
    got = sorted((r.k, r.v) for r in snapshot_read(spark, path).collect())
    assert got == sorted(model)
    for v, want in history.items():
        got = sorted(
            (r.k, r.v)
            for r in snapshot_read(spark, path, version=v).collect()
        )
        assert got == want, f"version {v}"
