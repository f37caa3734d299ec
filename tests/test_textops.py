"""Behavioral tests for the fuzzy-dedup / text operators (the parts the
SQL oracle can't grade: LSH candidate generation quality, simhash
locality, exact-dedup keep-first semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word edit
OTHER = (
    "completely different text about spark query engines and columnar "
    "storage formats with vectorized execution and shuffle services"
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, BASE, "en", "s0"),
        (1, NEAR, "en", "s0"),
        (2, OTHER, "en", "s0"),
        (3, BASE, "en", "s0"),          # exact duplicate of 0
        (4, BASE.upper(), "en", "s0"),  # case-variant duplicate of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_exact_dedup_keeps_lowest_id(docs):
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    # 3 and 4 normalize to the same fingerprint as 0
    assert kept == [0, 1, 2]


def test_lsh_finds_near_duplicate_pair(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert (0, 1) in pairs  # the one-word edit
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert not any({a, b} == {0, 2} for a, b in pairs)  # unrelated text


def test_lsh_agrees_with_exact_jaccard(docs):
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, ["lang", "source"], threshold=0.3).collect()
    }
    # every LSH-confirmed pair carries the exact jaccard value
    for k, v in lsh.items():
        assert exact[k] == v


def test_simhash_locality(spark, docs):
    out = {r.doc_id: r.sh for r in docs.select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
    ham_near = bin(out[0] ^ out[1]).count("1")
    ham_far = bin(out[0] ^ out[2]).count("1")
    assert out[0] == out[3]  # identical text -> identical simhash
    assert ham_near < ham_far  # near-dup closer in Hamming space


def test_shingles_shorter_than_k(spark):
    df = spark.createDataFrame([(0, "only two")], ["doc_id", "text"])
    sh = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()[0].s
    assert sh == ["only two"]


def test_winnowing_guarantee_and_density(spark):
    """Winnowing invariants (SIGMOD'03): (1) two docs sharing a token
    run of length >= k+w-1 share at least one fingerprint; (2) the
    selection is sparser than the full gram-hash sequence; (3) the
    result is layout-independent."""
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    shared = "alpha bravo charlie delta echo foxtrot"  # 6 tokens = k+w-1
    rows = [
        (1, f"unrelated prefix one {shared} trailing words here"),
        (2, f"{shared} completely different ending tokens now"),
        (3, "nothing in common with the others at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = winnow_fingerprints(docs, k=3, w=4)
    by_doc: dict[int, set[int]] = {}
    for r in fp.collect():
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    # guarantee: the shared 6-token run leaves a common fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density: fewer fingerprints than grams (n_tokens - k + 1)
    for doc_id, text in rows:
        n_grams = len(text.split()) - 2
        assert 1 <= len(by_doc[doc_id]) < n_grams
    # layout independence
    fp2 = winnow_fingerprints(docs.repartition(5), k=3, w=4)
    assert set(map(tuple, fp.collect())) == set(map(tuple, fp2.collect()))

    pairs = winnow_overlap_pairs(docs, k=3, w=4, min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_lsh_band_salt_identical_and_cap_drops_boilerplate(spark):
    """band_salt must not change results; max_band_size must drop a
    constructed boilerplate mega-bucket while keeping ordinary pairs."""
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        minhash_lsh_pairs,
    )

    boiler = "standard license header text identical across many files"
    rows = [(i, boiler) for i in range(1, 9)]  # 8-doc boilerplate cluster
    rows += [
        (100, BASE),
        (101, NEAR),
        (102, OTHER),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    plain = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    salted = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.3, band_salt=4).collect()
    }
    assert salted == plain
    assert (100, 101) in plain
    # the 8-doc cluster contributes C(8,2)=28 pairs without the cap
    assert sum(1 for a, b in plain if a < 100 and b < 100) == 28

    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.3, max_band_size=4).collect()
    }
    assert (100, 101) in capped
    assert not any(a < 100 and b < 100 for a, b in capped)


def test_connected_components_shapes(spark):
    """Chain, clique, and two-node components must each collapse to
    their min id; propagation must cross the whole chain diameter."""
    from end_to_end_data_engineering_pipeline_spark.operators.graph import (
        connected_components,
        resolve_canonical,
    )

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),   # chain 1-5
            (10, 11), (10, 12), (11, 12),     # triangle
            (20, 21),                         # pair
        ],
        ["id_a", "id_b"],
    )
    cc = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert cc == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 99]],
        ["doc_id", "text"],
    )
    kept = sorted(
        r.doc_id for r in resolve_canonical(docs, pairs).collect()
    )
    assert kept == [1, 10, 20, 99]  # one survivor per cluster + singleton


def test_connected_components_raises_on_nonconvergence(spark):
    """A chain longer than max_iter allows must RAISE, never return
    partially-propagated labels (which would silently keep multiple
    'canonical' docs per cluster)."""
    import pytest

    from end_to_end_data_engineering_pipeline_spark.operators.graph import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # and with enough rounds the same graph converges to one label
    cc = connected_components(chain, max_iter=25).collect()
    assert {r.cluster_id for r in cc} == {1}


def test_lsh_band_salt_string_ids(spark):
    """Salting must be type-agnostic: string doc ids used to NULL out
    under the long-cast salt, silently dropping every pair."""
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        minhash_lsh_pairs,
    )

    rows = [("doc-a", BASE), ("doc-b", NEAR), ("doc-c", OTHER)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    salted = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.3, band_salt=4).collect()
    }
    assert salted == plain
    assert ("doc-a", "doc-b") in plain


def test_pandas_udf_parity_with_jvm(spark):
    """The Arrow-vectorized pandas UDFs must match their JVM
    (whole-stage-codegen) twins byte-for-byte — the no-semantic-drift
    contract that allows moving operators across the Python boundary."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        normalize_text,
        whitespace_tokens,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.udfs import (
        normalize_text_pandas,
        token_count_pandas,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cmp = docs.select(
        "doc_id",
        normalize_text(F.col("text")).alias("jvm_norm"),
        normalize_text_pandas(F.col("text")).alias("py_norm"),
        F.size(whitespace_tokens(F.col("text"))).cast("long").alias("jvm_n"),
        token_count_pandas(F.col("text")).alias("py_n"),
    )
    bad = cmp.where(
        (F.col("jvm_norm") != F.col("py_norm")) | (F.col("jvm_n") != F.col("py_n"))
    ).count()
    assert bad == 0


def test_pack_sequences_greedy_semantics(spark):
    """First-fit fold: exact-budget fits stay, overflow opens a new
    bin, an oversized doc owns a bin alone, and assignment is
    invariant to input partitioning (the fold orders by id)."""
    from end_to_end_data_engineering_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    rows = [
        ("en", 1, 900),
        ("en", 2, 1100),  # 900+1100 = 2000 == budget: fits
        ("en", 3, 1),     # overflow -> bin 1
        ("en", 4, 5000),  # oversized: bin 2 alone
        ("en", 5, 10),    # bin 3 (oversized bin is over budget)
        ("fr", 6, 1500),  # independent group: bin 0
        ("fr", 7, 600),   # 1500+600 > 2000 -> bin 1
    ]
    df = spark.createDataFrame(
        rows, "lang string, doc_id long, n_chars long"
    ).repartition(5)
    got = {
        r.doc_id: (r.bin_id, r.bin_fill)
        for r in pack_sequences(df, budget=2000).collect()
    }
    assert got == {
        1: (0, 900),
        2: (0, 2000),
        3: (1, 1),
        4: (2, 5000),
        5: (3, 10),
        6: (0, 1500),
        7: (1, 600),
    }
    # partitioning-invariant
    got2 = {
        r.doc_id: (r.bin_id, r.bin_fill)
        for r in pack_sequences(df.repartition(1), budget=2000).collect()
    }
    assert got2 == got


def test_pack_sequences_rejects_bad_budget(spark):
    import pytest

    from end_to_end_data_engineering_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame([("en", 1, 5)], "lang string, doc_id long, n_chars long")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_chunk_passages_windows_and_tail(spark):
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        chunk_passages,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(7))),   # 7 toks
            (2, "solo"),                                  # 1 tok
            (3, " ".join(f"x{i}" for i in range(5))),    # exactly chunk
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.passage)
        for r in chunk_passages(docs, chunk_tokens=5, overlap=2).collect()
    }
    # doc1: stride 3, bound n-overlap-1 = 4 -> starts 0,3 only
    assert got[(1, 0)] == (5, "w0 w1 w2 w3 w4")
    assert got[(1, 1)] == (4, "w3 w4 w5 w6")   # short tail kept
    assert (1, 2) not in got                     # chunk 1 reached doc end
    assert got[(2, 0)] == (1, "solo")
    assert got[(3, 0)] == (5, "x0 x1 x2 x3 x4")
    assert (3, 1) not in got                     # no redundant overlap tail
    assert len(got) == 4

    import pytest

    with pytest.raises(ValueError):
        chunk_passages(docs, chunk_tokens=5, overlap=5)


def test_ngram_dup_stats_short_doc_guard(spark):
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        ngram_dup_stats,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a a a a"), (3, "x")],
        "doc_id long, text string",
    )
    s3 = {r.doc_id: r for r in ngram_dup_stats(docs, 3).collect()}
    assert 1 not in s3 and 3 not in s3          # < 3 tokens -> no grams
    assert s3[2].total_3 == 2 and s3[2].distinct_3 == 1
    assert s3[2].dup_frac_3 == 0.5
    s1 = {r.doc_id: r for r in ngram_dup_stats(docs, 1).collect()}
    assert s1[2].dup_frac_1 == 0.75 and s1[1].dup_frac_1 == 0.0


def test_pack_sequences_nonstring_group_and_zero_size(spark):
    """Group-col dtypes must come from the input schema (an integer
    shard key used to break the hardcoded-string out_schema), and a
    zero-size doc never opens a new bin (the fill>0 guard — mirrored
    in the t16 oracle)."""
    from end_to_end_data_engineering_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    rows = [
        (7, 1, 0),     # zero-size doc leads the group: bin 0, fill 0
        (7, 2, 5000),  # oversized joins the fill-0 bin (guard: fill>0)
        (7, 3, 10),    # overflow -> bin 1
        (8, 4, 2000),  # other (integer) group: exact fit, bin 0
        (8, 5, 0),     # zero-size never overflows: stays in bin 0
    ]
    df = spark.createDataFrame(
        rows, "shard int, doc_id long, n_chars long"
    ).repartition(3)
    out = pack_sequences(
        df, budget=2000, group_cols=("shard",), id_col="doc_id",
        size_col="n_chars",
    )
    assert dict(out.dtypes)["shard"] == "int"
    got = {r.doc_id: (r.shard, r.bin_id, r.bin_fill) for r in out.collect()}
    assert got == {
        1: (7, 0, 0),
        2: (7, 0, 5000),
        3: (7, 1, 10),
        4: (8, 0, 2000),
        5: (8, 0, 2000),
    }


def test_contamination_hits_exact_counts(spark):
    """A corpus doc sharing k-grams with the benchmark reports exactly
    its count of distinct overlapping shingles; clean docs are absent
    from the result (callers anti-join to drop the contaminated)."""
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        contamination_hits,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # shares 'the quick brown' and 'quick brown fox' (2 hits)
            (1, "note the quick brown fox sat"),
            # case/whitespace-insensitive: normalization matches
            (2, "THE  Quick   BROWN fox"),
            # clean: no 3-gram overlap
            (3, "completely different words entirely here"),
            # repeated contaminated gram counts once (distinct shingles)
            (4, "the quick brown then the quick brown"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: r.n_hits
        for r in contamination_hits(corpus, bench, k=3).collect()
    }
    assert got == {1: 2, 2: 2, 4: 1}


def test_hashed_embedding_locality_and_determinism(spark):
    """Identical (normalization-equivalent) texts hash to identical
    vectors; token multiset weighting shows up as component scaling;
    disjoint texts yield different vectors — the properties that make
    the hashing-trick embedding usable by the cosine near-dup family."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        hashed_embedding,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "ALPHA   beta gamma"),     # normalizes to doc 1
            (3, "alpha beta gamma alpha beta gamma"),  # doubled multiset
            (4, "delta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    rows = {r.id: [r[f"e{d}"] for d in range(16)] for r in
            hashed_embedding(docs, dim=16).collect()}
    assert rows[1] == rows[2]
    assert rows[3] == [2 * v for v in rows[1]]
    assert rows[4] != rows[1]


def test_dedup_chunks_removes_repeated_spans(spark):
    """Sub-document dedup contract: the corpus-wide FIRST occurrence of
    a chunk survives, later occurrences vanish even inside otherwise-
    unique documents, and reassembly preserves document order."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        dedup_chunks,
    )

    boiler = " ".join(f"b{i}" for i in range(4))  # one full 4-token chunk
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + " ".join(f"x{i}" for i in range(4))),
            (2, boiler + " " + " ".join(f"y{i}" for i in range(4))),
            (3, " ".join(f"z{i}" for i in range(4)) + " " + boiler),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_chunks(docs, chunk_tokens=4).collect()
    }
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[1].dedup_text == boiler + " " + " ".join(f"x{i}" for i in range(4))
    # doc 2's boilerplate chunk is a repeat — only its unique tail survives
    assert out[2].n_chunks == 2 and out[2].n_kept == 1
    assert out[2].dedup_text == " ".join(f"y{i}" for i in range(4))
    # doc 3's boilerplate is at the END — removal keeps the head, order intact
    assert out[3].n_chunks == 2 and out[3].n_kept == 1
    assert out[3].dedup_text == " ".join(f"z{i}" for i in range(4))


def test_dedup_chunks_all_duplicate_doc_empty_text(spark):
    """A document made ENTIRELY of repeated chunks stays in the output
    with an empty reassembled text (count parity with the input — the
    caller decides whether to drop empties)."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        dedup_chunks,
    )

    span = " ".join(f"w{i}" for i in range(4))
    docs = spark.createDataFrame(
        [(1, span), (2, span)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup_chunks(docs, chunk_tokens=4).collect()}
    assert out[1].dedup_text == span and out[1].n_kept == 1
    assert out[2].dedup_text == "" and out[2].n_kept == 0


def test_cms_overestimates_never_underestimates(spark):
    """The CMS contract on a collision-heavy configuration (w=4 forces
    collisions): estimate >= true count for EVERY key, and with a
    collision-free width the estimate is exact."""
    from end_to_end_data_engineering_pipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        whitespace_tokens,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range(i + 1))) for i in range(8)],
        "doc_id long, text string",
    )
    toks = docs.select(F.explode(whitespace_tokens("text")).alias("token"))
    exact = {r.token: r.n for r in
             toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = toks.select("token").distinct()

    tight = cms_estimate(cms_build(docs, d=2, w=4), keys, d=2, w=4)
    for r in tight.collect():
        assert r.cms_n >= exact[r.token], (r.token, r.cms_n, exact[r.token])

    wide = cms_estimate(cms_build(docs, d=4, w=4096), keys, d=4, w=4096)
    for r in wide.collect():
        assert r.cms_n == exact[r.token]

    # a key absent from the corpus estimates 0 unless something collides
    ghost = spark.createDataFrame([("zzz_absent",)], "token string")
    est = cms_estimate(cms_build(docs, d=4, w=4096), ghost, d=4, w=4096)
    assert est.collect()[0].cms_n == 0


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    """Bloom contract: every inserted key passes (no false negatives —
    the property that makes it a safe prefilter), and with a
    generously-sized bitmap the false-positive rate over absent keys
    stays far below 50%."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.sketches import (
        bloom_bitmap,
        bloom_member,
    )

    build = spark.createDataFrame(
        [(i,) for i in range(200)], "k long"
    )
    words = bloom_bitmap(build, "k", d=3, m=8192)
    probe = spark.createDataFrame(
        [(i,) for i in range(1000)], "k long"
    ).select("k", bloom_member(F.col("k"), words, d=3, m=8192).alias("hit"))
    rows = {r.k: r.hit for r in probe.collect()}
    assert all(rows[k] for k in range(200))  # no false negatives
    fp = sum(1 for k in range(200, 1000) if rows[k])
    assert fp / 800 < 0.1


def test_containment_catches_quote_jaccard_misses(spark):
    """The t33 semantics: a short passage fully embedded in a long
    document scores containment 1.0 from the short side while its
    Jaccard stays below any useful threshold — the asymmetric case
    the containment operator exists for."""
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(6))
    article = quote + " " + " ".join(f"a{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, quote, "en", "s"), (2, article, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    cont = ngram_containment_pairs(
        docs, ["lang", "source"], k=3, threshold=0.9
    ).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.cont_a == 1.0 and r.cont_b < 0.1
    # symmetric Jaccard on the same pair is tiny — below a 10% floor
    jac = ngram_jaccard_pairs(
        docs, ["lang", "source"], k=3, threshold=0.1
    ).collect()
    assert jac == []


def test_incremental_lsh_equals_full_recompute_filtered(spark, sf_dir, tmp_path):
    """incremental_lsh_pairs must return EXACTLY the full-corpus
    recompute restricted to pairs involving a new doc (signatures are
    a pure function of each doc's own text) — on a different split
    than the t35 oracle uses, and identically when the base's band
    table comes from a PERSISTED parquet index instead of being
    derived in-query (the deployment path)."""
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        incremental_lsh_pairs,
        lsh_band_table,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 3 != 1)
    new = docs.where(F.col("doc_id") % 3 == 1)

    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
        if r.id_a % 3 == 1 or r.id_b % 3 == 1
    }
    inc = {
        (r.id_a, r.id_b, r.jaccard)
        for r in incremental_lsh_pairs(old, new, threshold=0.3).collect()
    }
    assert inc == full and len(full) > 0

    # persisted index: write the base band table, read it back, reuse
    idx_path = str(tmp_path / "bands")
    lsh_band_table(old).write.parquet(idx_path)
    via_index = {
        (r.id_a, r.id_b, r.jaccard)
        for r in incremental_lsh_pairs(
            old,
            new,
            threshold=0.3,
            old_band_table=spark.read.parquet(idx_path),
        ).collect()
    }
    assert via_index == full


class TestDupSpanStats:
    """operators/text.py:dup_span_stats — hand-computed interval-union
    coverage, window-count semantics, and the no-gram edge."""

    def _run(self, spark, docs, n=3, min_count=2):
        from end_to_end_data_engineering_pipeline_spark.operators.text import (
            dup_span_stats,
        )

        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {
            r.doc_id: r.asDict()
            for r in dup_span_stats(df, n=n, min_count=min_count).collect()
        }

    def test_hand_computed_overlapping_spans(self, spark):
        # doc 0 and doc 1 share the 5-token run "a b c d e": doc 0 has
        # 3-gram starts {1,2,3} flagged (overlap-chained: coverage =
        # 3 + 1 + 1 = 5 of its 6 tokens); doc 1 identical run at
        # starts {2,3,4} -> coverage 5 of 7. doc 2 shares nothing.
        got = self._run(
            spark,
            [
                (0, "a b c d e x"),
                (1, "y a b c d e z"),
                (2, "p q r s t u"),
            ],
        )
        assert got[0]["n_tokens"] == 6 and got[0]["n_grams"] == 4
        assert got[0]["n_dup_grams"] == 3
        assert got[0]["dup_covered_tokens"] == 5
        assert abs(got[0]["dup_fraction"] - round(5 / 6, 6)) < 1e-12
        assert got[1]["dup_covered_tokens"] == 5
        assert got[2]["n_dup_grams"] == 0
        assert got[2]["dup_covered_tokens"] == 0
        assert got[2]["dup_fraction"] == 0.0

    def test_within_doc_repetition_counts(self, spark):
        # "a b c" occurs twice INSIDE one doc -> both starts flagged
        # (memorization doesn't care the repeat is intra-doc);
        # disjoint spans at starts 1 and 4 -> coverage 3 + 3 = 6
        got = self._run(spark, [(0, "a b c a b c")])
        assert got[0]["n_dup_grams"] == 2
        assert got[0]["dup_covered_tokens"] == 6
        assert got[0]["dup_fraction"] == 1.0

    def test_short_doc_has_no_grams(self, spark):
        got = self._run(spark, [(0, "a b"), (1, "a b c x y z")])
        assert got[0]["n_grams"] == 0 and got[0]["n_dup_grams"] == 0
        assert got[0]["n_tokens"] == 2

    def test_normalization_case_insensitive(self, spark):
        # normalize_text lowercases: "A B C" matches "a b c"
        got = self._run(spark, [(0, "A B C z1 z2"), (1, "a b c w1 w2")])
        assert got[0]["n_dup_grams"] == 1
        assert got[1]["n_dup_grams"] == 1


class TestQualityScoreLinear:
    def test_weights_deterministic_and_scores_exact(self, spark):
        """The score is the exact integer weight sum over hashed
        buckets — recompute it in Python from the same md5 primitive
        and require equality, keep = (mean >= 0)."""
        import hashlib

        from end_to_end_data_engineering_pipeline_spark.operators.text import (
            quality_score_linear,
        )

        def h32(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        dim = 16
        docs = [(0, "alpha beta gamma"), (1, "Delta   delta epsilon")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: r.asDict()
            for r in quality_score_linear(df, dim=dim).collect()
        }
        for doc_id, text in docs:
            toks = text.lower().split()
            raw = sum(h32(f"w|{h32(t) % dim}") % 17 - 8 for t in toks)
            assert got[doc_id]["n_tokens"] == len(toks)
            assert got[doc_id]["raw_score"] == raw
            assert got[doc_id]["score"] == round(raw / len(toks), 6)
            assert got[doc_id]["keep"] == (raw / len(toks) >= 0)


class TestHllSketch:
    """operators/sketches.py HLL: accuracy, set-semantics, and the
    merge-by-max property the distributed story rests on."""

    def _regs(self, spark, values, **kw):
        from end_to_end_data_engineering_pipeline_spark.operators.sketches import (
            hll_registers,
        )

        df = spark.createDataFrame([(v,) for v in values], "k string")
        return hll_registers(df, "k", **kw)

    def test_estimate_tracks_cardinality(self, spark):
        """Raw estimate within the ~1.04/sqrt(64) = 13% standard
        error band (3 sigma) at cardinalities well past m."""
        from end_to_end_data_engineering_pipeline_spark.operators.sketches import (
            hll_estimate,
        )

        for n in (500, 5000):
            est = hll_estimate(
                self._regs(spark, [f"u{i}" for i in range(n)])
            ).collect()[0]
            assert abs(est.raw_estimate - n) / n < 0.39, (n, est)

    def test_duplicates_do_not_move_registers(self, spark):
        """The sketch is a function of the SET: inserting every key
        ten times yields byte-identical registers."""
        vals = [f"u{i}" for i in range(200)]
        once = sorted(map(tuple, self._regs(spark, vals).collect()))
        many = sorted(map(tuple, self._regs(spark, vals * 10).collect()))
        assert once == many

    def test_union_is_register_max(self, spark):
        """Registers of A ∪ B == element-wise max of A's and B's
        registers — the property that makes partial aggregation the
        merge and lets unions across groups/days skip the re-scan."""
        a = [f"a{i}" for i in range(300)]
        b = [f"b{i}" for i in range(300)]
        union = {
            r.register: r.max_rho for r in self._regs(spark, a + b).collect()
        }
        ra = {r.register: r.max_rho for r in self._regs(spark, a).collect()}
        rb = {r.register: r.max_rho for r in self._regs(spark, b).collect()}
        merged = {
            k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
        }
        assert union == merged

    def test_rho_matches_python_bit_model(self, spark):
        """register/rho against a pure-Python md5 bit model."""
        import hashlib

        vals = [f"x{i}" for i in range(50)]
        got = {}
        for r in self._regs(spark, vals).collect():
            got.setdefault(r.register, r.max_rho)
        regs: dict[int, int] = {}
        for v in vals:
            h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
            reg, w = h >> 26, h % (1 << 26)
            rho = 27 if w == 0 else 27 - w.bit_length()
            regs[reg] = max(regs.get(reg, 0), rho)
        assert got == regs


class TestTriangleCount:
    """operators/graph.py:triangle_count — hand-built graphs where the
    triangle census is known, including the hub shape the oriented
    enumeration exists for."""

    def _run(self, spark, edges):
        from end_to_end_data_engineering_pipeline_spark.operators.graph import (
            triangle_count,
        )

        df = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges],
            "id_a long, id_b long",
        )
        return {r.node: r.n_triangles for r in triangle_count(df).collect()}

    def test_k4_every_node_in_three(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert self._run(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_star_hub_has_no_triangles(self, spark):
        # a 10-leaf hub: max degree, zero closure -> empty census
        assert self._run(spark, [(0, i) for i in range(1, 11)]) == {}

    def test_hub_with_one_closure(self, spark):
        # hub 0 -> leaves 1..10, plus the single closing edge (1,2):
        # exactly one triangle {0,1,2}; leaves 3..10 absent
        edges = [(0, i) for i in range(1, 11)] + [(1, 2)]
        assert self._run(spark, edges) == {0: 1, 1: 1, 2: 1}

    def test_two_disjoint_triangles_and_a_chain(self, spark):
        edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12),
                 (20, 21), (21, 22)]  # chain 20-21-22 never closes
        got = self._run(spark, edges)
        assert got == {0: 1, 1: 1, 2: 1, 10: 1, 11: 1, 12: 1}


def test_k_anonymity_violations_hand_case(spark):
    """Groups under k surface with exact sizes; groups at/over k are
    absent; expression quasi-columns work."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        k_anonymity_violations,
    )

    rows = [("en", "web")] * 5 + [("en", "book")] * 2 + [("sw", "web")]
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {
        (r.lang, r.source): r.group_size
        for r in k_anonymity_violations(df, ["lang", "source"], k=5).collect()
    }
    assert got == {("en", "book"): 2, ("sw", "web"): 1}


def test_quality_flags_hand_cases(spark):
    """Each rule fires alone on a crafted doc; a clean doc passes;
    multiple rules join in canonical short;upper;longword;stop order."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        quality_flags,
    )

    stopish = "the of and to in is it that was for on are with as"
    clean = " ".join([stopish] * 3)  # 42 tokens, stopword-dense, lowercase
    short = stopish  # 14 tokens < 30, stopword-dense -> only 'short'
    # 42 lowercase tokens but zero stopwords -> only 'stop'
    nostop = " ".join(["zebra"] * 42)
    # stop + longword: 42 very long lowercase tokens, no stopwords
    longw = " ".join(["pneumonoultramicroscopic"] * 42)
    # upper (+stop): 42 ALL-CAPS tokens -> uppercase>20%, no stopwords
    upper = " ".join(["ZEBRA"] * 42)
    rows = [
        (0, clean),
        (1, short),
        (2, nostop),
        (3, longw),
        (4, upper),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.flags for r in quality_flags(df).collect()}
    assert got == {
        0: "__pass__",
        1: "short",
        2: "stop",
        3: "longword;stop",
        4: "upper;stop",
    }


def test_bpe_merge_step_leftmost_non_overlapping(spark):
    """'aaaa' under top pair (a,a) merges to [aa, aa] — run parity,
    never the overlapping 3 merges; freq weighting drives the pick."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        bpe_merge_step,
    )

    wf = spark.createDataFrame(
        [("aaaa", 3), ("aab", 2), ("ba", 1)], "word string, freq long"
    )
    got = sorted(tuple(r) for r in bpe_merge_step(wf).collect())
    assert got == [
        ("aa", "aa", 3, "a", "a"),
        ("aa", "b", 2, "a", "a"),
        ("b", "a", 1, "a", "a"),
    ]


def test_bpe_word_freq_bounds_and_counts(spark):
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        bpe_word_freq,
    )

    docs = spark.createDataFrame(
        [(1, "The the THE a supercalifragilisticexpialidocious ok ok")],
        "doc_id long, text string",
    )
    got = {r.word: r.freq for r in bpe_word_freq(docs).collect()}
    # 'a' too short, the 34-char word too long, case-folded counts
    assert got == {"the": 3, "ok": 2}


def test_bigram_novelty_hand_case(spark):
    """'a b a b' repeats (a,b); a doc of unique bigrams scores 1.0;
    a one-token doc has no bigrams and is absent."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        bigram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),      # bigrams: ab, ba, ab -> ab cnt 2, ba cnt 1
            (2, "c d e"),        # cd, de -> both hapax
            (3, "x"),            # no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bigrams, r.n_rare, r.novelty)
           for r in bigram_novelty(docs).collect()}
    assert got == {1: (3, 1, round(1 / 3, 6)), 2: (2, 2, 1.0)}


def test_postings_increment_equals_rebuild(spark, sf_dir, tmp_path):
    """postings_increment on a SECOND split (%3, not the driver
    query's %5): after absorbing the increment, the persisted
    postings and dfreq tables must be row-identical to a full
    rebuild over the composed corpus, n_docs must match, and the
    base postings files must carry BY REFERENCE (the increment never
    re-tokenizes or rewrites the corpus)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_read,
        snapshot_write,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        postings_increment,
        tokenize_tf,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.where(F.col("doc_id") % 3 != 0)
    incr = docs.where(F.col("doc_id") % 3 == 0)
    store = str(tmp_path / "idx")
    tf = tokenize_tf(base)
    snapshot_write(spark, store + "/postings", tf)
    snapshot_write(
        spark,
        store + "/dfreq",
        tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df")),
    )
    snapshot_write(
        spark,
        store + "/meta",
        base.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
    )
    base_files = set(_manifest(store + "/postings", 0)["files"])

    postings_increment(
        spark,
        store,
        incr,
        docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
    )

    # append carried every base postings file by reference
    m1 = _manifest(store + "/postings", 1)
    assert base_files <= set(m1["files"])

    # postings content == full rebuild over the composed corpus
    rebuilt = tokenize_tf(docs)
    got = snapshot_read(spark, store + "/postings")
    assert got.count() == rebuilt.count()
    assert got.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(got).count() == 0

    # dfreq content == rebuild's document frequencies
    want_df = rebuilt.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    got_df = snapshot_read(spark, store + "/dfreq")
    assert got_df.exceptAll(want_df).count() == 0
    assert want_df.exceptAll(got_df).count() == 0

    # n_docs bumped to the composed corpus size
    assert snapshot_read(spark, store + "/meta").collect()[0].n_docs == (
        docs.count()
    )


def test_bm25_increment_equals_rebuild(spark, sf_dir, tmp_path):
    """bm25_increment on a SECOND split (%3, not the driver query's
    %5): the incremented postings (with dl), dfreq, AND both corpus
    statistics (n_docs, tl) must be row-identical to a full rebuild,
    base postings files must carry by reference, and the BM25 top-k
    served from the incremented index must equal the rebuilt one."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_read,
        snapshot_write,
    )
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        bm25_increment,
        tokenize_tf,
    )
    from end_to_end_data_engineering_pipeline_spark.queries.textops import (
        search_bm25,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.where(F.col("doc_id") % 3 != 0)
    incr = docs.where(F.col("doc_id") % 3 == 0)
    store = str(tmp_path / "idx")

    def build(target, corpus):
        tf = tokenize_tf(corpus)
        dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
        snapshot_write(spark, target + "/postings", tf.join(dl, "doc_id"))
        snapshot_write(
            spark,
            target + "/dfreq",
            tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df")),
        )
        snapshot_write(
            spark,
            target + "/meta",
            corpus.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs")
            ).crossJoin(tf.agg(F.sum("tf").cast("long").alias("tl"))),
        )

    build(store, base)
    base_files = set(_manifest(store + "/postings", 0)["files"])
    bm25_increment(spark, store, incr)
    m1 = _manifest(store + "/postings", 1)
    assert base_files <= set(m1["files"])  # never re-tokenized

    full = str(tmp_path / "full")
    build(full, docs)
    for table in ("/postings", "/dfreq", "/meta"):
        got = snapshot_read(spark, store + table)
        want = snapshot_read(spark, full + table)
        assert got.exceptAll(want).count() == 0, table
        assert want.exceptAll(got).count() == 0, table

    terms = ("query", "join", "batch")
    got_top = search_bm25(
        snapshot_read(spark, store + "/postings"),
        snapshot_read(spark, store + "/dfreq"),
        snapshot_read(spark, store + "/meta"),
        terms,
    ).collect()
    want_top = search_bm25(
        snapshot_read(spark, full + "/postings"),
        snapshot_read(spark, full + "/dfreq"),
        snapshot_read(spark, full + "/meta"),
        terms,
    ).collect()
    assert [tuple(r) for r in got_top] == [tuple(r) for r in want_top]


def test_bm25_increment_retry_skips_applied_stores(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The multi-store increment's recovery contract (r12 advice #4):
    a crash between store commits leaves the index inconsistent, and a
    retry carrying the same increment_id probes each store's
    last_increment stamp and applies ONLY the missing commits — the
    recovered index is row-identical to a full rebuild, and a full
    re-retry (all stores stamped) is a no-op."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
        text as T,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 600
    )
    base = docs.where(F.col("doc_id") % 3 != 0)
    incr = docs.where(F.col("doc_id") % 3 == 0)

    def build(target, corpus):
        tf = T.tokenize_tf(corpus)
        dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
        S.snapshot_write(spark, target + "/postings", tf.join(dl, "doc_id"))
        S.snapshot_write(
            spark,
            target + "/dfreq",
            tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df")),
        )
        S.snapshot_write(
            spark,
            target + "/meta",
            corpus.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs")
            ).crossJoin(tf.agg(F.sum("tf").cast("long").alias("tl"))),
        )

    store = str(tmp_path / "idx")
    build(store, base)

    # crash AFTER the postings append, BEFORE the dfreq merge
    # (bm25_increment imports snapshot_merge from the snapshots module
    # at call time, so the injection patches the source module)
    real_merge = S.snapshot_merge

    def boom(*a, **kw):
        raise RuntimeError("injected crash between store commits")

    monkeypatch.setattr(S, "snapshot_merge", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        T.bm25_increment(spark, store, incr, increment_id="batch-42")
    monkeypatch.undo()

    # postings reached; dfreq and meta did not
    assert T._increment_applied(store + "/postings", "batch-42")
    assert not T._increment_applied(store + "/dfreq", "batch-42")
    n_postings = S.snapshot_read(spark, store + "/postings").count()

    # retry with the SAME id: postings skipped (no double-append),
    # dfreq + meta applied
    T.bm25_increment(spark, store, incr, increment_id="batch-42")
    assert (
        S.snapshot_read(spark, store + "/postings").count() == n_postings
    )
    full = str(tmp_path / "full")
    build(full, docs)
    for table in ("/postings", "/dfreq", "/meta"):
        got = S.snapshot_read(spark, store + table)
        want = S.snapshot_read(spark, full + table)
        assert got.exceptAll(want).count() == 0, table
        assert want.exceptAll(got).count() == 0, table

    # full re-retry is a no-op in every store
    versions_before = {
        t: S.current_version(store + t)
        for t in ("/postings", "/dfreq", "/meta")
    }
    T.bm25_increment(spark, store, incr, increment_id="batch-42")
    assert versions_before == {
        t: S.current_version(store + t)
        for t in ("/postings", "/dfreq", "/meta")
    }
    assert real_merge is S.snapshot_merge  # undo restored the module


def test_prefix_filter_jaccard_matches_bruteforce(spark):
    """prefix_filter_jaccard_pairs == brute-force exact Jaccard on a
    corpus with known near-dup structure, in BOTH element modes (word
    sets and 3-word shingles) and at two thresholds — the completeness
    claim (prefix + length + positional filters lose no pair) checked
    against a model with no filters at all."""
    from itertools import combinations

    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        prefix_filter_jaccard_pairs,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox leaps over the lazy dog"),
        (3, "entirely different content about spark engines"),
        (4, "entirely different content about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog today"),
        (6, "spark engines about content different entirely"),  # same words, new order
        (7, "one"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def shingles(t, k):
        toks = t.lower().split()
        if k == 1:
            return set(toks)
        if len(toks) <= k:
            return {" ".join(toks[:k])} if len(toks) == k else {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    for k, (tn, td) in [(1, (3, 5)), (3, (3, 5)), (1, (4, 5)), (3, (1, 2))]:
        want = set()
        for (a, ta), (b, tb) in combinations(texts, 2):
            sa, sb = shingles(ta, k), shingles(tb, k)
            inter = len(sa & sb)
            uni = len(sa | sb)
            if inter * td >= uni * tn:
                want.add((a, b, inter, uni))
        got = {
            (r.a_id, r.b_id, r.inter, r.uni)
            for r in prefix_filter_jaccard_pairs(
                df, "doc_id", "text", tn, td, shingle_k=k
            ).collect()
        }
        assert got == want, (k, tn, td)


def test_prefix_filter_accumulated_positional_filter_prunes(spark):
    """The r15 accumulated (group-form) positional filter is
    load-bearing: on a templated corpus whose documents share most of
    their vocabulary (the skew shape where prefix postings collide),
    it admits STRICTLY fewer candidate pairs than the r14 per-token
    positional filter alone — while the verified output stays exactly
    the brute-force Jaccard answer, i.e. the pruning is free."""
    from itertools import combinations

    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        _prefix_jaccard_candidates,
        prefix_filter_jaccard_pairs,
    )

    # 24 templated docs: a large shared template + 3 doc-unique words
    # + one of 4 topic words — high vocabulary overlap, few true
    # near-dups at tau=3/5
    template = "alpha beta gamma delta epsilon zeta eta theta"
    topics = ["mars", "venus", "pluto", "titan"]
    texts = [
        (
            i,
            f"{template} {topics[i % 4]} u{i}a u{i}b u{i}c",
        )
        for i in range(24)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    toks = df.selectExpr(
        "doc_id AS id",
        "explode(array_distinct(split(lower(text), ' '))) AS tok",
    ).cache()
    n_pertoken = _prefix_jaccard_candidates(
        toks, 3, 5, accumulated=False
    ).count()
    n_acc = _prefix_jaccard_candidates(toks, 3, 5).count()
    assert n_acc < n_pertoken, (n_acc, n_pertoken)

    # completeness is untouched: output == brute force
    want = set()
    for (a, ta), (b, tb) in combinations(texts, 2):
        sa, sb = set(ta.split()), set(tb.split())
        if len(sa & sb) * 5 >= len(sa | sb) * 3:
            want.add((a, b, len(sa & sb), len(sa | sb)))
    got = {
        (r.a_id, r.b_id, r.inter, r.uni)
        for r in prefix_filter_jaccard_pairs(df, "doc_id", "text", 3, 5).collect()
    }
    assert got == want


def test_bpe_train_degenerate_vocab_stops_early(spark):
    """r17 internals change: the training loop resolves the winning
    pair with a driver collect and BREAKS when no adjacent pair exists
    anywhere (all-single-char vocabulary) — the metrics frame must be
    EMPTY with the full declared schema, exactly what the old
    crossJoin-with-empty-top1 shape produced for every round."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        bpe_train,
    )

    wf = spark.createDataFrame(
        [("a", 5), ("b", 3)], "word string, freq long"
    )
    got = bpe_train(wf, rounds=3)
    assert got.columns == [
        "round", "merged_left", "merged_right", "pair_cnt",
        "n_tokens_after",
    ]
    assert got.count() == 0


def test_bpe_train_metrics_match_manual_rounds(spark):
    """Two rounds on a hand vocabulary: round 1 merges the weighted
    top pair, round 2 merges the next — pair_cnt and the post-merge
    token checksum (sum of freq over remaining symbol rows) are the
    driver-collected values the r17 loop reports."""
    from end_to_end_data_engineering_pipeline_spark.operators.text import (
        bpe_train,
    )

    # 'abab' x2: pairs (a,b) cnt 4, (b,a) cnt 2 -> round 1 merges
    # (a,b) leftmost-non-overlapping: abab -> [ab, ab] (4 rows x2
    # freq = n_tokens_after 4); round 2: pairs (ab,ab) cnt 2 ->
    # merge -> [abab] (n_tokens_after 2)
    wf = spark.createDataFrame([("abab", 2)], "word string, freq long")
    got = sorted(
        tuple(r) for r in bpe_train(wf, rounds=2).collect()
    )
    assert got == [
        (1, "a", "b", 4, 4),
        (2, "ab", "ab", 2, 2),
    ]
