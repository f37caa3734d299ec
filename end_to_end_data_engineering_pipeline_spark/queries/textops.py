"""Text-analysis + dedup queries over the documents table (charter
§2.12): stats/quality, language-ID, exact dedup, minhash, simhash,
n-gram Jaccard near-dup, MinHash-LSH near-dup.

Every oracled query mirrors the operator expression in DuckDB SQL
exactly — including the shared hash32 primitive (first 8 md5 hex
digits) — so signatures match bit-for-bit, not just statistically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, load
from ..operators.partitioning import bounded_rank_topk
from ..operators.dedup_fuzzy import (
    add_minhash,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..operators.text import (
    LANG_MARKERS,
    TOKEN_RE,
    fingerprint,
    lang_id,
    postings_increment,
    text_stats,
    tokenize_tf,
)
from .registry import query

# ---- DuckDB SQL fragments mirroring operators/text.py ----------------------

_O_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_O_TOKS = f"regexp_split_to_array(trim({_O_NORM}), '\\s+')"
_O_RAW_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _o_shingles(k: int = 3) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({_O_TOKS})-{k - 1}, 1)+1), "
        f"i -> array_to_string(({_O_TOKS})[i:i+{k - 1}], ' ')))"
    )


def _o_hash32(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def _o_stop(words: list[str]) -> str:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


@query(
    "t1_text_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len({_O_RAW_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_bpe_tokens,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           len(regexp_extract_all(text, '[0-9]')) AS n_digits,
           {_o_stop(LANG_MARKERS["en"])} AS n_stopwords,
           ROUND(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio,
           ROUND({_o_stop(LANG_MARKERS["en"])} * 1000000.0
                 / len({_O_RAW_TOKS})) / 1000000.0 AS stopword_ratio,
           (CASE WHEN len({_O_RAW_TOKS}) BETWEEN 50 AND 1000 THEN 1 ELSE 0 END
            + CASE WHEN {_o_stop(LANG_MARKERS["en"])} * 20 >= len({_O_RAW_TOKS})
                   THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(text, '[.,!?;:]')) * 10
                        <= length(text) THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(text, '[0-9]')) * 5
                        <= length(text) THEN 1 ELSE 0 END) AS quality_score
    FROM documents
    """,
)
def t1_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc length/token/ratio stats + quality score (operators/
    text.py:text_stats). Pure per-row expressions: no shuffle."""
    return text_stats(load(spark, sf_dir, "documents"))


@query(
    "t2_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_o_stop(LANG_MARKERS["en"])} AS score_en,
             {_o_stop(LANG_MARKERS["fr"])} AS score_fr,
             {_o_stop(LANG_MARKERS["es"])} AS score_es,
             {_o_stop(LANG_MARKERS["de"])} AS score_de
      FROM documents
    )
    SELECT doc_id, lang, score_en, score_fr, score_es, score_de,
           CASE WHEN greatest(score_en, score_fr, score_es, score_de) = 0
                THEN 'und'
                WHEN score_en = greatest(score_en, score_fr, score_es, score_de) THEN 'en'
                WHEN score_fr = greatest(score_en, score_fr, score_es, score_de) THEN 'fr'
                WHEN score_es = greatest(score_en, score_fr, score_es, score_de) THEN 'es'
                ELSE 'de' END AS pred_lang
    FROM scored
    """,
)
def t2_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (operators/text.py:lang_id)."""
    return lang_id(load(spark, sf_dir, "documents"))


@query(
    "t3_exact_dedup",
    oracle=f"""
    SELECT doc_id, md5({_O_NORM}) AS fp
    FROM documents
    QUALIFY ROW_NUMBER() OVER (PARTITION BY md5({_O_NORM}) ORDER BY doc_id) = 1
    """,
)
def t3_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint, keep lowest doc_id
    (hash-groupBy dedup; one shuffle on the fingerprint)."""
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


def _o_minhash(i: int) -> str:
    from ..operators.dedup_fuzzy import MINHASH_P, minhash_seed

    a, b = minhash_seed(i)
    return (
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MINHASH_P}))"
        f" AS mh{i}"
    )


@query(
    "t4_minhash_signatures",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_o_shingles(3)} AS shingles FROM documents),
         hashed AS (SELECT doc_id,
                           list_transform(shingles, s -> {_o_hash32("s")}) AS hs
                    FROM sh)
    SELECT doc_id, {_o_minhash(0)}, {_o_minhash(1)}, {_o_minhash(2)}, {_o_minhash(3)}
    FROM hashed
    """,
)
def t4_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 seeds shown; the LSH operator uses 16):
    one md5 per shingle + affine universal rehashes per seed —
    bit-exact across engines via the shared hash32 primitive."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return add_minhash(docs, n_hashes=4).select("doc_id", "mh0", "mh1", "mh2", "mh3")


def _o_simhash_bits(bits: int = 32) -> str:
    token_hash = _o_hash32("t")
    terms = []
    for b in range(bits):
        vote = (
            f"list_sum(list_transform({_O_TOKS}, "
            f"t -> CASE WHEN ({token_hash} & {1 << b}) > 0 THEN 1 ELSE -1 END))"
        )
        terms.append(f"CASE WHEN {vote} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


@query(
    "t5_simhash",
    oracle=f"""
    SELECT doc_id, CAST({_o_simhash_bits(32)} AS BIGINT) AS simhash32
    FROM documents
    """,
)
def t5_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit Charikar simhash per document (operators/dedup_fuzzy.py:
    simhash_table — per-row staged token-hash array + bit-vote folds,
    zero shuffles) — near-dup docs differ in few Hamming bits."""
    from ..operators.dedup_fuzzy import simhash_table

    docs = load(spark, sf_dir, "documents")
    return simhash_table(docs).select(
        F.col("id").alias("doc_id"), F.col("simhash").alias("simhash32")
    )


@query(
    "t6_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, source, {_o_shingles(3)} AS s FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang, a.source,
           ROUND(len(list_intersect(a.s, b.s)) * 1000000.0
                 / len(list_distinct(list_concat(a.s, b.s)))) / 1000000.0 AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
                       AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.05
    """,
)
def t6_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact n-gram Jaccard (blocking on lang+source keeps the
    self-join quadratic only within buckets)."""
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, ["lang", "source"], k=3, threshold=0.05
    )


def _o_t7_ctes(
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.3,
    where: str = "",
    source: str = "documents",
) -> str:
    """CTE chain mirroring minhash_lsh_pairs: 16-hash signature, 4-band
    keys, band-collision candidates, exact-Jaccard verify — every stage
    deterministic via the shared md5 hash32, so the whole LSH pipeline
    sits under the strict value-hash gate. Ends with a ``pairs`` CTE so
    downstream oracles (t12 clustering) can build on it. ``where``
    optionally slices the corpus (t44's bounded audit); ``source``
    swaps the relation the chain hashes (t47 feeds a synthesized
    original+variant corpus — any (doc_id, text) CTE works)."""
    rows = n_hashes // bands
    mh = ", ".join(_o_minhash(i) for i in range(n_hashes))
    band_cols = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + f")) AS b{b}"
        for b in range(bands)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands"
        for b in range(bands)
    )
    ctes = f"""sh AS (SELECT doc_id, {_o_shingles(3)} AS s FROM {source}{where}),
    hashed AS (SELECT doc_id,
                      list_transform(s, x -> {_o_hash32("x")}) AS hs
               FROM sh),
    sig AS (SELECT doc_id, {mh} FROM hashed),
    bands AS (SELECT doc_id, {band_cols} FROM sig),
    stacked AS ({stacked}),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM stacked a JOIN stacked b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
    scored AS (SELECT id_a, id_b,
                      len(list_intersect(x.s, y.s)) AS inter,
                      len(x.s) + len(y.s)
                        - len(list_intersect(x.s, y.s)) AS uni
               FROM cand
               JOIN sh x ON x.doc_id = id_a
               JOIN sh y ON y.doc_id = id_b),
    pairs AS (SELECT id_a, id_b,
                     ROUND(inter * 1000000.0 / uni) / 1000000.0 AS jaccard
              FROM scored
              WHERE ROUND(inter * 1000000.0 / uni) / 1000000.0 >= {threshold})"""
    return ctes


def _o_t7(n_hashes: int = 16, bands: int = 4, threshold: float = 0.3) -> str:
    """Full SQL mirror of minhash_lsh_pairs (see _o_t7_ctes)."""
    return f"""
    WITH {_o_t7_ctes(n_hashes, bands, threshold)}
    SELECT id_a, id_b, jaccard FROM pairs
    """


@query("t7_minhash_lsh_neardup", oracle=_o_t7())
def t7_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs (candidate generation by band
    collision + exact Jaccard verify)."""
    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.3)


@query(
    "m1_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over driver data: documents re-encoded as
    binary media, features extracted via Arrow-batched mapInPandas
    (operators/multimodal.py). The oracle checks the engine-portable
    features (byte length, md5 of content) — proving binary columns
    survive the Arrow batch boundary byte-exactly; decode-derived
    columns are stub outputs and excluded here (covered by
    tests/test_multimodal.py)."""
    from ..operators.multimodal import documents_as_media, extract_features

    docs = load(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return extract_features(media).select(
        "media_id", "kind", "n_bytes", "content_md5"
    )


@query(
    "m2_frame_sample_offsets",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(UNNEST(range(0, octet_length(encode(text)), 256)) AS BIGINT)
             AS frame_offset
    FROM documents
    """,
)
def m2_frame_sample_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (operators/multimodal.py:frame_sample):
    one row per 256-byte offset of each media blob, produced by the
    Arrow-batched sampler; the oracle checks the emitted offset grid
    (frame content hashes are stub outputs, tested in pytest)."""
    from ..operators.multimodal import documents_as_media, frame_sample

    docs = load(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return frame_sample(media, every_n_bytes=256).select(
        "media_id", "frame_offset"
    )


@query(
    "t8_top_terms_per_lang",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({_O_TOKS}) AS tok FROM documents
    ), counts AS (
      SELECT lang, tok, COUNT(*) AS n
      FROM toks WHERE tok <> ''
      GROUP BY lang, tok
    )
    SELECT lang, tok, n FROM counts
    QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY n DESC, tok) <= 5
    """,
)
def t8_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus wordcount + per-group top-k: explode normalized tokens
    (partition-local), count per (lang, token) with map-side combine,
    then a row_number window on the tiny per-lang aggregate. The
    explode never shuffles raw text — only (lang, token) pairs move,
    and the window input is |distinct tokens| not |corpus|.
    Deterministic tiebreak: count desc, token asc."""
    from ..operators.text import normalize_text, whitespace_tokens

    d = load(spark, sf_dir, "documents")
    toks = fan_out(d.select("lang", "text")).select(
        "lang",
        F.explode(whitespace_tokens(normalize_text(F.col("text")))).alias("tok"),
    )
    counts = (
        toks.where(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tok"))
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= 5)
        .select("lang", "tok", "n")
    )


@query(
    "t9_simhash_neardup",
    oracle=f"""
    WITH sim AS (
      SELECT doc_id, CAST({_o_simhash_bits(32)} AS BIGINT) AS simhash
      FROM documents
    ),
    stacked AS (
      SELECT doc_id, simhash, 0 AS band_idx,
             (simhash >> 0) & 255 AS band_key FROM sim
      UNION ALL SELECT doc_id, simhash, 1, (simhash >> 8) & 255 FROM sim
      UNION ALL SELECT doc_id, simhash, 2, (simhash >> 16) & 255 FROM sim
      UNION ALL SELECT doc_id, simhash, 3, (simhash >> 24) & 255 FROM sim
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM stacked a JOIN stacked b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def t9_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via banded Hamming search: 4 byte-bands
    over the 32-bit signature (pigeonhole: hamming <= 3 => >= 1 equal
    band), exact bit_count(xor) verify on collisions only. The
    signature table is ~12 bytes/doc, so the self-join input at 100 TB
    is ~0.01% of the corpus (operators/dedup_fuzzy.py:
    simhash_neardup_pairs)."""
    from ..operators.dedup_fuzzy import simhash_neardup_pairs

    docs = load(spark, sf_dir, "documents")
    out = simhash_neardup_pairs(docs, bits=32, bands=4, max_hamming=3)
    return out.withColumn("hamming", F.col("hamming").cast("long"))


def _o_winnow(k: int = 3, w: int = 4) -> str:
    """Fingerprint-array CTE chain mirroring winnow_fingerprints."""
    return f"""
    g AS (SELECT doc_id,
                 list_transform(range(1, greatest(len({_O_TOKS})-{k - 1}, 1)+1),
                                i -> array_to_string(({_O_TOKS})[i:i+{k - 1}], ' '))
                   AS grams
          FROM documents),
    h AS (SELECT doc_id, list_transform(grams, s -> {_o_hash32("s")}) AS hs
          FROM g),
    f AS (SELECT doc_id,
                 list_distinct(
                   list_transform(range(1, greatest(len(hs)-{w - 1}, 1)+1),
                                  j -> list_min(hs[j:j+{w - 1}]))) AS fps
          FROM h)"""


@query(
    "t10_winnow_fingerprints",
    oracle=f"""
    WITH {_o_winnow(3, 4)}
    SELECT doc_id AS id, UNNEST(fps) AS fp FROM f
    """,
)
def t10_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints, k=3 w=4
    (operators/dedup_fuzzy.py:winnow_fingerprints — Schleimer/
    Wilkerson/Aiken SIGMOD'03). Partition-local array pipeline;
    bit-exact cross-engine via the shared hash32."""
    from ..operators.dedup_fuzzy import winnow_fingerprints

    docs = fan_out(load(spark, sf_dir, "documents"))
    return winnow_fingerprints(docs, k=3, w=4)


@query(
    "t11_winnow_overlap_pairs",
    oracle=f"""
    WITH {_o_winnow(3, 4)},
    fp AS (SELECT doc_id AS id, UNNEST(fps) AS fp FROM f)
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.id < b.id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def t11_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-similarity near-dup pairs by shared winnowing
    fingerprints (>= 2 shared) — detects shared PASSAGES (any common
    run of k+w-1 = 6 tokens leaves a shared fingerprint), which
    set-similarity minhash (t7) and bit-similarity simhash (t9)
    can miss. Self-equi-join on fp, same scale shape as the LSH
    band join."""
    from ..operators.dedup_fuzzy import winnow_overlap_pairs

    docs = fan_out(load(spark, sf_dir, "documents"))
    return winnow_overlap_pairs(docs, k=3, w=4, min_shared=2)


@query(
    "t12_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_o_t7_ctes(16, 4, 0.3)},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
    )
    SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node
    """,
)
def t12_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the t7 near-dup pair graph
    (operators/graph.py): every paired document labeled with its
    component's min doc_id. The iterative min-label propagation is
    verified against DuckDB's recursive-CTE transitive closure —
    an iterative Spark algorithm under the full value-hash oracle."""
    from ..operators.graph import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.3)
    return connected_components(pairs)


@query(
    "t13_canonical_corpus",
    oracle=f"""
    WITH RECURSIVE {_o_t7_ctes(16, 4, 0.3)},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
    ),
    cc AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT OUTER JOIN cc ON d.doc_id = cc.node
    WHERE COALESCE(cc.cluster_id, d.doc_id) = d.doc_id
    """,
)
def t13_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup: near-dup pairs -> components ->
    keep only each cluster's canonical representative (min doc_id;
    singletons survive as themselves). The transitive contract the
    pairwise operators alone can't give (operators/graph.py:
    resolve_canonical)."""
    from ..operators.graph import resolve_canonical

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.3)
    return resolve_canonical(docs, pairs).select("doc_id", "lang", "source")


@query(
    "t14_curation_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source, n_chars,
             len({_O_RAW_TOKS}) AS n_tokens,
             (CASE WHEN len({_O_RAW_TOKS}) BETWEEN 50 AND 1000 THEN 1 ELSE 0 END
              + CASE WHEN {_o_stop(LANG_MARKERS["en"])} * 20 >= len({_O_RAW_TOKS})
                     THEN 1 ELSE 0 END
              + CASE WHEN len(regexp_extract_all(text, '[.,!?;:]')) * 10
                          <= length(text) THEN 1 ELSE 0 END
              + CASE WHEN len(regexp_extract_all(text, '[0-9]')) * 5
                          <= length(text) THEN 1 ELSE 0 END) AS quality_score
      FROM documents)
    SELECT doc_id, lang, source, n_tokens, quality_score
    FROM scored
    WHERE quality_score >= 3 AND n_tokens BETWEEN 10 AND 2000
    """,
)
def t14_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation gate: keep documents passing the heuristic
    quality bar and token-length band — the filter stage every
    training-data pipeline runs between dedup and tokenization.
    Pure per-row expressions over text_stats; predicate-only, no
    shuffle."""
    docs = load(spark, sf_dir, "documents")
    stats = text_stats(docs)
    return (
        stats.where(
            (F.col("quality_score") >= 3)
            & F.col("n_tokens").between(10, 2000)
        )
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "n_tokens", "quality_score")
    )


@query(
    "t15_distinctive_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_O_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term <> ''
      GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    )
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           ROUND(tf.tf * 1000000.0 / df.df) / 1000000.0 AS score
    FROM tf JOIN df ON tf.term = df.term
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY tf.doc_id
      ORDER BY tf.tf * 1000000.0 / df.df DESC, tf.term) <= 3
    """,
)
def t15_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style distinctive terms: the doc-term matrix (tf) joined
    with corpus document frequencies (df), top-3 terms per doc by
    tf/df. The tf/df rational replaces log-idf — single exact-int
    division, so ordering AND the reported score are bit-stable
    cross-engine (libm log is not).

    Scale shape: explode is partition-local; tf shuffles once on
    (doc, term); df aggregates the ALREADY-AGGREGATED tf table on
    term (map-side combinable); the score join broadcasts df (vocab
    << corpus); the final window partitions by doc over <= |doc
    vocab| rows."""
    from ..operators.text import normalize_text, whitespace_tokens

    d = fan_out(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(whitespace_tokens(normalize_text(F.col("text")))).alias("term"),
    )
    tf = (
        toks.where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "term").withColumn(
        "__ord", F.col("tf") * 1000000.0 / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("__ord").desc(), F.col("term"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.round(F.col("__ord")) / 1000000.0).alias("score"),
        )
    )


@query(
    "t16_sequence_packing",
    oracle="""
    WITH RECURSIVE docs AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_chars, rn,
             CAST(0 AS BIGINT) AS bin_id,
             CAST(n_chars AS BIGINT) AS bin_fill
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.lang, d.doc_id, d.n_chars, d.rn,
             CASE WHEN p.bin_fill > 0 AND p.bin_fill + d.n_chars > 2000
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.bin_fill > 0 AND p.bin_fill + d.n_chars > 2000
                  THEN CAST(d.n_chars AS BIGINT)
                  ELSE p.bin_fill + d.n_chars END
      FROM docs d JOIN packed p ON d.lang = p.lang AND d.rn = p.rn + 1
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars, bin_id, bin_fill
    FROM packed
    """,
)
def t16_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 2000-char context bins per lang
    (operators/packing.py pack_sequences — Arrow applyInPandas, the
    per-group stateful fold Spark windows can't express). The DuckDB
    oracle replays the identical fold as a recursive CTE over the
    row_number chain, so every bin assignment and running fill is
    value-hash checked — not just bin counts."""
    from ..operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents")
    return pack_sequences(
        docs, budget=2000, group_cols=("lang",), id_col="doc_id",
        size_col="n_chars",
    )


# t17 chunking geometry — named once so the oracle SQL and the
# chunk_passages call can never drift apart (round-4 advice).
_T17_CHUNK = 50
_T17_OVERLAP = 10
_T17_STRIDE = _T17_CHUNK - _T17_OVERLAP


@query(
    "t17_passage_chunking",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_O_RAW_TOKS} AS t FROM documents),
    st AS (
      SELECT doc_id, t,
             UNNEST(range(0, greatest(len(t) - {_T17_OVERLAP} - 1, 0) + 1,
                          {_T17_STRIDE})) AS s
      FROM toks
    )
    SELECT doc_id,
           CAST(s // {_T17_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(t[s + 1 : s + {_T17_CHUNK}]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(t[s + 1 : s + {_T17_CHUNK}], ' ') AS passage
    FROM st
    """,
)
def t17_passage_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window passage chunking (50-token chunks, 10-token
    overlap -> stride 40) — the RAG/embedding pre-processing step
    (operators/text.py chunk_passages, pure Catalyst sequence +
    posexplode + slice). Every chunk's exact text is value-hash
    checked against the DuckDB list-slicing replay."""
    from ..operators.text import chunk_passages

    docs = load(spark, sf_dir, "documents")
    return chunk_passages(
        docs, chunk_tokens=_T17_CHUNK, overlap=_T17_OVERLAP
    )


@query(
    "t18_repetition_stats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_O_RAW_TOKS} AS t FROM documents),
    c1 AS (
      SELECT doc_id, gram, COUNT(*) AS n
      FROM (SELECT doc_id, UNNEST(t) AS gram FROM toks)
      GROUP BY doc_id, gram
    ),
    a1 AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total_1,
             CAST(COUNT(*) AS BIGINT) AS distinct_1,
             CAST(MAX(n) AS BIGINT) AS max_1,
             ROUND((SUM(n) - COUNT(*)) * 1000000.0 / SUM(n)) / 1000000.0
               AS dup_frac_1
      FROM c1 GROUP BY doc_id
    ),
    c3 AS (
      SELECT doc_id, gram, COUNT(*) AS n
      FROM (SELECT doc_id,
                   UNNEST(CASE WHEN len(t) >= 3
                     THEN list_transform(range(1, len(t) - 1),
                            i -> array_to_string(t[i : i + 2], ' '))
                     ELSE [] END) AS gram
            FROM toks)
      GROUP BY doc_id, gram
    ),
    a3 AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total_3,
             CAST(COUNT(*) AS BIGINT) AS distinct_3,
             CAST(MAX(n) AS BIGINT) AS max_3,
             ROUND((SUM(n) - COUNT(*)) * 1000000.0 / SUM(n)) / 1000000.0
               AS dup_frac_3
      FROM c3 GROUP BY doc_id
    )
    SELECT a1.doc_id, a1.dup_frac_1, a3.total_3, a3.distinct_3, a3.max_3,
           a3.dup_frac_3,
           COALESCE(a3.dup_frac_3 > 0.2, FALSE) AS flagged
    FROM a1 LEFT JOIN a3 ON a3.doc_id = a1.doc_id
    """,
)
def t18_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb-style repetition quality signal: per-doc
    duplicate-token and duplicate-3-gram fractions plus a boolean
    curation flag (dup_frac_3 > 0.2 marks boilerplate/template text).
    operators/text.py ngram_dup_stats; exact-int-ratio determinism."""
    from ..operators.text import ngram_dup_stats

    docs = load(spark, sf_dir, "documents")
    s1 = ngram_dup_stats(docs, 1).select("doc_id", "dup_frac_1")
    s3 = ngram_dup_stats(docs, 3).select(
        "doc_id", "total_3", "distinct_3", "max_3", "dup_frac_3"
    )
    return s1.join(s3, "doc_id", "left").select(
        "doc_id",
        "dup_frac_1",
        "total_3",
        "distinct_3",
        "max_3",
        "dup_frac_3",
        F.coalesce(F.col("dup_frac_3") > 0.2, F.lit(False)).alias("flagged"),
    )


# --------------------------------------------------------------------------
# t19 — benchmark decontamination (operators/dedup_fuzzy.py)
# --------------------------------------------------------------------------


@query(
    "t19_decontamination",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_o_shingles(3)} AS s FROM documents),
    bench AS (SELECT DISTINCT g FROM (
        SELECT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0)),
    corpus AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, COUNT(*) AS n_hits
    FROM corpus c JOIN bench USING (g)
    GROUP BY c.doc_id
    """,
)
def t19_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (the n-gram-overlap scrub every LLM
    training corpus runs against its benchmark suites): documents
    sharing any 3-gram shingle with the 'benchmark' slice
    (doc_id % 97 == 0 stands in for the eval set) are reported with
    their overlap count. operators/dedup_fuzzy.py:contamination_hits —
    benchmark grams broadcast, corpus never shuffled, per-doc count
    combines map-side. The reference has no decontamination operator;
    charter §2.12 requires it as a first-class curation step."""
    from ..operators.dedup_fuzzy import contamination_hits

    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return contamination_hits(corpus, bench).select(
        F.col("id").alias("doc_id"), "n_hits"
    )


# --------------------------------------------------------------------------
# t20 — token-budget mixture selection (operators/sampling.py)
# --------------------------------------------------------------------------

_O_DOCKEY32 = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
)


@query(
    "t20_token_budget_mix",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, len({_O_RAW_TOKS}) AS n_tokens FROM documents),
    ordered AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY {_O_DOCKEY32}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_w,
             SUM(n_tokens) OVER (PARTITION BY source) AS tot
      FROM w)
    SELECT doc_id, source, n_tokens, cum_w
    FROM ordered WHERE (cum_w - n_tokens) * 10 < 3 * tot
    """,
)
def t20_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: keep 30% of each source's TOKENS
    (not documents) by taking docs in hash order until the cumulative
    token count crosses the per-source budget —
    operators/sampling.py:token_budget_prefix. Exact int64 boundary
    arithmetic ((cum - w) * 10 < 3 * total) so the kept set is
    bit-identical across engines; hash order makes it re-derivable
    and nested (10% mix ⊂ 30% mix). Returns the kept docs with their
    cumulative position so the oracle checks the whole prefix, not
    just the aggregate."""
    from ..operators.sampling import token_budget_prefix
    from ..operators.text import whitespace_tokens

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(whitespace_tokens("text")).cast("long").alias("n_tokens"),
    )
    return token_budget_prefix(
        docs, "source", "n_tokens", 3, 10, "doc_id"
    ).select("doc_id", "source", "n_tokens", "cum_w")


# --------------------------------------------------------------------------
# t21 — PII redaction (operators/text.py:redact_pii)
# --------------------------------------------------------------------------

_O_AUG = (
    "CASE WHEN doc_id % 3 <> 0 THEN text || ' Contact user' "
    "|| CAST(doc_id % 50 AS VARCHAR) || '@example' "
    "|| CAST(doc_id % 7 AS VARCHAR) || '.org or 555-010-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE text END"
)
_O_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
_O_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "t21_pii_redaction",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_O_AUG} AS text FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{_O_EMAIL}')) AS n_emails,
           len(regexp_extract_all(text, '{_O_PHONE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_O_PHONE}', '<PHONE>', 'g'),
                              '{_O_EMAIL}', '<EMAIL>', 'g')) AS red_md5,
           length(regexp_replace(regexp_replace(text, '{_O_PHONE}', '<PHONE>', 'g'),
                                 '{_O_EMAIL}', '<EMAIL>', 'g')) AS red_len
    FROM aug
    """,
)
def t21_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/text.py:redact_pii): emails →
    <EMAIL>, phones → <PHONE>, with per-doc match counts. The
    synthetic corpus carries no PII, so a deterministic augmentation
    injects an email + phone into 2/3 of the docs (keyed off doc_id —
    the remaining third pins the zero-match path); the oracle md5s the
    scrubbed text so the replacement must be byte-identical, not just
    count-identical. Patterns live in the Java∩RE2 common syntax so
    both engines compile the same automaton. Pure per-row codegen —
    no shuffle at any scale."""
    from ..operators.text import redact_pii

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(
                F.col("text"),
                F.lit(" Contact user"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit("@example"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".org or 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    red = redact_pii(docs, "text", "redacted")
    return red.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.md5("redacted").alias("red_md5"),
        F.length("redacted").alias("red_len"),
    )


# --------------------------------------------------------------------------
# t22 — feature-hashing text embedding (operators/text.py)
# --------------------------------------------------------------------------

_O_HE_DIMS = 16


def _o_hashed_embedding() -> str:
    comps = ",\n           ".join(
        f"CAST(SUM(CASE WHEN d = {d} THEN s ELSE 0 END) AS BIGINT) AS e{d}"
        for d in range(_O_HE_DIMS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_O_TOKS}) AS t FROM documents
    ),
    contrib AS (
      SELECT doc_id,
             CAST({_o_hash32("t")} % {_O_HE_DIMS} AS INT) AS d,
             CASE WHEN {_o_hash32("'s|' || t")} % 2 = 0 THEN 1 ELSE -1 END AS s
      FROM toks
    )
    SELECT doc_id,
           {comps}
    FROM contrib GROUP BY doc_id
    """


@query("t22_hashed_embedding", oracle=_o_hashed_embedding())
def t22_hashed_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text embedding (operators/text.py:
    hashed_embedding — the hashing trick, MLlib HashingTF's signed
    variant): every document becomes a 16-dim signed term-frequency
    vector, a pure function of its text via the shared md5 hash32 —
    no vocabulary, no model, reproducible by any engine. This is the
    text->vector bridge that lets the cosine/LSH/PQ near-dup family
    run on corpora WITHOUT precomputed embeddings. The oracle
    recomputes every component from the exploded token multiset
    (signs included), so sign hash, bucket hash, and multiset
    weighting must all agree exactly."""
    from ..operators.text import hashed_embedding

    docs = load(spark, sf_dir, "documents")
    out = hashed_embedding(docs, dim=_O_HE_DIMS)
    return out.select(F.col("id").alias("doc_id"), *[f"e{d}" for d in range(_O_HE_DIMS)])


# --------------------------------------------------------------------------
# t23 — near-dup pairs over the hashed embeddings (no learned vectors)
# --------------------------------------------------------------------------


def _o_he_neardup() -> str:
    he = _o_hashed_embedding()
    dot = " + ".join(f"a.e{d} * b.e{d}" for d in range(_O_HE_DIMS))
    n2a = " + ".join(f"a.e{d} * a.e{d}" for d in range(_O_HE_DIMS))
    n2b = " + ".join(f"b.e{d} * b.e{d}" for d in range(_O_HE_DIMS))
    cos = (
        f"ROUND(CAST(({dot}) AS DOUBLE) / "
        f"(SQRT(CAST(({n2a}) AS DOUBLE)) * SQRT(CAST(({n2b}) AS DOUBLE))), 6)"
    )
    return f"""
    WITH he AS ({he}),
    meta AS (SELECT doc_id, lang, source FROM documents)
    SELECT m1.doc_id AS id_a, m2.doc_id AS id_b, m1.lang, m1.source,
           {cos} AS cosine
    FROM meta m1
    JOIN meta m2 ON m2.lang = m1.lang AND m2.source = m1.source
                AND m1.doc_id < m2.doc_id
    JOIN he a ON a.doc_id = m1.doc_id
    JOIN he b ON b.doc_id = m2.doc_id
    WHERE ({n2a}) > 0 AND ({n2b}) > 0 AND {cos} >= 0.8
    """


@query("t23_hashed_embedding_neardup", oracle=_o_he_neardup())
def t23_hashed_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full no-learned-embeddings near-dup path end-to-end: text ->
    hashing-trick vector (t22) -> blocked cosine pairs (sim3's shape,
    blocked on lang+source) — proving the engine can run vector
    near-dup on a corpus that ships with NO embedding column. Exact
    int dots over the signed term-frequency vectors; the zero-norm
    guard is explicit on BOTH sides because Spark orders NaN above
    every number while DuckDB compares it false. Narrow (id, block)
    pairs shuffle; the 16 components ride a broadcast-eligible
    projection."""
    from ..operators.text import hashed_embedding

    docs = load(spark, sf_dir, "documents")
    # materialize the embedding table before the pair join: both join
    # sides read it, and without the barrier projection collapse
    # inlines the 16 per-doc token folds into the PER-PAIR cosine
    # (measured 42 s vs ~1.5 s at sf0.1 — the explode/join twin of the
    # PQ sort-key inlining, docs/SCALE.md). 17 narrow columns per doc
    # — the embedding table is the index artifact here.
    he = hashed_embedding(docs, dim=_O_HE_DIMS).persist()
    meta = docs.select("doc_id", "lang", "source")
    a = meta.select(F.col("doc_id").alias("id_a"), "lang", "source")
    b = meta.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
    )
    pairs = a.join(
        b,
        (F.col("lang") == F.col("lang_b"))
        & (F.col("source") == F.col("source_b"))
        & (F.col("id_a") < F.col("id_b")),
    ).select("id_a", "id_b", "lang", "source")
    ea = he.select(
        F.col("id").alias("id_a"),
        *[F.col(f"e{d}").alias(f"a{d}") for d in range(_O_HE_DIMS)],
    )
    eb = he.select(
        F.col("id").alias("id_b"),
        *[F.col(f"e{d}").alias(f"b{d}") for d in range(_O_HE_DIMS)],
    )
    j = pairs.join(ea, "id_a").join(eb, "id_b")
    dot = sum(
        [F.col(f"a{d}") * F.col(f"b{d}") for d in range(_O_HE_DIMS)],
        start=F.lit(0).cast("long"),
    )
    n2a = sum(
        [F.col(f"a{d}") * F.col(f"a{d}") for d in range(_O_HE_DIMS)],
        start=F.lit(0).cast("long"),
    )
    n2b = sum(
        [F.col(f"b{d}") * F.col(f"b{d}") for d in range(_O_HE_DIMS)],
        start=F.lit(0).cast("long"),
    )
    cosine = F.round(
        dot.cast("double")
        / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))),
        6,
    )
    return (
        j.select("id_a", "id_b", "lang", "source", cosine.alias("cosine"),
                 n2a.alias("__n2a"), n2b.alias("__n2b"))
        .where((F.col("__n2a") > 0) & (F.col("__n2b") > 0)
               & (F.col("cosine") >= 0.8))
        .drop("__n2a", "__n2b")
    )


# --------------------------------------------------------------------------
# t24 — quality-aware canonical corpus (keep the BEST near-duplicate)
# --------------------------------------------------------------------------

_O_QSCORE = f"""(CASE WHEN len({_O_RAW_TOKS}) BETWEEN 50 AND 1000 THEN 1 ELSE 0 END
              + CASE WHEN {_o_stop(LANG_MARKERS["en"])} * 20 >= len({_O_RAW_TOKS})
                     THEN 1 ELSE 0 END
              + CASE WHEN len(regexp_extract_all(text, '[.,!?;:]')) * 10
                          <= length(text) THEN 1 ELSE 0 END
              + CASE WHEN len(regexp_extract_all(text, '[0-9]')) * 5
                          <= length(text) THEN 1 ELSE 0 END)"""


@query(
    "t24_canonical_best_quality",
    oracle=f"""
    WITH RECURSIVE {_o_t7_ctes(16, 4, 0.3)},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
    ),
    cc AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
    memb AS (
      SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
             {_O_QSCORE} AS quality_score
      FROM documents d LEFT OUTER JOIN cc ON d.doc_id = cc.node
    )
    SELECT doc_id, cluster_id, quality_score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                                       ORDER BY quality_score DESC, doc_id) rn
          FROM memb) t
    WHERE rn = 1
    """,
)
def t24_canonical_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup resolution (operators/graph.py:
    resolve_canonical_by): among near-duplicates, keep the HIGHEST
    quality copy (t1's quality score; doc_id breaks ties), not the
    min id — the curation rule production pipelines actually use,
    since boilerplate copies often have lower quality than the
    original. Same CC machinery as t13; the survivor choice is a
    per-cluster window."""
    from ..operators.graph import resolve_canonical_by
    from ..operators.text import text_stats

    docs = load(spark, sf_dir, "documents")
    scored = docs.join(
        text_stats(docs).select("doc_id", "quality_score"), "doc_id"
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.3)
    kept = resolve_canonical_by(
        scored,
        pairs,
        [F.col("quality_score").desc(), F.col("doc_id")],
    )
    return kept.select(
        "doc_id", "cluster_id", F.col("quality_score").cast("long")
    )


# --------------------------------------------------------------------------
# t25 — deterministic train/val/test split (operators/sampling.py)
# --------------------------------------------------------------------------


@query(
    "t25_train_val_test_split",
    oracle=f"""
    WITH assigned AS (
      SELECT source, len({_O_RAW_TOKS}) AS n_tokens,
             CASE WHEN {_O_DOCKEY32} % 1000000 < 900000 THEN 'train'
                  WHEN {_O_DOCKEY32} % 1000000 < 950000 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY source, split
    """,
)
def t25_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment
    (operators/sampling.py:assign_split): each doc's split is a pure
    hash of its id — stable under repartitioning, engine choice, and
    corpus growth (new rows never move existing rows between splits,
    the property a re-rolled random split lacks; that migration is
    how eval contamination usually enters). Scan-predicate cheap; the
    only shuffle is the reporting aggregate."""
    from ..operators.sampling import assign_split
    from ..operators.text import whitespace_tokens

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(whitespace_tokens("text")).cast("long").alias("n_tokens"),
    )
    out = assign_split(
        docs, [("train", 900000), ("val", 950000)], "test", "doc_id"
    )
    return out.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# t26 — corpus-vocabulary quality signal (common-token fraction)
# --------------------------------------------------------------------------


@query(
    "t26_common_token_fraction",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_O_TOKS}) AS t FROM documents
    ),
    vocab AS (
      SELECT t FROM (
        SELECT t, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS rnk
        FROM toks GROUP BY t) v
      WHERE rnk <= 100
    ),
    scored AS (
      SELECT k.doc_id, COUNT(*) AS n_toks,
             COUNT(*) FILTER (WHERE v.t IS NOT NULL) AS n_common
      FROM toks k LEFT JOIN vocab v ON v.t = k.t
      GROUP BY k.doc_id
    )
    SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
           CAST(n_common AS BIGINT) AS n_common,
           ROUND(n_common * 1000000.0 / n_toks) / 1000000.0 AS common_frac,
           n_common * 10 < n_toks * 3 AS flagged
    FROM scored
    """,
)
def t26_common_token_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style vocabulary quality signal: the corpus's top-100
    tokens (by frequency, token-text tiebreak so the rank cut is
    deterministic) form the reference vocabulary; each doc scores the
    fraction of its token occurrences that are common-vocabulary, and
    docs under 30% are flagged (gibberish / non-prose / wrong-language
    text scores low). Two passes, both scale-clean: the vocab is ONE
    aggregate + top-k (tiny result, broadcast back), scoring is a
    broadcast join over exploded tokens with a map-side-combining
    count — the corpus never shuffles its tokens. Exact-int ratio for
    the cross-engine fraction."""
    docs = load(spark, sf_dir, "documents")
    from ..operators.text import normalize_text, whitespace_tokens

    toks = fan_out(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(
            whitespace_tokens(normalize_text(F.col("text")))
        ).alias("t"),
    )
    # orderBy+limit plans TakeOrderedAndProject (per-partition top-100
    # + tiny driver merge) — a global row_number window would sort the
    # whole vocabulary in one partition
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "t")
        .limit(100)
        .select("t", F.lit(1).alias("__in_vocab"))
    )
    scored = (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.count("__in_vocab").alias("n_common"),
        )
    )
    return scored.select(
        "doc_id",
        "n_toks",
        "n_common",
        (F.round(F.col("n_common") * 1000000.0 / F.col("n_toks")) / 1000000.0)
        .alias("common_frac"),
        (F.col("n_common") * 10 < F.col("n_toks") * 3).alias("flagged"),
    )


# --------------------------------------------------------------------------
# t27 — decontaminated corpus (t19's removal composition)
# --------------------------------------------------------------------------


@query(
    "t27_decontaminated_corpus",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_o_shingles(3)} AS s FROM documents),
    bench AS (SELECT DISTINCT g FROM (
        SELECT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0)),
    hits AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0) c
      JOIN bench USING (g)
    )
    SELECT d.lang, d.source, COUNT(*) AS n_docs,
           CAST(SUM(len({_O_RAW_TOKS})) AS BIGINT) AS n_tokens
    FROM documents d
    WHERE d.doc_id % 97 <> 0
      AND NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = d.doc_id)
    GROUP BY d.lang, d.source
    """,
)
def t27_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination DROP step end-to-end: corpus minus every
    document t19 flags (anti-join on the hit set), reported as
    per-(lang, source) doc and token counts — the table a training
    run would actually consume. The hit set is tiny (hits are rare),
    so the anti-join broadcasts it; the corpus still never shuffles.
    Closes the flag → remove contract t19 opens."""
    from ..operators.dedup_fuzzy import contamination_hits
    from ..operators.text import whitespace_tokens

    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    hits = contamination_hits(corpus, bench).select(
        F.col("id").alias("doc_id")
    )
    clean = corpus.join(F.broadcast(hits), "doc_id", "left_anti")
    return clean.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(whitespace_tokens("text")).cast("long")).alias(
            "n_tokens"
        ),
    )


# --------------------------------------------------------------------------
# t28 — sub-document chunk dedup (repeated spans removed, docs reassembled)
# --------------------------------------------------------------------------

# t28 span geometry — named once so the oracle SQL and the
# dedup_chunks call can never drift apart (same discipline as t17).
_T28_CHUNK = 30


@query(
    "t28_chunk_dedup_corpus",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_O_RAW_TOKS} AS t FROM documents),
    st AS (
      SELECT doc_id, t,
             UNNEST(range(0, greatest(len(t) - 1, 0) + 1, {_T28_CHUNK})) AS s
      FROM toks
    ),
    ch AS (
      SELECT doc_id, CAST(s // {_T28_CHUNK} AS BIGINT) AS chunk_idx,
             array_to_string(t[s + 1 : s + {_T28_CHUNK}], ' ') AS passage
      FROM st
    ),
    fl AS (
      SELECT doc_id, chunk_idx, passage,
             ROW_NUMBER() OVER (PARTITION BY md5(passage)
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM ch
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN passage END, ' '
                               ORDER BY chunk_idx), '') AS dedup_text
    FROM fl GROUP BY doc_id
    """,
)
def t28_chunk_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: repeated {chunk}-token spans removed
    corpus-wide (keep-first by (doc_id, chunk_idx)), every document
    reassembled from its surviving chunks — the CCNet-style span-level
    pass that document-level t3 can't express. One shuffle on the
    chunk hash (the keep-first window) + one on the doc id (the
    reassembly); chunk rows are narrow and nothing is pairwise. Every
    reassembled text is value-hash checked against the DuckDB replay
    (operators/text.py dedup_chunks)."""
    from ..operators.text import dedup_chunks

    docs = load(spark, sf_dir, "documents")
    return dedup_chunks(docs, chunk_tokens=_T28_CHUNK)


# --------------------------------------------------------------------------
# t29 — count-min sketch heavy hitters with an EXACT oracle
# --------------------------------------------------------------------------

_T29_D = 4
_T29_W = 64


def _o_cms_bucket(tok_expr: str, i_expr: str) -> str:
    return (
        _o_hash32(f"{tok_expr} || '#' || CAST({i_expr} AS VARCHAR)")
        + f" % {_T29_W}"
    )


@query(
    "t29_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_O_RAW_TOKS}) AS token FROM documents),
    exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    keys AS (
      SELECT token, n FROM exact ORDER BY n DESC, token LIMIT 20),
    counters AS (
      SELECT i, {_o_cms_bucket("token", "i")} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tok CROSS JOIN range({_T29_D}) t(i)
      GROUP BY 1, 2),
    est AS (
      SELECT k.token, CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS cms_n
      FROM keys k
      CROSS JOIN range({_T29_D}) t(i)
      LEFT JOIN counters c
        ON c.i = t.i AND c.bucket = {_o_cms_bucket("k.token", "t.i")}
      GROUP BY k.token)
    SELECT k.token, k.n AS exact_n, e.cms_n,
           e.cms_n - k.n AS overestimate
    FROM keys k JOIN est e ON e.token = k.token
    """,
)
def t29_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch end-to-end with an EXACT oracle
    (operators/sketches.py): build the d x w counter table over the
    corpus token stream, point-query it for the exact top-20 tokens,
    and report estimate vs truth. Unlike q31's seeded HLL/KLL twins,
    CMS with a fixed hash family is a deterministic function of the
    input multiset, so every counter and estimate value-hash matches
    the DuckDB replay — and the printed overestimate column is the
    collision error a reader can see. The counter table is d*w rows
    from ANY corpus size (partial agg is the merge), which is the
    whole point of the sketch at 100 TB."""
    from ..operators.sketches import cms_build, cms_estimate
    from ..operators.text import whitespace_tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(whitespace_tokens("text")).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    keys = exact.orderBy(F.col("n").desc(), "token").limit(20)
    counters = cms_build(docs, d=_T29_D, w=_T29_W)
    est = cms_estimate(counters, keys, d=_T29_D, w=_T29_W)
    return (
        keys.join(est, "token")
        .select(
            "token",
            F.col("n").alias("exact_n"),
            "cms_n",
            (F.col("cms_n") - F.col("n")).alias("overestimate"),
        )
    )


# --------------------------------------------------------------------------
# t30 — probability-proportional-to-size corpus sample
# --------------------------------------------------------------------------

_T30_K = 100


@query(
    "t30_pps_weighted_sample",
    oracle=f"""
    WITH tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS t FROM documents)
    SELECT doc_id, lang, source, n_chars
    FROM documents, tot
    WHERE {_o_hash32("CAST(doc_id AS VARCHAR)")} * t
          < {_T30_K} * CAST(n_chars AS BIGINT) * 4294967296
    """,
)
def t30_pps_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted (PPS) deterministic sample of the corpus
    (operators/sampling.py pps_sample): each document is kept with
    probability proportional to its character count, expected sample
    size {k} — the curation sampler that matches TOKEN shares instead
    of row shares. The keep decision is a pure-integer inequality on
    the shared hash32 key (no float probability), so the sample is
    identical on any engine and any partitioning, and the oracle
    replays it row-for-row."""
    from ..operators.sampling import pps_sample

    docs = load(spark, sf_dir, "documents")
    return pps_sample(docs, _T30_K, "n_chars", F.col("doc_id")).select(
        "doc_id", "lang", "source", "n_chars"
    )


# --------------------------------------------------------------------------
# m3 — content-addressed chunk store (storage dedup over binary media)
# --------------------------------------------------------------------------

_M3_CHUNK = 64


@query(
    "m3_content_addressed_store",
    oracle=f"""
    WITH m AS (
      -- the corpus is pure ASCII (checked at all scales), so chunking
      -- the VARCHAR by characters is byte-identical to chunking the
      -- encoded blob, and md5(varchar) hashes the same bytes DuckDB
      -- has no blob substring for
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
             text AS content
      FROM documents),
    ch AS (
      SELECT media_id, kind,
             UNNEST(range(0, greatest(CAST(ceil(length(content)
                                              / {_M3_CHUNK}.0) AS BIGINT),
                                      1))) AS i,
             content
      FROM m),
    chunks AS (
      SELECT kind,
             md5(substring(content, CAST(i * {_M3_CHUNK} + 1 AS INT),
                           {_M3_CHUNK})) AS h,
             length(substring(content,
                              CAST(i * {_M3_CHUNK} + 1 AS INT),
                              {_M3_CHUNK})) AS len
      FROM ch),
    per_hash AS (
      SELECT kind, h, CAST(COUNT(*) AS BIGINT) AS refs,
             CAST(MAX(len) AS BIGINT) AS len
      FROM chunks GROUP BY kind, h)
    SELECT kind,
           CAST(SUM(refs) AS BIGINT) AS n_refs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(refs) - COUNT(*) AS BIGINT) AS n_dup_refs,
           CAST(SUM(refs * len) AS BIGINT) AS logical_bytes,
           CAST(SUM(len) AS BIGINT) AS stored_bytes
    FROM per_hash GROUP BY kind
    """,
)
def m3_content_addressed_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed chunk storage statistics — the dedup layer a
    blob store runs under multimodal data (operators/multimodal.py
    chunk_media): media split into fixed 64-byte chunks, addressed by
    md5; identical chunks store ONCE no matter how many media
    reference them. Per kind: reference count vs distinct chunks and
    logical vs stored bytes — the dedup ratio a 100 TB media lake
    actually banks. Chunking is the JVM substring path (no Python, no
    materialized arrays); the distinct-chunk reduction is one
    aggregate on the chunk hash — the same single-shuffle shape as
    exact dedup, applied to binary content."""
    from ..operators.multimodal import chunk_media, documents_as_media

    docs = load(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    chunks = chunk_media(media, chunk_bytes=_M3_CHUNK)
    kind = (
        F.when(F.col("media_id") % 3 == 0, "image")
        .when(F.col("media_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    per_hash = (
        chunks.select(
            kind.alias("kind"),
            F.md5("chunk").alias("h"),
            F.length("chunk").cast("long").alias("len"),
        )
        .groupBy("kind", "h")
        .agg(
            F.count(F.lit(1)).alias("refs"), F.max("len").alias("len")
        )
    )
    return per_hash.groupBy("kind").agg(
        F.sum("refs").cast("long").alias("n_refs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("refs") - F.count(F.lit(1))).cast("long").alias("n_dup_refs"),
        F.sum(F.col("refs") * F.col("len")).cast("long").alias("logical_bytes"),
        F.sum("len").cast("long").alias("stored_bytes"),
    )


# --------------------------------------------------------------------------
# t31 — classifier evaluation: lang-id confusion matrix + per-class metrics
# --------------------------------------------------------------------------


@query(
    "t31_langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             {_o_stop(LANG_MARKERS["en"])} AS score_en,
             {_o_stop(LANG_MARKERS["fr"])} AS score_fr,
             {_o_stop(LANG_MARKERS["es"])} AS score_es,
             {_o_stop(LANG_MARKERS["de"])} AS score_de
      FROM documents),
    pred AS (
      SELECT lang AS actual,
             CASE WHEN greatest(score_en, score_fr, score_es, score_de) = 0
                  THEN 'und'
                  WHEN score_en = greatest(score_en, score_fr, score_es,
                                           score_de) THEN 'en'
                  WHEN score_fr = greatest(score_en, score_fr, score_es,
                                           score_de) THEN 'fr'
                  WHEN score_es = greatest(score_en, score_fr, score_es,
                                           score_de) THEN 'es'
                  ELSE 'de' END AS predicted
      FROM scored),
    cells AS (
      SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY actual, predicted)
    SELECT actual, predicted, n,
           ROUND(n * 1000000.0
                 / SUM(n) OVER (PARTITION BY actual)) / 1000000.0
             AS row_frac
    FROM cells
    """,
)
def t31_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation over the corpus: the lang-id predictor
    (t2, operators/text.py:lang_id) scored against the stored lang
    label as a confusion matrix with per-actual row fractions (recall
    diagonals) — the eval table any curation classifier ships with.
    One aggregate over per-row predictions (scores are pure Catalyst
    regexp counts), one tiny window for the normalization; fractions
    use the exact-int-ratio rounding pattern."""
    from pyspark.sql import Window

    from ..operators.text import lang_id

    docs = load(spark, sf_dir, "documents")
    pred = lang_id(docs).select(
        F.col("lang").alias("actual"), F.col("pred_lang").alias("predicted")
    )
    cells = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("actual")
    return cells.select(
        "actual",
        "predicted",
        "n",
        (F.round(F.col("n") * 1000000.0 / F.sum("n").over(w)) / 1000000.0)
        .alias("row_frac"),
    )


# --------------------------------------------------------------------------
# t33 — asymmetric containment pairs (quote/excerpt detection)
# --------------------------------------------------------------------------


@query(
    "t33_containment_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, source, {_o_shingles(3)} AS s FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
             CAST(len(a.s) AS BIGINT) AS n_a,
             CAST(len(b.s) AS BIGINT) AS n_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
                         AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) > 0)
    SELECT id_a, id_b, n_inter, n_a, n_b,
           ROUND(n_inter * 1000000.0 / n_a) / 1000000.0 AS cont_a,
           ROUND(n_inter * 1000000.0 / n_b) / 1000000.0 AS cont_b
    FROM pairs
    WHERE ROUND(n_inter * 1000000.0 / n_a) / 1000000.0 >= 0.08
       OR ROUND(n_inter * 1000000.0 / n_b) / 1000000.0 >= 0.08
    """,
)
def t33_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (operators/dedup_fuzzy.py
    ngram_containment_pairs — Broder's containment measure): |A∩B|
    over EACH side's own shingle count, the quote/excerpt detector
    symmetric Jaccard (t6) structurally misses — a short doc fully
    embedded in a long one scores ~100% containment from the short
    side but ~1% Jaccard. Both directions are emitted so the caller
    knows which doc is the container; the fixture holds one true
    full-containment pair (cont = 1.0) that t6's 5% Jaccard floor
    also catches but cannot ATTRIBUTE. Same blocked shingle-join
    shape as t6 — no new shuffle surface."""
    from ..operators.dedup_fuzzy import ngram_containment_pairs

    docs = load(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        docs, ["lang", "source"], k=3, threshold=0.08
    )


# --------------------------------------------------------------------------
# t34 — curation audit: each dedup stage's independent yield on the corpus
# --------------------------------------------------------------------------


@query(
    "t34_curation_audit",
    oracle=f"""
    WITH RECURSIVE {_o_t7_ctes(16, 4, 0.3)},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
    ),
    cc AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
    tok AS (SELECT doc_id, len({_O_RAW_TOKS}) AS nt FROM documents),
    exact_keep AS (
      SELECT doc_id FROM documents
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5({_O_NORM})
                                 ORDER BY doc_id) = 1),
    ct AS (SELECT doc_id, {_O_RAW_TOKS} AS t FROM documents),
    st2 AS (
      SELECT doc_id, t,
             UNNEST(range(0, greatest(len(t) - 1, 0) + 1, {_T28_CHUNK})) AS s
      FROM ct),
    fl2 AS (
      SELECT doc_id,
             len(t[s + 1 : s + {_T28_CHUNK}]) AS n_ct,
             ROW_NUMBER() OVER (
               PARTITION BY md5(array_to_string(t[s + 1 : s + {_T28_CHUNK}],
                                                ' '))
               ORDER BY doc_id, s) AS rn
      FROM st2),
    chunk_stage AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN rn = 1 THEN n_ct ELSE 0 END) AS BIGINT)
               AS nt,
             SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS kept
      FROM fl2 GROUP BY doc_id),
    canon AS (
      SELECT d.doc_id FROM documents d
      LEFT JOIN cc ON d.doc_id = cc.node
      WHERE COALESCE(cc.cluster_id, d.doc_id) = d.doc_id)
    SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM tok
    UNION ALL
    SELECT '1_exact_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(nt) AS BIGINT)
    FROM exact_keep JOIN tok USING (doc_id)
    UNION ALL
    SELECT '2_chunk_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(nt) AS BIGINT)
    FROM chunk_stage WHERE kept > 0
    UNION ALL
    SELECT '3_neardup_canonical', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(nt) AS BIGINT)
    FROM canon JOIN tok USING (doc_id)
    """,
)
def t34_curation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation audit table: each dedup stage's INDEPENDENT
    yield against the raw corpus — surviving doc and token counts for
    exact dedup (t3), sub-document chunk dedup (t28), and near-dup
    canonicalization (t13) in one result — the dashboard row a data
    team reads before choosing which stages to run and in what order.
    Every stage reuses its already-oracled operator; the oracle
    composes the same verified CTE chains, so four pipelines'
    numbers must land exactly in one query."""
    from ..operators.dedup_fuzzy import exact_dedup, minhash_lsh_pairs
    from ..operators.graph import resolve_canonical
    from ..operators.text import dedup_chunks, whitespace_tokens

    docs = load(spark, sf_dir, "documents")
    nt = F.size(whitespace_tokens("text")).cast("long")
    tok = docs.select("doc_id", nt.alias("nt"))

    def stage(name, df):
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    raw = stage("0_raw", tok)
    exact = stage(
        "1_exact_dedup",
        exact_dedup(docs).select("doc_id").join(tok, "doc_id"),
    )
    chunk = dedup_chunks(docs, chunk_tokens=_T28_CHUNK).where(
        F.col("n_kept") > 0
    )
    chunk_tok = chunk.select(
        F.when(F.length("dedup_text") == 0, F.lit(0).cast("long"))
        .otherwise(F.size(whitespace_tokens("dedup_text")).cast("long"))
        .alias("nt")
    )
    chunks = stage("2_chunk_dedup", chunk_tok)
    pairs = minhash_lsh_pairs(docs, threshold=0.3)
    canon = stage(
        "3_neardup_canonical",
        resolve_canonical(docs, pairs).select("doc_id").join(tok, "doc_id"),
    )
    return raw.unionByName(exact).unionByName(chunks).unionByName(canon)


@query(
    "t35_incremental_neardup",
    oracle=f"""
    WITH {_o_t7_ctes(threshold=0.3)}
    SELECT id_a, id_b, jaccard FROM pairs
    WHERE id_a % 5 = 0 OR id_b % 5 = 0
    """,
)
def t35_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH index maintenance (operators/dedup_fuzzy.py:
    incremental_lsh_pairs): the corpus is split into an already-indexed
    base (doc_id %5 != 0) and an arriving increment (%5 == 0); only the
    increment is hashed, its band rows broadcast against the base's
    band table, and exact-Jaccard verify re-shingles only touched
    docs. Because minhash signatures are a pure function of each doc's
    own text, the result must equal the FULL-corpus t7 recompute
    restricted to pairs involving a new doc — which is literally this
    oracle: t7's CTE chain with that filter. At 100 TB this is the
    daily-ingest dedup path: index once, join increments forever."""
    from ..operators.dedup_fuzzy import incremental_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    return incremental_lsh_pairs(old, new, threshold=0.3)


# --------------------------------------------------------------------------
# t36 — temperature-rebalanced corpus mixture (alpha = 1/2)
# --------------------------------------------------------------------------

_T36_TARGET = 100_000


@query(
    "t36_temperature_mixture",
    oracle=f"""
    WITH per AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS ng
      FROM documents GROUP BY lang
    ),
    s0 AS (
      SELECT lang, ng,
             CAST(FLOOR(SQRT(CAST(ng AS DOUBLE))) AS BIGINT) AS s
      FROM per
    ),
    s1 AS (
      SELECT lang, ng, CASE WHEN s * s > ng THEN s - 1 ELSE s END AS s
      FROM s0
    ),
    w AS (
      SELECT lang, ng,
             CASE WHEN (s + 1) * (s + 1) <= ng THEN s + 1 ELSE s END AS wg
      FROM s1
    ),
    tot AS (SELECT CAST(SUM(wg) AS BIGINT) AS st FROM w)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN w ON w.lang = d.lang, tot
    WHERE CAST({_o_hash32("CAST(doc_id AS VARCHAR)")} AS HUGEINT)
            * w.ng * tot.st
          < CAST({_T36_TARGET} AS HUGEINT) * w.wg * 4294967296
    """,
)
def t36_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced mixture sampling, alpha = 1/2
    (operators/sampling.py:temperature_mixture): a ~100k-char sample
    whose per-language shares are proportional to sqrt(language
    chars) — the LLM-mixture rebalance that up-weights rare languages.
    The keep test is fully integer (isqrt weights via Newton-corrected
    floor(sqrt), DECIMAL(38,0)/HUGEINT products), so Spark and DuckDB
    agree on every row at every scale — a float-rate formulation
    would flip boundary rows per engine. One group-cardinality
    aggregate broadcast back; the test is a scan predicate."""
    from ..operators.sampling import temperature_mixture

    docs = load(spark, sf_dir, "documents")
    return temperature_mixture(
        docs.select("doc_id", "lang", "source", "n_chars"),
        "lang",
        _T36_TARGET,
        "n_chars",
        "doc_id",
    )


# --------------------------------------------------------------------------
# t37 — repeated n-gram span coverage (operators/text.py:dup_span_stats)
# --------------------------------------------------------------------------

_T37_N = 5


@query(
    "t37_dup_span_coverage",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_O_TOKS} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, start,
             md5(array_to_string(toks[start:start+{_T37_N - 1}], ' ')) AS gh
      FROM (SELECT doc_id, toks,
                   UNNEST(range(1, GREATEST(len(toks) - {_T37_N} + 1, 0) + 1))
                     AS start
            FROM base)
    ),
    dup AS (
      SELECT doc_id, start
      FROM (SELECT doc_id, start,
                   COUNT(*) OVER (PARTITION BY gh) AS cnt
            FROM g)
      WHERE cnt >= 2
    ),
    cov AS (
      SELECT doc_id,
             COALESCE(LEAST({_T37_N},
                      start - LAG(start) OVER (PARTITION BY doc_id
                                               ORDER BY start)),
                      {_T37_N}) AS c
      FROM dup
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
             CAST(SUM(c) AS BIGINT) AS dup_covered_tokens
      FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.toks) AS BIGINT) AS n_tokens,
           CAST(GREATEST(len(b.toks) - {_T37_N} + 1, 0) AS BIGINT) AS n_grams,
           COALESCE(a.n_dup_grams, 0) AS n_dup_grams,
           COALESCE(a.dup_covered_tokens, 0) AS dup_covered_tokens,
           ROUND(CAST(COALESCE(a.dup_covered_tokens, 0) AS DOUBLE)
                 / len(b.toks), 6) AS dup_fraction
    FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
    """,
)
def t37_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated n-gram SPAN coverage (operators/text.py:
    dup_span_stats): per-doc fraction of token positions covered by a
    5-token window occurring >=2 times corpus-wide — the
    n-gram-granular analog of Lee et al.'s suffix-array
    exact-substring dedup, catching arbitrary-offset boilerplate that
    fixed chunk boundaries (t28) miss. One narrow shuffle on the gram
    hash (the stand-in for the suffix sort), then lag-window interval
    union per doc — no position explode, no UDFs."""
    from ..operators.text import dup_span_stats

    docs = load(spark, sf_dir, "documents")
    return dup_span_stats(docs, n=_T37_N, min_count=2)


# --------------------------------------------------------------------------
# t38 — hashed linear quality scorer (operators/text.py:quality_score_linear)
# --------------------------------------------------------------------------

_T38_DIM = 64


@query(
    "t38_quality_scorer",
    oracle=f"""
    WITH w AS (
      SELECT CAST(i AS INT) AS bucket,
             CAST({_o_hash32("'w|' || CAST(i AS VARCHAR)")} % 17 - 8
                  AS BIGINT) AS weight
      FROM (SELECT UNNEST(range(0, {_T38_DIM})) AS i)
    ),
    tok AS (
      SELECT doc_id, UNNEST({_O_TOKS}) AS tok FROM documents
    ),
    b AS (
      SELECT doc_id,
             CAST({_o_hash32("tok")} % {_T38_DIM} AS INT) AS bucket
      FROM tok
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(weight) AS BIGINT) AS raw_score
      FROM b JOIN w USING (bucket)
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, raw_score,
           ROUND(CAST(raw_score AS DOUBLE) / n_tokens, 6) AS score,
           (CAST(raw_score AS DOUBLE) / n_tokens) >= 0 AS keep
    FROM agg
    """,
)
def t38_quality_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering plumbing (operators/text.py:
    quality_score_linear): a linear scorer over hashing-trick token
    features whose weight table is BROADCAST-JOINED against the
    exploded token stream — the serving shape of a fastText-style
    curation classifier at 100 TB (model = executor-resident
    metadata; corpus = one narrow shuffle on the doc id). Weights are
    hash-derived integers so the entire inference is value-hash
    oracled; a trained artifact drops in by replacing the weights
    table alone."""
    from ..operators.text import quality_score_linear

    docs = load(spark, sf_dir, "documents")
    return quality_score_linear(docs, dim=_T38_DIM)


# --------------------------------------------------------------------------
# t40 — k-anonymity audit (operators/text.py:k_anonymity_violations)
# --------------------------------------------------------------------------


@query(
    "t40_k_anonymity_audit",
    oracle="""
    SELECT lang, source,
           CAST(n_chars // 1000 AS BIGINT) AS chars_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY lang, source, n_chars // 1000
    HAVING COUNT(*) < 5
    """,
)
def t40_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus release metadata
    (operators/text.py:k_anonymity_violations, k=5): quasi-identifier
    groups (lang, source, length band) too small to hide in — the
    privacy check that survives PII redaction (t21 strips emails; it
    cannot strip being the only document of a kind). One counting
    groupBy; the violating set is < 5 rows per group by definition."""
    from ..operators.text import k_anonymity_violations

    docs = load(spark, sf_dir, "documents")
    return k_anonymity_violations(
        docs,
        [
            F.col("lang"),
            F.col("source"),
            (F.col("n_chars") / 1000)
            .cast("long")
            .alias("chars_bucket"),
        ],
        k=5,
    )


# --------------------------------------------------------------------------
# t41 — curation flag set (operators/text.py:quality_flags)
# --------------------------------------------------------------------------


@query(
    "t41_stopword_quality_flags",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             len({_O_RAW_TOKS}) AS n_tok,
             CAST(list_sum(list_transform({_O_RAW_TOKS},
                                          x -> length(x))) AS BIGINT)
               AS sum_len,
             len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
             {_o_stop(LANG_MARKERS["en"])} AS en_stops,
             length(text) AS n_chars
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             concat_ws(';',
               CASE WHEN n_tok < 30 THEN 'short' END,
               CASE WHEN n_upper * 5 > n_chars THEN 'upper' END,
               CASE WHEN sum_len > n_tok * 12 THEN 'longword' END,
               CASE WHEN en_stops * 25 < n_tok THEN 'stop' END) AS flags
      FROM base
    )
    SELECT doc_id,
           CASE WHEN flags = '' THEN '__pass__' ELSE flags END AS flags
    FROM f
    """,
)
def t41_stopword_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation FLAG SET (operators/text.py:
    quality_flags): which of the four C4/Gopher-style rules fire —
    short (<30 tokens), upper (>20% uppercase), longword (mean raw
    token length >12), stop (en-stopword density below 1/25) — as a
    canonical semicolon-joined string ('__pass__' when clean). The
    filter-funnel complement to t38's scalar score: an aggregation
    over ``flags`` reports each rule's marginal removal and the
    overlap structure of the filters, the way public curation
    appendix tables are presented. All four rules are integer-space
    comparisons, so the whole flag string is value-hash oracled.
    Pure per-row projection — a map stage fused into the scan; no
    shuffle at any scale."""
    from ..operators.text import quality_flags

    docs = load(spark, sf_dir, "documents")
    return quality_flags(docs).select("doc_id", "flags")


@query(
    "m4_frame_embedding_pool",
    oracle="""
    WITH frames AS (
      SELECT doc_id AS media_id,
             md5(substring(text, off + 1, 256)) AS fmd5
      FROM (SELECT doc_id, text,
                   UNNEST(range(0, length(text), 256)) AS off
            FROM documents)
    ),
    feat AS (
      SELECT media_id,
             CAST(CAST('0x' || substr(md5(fmd5 || '|0'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f0,
             CAST(CAST('0x' || substr(md5(fmd5 || '|1'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f1,
             CAST(CAST('0x' || substr(md5(fmd5 || '|2'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f2,
             CAST(CAST('0x' || substr(md5(fmd5 || '|3'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f3,
             CAST(CAST('0x' || substr(md5(fmd5 || '|4'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f4,
             CAST(CAST('0x' || substr(md5(fmd5 || '|5'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f5,
             CAST(CAST('0x' || substr(md5(fmd5 || '|6'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f6,
             CAST(CAST('0x' || substr(md5(fmd5 || '|7'), 1, 8) AS BIGINT) % 256 - 128 AS BIGINT) AS f7
      FROM frames
    )
    SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(f0) AS BIGINT) AS e0,
           CAST(SUM(f1) AS BIGINT) AS e1,
           CAST(SUM(f2) AS BIGINT) AS e2,
           CAST(SUM(f3) AS BIGINT) AS e3,
           CAST(SUM(f4) AS BIGINT) AS e4,
           CAST(SUM(f5) AS BIGINT) AS e5,
           CAST(SUM(f6) AS BIGINT) AS e6,
           CAST(SUM(f7) AS BIGINT) AS e7
    FROM feat GROUP BY media_id
    """,
)
def m4_frame_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-embedding pipeline shape end to end
    (operators/multimodal.py:frame_embed_pool): frames sampled by the
    Arrow mapInPandas sampler, each frame 'encoded' by the
    deterministic stub (hash of its content hash per dimension —
    container has no codecs; a real model drops onto the same
    (media_id, frame_md5) contract), SUM-pooled per media in exact
    int64. The oracle replays the whole chain — byte-offset frame
    grid, frame md5 (documents are pure ASCII so VARCHAR substring is
    byte-exact, asserted below), per-dim features, pooling — so the
    value-hash match covers the sampler's batching too."""
    from ..operators.multimodal import documents_as_media, frame_embed_pool

    docs = load(spark, sf_dir, "documents")
    # the oracle's VARCHAR substring == the sampler's byte slices only
    # for ASCII; fail loudly if the fixture ever grows multibyte text
    n_multibyte = (
        docs.where(F.octet_length("text") != F.length("text"))
        .limit(1)
        .count()
    )
    assert n_multibyte == 0, "documents fixture is no longer ASCII"
    media = documents_as_media(docs)
    return frame_embed_pool(media, dim=8)


@query(
    "m5_media_frame_overlap",
    oracle="""
    WITH frames AS (
      SELECT DISTINCT doc_id AS media_id,
             md5(substring(text, off + 1, 256)) AS fmd5
      FROM (SELECT doc_id, text,
                   UNNEST(range(0, length(text), 256)) AS off
            FROM documents)
    ),
    sizes AS (
      SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames
      FROM frames GROUP BY media_id
    ),
    shared AS (
      SELECT a.media_id AS lo, b.media_id AS hi,
             CAST(COUNT(*) AS BIGINT) AS shared_frames
      FROM frames a JOIN frames b
        ON b.fmd5 = a.fmd5 AND a.media_id < b.media_id
      GROUP BY a.media_id, b.media_id
    )
    SELECT lo, hi, shared_frames,
           sa.n_frames AS n_lo, sb.n_frames AS n_hi,
           ROUND(CAST(shared_frames AS DOUBLE)
                 / (sa.n_frames + sb.n_frames - shared_frames), 6)
             AS frame_jaccard
    FROM shared
    JOIN sizes sa ON sa.media_id = lo
    JOIN sizes sb ON sb.media_id = hi
    """,
)
def m5_media_frame_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based media near-dup
    (operators/multimodal.py:frame_overlap_pairs): media pairs
    sharing byte-identical sampled frames, with frame-Jaccard — the
    video-dedup practice whole-file hashing misses (trimmed/re-muxed
    copies keep identical frames). The only join moves (md5,
    media_id) narrow rows — exact-dedup's shape at frame granularity;
    the oracle replays sampler grid + hashing + the pair join."""
    from ..operators.multimodal import documents_as_media, frame_overlap_pairs

    docs = load(spark, sf_dir, "documents")
    return frame_overlap_pairs(documents_as_media(docs))


@query(
    "t42_bpe_merge_step",
    oracle="""
    WITH wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+'))
              AS word
            FROM documents)
      WHERE LENGTH(word) BETWEEN 2 AND 20
      GROUP BY word),
    chars AS (
      SELECT word, freq, i, SUBSTRING(word, i, 1) AS sym
      FROM wf CROSS JOIN (SELECT UNNEST(RANGE(1, 21)) AS i)
      WHERE i <= LENGTH(word)),
    seq0 AS (
      SELECT word, freq, i, sym,
             LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
      FROM chars),
    pairs0 AS (
      SELECT sym AS l, nxt AS r, SUM(freq) AS cnt
      FROM seq0 WHERE nxt IS NOT NULL GROUP BY sym, nxt),
    top1 AS (
      SELECT l AS mx, r AS my FROM pairs0
      ORDER BY cnt DESC, l, r LIMIT 1),
    matches AS (
      SELECT s.word, s.i,
             s.i - ROW_NUMBER() OVER (PARTITION BY s.word ORDER BY s.i)
               AS grp
      FROM seq0 s, top1 t
      WHERE s.sym = t.mx AND s.nxt = t.my),
    kept AS (
      SELECT word, i FROM (
        SELECT word, i,
               i - MIN(i) OVER (PARTITION BY word, grp) AS off
        FROM matches) t
      WHERE off % 2 = 0),
    syms AS (
      SELECT s.word, s.freq, s.i,
             CASE WHEN k1.i IS NOT NULL THEN s.sym || s.nxt
                  ELSE s.sym END AS sym
      FROM seq0 s
      LEFT JOIN kept k1 ON k1.word = s.word AND k1.i = s.i
      LEFT JOIN kept k2 ON k2.word = s.word AND k2.i = s.i - 1
      WHERE k2.i IS NULL),
    seq1 AS (
      SELECT word, freq, sym,
             LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
      FROM syms),
    pairs1 AS (
      SELECT sym AS left_sym, nxt AS right_sym,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM seq1 WHERE nxt IS NOT NULL GROUP BY sym, nxt)
    SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym, cnt,
           t.mx AS merged_left, t.my AS merged_right
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, left_sym,
                                       right_sym) AS rank
          FROM pairs1) p
    CROSS JOIN top1 t
    WHERE rank <= 20
    """,
)
def t42_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One training step of byte-pair encoding at corpus scale
    (operators/text.py bpe_word_freq + bpe_merge_step — Sennrich et
    al. 2016): tokenize once into a distinct-word frequency table,
    count adjacent symbol pairs weighted by freq, merge the top pair
    leftmost-non-overlapping into every word, and report the top-20
    post-merge pair counts plus the chosen merge. The corpus is
    touched exactly once; the merge step itself is vocabulary-scale
    window algebra (|vocab| x max_word_len rows), which is why BPE
    training is tractable at 100 TB — and why the sequential-looking
    'apply the merge left to right' rule had to be re-expressed as
    run-parity over consecutive match positions so both Catalyst and
    the SQL oracle compute it relationally."""
    from ..operators.text import bpe_merge_step, bpe_word_freq

    docs = load(spark, sf_dir, "documents")
    pairs = bpe_merge_step(bpe_word_freq(docs))
    # Top-20 selection FIRST via orderBy+limit (TakeOrderedAndProject:
    # per-partition heaps + a 20-row merge — the
    # partitioning.py:skew_report discipline), then rank only the 20
    # survivors. On a real corpus the pair table is vocabulary-scale
    # (~1e8 rows); ranking it with a global row_number window would
    # drag all of it through one executor. The rank over the SURVIVORS
    # is an unpartitioned row_number window — but its input is 20 rows
    # by construction, so the single-partition sort is free, and
    # unlike monotonically_increasing_id over the limit's output it
    # depends only on the window API contract, not on
    # TakeOrderedAndProject emitting one partition in sorted order
    # (a physical-plan detail AQE is allowed to change).
    sort_exprs = [
        F.col("cnt").desc(), F.col("left_sym"), F.col("right_sym")
    ]
    return (
        bounded_rank_topk(pairs, sort_exprs, 20)
        .select(
            "rank", "left_sym", "right_sym", "cnt",
            "merged_left", "merged_right",
        )
    )


@query(
    "t43_bigram_novelty_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(ws, 1) AS pos,
             unnest(ws) AS w
      FROM (SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
            FROM documents) t),
    bg AS (
      SELECT doc_id, w || ' ' || w2 AS bigram
      FROM (SELECT doc_id, w,
                   LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks) t
      WHERE w2 IS NOT NULL),
    cnts AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bg GROUP BY bigram)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN cnt <= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rare,
           ROUND(CAST(SUM(CASE WHEN cnt <= 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM bg JOIN cnts USING (bigram)
    GROUP BY doc_id
    """,
)
def t43_bigram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical quality scoring via corpus bigram rarity
    (operators/text.py bigram_novelty): each document's fraction of
    corpus-hapax bigrams — the deterministic stand-in for the
    KenLM-perplexity filter in public pretraining pipelines (CCNet's
    LM scoring, Gopher's repetition/quality rules): boilerplate
    scores near 0, gibberish near 1. Count-ratio arithmetic only
    (one division, one round), so the oracle is exact where a
    log-prob score would depend on libm. Two bigram-keyed passes
    share one exchange; the per-doc fold is the only other shuffle."""
    from ..operators.text import bigram_novelty

    docs = load(spark, sf_dir, "documents")
    return bigram_novelty(docs)


@query(
    "m6_media_dedup_clusters",
    oracle="""
    WITH RECURSIVE frames AS (
      SELECT DISTINCT doc_id AS media_id,
             md5(substring(text, off + 1, 256)) AS fmd5
      FROM (SELECT doc_id, text,
                   UNNEST(range(0, length(text), 256)) AS off
            FROM documents)
    ),
    sizes AS (
      SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames
      FROM frames GROUP BY media_id
    ),
    shared AS (
      SELECT a.media_id AS lo, b.media_id AS hi,
             CAST(COUNT(*) AS BIGINT) AS shared_frames
      FROM frames a JOIN frames b
        ON b.fmd5 = a.fmd5 AND a.media_id < b.media_id
      GROUP BY a.media_id, b.media_id
    ),
    pairs AS (
      SELECT lo, hi FROM shared
      JOIN sizes sa ON sa.media_id = lo
      JOIN sizes sb ON sb.media_id = hi
      WHERE ROUND(CAST(shared_frames AS DOUBLE)
                  / (sa.n_frames + sb.n_frames - shared_frames), 6) >= 0.3
    ),
    edges AS (
      SELECT lo AS src, hi AS dst FROM pairs
      UNION SELECT hi, lo FROM pairs
    ),
    reach AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
    ),
    clusters AS (
      SELECT node AS media_id, MIN(r) AS cluster_id
      FROM reach GROUP BY node
    )
    SELECT c.media_id, c.cluster_id, s.n_frames,
           CAST(c.media_id = (
             SELECT c2.media_id FROM clusters c2
             JOIN sizes s2 ON s2.media_id = c2.media_id
             WHERE c2.cluster_id = c.cluster_id
             ORDER BY s2.n_frames DESC, c2.media_id LIMIT 1
           ) AS BOOLEAN) AS is_canonical
    FROM clusters c JOIN sizes s ON s.media_id = c.media_id
    """,
)
def m6_media_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end media dedup: frame-overlap pairs (m5's operator) at
    frame-Jaccard >= 0.3 close into CLUSTERS via min-label connected
    components, and each cluster elects one CANONICAL medium (most
    sampled frames, then min id — 'keep the most complete copy', the
    video-dedup analog of t24's quality-aware canonical pick). The
    keep/drop decision is transitive: a trimmed copy and a re-muxed
    copy of the same master land in ONE cluster with one survivor.
    Composes multimodal sampling, exact frame hashing, the iterative
    CC operator, and a window election — all verified against the
    recursive-CTE closure oracle. Every join moves (md5, media_id)
    or (media_id, label) narrow rows; frames never re-read."""
    from ..operators.graph import connected_components
    from ..operators.multimodal import (
        documents_as_media,
        frame_overlap_pairs,
    )

    media = documents_as_media(load(spark, sf_dir, "documents"))
    # the overlap pair table fans out into THREE consumers (cluster
    # edges + both sides of the size union); eager checkpoint
    # materializes the narrow pair rows once instead of re-running
    # the frame-hash overlap join per consumer (r16, guide §1.2)
    ov = frame_overlap_pairs(media).localCheckpoint(eager=True)
    pairs = ov.where(F.col("frame_jaccard") >= 0.3).select("lo", "hi")
    cl = connected_components(pairs, src_col="lo", dst_col="hi").select(
        F.col("node").alias("media_id"), "cluster_id"
    )
    sizes = ov.select(
        F.col("lo").alias("media_id"), F.col("n_lo").alias("n_frames")
    ).unionByName(
        ov.select(
            F.col("hi").alias("media_id"), F.col("n_hi").alias("n_frames")
        )
    ).groupBy("media_id").agg(F.max("n_frames").alias("n_frames"))
    j = cl.join(sizes, "media_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_frames").desc(), "media_id"
    )
    return j.withColumn(
        "is_canonical", F.row_number().over(w) == 1
    ).select("media_id", "cluster_id", "n_frames", "is_canonical")


@query(
    "t44_lsh_candidate_audit",
    oracle=f"""
    WITH {_o_t7_ctes(where=" WHERE doc_id < 1000")},
    ttok AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
    tinter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM ttok a JOIN ttok b ON b.g = a.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    tsizes AS (SELECT doc_id, len(s) AS n FROM sh),
    truth AS (
      SELECT id_a, id_b FROM tinter
      JOIN tsizes sa ON sa.doc_id = id_a
      JOIN tsizes sb ON sb.doc_id = id_b
      WHERE ROUND(n_inter * 1000000.0 / (sa.n + sb.n - n_inter))
            / 1000000.0 >= 0.3),
    tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tp
           FROM cand JOIN truth USING (id_a, id_b))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
           n_tp,
           ROUND(CAST(n_tp AS DOUBLE)
                 / (SELECT COUNT(*) FROM truth), 6) AS recall,
           ROUND(CAST(n_tp AS DOUBLE)
                 / (SELECT COUNT(*) FROM cand), 6) AS cand_precision
    FROM tp
    """,
)
def t44_lsh_candidate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality audit of MinHash LSH banding — the text-side
    mirror of sim18's ANN recall table: on a bounded corpus slice
    (doc_id < 1000, so the exact truth stays cheap at every sf), the
    EXACT shingle-Jaccard >= 0.3 pair set (inverted-index join, the
    scalable exact formulation — never all-pairs) is compared against
    the LSH band-collision CANDIDATE set. recall = how many true
    near-dup pairs banding surfaces at all (missed candidates are
    unrecoverable — verification can only discard); cand_precision =
    what fraction of surfaced candidates survive exact verification
    (the wasted-verification dial). These two numbers ARE the
    bands/rows tuning trade (Leskovec et al., MMDS ch.3), measured
    rather than assumed — same discipline sim18 applies to
    n_planes/nprobe. Count-ratio arithmetic, exact oracle."""
    from ..operators.dedup_fuzzy import lsh_band_table, ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    truth = ngram_jaccard_pairs(docs, [], k=3, threshold=0.3).select(
        "id_a", "id_b"
    )
    bt = lsh_band_table(docs)
    a = bt.select(
        F.col("id").alias("id_a"), "band_idx", "band_key"
    )
    b = bt.select(
        F.col("id").alias("id_b"), "band_idx", "band_key"
    )
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    tp = cand.join(truth, ["id_a", "id_b"])
    stats = (
        truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
        .crossJoin(
            cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        )
        .crossJoin(tp.agg(F.count(F.lit(1)).cast("long").alias("n_tp")))
    )
    return stats.select(
        "n_truth",
        "n_candidates",
        "n_tp",
        F.round(
            F.col("n_tp").cast("double") / F.col("n_truth"), 6
        ).alias("recall"),
        F.round(
            F.col("n_tp").cast("double") / F.col("n_candidates"), 6
        ).alias("cand_precision"),
    )


_T45_AGREE_SQL = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(16)
)


@query(
    "t45_minhash_estimator_calibration",
    oracle=f"""
    WITH {_o_t7_ctes(where=" WHERE doc_id < 1000")},
    pairsig AS (
      SELECT c.id_a, c.id_b,
             CAST({_T45_AGREE_SQL} AS BIGINT) AS agreement
      FROM cand c
      JOIN sig a ON a.doc_id = c.id_a
      JOIN sig b ON b.doc_id = c.id_b),
    px AS (
      SELECT c.id_a, c.id_b,
             CAST(ROUND(len(list_intersect(x.s, y.s)) * 1000000.0
                        / (len(x.s) + len(y.s)
                           - len(list_intersect(x.s, y.s))))
                  AS BIGINT) AS micro
      FROM cand c
      JOIN sh x ON x.doc_id = c.id_a
      JOIN sh y ON y.doc_id = c.id_b)
    SELECT agreement,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(agreement / 16.0, 6) AS est_jaccard,
           ROUND(CAST(SUM(micro) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS mean_exact_jaccard
    FROM pairsig JOIN px USING (id_a, id_b)
    GROUP BY agreement
    """,
)
def t45_minhash_estimator_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash as an ESTIMATOR, calibrated against truth: for every
    LSH candidate pair (bounded slice, as t44), signature agreement
    (matching components / 16 — the unbiased Jaccard estimator) is
    bucketed against the mean EXACT Jaccard of the bucket's pairs.
    A healthy signature family puts mean_exact_jaccard ~ est_jaccard
    per bucket; systematic bias here means the hash family or
    shingle size is wrong BEFORE any dedup decision depends on it —
    the estimator-calibration discipline t44/sim18 apply to
    candidate generation, applied to the similarity estimate itself.
    Exact-integer micro-Jaccard sums (never order-dependent double
    accumulation) keep the oracle bit-exact."""
    from ..operators.dedup_fuzzy import (
        lsh_band_table,
        minhash_signature_table,
    )

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    sig = minhash_signature_table(docs)
    bt = lsh_band_table(docs)
    cand = (
        bt.select(F.col("id").alias("id_a"), "band_idx", "band_key")
        .join(
            bt.select(F.col("id").alias("id_b"), "band_idx", "band_key"),
            ["band_idx", "band_key"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sig.select(
        F.col("id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)],
    )
    b = sig.select(
        F.col("id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)],
    )
    j = cand.join(a, "id_a").join(b, "id_b")
    agreement = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(16)
    ).cast("long")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size("sh_a") + F.size("sh_b") - inter
    micro = F.round(inter * F.lit(1000000.0) / uni).cast("long")
    scored = j.select(
        agreement.alias("agreement"), micro.alias("micro")
    )
    return scored.groupBy("agreement").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.col("agreement") / F.lit(16.0), 6).alias("est_jaccard"),
        F.round(
            F.sum("micro").cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000.0)),
            6,
        ).alias("mean_exact_jaccard"),
    ).select("agreement", "n_pairs", "est_jaccard", "mean_exact_jaccard")


@query(
    "m7_wav_decode_features",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
    samp AS (
      SELECT media_id, t.i AS i,
             ((media_id * 31 + t.i * 17) % 65536) - 32768 AS x
      FROM ids, generate_series(0, 2047) AS t(i)),
    nxt AS (
      SELECT media_id, x,
             LEAD(x) OVER (PARTITION BY media_id ORDER BY i) AS x1
      FROM samp)
    SELECT media_id,
           1 AS n_channels,
           16000 AS sample_rate,
           CAST(2048 AS BIGINT) AS n_samples,
           CAST(MAX(ABS(x)) AS BIGINT) AS peak,
           CAST(SUM(x * x) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN x * x1 < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings,
           ROUND(SQRT(CAST(SUM(x * x) AS DOUBLE) / 2048), 6) AS rms
    FROM nxt GROUP BY media_id
    """,
)
def m7_wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode under the value-hash gate — the query that
    retires the audio half of the long-standing 'decode is a guarded
    stub' gap: each id synthesizes a GENUINE RIFF/WAVE container
    (mono 16-bit PCM written by the stdlib ``wave`` encoder, samples
    = the analytic formula ((id*31 + i*17) % 65536) - 32768), the
    bytes round-trip through :func:`operators.multimodal.
    decode_wav_features` (a real container parse: fmt-chunk header
    fields + PCM frame extraction, Arrow-batched mapInPandas), and
    the decoded waveform's integer-exact features (peak, sum of
    squared samples, strict zero crossings) are checked against the
    oracle computing the SAME formula in pure SQL. RMS derives from
    the int64 sum_sq by one symmetric double sqrt. A header
    mis-parse, an endianness slip, or a dropped frame changes the
    integers and fails the hash — this is codec-level verification,
    not plumbing-shape verification. Image/video decode still raises
    CodecsUnavailableError (no PIL/av in the container)."""
    from ..operators.multimodal import decode_wav_features, synth_wav

    ids = load(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    ).select(F.col("doc_id").alias("media_id"))
    feats = decode_wav_features(synth_wav(ids))
    return feats.select(
        "media_id",
        "n_channels",
        "sample_rate",
        "n_samples",
        "peak",
        "sum_sq",
        "zero_crossings",
        F.round(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_samples")), 6
        ).alias("rms"),
    )


@query(
    "m8_bmp_decode_features",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
    px AS (
      SELECT media_id, y.i AS y, x.i AS x,
             (media_id * 7 + y.i * 13 + x.i * 5) % 256 AS r,
             (media_id * 11 + y.i * 3 + x.i * 17) % 256 AS g,
             (media_id * 23 + y.i * 19 + x.i * 29) % 256 AS b
      FROM ids,
           generate_series(0, 19) AS y(i),
           generate_series(0, 29) AS x(i))
    SELECT media_id,
           30 AS width,
           20 AS height,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS peak,
           CAST(SUM((y * 30 + x) * (r + 2 * g + 3 * b)) AS BIGINT)
             AS pos_weighted
    FROM px GROUP BY media_id
    """,
)
def m8_bmp_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the value-hash gate — the m7/WAV
    strategy applied to the image modality, retiring the LAST decode
    stub except video: each id synthesizes a GENUINE 24-bit
    uncompressed BMP (stdlib struct: file header + BITMAPINFOHEADER +
    bottom-up BGR rows padded to the 4-byte stride — width 30 forces
    2 real pad bytes per row), the bytes round-trip through
    :func:`operators.multimodal.decode_bmp_features` (a real
    container parse: header offsets, stride arithmetic, row-order
    flip, channel un-swizzle; Arrow-batched mapInPandas), and the
    decoded integer pixel features are checked against the oracle
    computing the same analytic pixel formula in pure SQL. The
    pos_weighted spatial checksum makes the three classic BMP decoder
    bugs (ignored stride padding, forgotten bottom-up order, BGR/RGB
    swap) each flip the hash — codec-level verification, not
    plumbing-shape verification. Video decode alone still raises
    CodecsUnavailableError (no av/torchvision in the container)."""
    from ..operators.multimodal import decode_bmp_features, synth_bmp

    ids = load(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    ).select(F.col("doc_id").alias("media_id"))
    return decode_bmp_features(synth_bmp(ids)).select(
        "media_id",
        "width",
        "height",
        "sum_r",
        "sum_g",
        "sum_b",
        "peak",
        "pos_weighted",
    )


@query(
    "m9_avi_decode_features",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < 150),
    px AS (
      SELECT media_id, t.i AS t, y.i AS y, x.i AS x,
             (media_id * 7 + t.i * 41 + y.i * 13 + x.i * 5) % 256 AS r,
             (media_id * 11 + t.i * 43 + y.i * 3 + x.i * 17) % 256 AS g,
             (media_id * 23 + t.i * 47 + y.i * 19 + x.i * 29) % 256 AS b
      FROM ids,
           generate_series(0, 2) AS t(i),
           generate_series(0, 11) AS y(i),
           generate_series(0, 17) AS x(i))
    SELECT media_id,
           3 AS n_frames,
           18 AS width,
           12 AS height,
           CAST(SUM(r + g + b) AS BIGINT) AS sum_all,
           CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS peak,
           CAST(SUM((t * 12 * 18 + y * 18 + x) * (r + 2 * g + 3 * b))
                AS BIGINT) AS time_weighted
    FROM px GROUP BY media_id
    """,
)
def m9_avi_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode under the value-hash gate — completing the
    m7 (WAV) / m8 (BMP) modality set, so NO decode path is a stub
    anymore: each id synthesizes a GENUINE AVI container (stdlib
    struct: RIFF('AVI ') with hdrl{avih, strl{strh vids/DIB, strf}}
    and a movi LIST of three '00db' uncompressed DIB frames, each
    bottom-up BGR with a 2-byte row pad), the bytes round-trip
    through :func:`operators.multimodal.decode_avi_features` (a real
    demux: RIFF chunk-tree walk, strf header parse, per-frame
    stride/row-order/channel decode; Arrow-batched mapInPandas), and
    the decoded spatiotemporal integer features are checked against
    the oracle computing the same analytic pixel formula in pure
    SQL. The time_weighted checksum covers FRAME ORDER on top of
    m8's spatial/channel axes — a demuxer that reorders, drops, or
    duplicates a frame fails the hash. CodecsUnavailableError now
    guards only entropy/DCT codecs (JPEG/H.264; PNG joined the
    decoded set in m10), the honest
    boundary for a container with no codec libraries."""
    from ..operators.multimodal import decode_avi_features, synth_avi

    ids = load(spark, sf_dir, "documents").where(
        F.col("doc_id") < 150
    ).select(F.col("doc_id").alias("media_id"))
    return decode_avi_features(synth_avi(ids)).select(
        "media_id",
        "n_frames",
        "width",
        "height",
        "sum_all",
        "peak",
        "time_weighted",
    )


@query(
    "m10_png_decode_features",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
    px AS (
      SELECT media_id, y.i AS y, x.i AS x,
             (media_id * 7 + y.i * 13 + x.i * 5) % 256 AS r,
             (media_id * 11 + y.i * 3 + x.i * 17) % 256 AS g,
             (media_id * 23 + y.i * 19 + x.i * 29) % 256 AS b,
             (media_id * 5 + y.i * 7 + x.i * 11) % 256 AS a
      FROM ids,
           generate_series(0, 19) AS y(i),
           generate_series(0, 29) AS x(i))
    SELECT media_id,
           30 AS width,
           20 AS height,
           CASE WHEN media_id % 2 = 0 THEN 3 ELSE 4 END AS n_channels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(CASE WHEN media_id % 2 = 1 THEN SUM(a) END AS BIGINT)
             AS sum_a,
           CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS peak,
           CAST(SUM((y * 30 + x) * (r + 2 * g + 3 * b)) AS BIGINT)
             AS pos_weighted
    FROM px GROUP BY media_id
    """,
)
def m10_png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-image decode under the value-hash gate — the
    first entropy-coded container in the m7/m8/m9 modality set (r14
    verdict ask #5): each id synthesizes a GENUINE PNG (stdlib zlib +
    struct: signature, CRC-stamped IHDR/IDAT/IEND, DEFLATE-compressed
    scanlines; even ids RGB, odd ids RGBA; scanline y filtered with
    type y%5 so ALL FIVE PNG filters appear in every file), the bytes
    round-trip through :func:`operators.multimodal.
    decode_png_features` (a real decode: chunk walk + CRC32 verify,
    inflate, per-row unfilter of None/Sub/Up/Average/Paeth; Arrow-
    batched mapInPandas), and the decoded integer pixel features are
    checked against the oracle computing the same analytic formula in
    pure SQL. The pos_weighted spatial checksum makes a wrong filter
    inverse, a dropped scanline, or an RGB/RGBA layout slip each flip
    the hash — codec-level verification of a COMPRESSED format.
    CodecsUnavailableError now guards only entropy/DCT codecs
    (JPEG/H.264) and exotic PNG shapes (palette/16-bit/interlaced)."""
    from ..operators.multimodal import decode_png_features, synth_png

    ids = load(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    ).select(F.col("doc_id").alias("media_id"))
    return decode_png_features(synth_png(ids)).select(
        "media_id",
        "width",
        "height",
        "n_channels",
        "sum_r",
        "sum_g",
        "sum_b",
        "sum_a",
        "peak",
        "pos_weighted",
    )


def _bpe_round_sql(r: int) -> str:
    """One round of the BPE training loop as DuckDB CTEs: pair counts
    over seq{r-1}, greedy top-1, run-parity leftmost-non-overlap
    application, position re-densification — the exact algebra of
    operators/text.py:bpe_train, generated per round so the t46
    oracle replays the WHOLE loop, not just one step."""
    p = r - 1
    return f""",
    pairs{r} AS (
      SELECT sym AS l, nxt AS r, SUM(freq) AS cnt
      FROM seq{p} WHERE nxt IS NOT NULL GROUP BY sym, nxt),
    top{r} AS (
      SELECT l AS mx, r AS my, CAST(cnt AS BIGINT) AS pair_cnt
      FROM pairs{r} ORDER BY cnt DESC, l, r LIMIT 1),
    matches{r} AS (
      SELECT s.word, s.i,
             s.i - ROW_NUMBER() OVER (PARTITION BY s.word ORDER BY s.i)
               AS grp
      FROM seq{p} s, top{r} t
      WHERE s.sym = t.mx AND s.nxt = t.my),
    kept{r} AS (
      SELECT word, i FROM (
        SELECT word, i,
               i - MIN(i) OVER (PARTITION BY word, grp) AS off
        FROM matches{r}) t
      WHERE off % 2 = 0),
    merged{r} AS (
      SELECT s.word, s.freq, s.i,
             CASE WHEN k1.i IS NOT NULL THEN s.sym || s.nxt
                  ELSE s.sym END AS sym
      FROM seq{p} s
      LEFT JOIN kept{r} k1 ON k1.word = s.word AND k1.i = s.i
      LEFT JOIN kept{r} k2 ON k2.word = s.word AND k2.i = s.i - 1
      WHERE k2.i IS NULL),
    resyms{r} AS (
      SELECT word, freq,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS i, sym
      FROM merged{r}),
    seq{r} AS (
      SELECT word, freq, i, sym,
             LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
      FROM resyms{r})"""


_T46_ROUNDS = 3

# Shared by t46 (training metrics) and t48 (corpus encode): the
# word-frequency fold, per-word char unroll, and the generated
# three-round greedy merge chain.
_BPE_LOOP_SQL = (
    """
    WITH wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+'))
              AS word
            FROM documents)
      WHERE LENGTH(word) BETWEEN 2 AND 20
      GROUP BY word),
    chars AS (
      SELECT word, freq, i, SUBSTRING(word, i, 1) AS sym
      FROM wf CROSS JOIN (SELECT UNNEST(RANGE(1, 21)) AS i)
      WHERE i <= LENGTH(word)),
    seq0 AS (
      SELECT word, freq, i, sym,
             LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
      FROM chars)"""
    + "".join(_bpe_round_sql(r) for r in range(1, _T46_ROUNDS + 1))
)

_T46_SQL = (
    _BPE_LOOP_SQL
    + "".join(
        f"""
    {"SELECT" if r == 1 else "UNION ALL SELECT"}
      CAST({r} AS BIGINT) AS round, t.mx AS merged_left,
      t.my AS merged_right, t.pair_cnt,
      (SELECT CAST(SUM(freq) AS BIGINT) FROM resyms{r})
        AS n_tokens_after
    FROM top{r} t"""
        for r in range(1, _T46_ROUNDS + 1)
    )
)


@query("t46_bpe_train_loop", oracle=_T46_SQL)
def t46_bpe_train_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE TRAINING LOOP (operators/text.py:bpe_train), three
    greedy rounds end-to-end under one oracle — the inference-side
    completion of t42's single step: each round learns the top pair
    and feeds the merged token back as a symbol for the next. The
    output is the learned merge table with per-round pair counts AND
    the weighted corpus token count after each application — a
    vocabulary-wide checksum: a merge applied to one word too few (or
    an overlap handled wrong) shifts n_tokens_after and fails the
    hash. The oracle is GENERATED (one CTE block per round), so the
    SQL replays the identical greedy loop rather than trusting the
    engine's round 1 and assuming induction. Corpus touched once;
    every round is vocabulary-scale window algebra chained through
    eager checkpoints (V merges = V bounded jobs, the CC lineage
    discipline)."""
    from ..operators.text import bpe_train, bpe_word_freq

    docs = load(spark, sf_dir, "documents")
    return bpe_train(bpe_word_freq(docs), rounds=_T46_ROUNDS)


_T48_SQL = (
    _BPE_LOOP_SQL
    + f""",
    wtok AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_bpe
      FROM resyms{_T46_ROUNDS} GROUP BY word),
    docwords AS (
      SELECT lang, word FROM (
        SELECT lang,
               UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+'))
                 AS word
        FROM documents)
      WHERE LENGTH(word) BETWEEN 2 AND 20)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words,
           CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / COUNT(*), 6)
             AS tokens_per_word
    FROM docwords JOIN wtok USING (word)
    GROUP BY lang"""
)


@query("t48_bpe_encode_corpus", oracle=_T48_SQL)
def t48_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY at corpus scale — the half of the BPE pipeline
    t46's training leaves open, and the op a training-data pipeline
    runs on every batch (token counting under the REAL learned
    vocabulary, for context budgeting and mixture weighting, not the
    whitespace proxy): train the same three greedy merges, ENCODE
    every distinct word with them (operators/text.py:
    bpe_token_counts — the final symbol table the training loop
    already carries), then re-attach per-word token counts to the
    corpus occurrences and report per language: occurrence count,
    distinct vocabulary, total BPE tokens, tokens/word. The oracle
    replays the identical loop (the t46 generated CTE chain) plus the
    encode join in pure SQL, so a single mis-merged word shifts
    n_bpe_tokens and fails the hash. Scale: corpus folded once to the
    vocab table, merges are vocabulary-sized, and the re-attach is a
    word-keyed join (broadcastable vocab at real scale) feeding a
    low-cardinality aggregate."""
    from ..operators.text import bpe_token_counts, bpe_word_freq

    docs = load(spark, sf_dir, "documents")
    toks = bpe_token_counts(bpe_word_freq(docs), rounds=_T46_ROUNDS)
    words = (
        docs.select(
            "lang",
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("word"),
        )
        .where(F.length("word").between(2, 20))
    )
    return (
        words.join(toks.select("word", "n_bpe"), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.countDistinct("word").cast("long").alias("n_distinct_words"),
            F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_bpe").cast("double") / F.count(F.lit(1)), 6
            ).alias("tokens_per_word"),
        )
    )


_T47_DIALS = (3, 4, 6, 10, 16, 25, 50)

_T47_SQL = f"""
    WITH dials(n) AS (VALUES (3), (4), (6), (10), (16), (25), (50)),
    base AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
    toksed AS (SELECT doc_id, {_O_TOKS} AS toks FROM base),
    variants AS (
      SELECT doc_id + n * 1000000 AS doc_id,
             array_to_string(
               list_transform(
                 toks,
                 (t, i) -> CASE WHEN (i - 1) % n = 0
                                THEN 'qzqzq' ELSE t END),
               ' ') AS text
      FROM toksed, dials),
    docs_src AS (
      SELECT doc_id, text FROM base
      UNION ALL SELECT doc_id, text FROM variants),
    {_o_t7_ctes(source="docs_src", threshold=0.0)},
    collide AS (
      SELECT DISTINCT a.doc_id AS id, b.doc_id // 1000000 AS n
      FROM stacked a JOIN stacked b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      WHERE a.doc_id < 1000000 AND b.doc_id >= 1000000
        AND b.doc_id % 1000000 = a.doc_id),
    jac AS (
      SELECT x.doc_id AS id, y.doc_id // 1000000 AS n,
             CAST(ROUND(len(list_intersect(x.s, y.s)) * 1000000.0
                        / (len(x.s) + len(y.s)
                           - len(list_intersect(x.s, y.s))))
                  AS BIGINT) AS micro
      FROM sh x JOIN sh y
        ON y.doc_id % 1000000 = x.doc_id
       AND x.doc_id < 1000000 AND y.doc_id >= 1000000)
    SELECT CAST(j.n AS BIGINT) AS dial_n,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(j.micro) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS mean_jaccard,
           CAST(SUM(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_caught,
           ROUND(SUM(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS catch_rate
    FROM jac j LEFT JOIN collide c ON c.id = j.id AND c.n = j.n
    GROUP BY j.n
    """


@query("t47_lsh_s_curve", oracle=_T47_SQL)
def t47_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EMPIRICAL LSH S-curve — the measurement t44 could not make:
    the fixture's true near-dups are all j≈1 clones, so banding recall
    at moderate similarity was argued from theory (docs/SCALE.md, LSH
    dial decision). This query MANUFACTURES mid-band pairs at
    controlled similarity: for each document and each dial n in
    {3,4,6,10,16,25,50}, a variant replaces every n-th whitespace token of
    the normalized text with a junk token, the original+variant corpus
    runs through the EXACT production MinHash/band machinery
    (operators/dedup_fuzzy.py, same 16-hash/4-band dials, same md5
    hash32), and each dial reports its mean exact shingle-Jaccard and
    the fraction of (original, variant) pairs that band-collide —
    catch probability as a function of similarity, measured on the
    production hash family rather than assumed from
    1-(1-j^r)^b. Everything is deterministic (mutation is a pure
    token-index function, identical in both engines), so the whole
    curve sits under the value hash. At 100 TB the synthesized corpus
    is 6x the audited slice — bounded by the slice, not the table."""
    from ..operators.dedup_fuzzy import lsh_band_table, shingled_docs
    from ..operators.text import normalize_text, whitespace_tokens

    base = load(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    ).select("doc_id", "text")
    toks = whitespace_tokens(normalize_text(F.col("text")))
    def _mut(n):
        return lambda t, i: F.when(
            i % F.lit(n) == 0, F.lit("qzqzq")
        ).otherwise(t)

    variants = None
    for n in _T47_DIALS:
        v = base.select(
            (F.col("doc_id") + F.lit(n * 1000000)).alias("doc_id"),
            F.array_join(F.transform(toks, _mut(n)), " ").alias("text"),
        )
        variants = v if variants is None else variants.unionByName(v)
    src = base.unionByName(variants)
    bt = lsh_band_table(src)
    a = bt.where(F.col("id") < 1000000).select(
        F.col("id").alias("id_a"),
        F.col("band_idx").alias("bi_a"),
        F.col("band_key").alias("bk_a"),
    )
    b = bt.where(F.col("id") >= 1000000).select(
        F.col("id").alias("id_b"),
        F.col("band_idx").alias("bi_b"),
        F.col("band_key").alias("bk_b"),
    )
    collide = (
        a.join(
            b,
            (F.col("bi_a") == F.col("bi_b"))
            & (F.col("bk_a") == F.col("bk_b"))
            & (F.col("id_b") % 1000000 == F.col("id_a")),
        )
        .select(
            F.col("id_a").alias("id"),
            F.floor(F.col("id_b") / F.lit(1000000)).cast("long").alias("n"),
        )
        .distinct()
        .withColumn("caught", F.lit(1))
    )
    sh = shingled_docs(src)
    x = sh.where(F.col("id") < 1000000).select(
        F.col("id").alias("id"), F.col("sh").alias("s_x")
    )
    y = sh.where(F.col("id") >= 1000000).select(
        F.col("id").alias("yid"), F.col("sh").alias("s_y")
    )
    inter = F.size(F.array_intersect("s_x", "s_y"))
    uni = F.size("s_x") + F.size("s_y") - inter
    jac = (
        x.join(y, F.col("yid") % 1000000 == F.col("id"))
        .select(
            "id",
            F.floor(F.col("yid") / F.lit(1000000)).cast("long").alias("n"),
            F.round(inter * F.lit(1000000.0) / uni)
            .cast("long")
            .alias("micro"),
        )
    )
    return (
        jac.join(collide, ["id", "n"], "left")
        .groupBy(F.col("n").cast("long").alias("dial_n"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum("micro").cast("double")
                / (F.count(F.lit(1)) * F.lit(1000000.0)),
                6,
            ).alias("mean_jaccard"),
            F.sum(F.coalesce(F.col("caught"), F.lit(0)))
            .cast("long")
            .alias("n_caught"),
            F.round(
                F.sum(F.coalesce(F.col("caught"), F.lit(0)))
                * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("catch_rate"),
        )
    )


_T49_TERMS = ("window", "merge", "customer")

_T49_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w
      FROM documents),
    tf AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE LENGTH(w) >= 2 GROUP BY w, doc_id),
    dfreq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id,
             SUM(tf.tf * ((n.n_docs * 1000000) // dfreq.df)) AS score,
             COUNT(*) AS n_terms
      FROM tf JOIN dfreq USING (w) CROSS JOIN n
      WHERE tf.w IN {str(tuple(_T49_TERMS))}
      GROUP BY tf.doc_id),
    top AS (
      SELECT doc_id, CAST(score AS BIGINT) AS score
      FROM scored WHERE n_terms = {len(_T49_TERMS)}
      ORDER BY score DESC, doc_id LIMIT 20)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, score
    FROM top
    """


@query("t49_inverted_index_search", oracle=_T49_SQL)
def t49_inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive corpus search through an inverted index — the
    'find documents containing ALL of [terms], best first' path a
    curation/decontamination workflow runs interactively: postings =
    per-(term, doc) term frequencies (one tokenize + one shuffle —
    the same fold every t-family query starts from), document
    frequency per term, and an EXACT integer tf-idf score
    (tf x (N_docs*1e6 DIV df) — floor division, so Spark and DuckDB
    agree bit-for-bit; float idf logs differ in ulps across engines).
    Only docs matching every query term survive (n_terms = k), top-20
    by (score desc, doc_id) selected via TakeOrderedAndProject, then
    ranked with a 20-row window (the t42 discipline — no global
    sort). At 100 TB the postings table IS the index: build it once
    as a snapshot table bucketed by term, and each query is a k-way
    semi-join on term keys over posting-list-sized data, never a
    corpus scan."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"),
    ).where(F.length("w") >= 2)
    tf = toks.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.where(F.col("w").isin(*_T49_TERMS))
        .join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.expr("(n_docs * 1000000) div df")
            ).cast("long").alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .where(F.col("n_terms") == len(_T49_TERMS))
    )
    sort_exprs = [F.col("score").desc(), F.col("doc_id")]
    return (
        bounded_rank_topk(scored, sort_exprs, 20)
        .select("rank", "doc_id", "score")
    )


_T50_QUERIES = {"qa": ("scan", "sort", "table"), "qb": ("stream", "batch")}


def _t50_one_sql(qid: str, terms: tuple) -> str:
    return f"""
    sc_{qid} AS (
      SELECT tf.doc_id,
             SUM(tf.tf * ((n.n_docs * 1000000) // dfreq.df)) AS score,
             COUNT(*) AS n_terms
      FROM tf JOIN dfreq USING (w) CROSS JOIN n
      WHERE tf.w IN {str(tuple(terms)) if len(terms) > 1 else f"('{terms[0]}')"}
      GROUP BY tf.doc_id),
    top_{qid} AS (
      SELECT doc_id, CAST(score AS BIGINT) AS score
      FROM sc_{qid} WHERE n_terms = {len(terms)}
      ORDER BY score DESC, doc_id LIMIT 10),
    r_{qid} AS (
      SELECT '{qid}' AS query_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                  AS BIGINT) AS rank,
             doc_id, score
      FROM top_{qid})"""


_T50_SQL = (
    """
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w
      FROM documents),
    tf AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE LENGTH(w) >= 2 GROUP BY w, doc_id),
    dfreq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),"""
    + ",".join(_t50_one_sql(q, t) for q, t in _T50_QUERIES.items())
    + """
    SELECT * FROM r_qa UNION ALL SELECT * FROM r_qb
    """
)


@query("t50_persisted_postings_search", oracle=_T50_SQL)
def t50_persisted_postings_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The index/query SPLIT behind t49, made physical: the postings
    (term, doc, tf), document frequencies, and corpus size are built
    ONCE and committed as snapshot tables (the fixture — the corpus
    is tokenized exactly once), then TWO conjunctive queries are
    served purely from the PERSISTED index: the term predicate pushes
    down into the postings parquet scan (PushedFilters on w — at
    100 TB each query reads posting-list-sized data, never the
    corpus), scores are the same exact integer tf-idf as t49, and
    each query's top-10 flows through TakeOrderedAndProject before a
    10-row ranking window. Build once / query many is what makes
    interactive corpus search affordable: the build cost amortizes
    over every future query, exactly as p27's bloom index amortizes
    point lookups. The oracle recomputes the index inline — the
    persisted tables must be indistinguishable from the inline
    computation."""
    import shutil
    import tempfile
    from functools import reduce

    from ..operators.snapshots import snapshot_read, snapshot_write
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="t50_idx_")
    try:
        with fixture_phase():  # the one-time index build
            toks = docs.select(
                "doc_id",
                F.explode(
                    F.split(F.lower(F.col("text")), "[^a-z]+")
                ).alias("w"),
            ).where(F.length("w") >= 2)
            tf = toks.groupBy("w", "doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("tf")
            )
            snapshot_write(spark, tmp + "/postings", tf)
            snapshot_write(
                spark,
                tmp + "/dfreq",
                tf.groupBy("w").agg(
                    F.count(F.lit(1)).cast("long").alias("df")
                ),
            )
            snapshot_write(
                spark,
                tmp + "/meta",
                docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
            )
        postings = snapshot_read(spark, tmp + "/postings")
        dfreq = snapshot_read(spark, tmp + "/dfreq")
        n_docs = snapshot_read(spark, tmp + "/meta")
        outs = []
        for qid, terms in _T50_QUERIES.items():
            scored = (
                postings.where(F.col("w").isin(*terms))
                .join(dfreq.where(F.col("w").isin(*terms)), "w")
                .crossJoin(F.broadcast(n_docs))
                .groupBy("doc_id")
                .agg(
                    F.sum(
                        F.col("tf") * F.expr("(n_docs * 1000000) div df")
                    ).cast("long").alias("score"),
                    F.count(F.lit(1)).alias("n_terms"),
                )
                .where(F.col("n_terms") == len(terms))
            )
            se = [F.col("score").desc(), F.col("doc_id")]
            outs.append(
                bounded_rank_topk(scored, se, 10)
                .select(
                    F.lit(qid).alias("query_id"), "rank", "doc_id", "score"
                )
            )
        out = reduce(lambda a, b: a.unionByName(b), outs)
        from ..catalog import pin_result

        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# t51/t52/t53: the postings index grows into a real search surface —
# incremental maintenance (append a document increment WITHOUT
# re-tokenizing the corpus), disjunctive OR-scoring, and positional
# phrase matching. All three serve queries from PERSISTED snapshot
# tables with the term predicate pushed into the parquet scan, so at
# 100 TB a query reads posting-list-sized data, never the corpus.
# ---------------------------------------------------------------------------

_T51_TERMS = ("merge", "stream", "filter")

_T51_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w
      FROM documents),
    tf AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE LENGTH(w) >= 2 GROUP BY w, doc_id),
    dfreq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id,
             SUM(tf.tf * ((n.n_docs * 1000000) // dfreq.df)) AS score,
             COUNT(*) AS n_terms
      FROM tf JOIN dfreq USING (w) CROSS JOIN n
      WHERE tf.w IN {str(tuple(_T51_TERMS))}
      GROUP BY tf.doc_id),
    top AS (
      SELECT doc_id, CAST(score AS BIGINT) AS score
      FROM scored WHERE n_terms = {len(_T51_TERMS)}
      ORDER BY score DESC, doc_id LIMIT 20)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, score
    FROM top
    """


@query("t51_postings_increment", oracle=_T51_SQL)
def t51_postings_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental postings-index maintenance under the driver hash:
    the base corpus (doc_id % 5 != 0) is indexed as the fixture; the
    TIMED operator is :func:`postings_increment` absorbing the %5
    increment — append posting rows, CoW-merge df deltas, bump
    n_docs — followed by a conjunctive search served purely from the
    persisted index. The oracle recomputes the index inline over the
    COMPOSED corpus, so one missed posting row, one stale df, or a
    wrong n_docs shifts the integer tf-idf and fails the value hash.
    Completes the t50 story the way sim20 completed IVF: build once,
    query many, and APPEND without rebuilding."""
    import shutil
    import tempfile

    from ..catalog import pin_result
    from ..operators.snapshots import snapshot_read, snapshot_write
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    incr = docs.where(F.col("doc_id") % 5 == 0)
    tmp = tempfile.mkdtemp(prefix="t51_idx_")
    try:
        with fixture_phase():  # one-time BASE index build
            tf = tokenize_tf(base)
            snapshot_write(spark, tmp + "/postings", tf)
            snapshot_write(
                spark,
                tmp + "/dfreq",
                tf.groupBy("w").agg(
                    F.count(F.lit(1)).cast("long").alias("df")
                ),
            )
            snapshot_write(
                spark,
                tmp + "/meta",
                base.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
            )
        postings_increment(
            spark,
            tmp,
            incr,
            docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
        )
        postings = snapshot_read(spark, tmp + "/postings")
        dfreq = snapshot_read(spark, tmp + "/dfreq")
        n_docs = snapshot_read(spark, tmp + "/meta")
        terms = _T51_TERMS
        scored = (
            postings.where(F.col("w").isin(*terms))
            .join(dfreq.where(F.col("w").isin(*terms)), "w")
            .crossJoin(F.broadcast(n_docs))
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.col("tf") * F.expr("(n_docs * 1000000) div df")
                ).cast("long").alias("score"),
                F.count(F.lit(1)).alias("n_terms"),
            )
            .where(F.col("n_terms") == len(terms))
        )
        se = [F.col("score").desc(), F.col("doc_id")]
        out = (
            bounded_rank_topk(scored, se, 20)
            .select("rank", "doc_id", "score")
        )
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_T52_TERMS = ("vector", "merge", "customer")

_T52_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w
      FROM documents),
    tf AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE LENGTH(w) >= 2 GROUP BY w, doc_id),
    dfreq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_matched,
             CAST(SUM(tf.tf * ((n.n_docs * 1000000) // dfreq.df))
                  AS BIGINT) AS score
      FROM tf JOIN dfreq USING (w) CROSS JOIN n
      WHERE tf.w IN {str(tuple(_T52_TERMS))}
      GROUP BY tf.doc_id),
    top AS (
      SELECT doc_id, n_matched, score
      FROM scored
      ORDER BY n_matched DESC, score DESC, doc_id LIMIT 20)
    SELECT CAST(ROW_NUMBER() OVER
                (ORDER BY n_matched DESC, score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, n_matched, score
    FROM top
    """


def search_disjunctive(
    postings: DataFrame,
    dfreq: DataFrame,
    n_docs: DataFrame,
    terms: tuple,
    k: int = 20,
) -> DataFrame:
    """OR-scored top-k over a postings index: (rank, doc_id,
    n_matched, score) ranked by (matched-term count DESC, integer
    tf-idf DESC, doc_id). The isin term predicate sits directly over
    the postings relation so it pushes into a persisted parquet scan
    (plan-pinned in tests/test_plans.py); top-k flows through
    TakeOrderedAndProject before a k-row ranking window."""
    scored = (
        postings.where(F.col("w").isin(*terms))
        .join(dfreq.where(F.col("w").isin(*terms)), "w")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(
                F.col("tf") * F.expr("(n_docs * 1000000) div df")
            ).cast("long").alias("score"),
        )
    )
    se = [
        F.col("n_matched").desc(),
        F.col("score").desc(),
        F.col("doc_id"),
    ]
    return (
        bounded_rank_topk(scored, se, k)
        .select("rank", "doc_id", "n_matched", "score")
    )


@query("t52_disjunctive_search", oracle=_T52_SQL)
def t52_disjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive (OR) search on the persisted postings index: docs
    matching ANY query term, ranked by (matched-term count DESC,
    integer tf-idf DESC, doc_id) — the standard best-match tiering a
    real search surface serves beyond pure conjunction (a doc hitting
    all three terms outranks any two-term doc regardless of tf). The
    index build is the fixture (t50's layout); the query reads ONLY
    the three terms' posting lists (isin pushed into the parquet
    scan — plan-pinned in tests/test_plans.py), aggregates exact
    integers, and ranks 20 survivors with a bounded window. The t49
    conjunctive path is this plan plus a HAVING n=k filter; dropping
    the filter is what makes the n_matched tier meaningful."""
    import shutil
    import tempfile

    from ..catalog import pin_result
    from ..operators.snapshots import snapshot_read, snapshot_write
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="t52_idx_")
    try:
        with fixture_phase():
            tf = tokenize_tf(docs)
            snapshot_write(spark, tmp + "/postings", tf)
            snapshot_write(
                spark,
                tmp + "/dfreq",
                tf.groupBy("w").agg(
                    F.count(F.lit(1)).cast("long").alias("df")
                ),
            )
            snapshot_write(
                spark,
                tmp + "/meta",
                docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
            )
        out = search_disjunctive(
            snapshot_read(spark, tmp + "/postings"),
            snapshot_read(spark, tmp + "/dfreq"),
            snapshot_read(spark, tmp + "/meta"),
            _T52_TERMS,
        )
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_T53_PHRASES = {"qa": ("fast", "scan"), "qb": ("table", "window")}


def _t53_one_sql(qid: str, phrase: tuple) -> str:
    return f"""
    ph_{qid} AS (
      SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.w = '{phrase[0]}' AND b.w = '{phrase[1]}'
      GROUP BY a.doc_id),
    top_{qid} AS (
      SELECT doc_id, n_occ FROM ph_{qid}
      ORDER BY n_occ DESC, doc_id LIMIT 20),
    r_{qid} AS (
      SELECT '{qid}' AS query_id,
             CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, doc_id)
                  AS BIGINT) AS rank,
             doc_id, n_occ
      FROM top_{qid})"""


_T53_SQL = (
    """
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w,
             generate_subscripts(
               regexp_split_to_array(LOWER(text), '[^a-z]+'), 1) - 1
               AS pos
      FROM documents),
    pos AS (SELECT doc_id, w, pos FROM toks WHERE LENGTH(w) >= 2),"""
    + ",".join(_t53_one_sql(q, p) for q, p in _T53_PHRASES.items())
    + """
    SELECT * FROM r_qa UNION ALL SELECT * FROM r_qb
    """
)


def search_phrase(
    pos: DataFrame, w1: str, w2: str, k: int = 20
) -> DataFrame:
    """Exact adjacent-position phrase count over a positions index:
    (rank, doc_id, n_occ) top-k by (n_occ DESC, doc_id). Each term's
    equality predicate sits directly over the positions relation so
    it pushes into a persisted parquet scan; adjacency is a join on
    (doc_id, offset)."""
    a = pos.where(F.col("w") == w1).select(
        "doc_id", F.col("pos").alias("p")
    )
    b = pos.where(F.col("w") == w2).select(
        "doc_id", (F.col("pos") - 1).alias("p")
    )
    occ = (
        a.join(b, ["doc_id", "p"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    se = [F.col("n_occ").desc(), F.col("doc_id")]
    return (
        bounded_rank_topk(occ, se, k)
        .select("rank", "doc_id", "n_occ")
    )


@query("t53_phrase_search", oracle=_T53_SQL)
def t53_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search on a persisted POSITIONS index: the
    postings grow a token-offset column (doc_id, w, pos — posexplode
    over the same tokenizer, so offsets are byte-for-byte the t49
    token stream's), committed once as the fixture; each phrase query
    reads ONLY its two terms' position lists (isin pushed into the
    scan), self-joins on (doc_id, adjacent position) to count exact
    phrase occurrences, and ranks 20 survivors with a bounded window.
    Adjacency is over RAW token offsets, so filtered-out short tokens
    (length < 2) leave gaps a phrase cannot bridge — both engines
    index the same raw split array (DuckDB: generate_subscripts;
    Spark: posexplode), which the value hash pins. At 100 TB the
    position lists for two terms are a vanishing fraction of the
    corpus; the join key (doc_id, pos) is high-cardinality and
    skew-free by construction."""
    import shutil
    import tempfile
    from functools import reduce

    from ..catalog import pin_result
    from ..operators.snapshots import snapshot_read, snapshot_write
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="t53_idx_")
    try:
        with fixture_phase():  # one-time positions-index build
            positions = docs.select(
                "doc_id",
                F.posexplode(
                    F.split(F.lower(F.col("text")), "[^a-z]+")
                ).alias("pos", "w"),
            ).where(F.length("w") >= 2)
            snapshot_write(spark, tmp + "/positions", positions)
        pos = snapshot_read(spark, tmp + "/positions")
        outs = [
            search_phrase(pos, w1, w2).select(
                F.lit(qid).alias("query_id"), "rank", "doc_id", "n_occ"
            )
            for qid, (w1, w2) in _T53_PHRASES.items()
        ]
        out = reduce(lambda x, y: x.unionByName(y), outs)
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_T54_TERMS = ("query", "join", "batch")

# Exact-integer BM25 (k1 = 1.2, b = 0.75): the standard
#   idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# cross-multiplied until every quantity is an integer. With
# TL = total corpus tokens and N = doc count (so avgdl = TL/N),
# k1 = 6/5 and b = 3/4 give
#   score = idf * 44*TL*tf // (20*TL*tf + 6*TL + 18*dl*N)
# — one integer floor division per (term, doc), products bounded by
# ~1e22 (inside DECIMAL(38,0) / HUGEINT on both engines), quotient
# ~2.2*idf (inside int64). Both engines compute it bit-for-bit; a
# float BM25 would differ in ulps and fail the driver's value hash.
_T54_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w
      FROM documents),
    tf AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE LENGTH(w) >= 2 GROUP BY w, doc_id),
    dl AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    dfreq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    meta AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             (SELECT CAST(SUM(tf) AS BIGINT) FROM tf) AS tl
      FROM documents),
    scored AS (
      SELECT tf.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_matched,
             CAST(SUM(
               (CAST((meta.n_docs * 1000000) // dfreq.df AS HUGEINT)
                  * 44 * meta.tl * tf.tf)
               // (CAST(20 AS HUGEINT) * meta.tl * tf.tf
                   + CAST(6 AS HUGEINT) * meta.tl
                   + CAST(18 AS HUGEINT) * dl.dl * meta.n_docs)
             ) AS BIGINT) AS score
      FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id) CROSS JOIN meta
      WHERE tf.w IN {str(tuple(_T54_TERMS))}
      GROUP BY tf.doc_id),
    top AS (
      SELECT doc_id, n_matched, score
      FROM scored ORDER BY score DESC, doc_id LIMIT 20)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, n_matched, score
    FROM top
    """


def search_bm25(
    postings: DataFrame,
    dfreq: DataFrame,
    meta: DataFrame,
    terms: tuple,
    k: int = 20,
) -> DataFrame:
    """BM25-ranked top-k over a postings index whose rows carry the
    document length (``w, doc_id, tf, dl`` — the denormalization real
    indexes use: the length norm travels WITH the posting, so a query
    touches posting lists only, never a per-document side table).
    Scores are the exact-integer BM25 above (k1=1.2, b=0.75 via
    cross-multiplied floor division over DECIMAL(38,0)); ranking is
    (score DESC, doc_id) with OR semantics and an n_matched column.
    The isin term predicate sits directly over the postings relation
    so it pushes into a persisted parquet scan; top-k flows through
    TakeOrderedAndProject before a k-row ranking window."""
    term_score = F.expr(
        "CAST((CAST((n_docs * 1000000) div df AS DECIMAL(38,0))"
        "      * 44 * tl * tf)"
        " div (CAST(20 AS DECIMAL(38,0)) * tl * tf"
        "      + 6 * tl + 18 * dl * n_docs) AS LONG)"
    )
    scored = (
        postings.where(F.col("w").isin(*terms))
        .join(dfreq.where(F.col("w").isin(*terms)), "w")
        .crossJoin(F.broadcast(meta))
        .select("doc_id", term_score.alias("ts"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("ts").cast("long").alias("score"),
        )
    )
    se = [F.col("score").desc(), F.col("doc_id")]
    return (
        bounded_rank_topk(scored, se, k)
        .select("rank", "doc_id", "n_matched", "score")
    )


@query("t54_bm25_search", oracle=_T54_SQL)
def t54_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking on the persisted postings index — the scoring
    model every production search surface actually serves (tf
    saturation via k1, document-length normalization via b), made
    EXACT: k1=1.2, b=0.75 cross-multiplied into one integer floor
    division per (term, doc), so Spark and DuckDB agree bit-for-bit
    where a float BM25 would drift in ulps (the same strategy as
    t49's integer tf-idf; the idf family is shared). The index build
    is the fixture, in t50's layout with one change that IS the
    point: posting rows carry the document length (w, doc_id, tf,
    dl), the denormalization real BM25 indexes use, so the query
    reads ONLY the three terms' posting lists — no per-document
    norms join, no corpus scan. Scores aggregate per doc with OR
    semantics (n_matched reported), top-20 by (score DESC, doc_id)
    through TakeOrderedAndProject, ranked by a 20-row window.

    vs t49/t52's raw tf-idf: a 10-occurrence term in a short doc no
    longer drowns a 3-term match in a long one — tf saturates at
    (k1+1)*idf and long docs pay 18*dl*N in the denominator. At
    100 TB: build once, query many; per-query cost tracks posting
    lists exactly as t50 measured (sub-1x query-side at 10x data)."""
    import shutil
    import tempfile

    from ..catalog import pin_result
    from ..operators.snapshots import snapshot_read, snapshot_write
    from ..operators.text import tokenize_tf
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="t54_idx_")
    try:
        with fixture_phase():  # one-time index build (t50 layout + dl)
            tf = tokenize_tf(docs)
            dl = tf.groupBy("doc_id").agg(
                F.sum("tf").cast("long").alias("dl")
            )
            snapshot_write(spark, tmp + "/postings", tf.join(dl, "doc_id"))
            snapshot_write(
                spark,
                tmp + "/dfreq",
                tf.groupBy("w").agg(
                    F.count(F.lit(1)).cast("long").alias("df")
                ),
            )
            meta = docs.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs")
            ).crossJoin(
                tf.agg(F.sum("tf").cast("long").alias("tl"))
            )
            snapshot_write(spark, tmp + "/meta", meta)
        out = search_bm25(
            snapshot_read(spark, tmp + "/postings"),
            snapshot_read(spark, tmp + "/dfreq"),
            snapshot_read(spark, tmp + "/meta"),
            _T54_TERMS,
        )
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query("t55_bm25_incremental_index", oracle=_T54_SQL)
def t55_bm25_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL maintenance of the BM25 index — t54's build-once
    story absorbed a crawl batch the way t51 did for t50: the base
    corpus (doc_id % 5 != 0) is indexed as the fixture, then the
    increment (the % 5 == 0 slice) lands through
    operators/text.py:bm25_increment — tokenize ONLY the increment,
    APPEND its posting rows (base files carry by reference),
    CoW-merge the per-term df deltas (only touched vocabulary files
    rewrite), and roll the two corpus statistics BM25 needs (n_docs,
    total tokens) forward as one 1-row overwrite. The oracle is
    t54's chain over the WHOLE corpus verbatim: the hash holds only
    if the incremented index is bit-indistinguishable from a full
    rebuild — a stale df, a missed dl, or a drifted tl all shift the
    integer scores. At 100 TB a daily batch costs the increment's
    tokenize plus the touched vocab slice, never a corpus re-index —
    and the length-normalization statistics stay exact, where a
    production system would let avgdl drift and re-anchor at the
    next rebuild."""
    import shutil
    import tempfile

    from ..catalog import pin_result
    from ..operators.snapshots import snapshot_read, snapshot_write
    from ..operators.text import bm25_increment, tokenize_tf
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    incr = docs.where(F.col("doc_id") % 5 == 0)
    tmp = tempfile.mkdtemp(prefix="t55_idx_")
    try:
        with fixture_phase():  # the pre-existing index is the fixture
            tf = tokenize_tf(base)
            dl = tf.groupBy("doc_id").agg(
                F.sum("tf").cast("long").alias("dl")
            )
            snapshot_write(spark, tmp + "/postings", tf.join(dl, "doc_id"))
            snapshot_write(
                spark,
                tmp + "/dfreq",
                tf.groupBy("w").agg(
                    F.count(F.lit(1)).cast("long").alias("df")
                ),
            )
            snapshot_write(
                spark,
                tmp + "/meta",
                base.agg(
                    F.count(F.lit(1)).cast("long").alias("n_docs")
                ).crossJoin(tf.agg(F.sum("tf").cast("long").alias("tl"))),
            )
        # the operator under test: absorb the increment, then search
        bm25_increment(spark, tmp, incr)
        out = search_bm25(
            snapshot_read(spark, tmp + "/postings"),
            snapshot_read(spark, tmp + "/dfreq"),
            snapshot_read(spark, tmp + "/meta"),
            _T54_TERMS,
        )
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_T56_TERMS = ("stream", "filter", "table")

_T56_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w
      FROM documents),
    tf AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE LENGTH(w) >= 2 GROUP BY w, doc_id),
    dfreq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_matched,
             CAST(SUM(tf.tf * ((n.n_docs * 1000000) // dfreq.df))
                  AS BIGINT) AS score
      FROM tf JOIN dfreq USING (w) CROSS JOIN n
      WHERE tf.w IN {str(tuple(_T56_TERMS))}
      GROUP BY tf.doc_id),
    top AS (
      SELECT doc_id, n_matched, score
      FROM scored
      ORDER BY n_matched DESC, score DESC, doc_id LIMIT 20)
    SELECT CAST(ROW_NUMBER() OVER
                (ORDER BY n_matched DESC, score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, n_matched, score
    FROM top
    """


@query("t56_incremented_disjunctive_search", oracle=_T56_SQL)
def t56_incremented_disjunctive_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OR-scored search served from an INCREMENTED postings index —
    t51's maintenance composed with t52's ranking: the base corpus
    (doc_id % 5 != 0) indexes as the fixture, postings_increment
    absorbs the %5 slice, and the disjunctive query runs purely from
    the persisted index. The oracle is the inline chain over the
    COMPOSED corpus — the matched-term tier makes this strictly
    harsher than t51's conjunctive check (a stale df on ANY of the
    three terms reorders the n_matched-then-score ranking)."""
    import shutil
    import tempfile

    from ..catalog import pin_result
    from ..operators.snapshots import snapshot_read, snapshot_write
    from ..operators.text import postings_increment, tokenize_tf
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    incr = docs.where(F.col("doc_id") % 5 == 0)
    tmp = tempfile.mkdtemp(prefix="t56_idx_")
    try:
        with fixture_phase():
            tf = tokenize_tf(base)
            snapshot_write(spark, tmp + "/postings", tf)
            snapshot_write(
                spark,
                tmp + "/dfreq",
                tf.groupBy("w").agg(
                    F.count(F.lit(1)).cast("long").alias("df")
                ),
            )
            snapshot_write(
                spark,
                tmp + "/meta",
                base.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
            )
        postings_increment(
            spark,
            tmp,
            incr,
            docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
        )
        out = search_disjunctive(
            snapshot_read(spark, tmp + "/postings"),
            snapshot_read(spark, tmp + "/dfreq"),
            snapshot_read(spark, tmp + "/meta"),
            _T56_TERMS,
        )
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_T57_PHRASE = ("data", "quality")

_T57_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) AS w,
             generate_subscripts(
               regexp_split_to_array(LOWER(text), '[^a-z]+'), 1) - 1
               AS pos
      FROM documents),
    pos AS (SELECT doc_id, w, pos FROM toks WHERE LENGTH(w) >= 2),
    ph AS (
      SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.w = '{_T57_PHRASE[0]}' AND b.w = '{_T57_PHRASE[1]}'
      GROUP BY a.doc_id),
    top AS (
      SELECT doc_id, n_occ FROM ph
      ORDER BY n_occ DESC, doc_id LIMIT 20)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, n_occ
    FROM top
    """


@query("t57_incremented_phrase_search", oracle=_T57_SQL)
def t57_incremented_phrase_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Phrase search served from an INCREMENTED positions index: the
    positions table (doc_id, w, pos) is the one index whose increment
    needs NO merge at all — token offsets are per-document, so a new
    document's rows simply APPEND (base files carry by reference; no
    df, no corpus statistic). The base corpus indexes as the fixture,
    the %5 slice appends, and t53's adjacency self-join runs from the
    persisted table with both term predicates pushed into the scan.
    Oracle = the inline positions chain over the composed corpus."""
    import shutil
    import tempfile

    from ..catalog import pin_result
    from ..operators.snapshots import snapshot_read, snapshot_write
    from .benchmeta import fixture_phase

    docs = load(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    incr = docs.where(F.col("doc_id") % 5 == 0)

    def positions_of(d: DataFrame) -> DataFrame:
        return d.select(
            "doc_id",
            F.posexplode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("pos", "w"),
        ).where(F.length("w") >= 2)

    tmp = tempfile.mkdtemp(prefix="t57_idx_")
    try:
        with fixture_phase():
            snapshot_write(spark, tmp + "/positions", positions_of(base))
        # the increment: one plain append, base files by reference
        snapshot_write(
            spark, tmp + "/positions", positions_of(incr), mode="append"
        )
        out = search_phrase(
            snapshot_read(spark, tmp + "/positions"), *_T57_PHRASE
        )
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# t58 — exact similarity join via prefix filtering (AllPairs/PPJoin)
# --------------------------------------------------------------------------


@query(
    "t58_prefix_filter_jaccard",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_o_shingles(3)} AS s FROM documents),
    tok AS (
      SELECT DISTINCT doc_id, t AS tok FROM sh, UNNEST(s) AS u(t)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    res AS (
      SELECT p.a_id, p.b_id, p.inter, sa.n + sb.n - p.inter AS uni
      FROM pair_inter p
      JOIN sizes sa ON sa.doc_id = p.a_id
      JOIN sizes sb ON sb.doc_id = p.b_id
    )
    SELECT a_id, b_id,
           CAST(inter AS BIGINT) AS inter,
           CAST(uni AS BIGINT) AS uni,
           CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jac
    FROM res WHERE inter * 5 >= uni * 3
    """,
)
def t58_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-Jaccard >= 0.6 similarity join with NO blocking
    key and NO probabilistic filter (operators/dedup_fuzzy.py:
    prefix_filter_jaccard_pairs — the AllPairs/PPJoin prefix filter,
    over the t6/t7 3-word-shingle convention): each document is
    indexed only by its p = n - ceil(0.6n) + 1 globally-RAREST
    shingles, so candidate generation touches rare-shingle postings
    only and template boilerplate never pairs anything. The ORACLE is
    the stronger claim: it computes GROUND TRUTH (every pair sharing
    ANY shingle, exact Jaccard, no filter), so the hash match proves
    the prefix filter is COMPLETE — zero false negatives — not merely
    self-consistent, while the Spark plan never materializes the
    all-pairs join the oracle can afford only at gate scale.

    Complements the dedup family: t6 is exact-but-blocked (needs a
    metadata key, quadratic inside a bucket), t7 is
    unblocked-but-probabilistic (LSH admits false negatives), t58 is
    exact AND unblocked — the right tool for high-threshold dedup of
    a single-language 100 TB corpus.

    Reference parity: transformation/clean_data.py:99-116's exact
    dedup, generalized to near-duplicate sets (same charter extension
    lineage as t6/t7)."""
    from ..operators.dedup_fuzzy import prefix_filter_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", tau_num=3, tau_den=5, shingle_k=3
    )
