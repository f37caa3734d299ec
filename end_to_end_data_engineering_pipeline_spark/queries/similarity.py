"""Similarity-search queries over the embeddings table (charter §2.12).

sim1 is the exact brute-force baseline with a full DuckDB oracle; the
1e-8 fixed-point dot product (operators/similarity.py) makes scores
bit-identical across engines. sim2 (LSH ANN) and sim3 (embedding
near-dup) compose the same scoring; sim2's recall is asserted against
sim1 in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load, pin_result
from ..operators.similarity import (
    SCALE,
    cosine_scaled,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    dot_scaled,
    with_scaled,
)
from .benchmeta import fixture_phase
from .registry import query

QUERY_IDS = [0, 1, 2, 3, 4]

# scaled-vector CTE fragment: (vec_id, sv BIGINT[], n2 BIGINT)
_O_SCALED = f"""
    scaled AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS sv
      FROM embeddings
    ),
    normed AS (
      SELECT vec_id, sv,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(sv) x)) AS BIGINT) AS n2
      FROM scaled
    )
"""

_O_DOT = "CAST((SELECT SUM(x * y) FROM (SELECT UNNEST(q.sv) x, UNNEST(c.sv) y)) AS BIGINT)"
_O_COS = (
    f"ROUND(CAST({_O_DOT} AS DOUBLE)"
    " / (SQRT(CAST(q.n2 AS DOUBLE)) * SQRT(CAST(c.n2 AS DOUBLE))), 6)"
)


@query(
    "sim1_cosine_topk_bruteforce",
    oracle=f"""
    WITH {_O_SCALED},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_O_COS} AS cosine
      FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0, 1, 2, 3, 4)
    )
    SELECT query_id, cand_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, cand_id) AS rk
          FROM scored) t
    WHERE rk <= 10
    """,
)
def sim1_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors against the full corpus."""
    emb = load(spark, sf_dir, "embeddings")
    out = cosine_topk_bruteforce(emb, QUERY_IDS, k=10)
    return out.withColumn("rk", F.col("rk").cast("long"))


def _o_lsh_sig(n_planes: int = 6, dim: int = 64) -> str:
    """SQL mirror of operators.similarity.lsh_signature: the plane
    components are deterministic ints (md5 recipe), embedded as list
    literals — identical to the literal arrays Spark ships in-plan."""
    from ..operators.similarity import hyperplane

    terms = []
    for p in range(n_planes):
        lit = "[" + ", ".join(str(c) for c in hyperplane(p, dim)) + "]"
        dot = f"(SELECT SUM(x * y) FROM (SELECT UNNEST(sv) x, UNNEST({lit}) y))"
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END")
    return " + ".join(terms)


_O_LSH_CTES = f"""sigd AS (SELECT vec_id, sv, n2,
                    CAST({_o_lsh_sig(6, 64)} AS BIGINT) AS sig
             FROM normed),
    lsh_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_O_COS} AS cosine
      FROM sigd q JOIN sigd c ON c.sig = q.sig AND c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0, 1, 2, 3, 4)
    ),
    lsh_ranked AS (
      SELECT query_id, cand_id, cosine, rk
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, cand_id) AS rk
            FROM lsh_scored) t
      WHERE rk <= 10
    )"""


@query(
    "sim2_cosine_topk_lsh",
    oracle=f"""
    WITH {_O_SCALED},
    {_O_LSH_CTES}
    SELECT query_id, cand_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM lsh_ranked
    """,
)
def sim2_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-probe LSH-bucketed ANN top-10 (the scale path: candidate
    set shrinks ~2^planes-fold per probe). The whole approximate
    pipeline — fixed-point scaling, hyperplane signatures, bucket
    equi-join, exact rescoring — is deterministic, so it sits under
    the full value-hash oracle, not a rows-only check; recall vs the
    sim1 exact oracle is additionally asserted in
    tests/test_similarity.py."""
    emb = load(spark, sf_dir, "embeddings")
    out = cosine_topk_lsh(emb, QUERY_IDS, k=10, n_planes=6)
    return out.withColumn("rk", F.col("rk").cast("long"))


@query(
    "sim3_embedding_neardup_pairs",
    oracle=f"""
    WITH {_O_SCALED}
    SELECT q.vec_id AS id_a, c.vec_id AS id_b, ql.label, {_O_COS} AS cosine
    FROM normed q
    JOIN embeddings ql ON ql.vec_id = q.vec_id
    JOIN embeddings cl ON cl.label = ql.label
    JOIN normed c ON c.vec_id = cl.vec_id AND q.vec_id < c.vec_id
    WHERE {_O_COS} >= 0.8
    """,
)
def sim3_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    embedding-space analog of t6's blocked Jaccard dedup).

    Plan shape for scale: (1) narrow id-pair generation via the label
    self-join, (2) explicit fan-out of the byte-small CPU-heavy pair
    set, (3) vectors attached by PLAIN equi-joins — the pair set (two
    longs + a label) is the side that shuffles; AQE promotes the
    vector side to a broadcast only while it actually fits the
    threshold. A forced ``F.broadcast`` here would OOM the driver at
    corpus scale (the vector relation grows with the corpus), so the
    hint is deliberately absent — tests/test_plans.py pins this.
    """
    emb = load(spark, sf_dir, "embeddings")
    ids = emb.select("vec_id", "label")
    a = ids.select(F.col("vec_id").alias("id_a"), "label")
    b = ids.select(F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"))
    pairs = a.join(
        b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b", "label")
    pairs = fan_out(pairs)

    vecs = with_scaled(emb, "vec_id", "embedding")
    va = vecs.select(
        F.col("id").alias("id_a"), F.col("sv").alias("sv_a"), F.col("n2").alias("n2_a")
    )
    vb = vecs.select(
        F.col("id").alias("id_b"), F.col("sv").alias("sv_b"), F.col("n2").alias("n2_b")
    )
    scored = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            "label",
            cosine_scaled(
                dot_scaled(F.col("sv_a"), F.col("sv_b")),
                F.col("n2_a"),
                F.col("n2_b"),
            ).alias("cosine"),
        )
    )
    return scored.where(F.col("cosine") >= 0.8)


# IVF index-build artifact, memoized per dataset: training the coarse
# quantizer is index CONSTRUCTION (train once, serve many queries) —
# the deterministic k-means makes the memo value identical to a fresh
# train, so caching changes cost, never results. Keyed on
# (path, mtime) so regenerating the embeddings file at the same path
# invalidates the memo instead of serving stale centroids. At 100 TB
# the centroid table would persist alongside the embedding table.
_IVF_CENTROIDS: dict[tuple[str, int], list[list[int]]] = {}


def _ivf_memo_key(sf_dir: str) -> tuple[str, int]:
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    return (path, mtime)


# IVF probe width shared by the exact-rescore IVF family (sim4 /
# sim14 / sim15 / sim16 / sim18 / sim19) and their composed oracles.
# RETUNED 3 -> 4 in round 9 FROM sim18's recall table (the loop the
# table exists to close): at sf0.1, nprobe=4 buys recall@10
# 0.36 -> 0.50 for +33% candidates scored (1885 -> 2505 across the
# 5 queries; full sweep in docs/SCALE.md "ANN retune"), the best
# recall-per-byte move on the sweep — vs LSH 6 -> 5 planes, 1.9x for
# +0.04. sim9's IVFPQ keeps its own nprobe: its ADC candidates are
# ~64x cheaper per row, a different trade.
_NPROBE = 4


def _o_ivf_ctes(cand_pred: str = "", nprobe: int = _NPROBE) -> str:
    """IVF CTE chain (k-means-1-iter centroids over the vec_id%5
    sample, cell assignment, ``nprobe``-cell probe, cosine re-rank).
    ``cand_pred`` narrows the candidate corpus — sim19 appends the
    GDPR-survivor predicate so the same chain oracles a post-delete
    index."""
    return f"""samp AS (SELECT * FROM normed WHERE vec_id % 5 = 0),
    comp AS (
      SELECT CAST(vec_id % 16 AS INT) AS cid, pos, sv[pos] AS v
      FROM samp CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS pos)
    ),
    cent AS (
      SELECT cid, LIST(m ORDER BY pos) AS cv
      FROM (SELECT cid, pos, CAST(ROUND(AVG(v)) AS BIGINT) AS m
            FROM comp GROUP BY cid, pos)
      GROUP BY cid
    ),
    centn AS (
      SELECT cid, cv,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(cv) x)) AS BIGINT)
               AS cn2
      FROM cent
    ),
    dists AS (
      SELECT n.vec_id AS id, c.cid,
             n.n2
             - 2 * CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(n.sv) x, UNNEST(c.cv) y))
                        AS BIGINT)
             + c.cn2 AS dist
      FROM normed n CROSS JOIN centn c
    ),
    corpus_cell AS (
      SELECT id, cid AS cell
      FROM (SELECT id, cid,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cid) rn
            FROM dists) t
      WHERE rn = 1
    ),
    qcells AS (
      SELECT id AS query_id, cid AS cell
      FROM (SELECT id, cid,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cid) rn
            FROM dists WHERE id IN (0, 1, 2, 3, 4)) t
      WHERE rn <= {nprobe}
    ),
    ivf_scored AS (
      SELECT qc.query_id, cc.id AS cand_id, {_O_COS} AS cosine
      FROM qcells qc
      JOIN corpus_cell cc ON cc.cell = qc.cell AND cc.id <> qc.query_id{cand_pred}
      JOIN normed q ON q.vec_id = qc.query_id
      JOIN normed c ON c.vec_id = cc.id
    )
,
    ivf_ranked AS (
      SELECT query_id, cand_id, cosine, rk
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, cand_id) AS rk
            FROM ivf_scored) t
      WHERE rk <= 10
    )"""


_O_IVF_CTES = _o_ivf_ctes()

_O_IVF_TOPK = f"""
    WITH {_O_SCALED},
    {_O_IVF_CTES}
    SELECT query_id, cand_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM ivf_ranked
    """


@query(
    "sim4_cosine_topk_ivf",
    oracle=_O_IVF_TOPK,
)
def sim4_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means coarse quantizer + nprobe cell
    search (operators/similarity.py:ivf_train/ivf_topk), serving from
    the PERSISTED index when one exists for this exact dataset
    (path+mtime-keyed parquet centroid table under .ivf_index/) —
    train once, serve many, across processes. Deterministic k-means
    makes a stored index value-identical to a fresh train, so the
    cache changes cost, never results.

    FULL value-hash oracle (upgraded from rows-only, r5 verdict #4):
    with iters=1 the quantizer is exactly the component-wise rounded
    mean of the vec_id%5 sample grouped by vec_id%16, so the whole
    pipeline — train, _NPROBE-wide probe order (squared-L2 with (dist,
    cid) tiebreak), candidate join, exact fixed-point rescoring — is
    a deterministic SQL expression DuckDB reproduces bit-for-bit."""
    from ..operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    # one Lloyd refinement on a 1/5 sample: the registry entry
    # demonstrates the operator; tests/test_similarity.py grades recall
    # with heavier settings
    out = ivf_topk(
        emb, QUERY_IDS, _centroids_for(spark, sf_dir, emb), k=10, nprobe=_NPROBE
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


def _centroids_for(spark, sf_dir, emb) -> list[list[int]]:
    """The memoized/persisted deterministic quantizer shared by sim4
    (IVF coarse cells) and sim8 (PQ codebooks are its subspace
    slices): load from the parquet index when present, else train and
    try to persist, else fall back to the in-process memo."""
    import hashlib
    import os

    from ..operators.similarity import (
        ivf_load_index,
        ivf_save_index,
        ivf_train,
    )

    memo_key = _ivf_memo_key(sf_dir)
    if memo_key not in _IVF_CENTROIDS:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        idx_dir = os.path.join(
            repo_root,
            ".ivf_index",
            hashlib.md5(repr(memo_key).encode()).hexdigest(),
        )
        try:
            if os.path.isdir(idx_dir):
                _IVF_CENTROIDS[memo_key] = ivf_load_index(spark, idx_dir)
            else:
                cents = ivf_train(emb, n_centroids=16, iters=1, sample_mod=5)
                ivf_save_index(
                    spark, cents, idx_dir, meta={"key": repr(memo_key)}
                )
                _IVF_CENTROIDS[memo_key] = cents
        # a Spark write to an unwritable path surfaces as Py4JJavaError /
        # AnalysisException, not OSError — catch broadly so the
        # read-only-checkout fallback actually engages (save is an
        # optimization; a failed save must never fail the query)
        except Exception:  # noqa: BLE001 — fall back to in-process memo
            _IVF_CENTROIDS[memo_key] = ivf_train(
                emb, n_centroids=16, iters=1, sample_mod=5
            )
    return _IVF_CENTROIDS[memo_key]


# the 16x64 mean-centroid derivation shared by the sim4 and sim8
# oracles (iters=1 -> the quantizer IS the per-cell component mean of
# the vec_id%5 sample)
_O_CENT = """
    samp AS (SELECT * FROM normed WHERE vec_id % 5 = 0),
    comp AS (
      SELECT CAST(vec_id % 16 AS INT) AS cid, pos, sv[pos] AS v
      FROM samp CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS pos)
    ),
    cent AS (
      SELECT cid, LIST(m ORDER BY pos) AS cv
      FROM (SELECT cid, pos, CAST(ROUND(AVG(v)) AS BIGINT) AS m
            FROM comp GROUP BY cid, pos)
      GROUP BY cid
    )
"""


# the PQ train+encode+ADC scoring chain shared by the sim8 and sim10
# oracles (mms..scored over _O_SCALED + _O_CENT)
_O_PQ_SCORED = """
    mms AS (SELECT UNNEST(RANGE(0, 8)) AS mm),
    subn AS (
      SELECT mm, cid, cv8,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(cv8) x)) AS BIGINT)
               AS cn2
      FROM (SELECT mm, cid, list_slice(cv, mm * 8 + 1, mm * 8 + 8) AS cv8
            FROM cent CROSS JOIN mms) t
    ),
    vsub AS (
      SELECT vec_id, mm, list_slice(sv, mm * 8 + 1, mm * 8 + 8) AS sv8
      FROM normed CROSS JOIN mms
    ),
    cdist AS (
      SELECT v.vec_id, v.mm, s.cid,
             s.cn2
             - 2 * CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(v.sv8) x, UNNEST(s.cv8) y))
                        AS BIGINT) AS d
      FROM vsub v JOIN subn s ON s.mm = v.mm
    ),
    codes AS (
      SELECT vec_id, mm, cid AS code
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, mm
                                         ORDER BY d, cid) rn
            FROM cdist) t
      WHERE rn = 1
    ),
    qdist AS (
      SELECT v.vec_id AS query_id, v.mm, s.cid,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(v.sv8) x)) AS BIGINT)
             - 2 * CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(v.sv8) x, UNNEST(s.cv8) y))
                        AS BIGINT)
             + s.cn2 AS d
      FROM vsub v JOIN subn s ON s.mm = v.mm
      WHERE v.vec_id IN (0, 1, 2, 3, 4)
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id, CAST(SUM(q.d) AS BIGINT) AS adist
      FROM codes c JOIN qdist q ON q.mm = c.mm AND q.cid = c.code
      WHERE c.vec_id <> q.query_id
      GROUP BY 1, 2
    )
"""


@query(
    "sim8_pq_adc_topk",
    oracle=f"""
    WITH {_O_SCALED},
    {_O_CENT},
    {_O_PQ_SCORED}
    SELECT query_id, cand_id, adist, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adist, cand_id) AS rk
          FROM scored) t
    WHERE rk <= 10
    """,
)
def sim8_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/similarity.py:
    pq_encode/pq_topk) — the compressed-domain ANN scale path: the
    corpus is scanned as 8 nibble codes per vector (~64x smaller than
    the embedding column), each query's exact vector becomes an 8x16
    exact-int lookup table, and a candidate's distance is 8 map
    lookups. Shares sim4's deterministic mean-trained quantizer
    (subspace codebooks are its dim/8 slices), so train + encode +
    ADC + rank is one deterministic expression the DuckDB oracle
    reproduces bit-for-bit. Recall vs exact L2 is graded in
    tests/test_similarity.py."""
    emb = load(spark, sf_dir, "embeddings")
    from ..operators.similarity import pq_topk

    out = pq_topk(
        emb, QUERY_IDS, _centroids_for(spark, sf_dir, emb), k=10, m=8
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


@query(
    "sim9_ivfpq_topk",
    oracle=f"""
    WITH {_O_SCALED},
    {_O_CENT},
    centn AS (
      SELECT cid, cv,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(cv) x)) AS BIGINT)
               AS cn2
      FROM cent
    ),
    celld AS (
      SELECT n.vec_id AS id, c.cid,
             n.n2
             - 2 * CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(n.sv) x, UNNEST(c.cv) y))
                        AS BIGINT)
             + c.cn2 AS dist
      FROM normed n CROSS JOIN centn c
    ),
    corpus_cell AS (
      SELECT id, cid AS cell
      FROM (SELECT id, cid,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cid) rn
            FROM celld) t
      WHERE rn = 1
    ),
    qcells AS (
      SELECT id AS query_id, cid AS cell
      FROM (SELECT id, cid,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cid) rn
            FROM celld WHERE id IN (0, 1, 2, 3, 4)) t
      WHERE rn <= 3
    ),
    mms AS (SELECT UNNEST(RANGE(0, 8)) AS mm),
    subn AS (
      SELECT mm, cid, cv8,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(cv8) x)) AS BIGINT)
               AS cn2
      FROM (SELECT mm, cid, list_slice(cv, mm * 8 + 1, mm * 8 + 8) AS cv8
            FROM cent CROSS JOIN mms) t
    ),
    vsub AS (
      SELECT vec_id, mm, list_slice(sv, mm * 8 + 1, mm * 8 + 8) AS sv8
      FROM normed CROSS JOIN mms
    ),
    cdist AS (
      SELECT v.vec_id, v.mm, s.cid,
             s.cn2
             - 2 * CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(v.sv8) x, UNNEST(s.cv8) y))
                        AS BIGINT) AS d
      FROM vsub v JOIN subn s ON s.mm = v.mm
    ),
    codes AS (
      SELECT vec_id, mm, cid AS code
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, mm
                                         ORDER BY d, cid) rn
            FROM cdist) t
      WHERE rn = 1
    ),
    qdist AS (
      SELECT v.vec_id AS query_id, v.mm, s.cid,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(v.sv8) x)) AS BIGINT)
             - 2 * CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(v.sv8) x, UNNEST(s.cv8) y))
                        AS BIGINT)
             + s.cn2 AS d
      FROM vsub v JOIN subn s ON s.mm = v.mm
      WHERE v.vec_id IN (0, 1, 2, 3, 4)
    ),
    scored AS (
      SELECT qc.query_id, cc.id AS cand_id,
             CAST(SUM(q.d) AS BIGINT) AS adist
      FROM qcells qc
      JOIN corpus_cell cc ON cc.cell = qc.cell AND cc.id <> qc.query_id
      JOIN codes c ON c.vec_id = cc.id
      JOIN qdist q ON q.query_id = qc.query_id AND q.mm = c.mm
                  AND q.cid = c.code
      GROUP BY 1, 2
    )
    SELECT query_id, cand_id, adist, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adist, cand_id) AS rk
          FROM scored) t
    WHERE rk <= 10
    """,
)
def sim9_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (operators/similarity.py:ivfpq_topk — the
    FAISS-IVFPQ architecture): nprobe=3 coarse cells prune ~13/16 of
    the corpus before scoring, survivors are scored by 8 exact-int
    ADC map lookups against their nibble codes. Corpus cell + codes
    are ONE per-row projection (zero shuffles; plan-pinned); the only
    shuffle is the final top-k window. Shares sim4/sim8's
    deterministic quantizer, so the composed pipeline hash-matches
    the composed DuckDB oracle."""
    emb = load(spark, sf_dir, "embeddings")
    from ..operators.similarity import ivfpq_topk

    out = ivfpq_topk(
        emb, QUERY_IDS, _centroids_for(spark, sf_dir, emb), k=10, m=8, nprobe=3  # PQ family: own oracle, not retuned
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


@query(
    "sim5_vector_stats",
    oracle=f"""
    WITH scaled AS (
      SELECT vec_id, label, embedding,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS sv
      FROM embeddings
    )
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST((SELECT SUM(x) FROM (SELECT UNNEST(sv) x)) AS BIGINT)
             AS sum_scaled,
           list_max(sv) AS max_scaled,
           list_min(sv) AS min_scaled,
           len(list_filter(sv, x -> x > 0)) AS n_positive,
           CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(sv) x)) AS BIGINT)
             AS norm2_scaled
    FROM scaled
    """,
)
def sim5_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embedding column: size /
    element-wise transform / filter / min / max / fold — all JVM
    higher-order functions, partition-local (zero shuffles, the whole
    query is one codegen'd scan stage). The 1e-8 fixed-point scaling
    makes every reduction exact-integer, so results are bit-identical
    across engines and cluster layouts."""
    from ..operators.similarity import norm2_scaled, scale_vec

    emb = fan_out(load(spark, sf_dir, "embeddings"))
    # scaled vector materialized once: HOFs are interpreted (no CSE),
    # so an inline `sv` would re-run the scale transform per output
    # expression — five times per row
    staged = emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        scale_vec(F.col("embedding")).alias("__sv"),
    )
    sv = F.col("__sv")
    return staged.select(
        "vec_id",
        "label",
        "dim",
        F.aggregate(
            sv, F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("sum_scaled"),
        F.array_max(sv).alias("max_scaled"),
        F.array_min(sv).alias("min_scaled"),
        F.size(F.filter(sv, lambda x: x > 0)).cast("long").alias("n_positive"),
        norm2_scaled(sv).alias("norm2_scaled"),
    )


# fixed-size sample budget for sim6: pair work is C(budget, 2) and the
# broadcast is `budget` rows REGARDLESS of corpus size — a fixed-RATE
# sample (the first draft's vec_id % 20) grows linearly with the corpus
# and its all-pairs broadcast is a deferred OOM at 100 TB
SIM6_BUDGET = 128

# hash-order selection key, engine-portable (operators/sampling.sample_key)
_O_SIM6_KEY = "CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT)"


@query(
    "sim6_label_separation",
    oracle=f"""
    WITH sampled AS (
      SELECT vec_id, label, embedding
      FROM embeddings
      ORDER BY {_O_SIM6_KEY}, vec_id
      LIMIT {SIM6_BUDGET}
    ),
    scaled AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS sv
      FROM sampled
    ),
    normed AS (
      SELECT vec_id, label, sv,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(sv) x)) AS BIGINT) AS n2
      FROM scaled
    ),
    pairs AS (
      SELECT CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS same_label,
             {_O_COS} AS cosine
      FROM normed q JOIN normed c ON q.vec_id < c.vec_id
    )
    SELECT same_label, COUNT(*) AS n_pairs,
           CAST(SUM(CAST(cosine AS DECIMAL(9,6))) AS DOUBLE) / COUNT(*)
             AS avg_cosine,
           MIN(cosine) AS min_cosine, MAX(cosine) AS max_cosine
    FROM pairs GROUP BY same_label
    """,
)
def sim6_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label separation: average intra-label vs
    inter-label cosine over all pairs of a FIXED-SIZE deterministic
    sample — the contrastive-quality diagnostic run before trusting
    embeddings for clustering/dedup (well-separated labels => intra
    >> inter). All-pairs is intentional but BOUNDED: the sample is
    the first SIM6_BUDGET vectors in hash order of vec_id (selected
    by TakeOrderedAndProject — per-partition top-k then merge, no
    global sort), so pair work is C(budget, 2) and the broadcast side
    is a constant row count at ANY corpus size. The hash-order
    selection is a pure function of vec_id, so the oracle reproduces
    it exactly. Cosines are 6dp-rounded; the mean goes through an
    exact decimal sum (davg convention) so the distributed reduction
    is order-independent."""
    from ..operators.sampling import sample_key
    from ..operators.similarity import cosine_scaled, dot_scaled, with_scaled

    emb = (
        load(spark, sf_dir, "embeddings")
        .orderBy(sample_key("vec_id").asc(), F.col("vec_id"))
        .limit(SIM6_BUDGET)
    )
    base = with_scaled(fan_out(emb), "vec_id", "embedding").join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    )
    a = base.select(
        F.col("id").alias("id_a"), F.col("sv").alias("sv_a"),
        F.col("n2").alias("n2_a"), F.col("label").alias("label_a"),
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("sv").alias("sv_b"),
        F.col("n2").alias("n2_b"), F.col("label").alias("label_b"),
    )
    # pure-inequality pair join: broadcasting the sampled side keeps
    # the plan a BroadcastNestedLoopJoin, never a partitioned
    # CartesianProduct — and the broadcast is SAFE because the side is
    # capped at SIM6_BUDGET rows by construction, independent of
    # corpus size (the budget, not a rate, is the diagnostic's dial)
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b")).select(
        F.when(F.col("label_a") == F.col("label_b"), 1)
        .otherwise(0)
        .alias("same_label"),
        cosine_scaled(
            dot_scaled(F.col("sv_a"), F.col("sv_b")),
            F.col("n2_a"),
            F.col("n2_b"),
        ).alias("cosine"),
    )
    return pairs.groupBy("same_label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (
            F.sum(F.col("cosine").cast("decimal(9,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_cosine"),
        F.min("cosine").alias("min_cosine"),
        F.max("cosine").alias("max_cosine"),
    )


@query(
    "sim7_neardup_pairs_lsh",
    oracle=f"""
    WITH {_O_SCALED},
    sigd AS (SELECT vec_id, sv, n2,
                    CAST({_o_lsh_sig(6, 64)} AS BIGINT) AS sig
             FROM normed)
    SELECT q.vec_id AS id_a, c.vec_id AS id_b, {_O_COS} AS cosine
    FROM sigd q JOIN sigd c ON c.sig = q.sig AND q.vec_id < c.vec_id
    WHERE {_O_COS} >= 0.8
    """,
)
def sim7_neardup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide embedding near-dup pairs, LSH-bucketed (no label
    blocking — operators/similarity.py embedding_neardup_lsh). The
    banded self-join makes candidate volume ~N^2/2^(planes+1) instead
    of N^2/2; exact fixed-point rescoring inside the bucket keeps the
    result deterministic and fully value-hash oracled. Recall vs the
    exact threshold-pair set is asserted in tests/test_similarity.py."""
    from ..operators.similarity import embedding_neardup_lsh

    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh(emb, threshold=0.8, n_planes=6)


@query(
    "sim10_pq_refine_topk",
    oracle=f"""
    WITH {_O_SCALED},
    {_O_CENT},
    {_O_PQ_SCORED},
    short AS (
      SELECT query_id, cand_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adist, cand_id) AS rk
            FROM scored) t
      WHERE rk <= 50
    ),
    exact AS (
      SELECT s.query_id, s.cand_id,
             q.n2
             - 2 * CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(q.sv) x, UNNEST(c.sv) y))
                        AS BIGINT)
             + c.n2 AS dist
      FROM short s
      JOIN normed q ON q.vec_id = s.query_id
      JOIN normed c ON c.vec_id = s.cand_id
    )
    SELECT query_id, cand_id, dist, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY dist, cand_id) AS rk
          FROM exact) t
    WHERE rk <= 10
    """,
)
def sim10_pq_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN serving pipeline (operators/similarity.py:
    pq_topk_refined — FAISS IndexRefine / DiskANN rerank): PQ-ADC
    shortlists 50 candidates per query from the compressed codes,
    then exact scaled-int L2 re-ranks ONLY those 250 rows against
    the uncompressed vectors (broadcast shortlist semi-join; the
    full-precision column is scanned once, never shuffled).
    Quantization error affects recall only through the shortlist —
    the emitted order is exact. The oracle replays shortlist AND
    refine generically over the shared PQ CTE chain."""
    emb = load(spark, sf_dir, "embeddings")
    from ..operators.similarity import pq_topk_refined

    out = pq_topk_refined(
        emb,
        QUERY_IDS,
        _centroids_for(spark, sf_dir, emb),
        k=10,
        shortlist=50,
        m=8,
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


@query(
    "sim11_sq8_topk",
    oracle=f"""
    WITH {_O_SCALED},
    mx AS (
      SELECT vec_id, sv,
             greatest((SELECT MAX(abs(x)) FROM (SELECT UNNEST(sv) x)),
                      1) AS m
      FROM scaled
    ),
    quant AS (
      SELECT vec_id,
             list_transform(sv, v -> CAST(sign(v) AS BIGINT)
                                     * ((abs(v) * 254 + m) // (2 * m))) AS q
      FROM mx
    ),
    qn AS (
      SELECT vec_id, q,
             CAST((SELECT SUM(x * x) FROM (SELECT UNNEST(q) x)) AS BIGINT)
               AS qn2
      FROM quant
    ),
    scored AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS cand_id,
             ROUND(CAST((SELECT SUM(x * y)
                         FROM (SELECT UNNEST(qs.q) x, UNNEST(c.q) y))
                        AS DOUBLE)
                   / (SQRT(CAST(qs.qn2 AS DOUBLE))
                      * SQRT(CAST(c.qn2 AS DOUBLE))), 6) AS q_cosine
      FROM qn qs JOIN qn c ON c.vec_id <> qs.vec_id
      WHERE qs.vec_id IN (0, 1, 2, 3, 4)
    )
    SELECT query_id, cand_id, q_cosine, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY q_cosine DESC, cand_id) AS rk
          FROM scored) t
    WHERE rk <= 10
    """,
)
def sim11_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized ANN top-10 (operators/similarity.py
    with_sq8/sq8_topk): per-vector symmetric max-abs quantization to
    the [-127, 127] byte range, then cosine top-k scored entirely on
    the 1-byte/dim codes — the memory-bandwidth scale path that keeps
    per-dimension structure (unlike PQ) so the plain int dot product
    still scores it. Quantization is pure integer round-half-away
    arithmetic, so the whole pipeline sits under a full value-hash
    DuckDB oracle; recall vs the exact baseline is additionally pinned
    in tests/test_similarity.py."""
    from ..operators.similarity import sq8_topk

    emb = load(spark, sf_dir, "embeddings")
    out = sq8_topk(emb, QUERY_IDS, k=10)
    return out.withColumn("rk", F.col("rk").cast("long"))


@query(
    "sim12_knn_graph",
    oracle=f"""
    WITH {_O_SCALED},
    sigd AS (SELECT vec_id, sv, n2,
                    CAST({_o_lsh_sig(8, 64)} AS BIGINT) AS sig
             FROM normed),
    scored AS (
      SELECT q.vec_id AS src_id, c.vec_id AS dst_id, {_O_COS} AS cosine
      FROM sigd q JOIN sigd c ON c.sig = q.sig AND c.vec_id <> q.vec_id
    )
    SELECT src_id, dst_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                                       ORDER BY cosine DESC, dst_id) AS rk
          FROM scored) t
    WHERE rk <= 3
    """,
)
def sim12_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate kNN graph (operators/similarity.py
    knn_graph): EVERY vector's top-3 in-bucket cosine neighbors — the
    graph-construction step under dedup clustering and diversity
    selection. Candidate volume is sum-of-bucket-squares (2^8 buckets
    here), never n²; the whole pipeline (per-row signatures, bucket
    self-join, exact rescoring, per-node top-k) is deterministic and
    sits under a full value-hash oracle. Neighbor recall on clustered
    data is regression-tested in tests/test_similarity.py."""
    from ..operators.similarity import knn_graph

    emb = load(spark, sf_dir, "embeddings")
    return knn_graph(emb, k=3, n_planes=8)


@query(
    "sim13_embedding_clusters",
    oracle=f"""
    WITH RECURSIVE {_O_SCALED},
    sigd AS (SELECT vec_id, sv, n2,
                    CAST({_o_lsh_sig(6, 64)} AS BIGINT) AS sig
             FROM normed),
    pairs AS (
      SELECT q.vec_id AS id_a, c.vec_id AS id_b
      FROM sigd q JOIN sigd c ON c.sig = q.sig AND q.vec_id < c.vec_id
      WHERE {_O_COS} >= 0.3),
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
def sim13_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space duplicate clusters: the LSH similarity pair
    graph (sim7 machinery at a fixture-matched 0.3 threshold; the
    synthetic embeddings hold no >=0.8 near-dups) resolved to connected components (operators/graph.py) —
    the cross-family composition that turns pairwise vector
    similarity into the transitive duplicate GROUPS a curation
    pipeline actually deletes from, exactly as t12 does for text
    minhash pairs. Iterative min-label propagation verified against
    DuckDB's recursive-CTE transitive closure over the identical
    pair set."""
    from ..operators.graph import connected_components
    from ..operators.similarity import embedding_neardup_lsh

    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_lsh(emb, threshold=0.3, n_planes=6)
    return connected_components(pairs)


@query(
    "sim14_ivf_partitioned_topk",
    oracle=_O_IVF_TOPK,
)
def sim14_ivf_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF where the inverted lists are the TABLE LAYOUT
    (operators/similarity.py:ivf_partitioned_write/-_topk): the corpus
    is persisted partitioned by its IVF cell, and a probe's cell set
    becomes a literal IN-filter the planner resolves as
    PartitionFilters — unprobed cell directories are never read, so a
    3-of-16 probe reads ~3/16 of corpus BYTES (ivf_topk's equi-join
    prunes compute but still scans everything; at 100 TB the scan IS
    the cost). Same centroids, queries, nprobe, tiebreaks as sim4 —
    the ORACLE IS SHARED (_O_IVF_TOPK), pinning that moving the
    pruning from join to layout changes IO, never results. Pruning
    itself is plan-pinned in tests/test_plans.py."""
    import shutil
    import tempfile

    from ..operators.similarity import (
        ivf_partitioned_topk,
        ivf_partitioned_write,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    tmp = tempfile.mkdtemp(prefix="sim14_ivfpart_")
    store = tmp + "/store"
    try:
        with fixture_phase():  # index build; operator = pruned search
            ivf_partitioned_write(emb, cents, store)
        out = ivf_partitioned_topk(
            spark,
            store,
            emb.where(F.col("vec_id").isin(QUERY_IDS)),
            cents,
            k=10,
            nprobe=_NPROBE,
        ).withColumn("rk", F.col("rk").cast("long"))
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "sim15_rrf_hybrid_topk",
    oracle=f"""
    WITH {_O_SCALED},
    {_O_LSH_CTES},
    {_O_IVF_CTES},
    fused AS (
      SELECT COALESCE(l.query_id, i.query_id) AS query_id,
             COALESCE(l.cand_id, i.cand_id) AS cand_id,
             COALESCE(CAST(1 AS DOUBLE) / (60 + l.rk), 0)
               + COALESCE(CAST(1 AS DOUBLE) / (60 + i.rk), 0) AS rrf
      FROM lsh_ranked l FULL OUTER JOIN ivf_ranked i
        ON i.query_id = l.query_id AND i.cand_id = l.cand_id
    )
    SELECT query_id, cand_id, rrf, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rrf DESC, cand_id) AS rk
          FROM fused) t
    WHERE rk <= 10
    """,
)
def sim15_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid ANN via reciprocal-rank fusion (operators/similarity.py:
    rrf_fuse): sim2's hyperplane-LSH top-10 and sim4's IVF top-10
    fused by 1/(60+rank) — the calibration-free combiner for
    retrievers whose raw scores aren't comparable. A candidate found
    by BOTH retrievers outranks one found by either alone, which is
    exactly the redundancy-as-confidence signal hybrid search buys.
    The oracle composes the sim2 and sim4 CTE chains verbatim
    (_O_LSH_CTES / _O_IVF_CTES) and fuses with the same fixed
    coalesced-addition order, so the whole two-retriever pipeline
    sits under one value-hash check. Fusion cost is |Q| x k rows per
    retriever — invisible next to retrieval at any scale."""
    from ..operators.similarity import cosine_topk_lsh, ivf_topk, rrf_fuse

    emb = load(spark, sf_dir, "embeddings")
    lsh = cosine_topk_lsh(emb, QUERY_IDS, k=10, n_planes=6)
    ivf = ivf_topk(
        emb, QUERY_IDS, _centroids_for(spark, sf_dir, emb), k=10, nprobe=_NPROBE
    )
    return rrf_fuse([lsh, ivf], k=10).withColumn(
        "rk", F.col("rk").cast("long")
    )


@query(
    "sim16_versioned_ivf_topk",
    oracle=_O_IVF_TOPK,
)
def sim16_versioned_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index builds as TIME-TRAVELABLE COMMITS
    (operators/similarity.py:versioned_ivf_write/-_topk): the
    cell-assigned corpus AND its quantizer centroids go through one
    atomic snapshot_write_partitioned commit (centroids in the
    manifest's extra), search prunes files by MANIFEST lookup, and a
    version pin reproduces that build's exact results after any
    rebuild. Here the index is committed as v0, then REBUILT (v1)
    over a half corpus — and the query searches pinned at v0, proving
    the rebuild cannot perturb a pinned reader: same centroids,
    queries, nprobe, tiebreaks as sim4, so the ORACLE IS SHARED
    (_O_IVF_TOPK). The v0-vs-v1 divergence itself is pinned in
    tests/test_similarity.py."""
    import shutil
    import tempfile

    from ..operators.similarity import (
        versioned_ivf_topk,
        versioned_ivf_write,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    tmp = tempfile.mkdtemp(prefix="sim16_vivf_")
    store = tmp + "/index"
    try:
        with fixture_phase():  # index builds; operator = pinned search
            v0 = versioned_ivf_write(spark, emb, cents, store)
            versioned_ivf_write(  # rebuild over half the corpus
                spark, emb.where(F.col("vec_id") % 2 == 0), cents, store
            )
        out = versioned_ivf_topk(
            spark,
            store,
            emb.where(F.col("vec_id").isin(QUERY_IDS)),
            k=10,
            nprobe=_NPROBE,
            version=v0,
        ).withColumn("rk", F.col("rk").cast("long"))
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "sim17_neardup_triangles",
    oracle=f"""
    WITH {_O_SCALED},
    sigd AS (SELECT vec_id, sv, n2,
                    CAST({_o_lsh_sig(6, 64)} AS BIGINT) AS sig
             FROM normed),
    pairs AS (
      SELECT q.vec_id AS id_a, c.vec_id AS id_b
      FROM sigd q JOIN sigd c ON c.sig = q.sig AND q.vec_id < c.vec_id
      WHERE {_O_COS} >= 0.1),
    tris AS (
      SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
      FROM pairs p1
      JOIN pairs p2 ON p2.id_a = p1.id_b
      JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b)
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT a AS node FROM tris
          UNION ALL SELECT b FROM tris
          UNION ALL SELECT c FROM tris)
    GROUP BY node
    """,
)
def sim17_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle census of the embedding near-dup graph
    (operators/graph.py:triangle_count over sim13's LSH pair
    machinery at threshold 0.1): the transitivity diagnostic that
    separates genuine near-dup CLIQUES (pairs that close into
    triangles — one boilerplate family) from hub false-positives
    (high degree, no closure) BEFORE canonicalization deletes
    documents. The Spark side counts via degree-ORIENTED wedge
    enumeration (every wedge generated at its lowest-(degree,id)
    apex — O(m^1.5) wedges on any graph, hub-immune); the oracle
    enumerates naively by id order a<b<c — two formulations of the
    same graph property, so the value-hash match pins orientation
    correctness, not just arithmetic."""
    from ..operators.graph import triangle_count
    from ..operators.similarity import embedding_neardup_lsh

    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_lsh(emb, threshold=0.1, n_planes=6)
    return triangle_count(pairs)


@query(
    "sim18_ann_recall_table",
    oracle=f"""
    WITH {_O_SCALED},
    {_O_LSH_CTES},
    {_O_IVF_CTES},
    brute_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_O_COS} AS cosine
      FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0, 1, 2, 3, 4)
    ),
    brute_ranked AS (
      SELECT query_id, cand_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, cand_id) AS rk
            FROM brute_scored) t
      WHERE rk <= 10
    ),
    fam AS (
      SELECT 'lsh' AS family, b.query_id,
             CAST(COUNT(l.cand_id) AS BIGINT) AS n_hits
      FROM brute_ranked b LEFT JOIN lsh_ranked l
        ON l.query_id = b.query_id AND l.cand_id = b.cand_id
      GROUP BY b.query_id
      UNION ALL
      SELECT 'ivf', b.query_id, CAST(COUNT(i.cand_id) AS BIGINT)
      FROM brute_ranked b LEFT JOIN ivf_ranked i
        ON i.query_id = b.query_id AND i.cand_id = b.cand_id
      GROUP BY b.query_id
    )
    SELECT family, query_id, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / 10, 6) AS recall_at_10
    FROM fam
    """,
)
def sim18_ann_recall_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality eval AS A TABLE: per (retriever family, query),
    recall@10 of the LSH and IVF retrievers against the brute-force
    truth — the measure-don't-guess artifact that turns "retune
    n_planes/nprobe" from a guess into a read (t31 is this same idea
    for the lang-id classifier). The whole three-retriever pipeline —
    truth + both approximations + the recall join — sits under ONE
    value-hash oracle composed from the families' shared CTE chains,
    so a drift in ANY retriever's semantics breaks the gate. Cost is
    the retrievers themselves; the eval join touches |Q| x k rows per
    family."""
    from ..operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
        ivf_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    brute = cosine_topk_bruteforce(emb, QUERY_IDS, k=10).select(
        "query_id", "cand_id"
    )
    fams = {
        "lsh": cosine_topk_lsh(emb, QUERY_IDS, k=10, n_planes=6),
        "ivf": ivf_topk(emb, QUERY_IDS, cents, k=10, nprobe=_NPROBE),
    }
    parts = []
    for name, ranked in fams.items():
        r = ranked.select(
            "query_id", F.col("cand_id").alias("__hit")
        )
        joined = brute.join(
            r,
            (brute["query_id"] == r["query_id"])
            & (brute["cand_id"] == r["__hit"]),
            "left",
        ).select(brute["query_id"], r["__hit"])
        parts.append(
            joined.groupBy("query_id").agg(
                F.count("__hit").cast("long").alias("n_hits")
            ).select(
                F.lit(name).alias("family"),
                "query_id",
                "n_hits",
                F.round(F.col("n_hits").cast("double") / 10, 6).alias(
                    "recall_at_10"
                ),
            )
        )
    return parts[0].unionByName(parts[1])


@query(
    "sim19_ivf_delete_refresh",
    oracle=f"""
    WITH {_O_SCALED},
    {_o_ivf_ctes(" AND cc.id % 7 <> 5")}
    SELECT query_id, cand_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM ivf_ranked
    """,
)
def sim19_ivf_delete_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR delete THROUGH the versioned ANN index
    (operators/snapshots.py:snapshot_delete composed with
    operators/similarity.py:versioned_ivf_write/-_topk): the index is
    committed at v0, a keyed right-to-be-forgotten sweep (vec_id %
    7 = 5) copy-on-writes only the inverted-list files that contain a
    matched vector (partition map and the manifest-embedded centroids
    carry to v1 untouched), and the refreshed search at the CURRENT
    version serves survivors only — no rebuild, no stale tombstone
    view. The oracle is the shared IVF chain with the survivor
    predicate on the candidate corpus, so the whole
    delete-then-search composition sits under one value-hash check
    (deleted ids vanishing from results is pinned structurally in
    tests/test_similarity.py; pinned-v0 reads still see them —
    erasure-from-bytes remains delete + retention + vacuum, as in
    p16). At 100 TB the delete rewrites ~|matched cells' files|, not
    the corpus, and the search still prunes cells by manifest."""
    import shutil
    import tempfile

    from ..operators.similarity import (
        versioned_ivf_topk,
        versioned_ivf_write,
    )
    from ..operators.snapshots import snapshot_delete

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    tmp = tempfile.mkdtemp(prefix="sim19_vivf_")
    store = tmp + "/index"
    try:
        with fixture_phase():  # index build; operator = delete+search
            versioned_ivf_write(spark, emb, cents, store)
        snapshot_delete(
            spark,
            store,
            emb.where(F.col("vec_id") % 7 == 5).select("vec_id"),
            ["vec_id"],
        )
        out = versioned_ivf_topk(
            spark,
            store,
            emb.where(F.col("vec_id").isin(QUERY_IDS)),
            k=10,
            nprobe=_NPROBE,
        ).withColumn("rk", F.col("rk").cast("long"))
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "sim20_ivf_append_increment",
    oracle=_O_IVF_TOPK,
)
def sim20_ivf_append_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN ingest (operators/similarity.py:
    versioned_ivf_append — the IVF half of t35's daily-ingest story):
    the index is BUILT over two thirds of the corpus, the remaining
    third arrives later as an ingest increment and is cell-assigned
    under the COMMITTED quantizer and appended as a new snapshot
    version — O(increment) indexing, existing inverted-list files
    carried by reference (pinned in tests/test_similarity.py). The
    post-append search must be IDENTICAL to a one-shot index over the
    full corpus: same centroids, same cells, same tiebreaks — so the
    ORACLE IS SHARED with sim4 (_O_IVF_TOPK), and the hash match pins
    that incremental maintenance cannot drift the index away from its
    batch-rebuild twin. At 100 TB this is the nightly embedding-ingest
    path: assign + append new vectors' cells, rebuild (re-train) only
    when the quantizer itself degrades."""
    import shutil
    import tempfile

    from ..operators.similarity import (
        versioned_ivf_append,
        versioned_ivf_topk,
        versioned_ivf_write,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = _centroids_for(spark, sf_dir, emb)
    tmp = tempfile.mkdtemp(prefix="sim20_vivf_")
    store = tmp + "/index"
    try:
        with fixture_phase():  # base build; operator = append+search
            versioned_ivf_write(
                spark, emb.where(F.col("vec_id") % 3 != 0), cents, store
            )
        versioned_ivf_append(
            spark, emb.where(F.col("vec_id") % 3 == 0), store
        )
        out = versioned_ivf_topk(
            spark,
            store,
            emb.where(F.col("vec_id").isin(QUERY_IDS)),
            k=10,
            nprobe=_NPROBE,
        ).withColumn("rk", F.col("rk").cast("long"))
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _o_mmr(k: int, pool: int, lam: str, mu: str) -> str:
    """Unrolled greedy-MMR CTE chain (k fixed selection rounds —
    greedy argmax is not one SQL aggregate, but k of them are)."""
    parts = [
        f"""mscored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_O_COS} AS rel
      FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0, 1, 2, 3, 4)
    ),
    mpool AS (
      SELECT query_id, cand_id, rel
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY rel DESC, cand_id) AS rn
            FROM mscored) t
      WHERE rn <= {pool}
    ),
    mpairs AS (
      SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,
             {_O_COS} AS sim
      FROM mpool a
      JOIN mpool b ON b.query_id = a.query_id AND b.cand_id <> a.cand_id
      JOIN normed q ON q.vec_id = a.cand_id
      JOIN normed c ON c.vec_id = b.cand_id
    ),
    chosen1 AS (
      SELECT query_id, cand_id, 1 AS mmr_rank, rel
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY rel DESC, cand_id) AS rn
            FROM mpool) t
      WHERE rn = 1
    )"""
    ]
    prev = "chosen1"
    for i in range(2, k + 1):
        parts.append(f"""pen{i} AS (
      SELECT p.query_id, p.a_id, MAX(p.sim) AS pen
      FROM mpairs p JOIN {prev} ch
        ON ch.query_id = p.query_id AND ch.cand_id = p.b_id
      GROUP BY p.query_id, p.a_id
    ),
    sel{i} AS (
      SELECT query_id, cand_id, rel
      FROM (SELECT c.query_id, c.cand_id, c.rel,
                   ROW_NUMBER() OVER (
                     PARTITION BY c.query_id
                     ORDER BY {lam} * c.rel - {mu} * p.pen DESC, c.cand_id
                   ) AS rn
            FROM mpool c
            JOIN pen{i} p
              ON p.query_id = c.query_id AND p.a_id = c.cand_id
            WHERE NOT EXISTS (SELECT 1 FROM {prev} ch2
                              WHERE ch2.query_id = c.query_id
                                AND ch2.cand_id = c.cand_id)) t
      WHERE rn = 1
    ),
    chosen{i} AS (
      SELECT * FROM {prev}
      UNION ALL
      SELECT query_id, cand_id, {i} AS mmr_rank, rel FROM sel{i}
    )""")
        prev = f"chosen{i}"
    return ",\n    ".join(parts) + f"""
    SELECT query_id, cand_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
           rel AS cosine
    FROM {prev}"""


_O_MMR = "WITH " + _O_SCALED + ",\n    " + _o_mmr(5, 20, "0.7", "0.3")


@query(
    "sim21_mmr_diversified_topk",
    oracle=_O_MMR,
)
def sim21_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified retrieval
    (operators/similarity.py mmr_topk): greedy selection of 5 results
    per query maximizing 0.7*cos(q,d) - 0.3*max_sim-to-already-chosen
    over a brute-force top-20 candidate pool — the curation-side
    retrieval primitive plain top-k lacks (a near-dup cluster
    contributes ONE representative, not k copies). The oracle unrolls
    the same 5 greedy rounds as SQL CTEs over the shared fixed-point
    cosine, so selection order, penalty maxima, and every tiebreak
    must reproduce bit-for-bit. Scale shape: one broadcast scoring
    pass narrows to |queries| x pool rows; the greedy rounds are
    bounded by |queries| x pool^2, independent of corpus size."""
    from ..operators.similarity import mmr_topk

    emb = load(spark, sf_dir, "embeddings")
    out = mmr_topk(
        emb, QUERY_IDS, k=5, pool=20, lam=0.7, mu=0.3
    )
    return out.select(
        "query_id",
        "cand_id",
        "mmr_rank",
        F.col("rel").alias("cosine"),
    )


@query(
    "sim22_filtered_ann_topk",
    oracle=f"""
    WITH {_O_SCALED},
    {_o_ivf_ctes(" AND cc.id IN (SELECT vec_id FROM embeddings WHERE label % 2 = 1)")}
    SELECT query_id, cand_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM ivf_ranked
    """,
)
def sim22_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED approximate search — the vector-DB feature every
    retrieval stack ships (Milvus/Qdrant/pgvector 'metadata
    filtering'): top-k cosine among corpus vectors satisfying a
    predicate (odd label), queries drawn from the FULL set. The
    operator (ivf_topk's corpus_emb) PRE-filters: the predicate
    travels to the corpus scan as a pushed filter, cell assignment
    runs on survivors only, and k results are k QUALIFYING results —
    not the post-filter approach whose k results can shrink to
    nothing when the predicate is selective. Oracle = the shared IVF
    chain with the same predicate on the candidate corpus. At 100 TB
    the filter prunes candidate bytes before any distance math, and
    combined with the IVF-as-layout path (sim14) it prunes at the
    manifest level too."""
    from ..operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    out = ivf_topk(
        emb,
        QUERY_IDS,
        _centroids_for(spark, sf_dir, emb),
        k=10,
        nprobe=_NPROBE,
        corpus_emb=emb.where(F.col("label") % 2 == 1),
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


@query(
    "sim23_knn_label_vote",
    oracle=f"""
    WITH {_O_SCALED},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_O_COS} AS cosine
      FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 50
    ),
    topk AS (
      SELECT query_id, cand_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, cand_id) AS rk
            FROM scored) t
      WHERE rk <= 10
    ),
    votes AS (
      SELECT t.query_id, e.label AS cand_label,
             CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM topk t JOIN embeddings e ON e.vec_id = t.cand_id
      GROUP BY t.query_id, e.label
    ),
    pred AS (
      SELECT query_id, cand_label AS pred_label
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY n_votes DESC, cand_label)
                        AS rn
            FROM votes) t
      WHERE rn = 1
    )
    SELECT CAST(e.label AS BIGINT) AS true_label,
           CAST(p.pred_label AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
    GROUP BY e.label, p.pred_label
    """,
)
def sim23_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label prediction with a confusion-matrix
    output — the standard embedding-quality eval (does neighborhood
    structure predict labels?): for the first 50 vectors, the top-10
    exact cosine neighbors vote (count desc, then min label — fully
    deterministic), and predictions aggregate against true labels.
    One brute-force scoring pass (broadcast queries), one narrow
    label join on (query, cand) id rows, two small window/agg steps —
    vectors never re-read after scoring. The relational formulation
    of the eval loop every embedding pipeline runs before trusting
    an index; on real corpora the same query swaps the brute-force
    pool for ivf_topk output, trading exactness for a cheap sweep."""
    from pyspark.sql import Window

    from ..operators.similarity import cosine_topk_bruteforce

    emb = load(spark, sf_dir, "embeddings")
    topk = cosine_topk_bruteforce(emb, list(range(50)), k=10).select(
        "query_id", "cand_id"
    )
    labels = emb.select("vec_id", "label")
    votes = (
        topk.join(labels, topk.cand_id == labels.vec_id)
        .groupBy("query_id", F.col("label").alias("cand_label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), "cand_label"
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("cand_label").alias("pred_label"))
    )
    return (
        pred.join(labels, pred.query_id == labels.vec_id)
        .groupBy(
            F.col("label").cast("long").alias("true_label"),
            F.col("pred_label").cast("long").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
