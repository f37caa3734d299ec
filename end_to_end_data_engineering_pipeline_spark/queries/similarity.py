"""Similarity-search queries over the embeddings table (charter §2.12).

sim1 is the exact brute-force baseline with a full DuckDB oracle (the
decimal-accumulated dot product makes scores bit-identical across
engines). sim2 (LSH ANN) and sim3 (embedding near-dup) compose the
same scoring; sim2's recall is asserted against sim1 in
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.similarity import (
    _dot,
    cosine,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    norm2,
)
from .registry import query

QUERY_IDS = [0, 1, 2, 3, 4]

_O_DOT = (
    "(SELECT CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)"
    " AS DECIMAL(20,9))) AS DOUBLE)"
    " FROM (SELECT UNNEST(q.embedding) x, UNNEST(c.embedding) y))"
)
_O_N2 = (
    "(SELECT CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
    " AS DECIMAL(20,9))) AS DOUBLE)"
    " FROM (SELECT UNNEST({v}.embedding) x))"
)


@query(
    "sim1_cosine_topk_bruteforce",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             ROUND({_O_DOT} / (SQRT({_O_N2.format(v="q")})
                               * SQRT({_O_N2.format(v="c")})), 6) AS cosine
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0, 1, 2, 3, 4)
    )
    SELECT query_id, cand_id, cosine,
           CAST(rk AS BIGINT) AS rk
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


@query("sim2_cosine_topk_lsh")  # rows-only: approximate by design; recall
# vs the sim1 exact oracle is asserted in tests/test_similarity.py
def sim2_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-probe LSH-bucketed ANN top-10 (the scale path: candidate
    set shrinks ~2^planes-fold per probe)."""
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, QUERY_IDS, k=10, n_planes=6)


@query(
    "sim3_embedding_neardup_pairs",
    oracle=f"""
    SELECT q.vec_id AS id_a, c.vec_id AS id_b, q.label,
           ROUND({_O_DOT} / (SQRT({_O_N2.format(v="q")})
                             * SQRT({_O_N2.format(v="c")})), 6) AS cosine
    FROM embeddings q JOIN embeddings c
      ON q.label = c.label AND q.vec_id < c.vec_id
    WHERE ROUND({_O_DOT} / (SQRT({_O_N2.format(v="q")})
                            * SQRT({_O_N2.format(v="c")})), 6) >= 0.8
    """,
)
def sim3_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    embedding-space analog of t6's blocked Jaccard dedup)."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.col("label"),
        F.col("embedding").alias("vec"),
        norm2(F.col("embedding")).alias("n2"),
    )
    a = base.select(
        F.col("id").alias("id_a"), F.col("label"),
        F.col("vec").alias("vec_a"), F.col("n2").alias("n2_a"),
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("label").alias("label_b"),
        F.col("vec").alias("vec_b"), F.col("n2").alias("n2_b"),
    )
    pairs = a.join(b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b")))
    return (
        pairs.select(
            "id_a",
            "id_b",
            "label",
            cosine(
                _dot(F.col("vec_a"), F.col("vec_b")), F.col("n2_a"), F.col("n2_b")
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.8)
    )
