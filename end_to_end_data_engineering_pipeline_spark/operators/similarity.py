"""Similarity search over embedding columns (charter §2.12).

Brute-force cosine top-k as the exact baseline, plus a random-
hyperplane LSH-bucketed variant as the scale path (Charikar '02 —
see PAPERS.md).

Numeric determinism: dot products and norms accumulate per-element
double products through exact DECIMAL (order-independent — see
functions/scalar.py), so scores are bit-stable across engines and
partitionings; ranking ties are broken by candidate id.

Scale design:
- norms are precomputed once per vector (one projection, no shuffle).
- brute-force is a broadcast nested-loop of |Q| queries × corpus —
  linear scans are THE baseline ANN at any scale when |Q| is small;
  the corpus side never shuffles.
- the LSH variant buckets by an h-bit hyperplane signature: candidate
  generation becomes an equi-join on the signature (hash shuffle on
  bucket key), reducing compared pairs from |Q|·N to |Q|·N/2^h per
  probe. Multi-probe = OR over neighboring signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import hash32

_ACC = "decimal(28,9)"


def _dot(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two float arrays -> DECIMAL."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(20,9)"),
    )
    return F.aggregate(
        prods,
        F.lit(0).cast(_ACC),
        lambda acc, v: (acc + v).cast(_ACC),
    )


def norm2(vec: Column) -> Column:
    """Squared L2 norm as exact DECIMAL."""
    return _dot(vec, vec)


def cosine(dot_dec: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """Cosine from decimal dot + squared norms, rounded to 6 dp."""
    return F.round(
        dot_dec.cast("double")
        / (F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double"))),
        6,
    )


def cosine_topk_bruteforce(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Returns (query_id, cand_id, cosine, rk), rk in 1..k. The query side
    is broadcast; the corpus is scanned once, unshuffled, and the top-k
    window runs on the (small) scored pair set.
    """
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm2(F.col(vec_col)).alias("n2"),
    )
    q = base.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("n2").alias("qn2"),
    )
    pairs = base.join(F.broadcast(q), F.col("id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("id").alias("cand_id"),
        cosine(_dot(F.col("qvec"), F.col("vec")), F.col("qn2"), F.col("n2")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def _plane_component(plane: int):
    # hash32("p:<plane>:<dim>") mapped into [-1000, 1000] / 1000
    return lambda i: (
        (hash32(F.concat(F.lit(f"p:{plane}:"), i.cast("string"))) % 2001) - 1000
    ).cast("double") / 1000.0


def lsh_signature(vec: Column, n_planes: int = 8) -> Column:
    """n-bit random-hyperplane signature of a float vector (long).

    bit p = 1 iff dot(vec, plane_p) > 0; planes are hash-derived, so
    signatures are reproducible anywhere (no driver-side state to
    broadcast, no RNG seed to ship)."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        comp = _plane_component(p)
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.transform(idx, comp),
                lambda x, c: (x.cast("double") * c).cast("decimal(20,9)"),
            ),
            F.lit(0).cast(_ACC),
            lambda acc, v: (acc + v).cast(_ACC),
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(0).cast("long")
    return sig


def cosine_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (single-probe). Recall is tested against the brute-force
    oracle in tests/test_similarity.py."""
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm2(F.col(vec_col)).alias("n2"),
        lsh_signature(F.col(vec_col), n_planes).alias("sig"),
    )
    q = base.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("n2").alias("qn2"),
        F.col("sig").alias("qsig"),
    )
    cand = base.join(
        F.broadcast(q),
        (F.col("sig") == F.col("qsig")) & (F.col("id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("id").alias("cand_id"),
        cosine(_dot(F.col("qvec"), F.col("vec")), F.col("qn2"), F.col("n2")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
