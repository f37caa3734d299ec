"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Charter §2.12 operators over the documents table, grounded in the
public MinHash/LSH literature (Broder '97 shingling; Indyk-Motwani
LSH; Charikar '02 simhash — see PAPERS.md). All are compositions of
built-in DataFrame ops around the engine-portable ``hash32`` so the
DuckDB oracle can verify signatures exactly.

Scale design (100 TB of documents):
- Shingling/minhash/simhash are per-row expressions — embarrassingly
  parallel, no shuffle, whole-stage codegen.
- LSH banding turns O(n²) pair search into groupBy(band_key): one
  shuffle whose fan-in is bucket size, not corpus size. Hot buckets
  (boilerplate docs) are the skew risk -> cap bucket size / salt; AQE
  skew-join handles the join stage.
- The verify stage (exact Jaccard on candidates) touches only
  candidate pairs — the design keeps candidates per doc O(bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash32, normalize_text, whitespace_tokens


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (array<string>).

    ``transform(sequence(...))`` over the token array — pure Catalyst,
    no UDF (SURVEY §2.12 mapping).
    """
    toks = whitespace_tokens(normalize_text(col))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def _seeded_hash(i: int):
    # closure factory: a default-arg lambda would gain a second
    # parameter, which PySpark's transform() binds to the array INDEX
    return lambda s: hash32(F.concat(F.lit(f"{i}:"), s))


def minhash_signature(shingles: Column, n_hashes: int = 16) -> list[Column]:
    """MinHash signature: for seed i, min over shingles of
    hash32(i || ':' || shingle). Returns one column per seed."""
    return [
        F.array_min(F.transform(shingles, _seeded_hash(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def add_minhash(
    df: DataFrame, text_col: str = "text", n_hashes: int = 16, k: int = 3
) -> DataFrame:
    sh = word_shingles(F.col(text_col), k)
    return df.withColumn("__sh", sh).select(
        "*", *minhash_signature(F.col("__sh"), n_hashes)
    ).drop("__sh")


def lsh_band_keys(n_hashes: int = 16, bands: int = 4) -> list[Column]:
    """Band a minhash signature: md5 over each band's rows. Docs
    sharing any band key are near-dup candidates."""
    rows = n_hashes // bands
    keys = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        keys.append(F.md5(F.concat_ws(",", *cols)).alias(f"band{b}"))
    return keys


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified with exact Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    sig = add_minhash(df.select(id_col, text_col), text_col, n_hashes, k)
    sig = sig.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("sh"),
        *lsh_band_keys(n_hashes, bands),
    ).cache()

    pairs = None
    for b in range(bands):
        left = sig.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col(f"band{b}"))
        right = sig.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col(f"band{b}"))
        cand = left.join(right, f"band{b}").where(F.col("id_a") < F.col("id_b")).drop(f"band{b}")
        pairs = cand if pairs is None else pairs.unionByName(cand)

    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(col: Column | str, bits: int = 32) -> Column:
    """Charikar simhash over whitespace tokens (multiset-weighted).

    For each bit b: sum over tokens of +1/-1 by token-hash bit b; the
    simhash bit is 1 iff the sum > 0. Folded as a single aggregate
    expression over the token array — per-row, shuffle-free.
    """
    toks = whitespace_tokens(normalize_text(col))
    hashes = F.transform(toks, lambda t: hash32(t))

    def _vote(bit_mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(bit_mask)) > 0, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for b in range(bits):
        votes = F.aggregate(hashes, F.lit(0).cast("long"), _vote(1 << b))
        out = out + F.when(votes > 0, F.lit(1 << b)).otherwise(0).cast("long")
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact n-gram Jaccard within blocking buckets (e.g. lang+source).

    The blocked self-join is the classic scalable formulation: pair
    count is sum of bucket² not corpus² — bucket keys must be chosen
    so buckets stay small (cardinality analysis is the operator's
    contract at 100 TB).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in bucket_cols],
        word_shingles(F.col(text_col), k).alias("sh"),
    )
    left = base.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), *bucket_cols
    )
    right = base.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), *bucket_cols
    )
    pairs = left.join(right, bucket_cols).where(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", *bucket_cols, "jaccard")
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by normalized-text fingerprint, keep lowest id
    (deterministic keep-first — SURVEY §2.6 O3)."""
    from .dedup import dedup_keep_first

    from .text import fingerprint

    with_fp = df.withColumn("__fp", fingerprint(F.col(text_col)))
    return dedup_keep_first(with_fp, ["__fp"], [id_col]).drop("__fp")
