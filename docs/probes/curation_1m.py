"""Composed curation-pipeline probe at 1M documents (r6 verdict #8).

The per-operator probes in docs/SCALE.md measure single stages; a
real corpus-curation user runs the t34 COMPOSITION end-to-end: raw
stats -> exact dedup -> chunk dedup -> near-dup canonicalization.
This probe runs that composition once at 1M synthetic documents with
the duplicate structure the stages exist to catch, and records wall
per stage plus total shuffle read/write bytes (AppStatusStore).
Results are transcribed into docs/SCALE.md §Curation-composition.

Corpus shape (pure column expressions, no driver rows):
  - 5%  exact duplicates (doc i clones doc i-1's full text)
  - 30% boilerplate: a shared 30-token license header + unique tail
        (invisible to exact dedup, caught at chunk granularity)
  - 2%  near-twins (7 of 8 tokens shared -> LSH-discoverable)
  - remainder unique 8-token docs

Run:  python docs/probes/curation_1m.py  [N_DOCS]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/docs/", 1)[0])

from pyspark.sql import DataFrame, functions as F

from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
    exact_dedup,
    minhash_lsh_pairs,
)
from end_to_end_data_engineering_pipeline_spark.operators.graph import (
    resolve_canonical,
)
from end_to_end_data_engineering_pipeline_spark.operators.text import (
    dedup_chunks,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark

# exactly 30 tokens: fills one dedup_chunks chunk, shared corpus-wide
HEADER = " ".join(f"lic{i} term{i} clause{i}" for i in range(10))


def corpus(spark, n: int) -> DataFrame:
    own, prev = F.col("id"), F.col("id") - 1

    def toks(base, js):
        return [
            F.md5(F.concat(base.cast("string"), F.lit(str(j)))) for j in js
        ]

    def body(base):
        return F.concat_ws(" ", *toks(base, range(8)))

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        # i%20==5 -> i-1 is always a plain-body doc (never boilerplate
        # or twin), so the clone really is byte-identical to doc i-1
        F.when(F.col("id") % 20 == 5, body(prev))
        .when(
            (F.col("id") % 10) < 3,
            F.concat(F.lit(HEADER + " "), F.md5(own.cast("string"))),
        )
        .when(
            F.col("id") % 50 == 7,
            F.concat_ws(" ", *toks(prev, range(7)), F.md5(own.cast("string"))),
        )
        .otherwise(body(own))
        .alias("text"),
    )


def shuffle_totals(spark) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over all stages so far."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        jlist = sc._jvm.java.util.ArrayList
        no_quantiles = sc._gateway.new_array(sc._jvm.double, 0)
        it = store.stageList(
            jlist(), False, False, no_quantiles, jlist()
        ).iterator()
        r = w = 0
        while it.hasNext():
            s = it.next()
            r += s.shuffleReadBytes()
            w += s.shuffleWriteBytes()
        return r, w
    except Exception as exc:  # metrics are best-effort
        print("statusStore unavailable:", exc)
        return -1, -1


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="curation_probe")
    docs = corpus(spark, n)
    docs.write.mode("overwrite").parquet("/tmp/curation_probe_docs")
    docs = spark.read.parquet("/tmp/curation_probe_docs")
    print(f"corpus: {docs.count():,} docs")

    r0, w0 = shuffle_totals(spark)
    t_total = time.perf_counter()
    stages: dict[str, float] = {}

    t0 = time.perf_counter()
    n_exact = exact_dedup(docs).count()
    stages["1_exact_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    kept_chunks = (
        dedup_chunks(docs, chunk_tokens=30)
        .where(F.col("n_kept") > 0)
        .count()
    )
    stages["2_chunk_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, threshold=0.3, max_band_size=256)
    n_canon = resolve_canonical(docs, pairs).count()
    stages["3_neardup_canonical"] = time.perf_counter() - t0

    total = time.perf_counter() - t_total
    r1, w1 = shuffle_totals(spark)
    print(f"exact-dedup survivors:  {n_exact:,}")
    print(f"chunk-dedup survivors:  {kept_chunks:,}")
    print(f"canonical corpus:       {n_canon:,}")
    for k, v in stages.items():
        print(f"{k:22s} {v:7.1f} s")
    print(f"TOTAL                  {total:7.1f} s")
    if r1 >= 0:
        print(
            f"shuffle read  {(r1 - r0) / 1e6:,.0f} MB, "
            f"write {(w1 - w0) / 1e6:,.0f} MB"
        )
    spark.stop()


if __name__ == "__main__":
    main()
