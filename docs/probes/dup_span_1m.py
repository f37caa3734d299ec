"""dup_span_stats probe at 1M documents.

t37's gram stream is the largest intermediate any text operator here
produces (one row per token-window: ~n_tokens rows per doc), so the
claim that it shuffles NARROW — (md5, id, start), never the token
array — is the one to measure. Reuses the curation probe's corpus
(5% exact clones, 30% shared 30-token boilerplate header, 2%
near-twins): the boilerplate docs should surface with high
dup_fraction since every window inside the shared header repeats
~300k times — which also exercises the hot-gram skew ceiling the
docstring names.

Run:  python docs/probes/dup_span_1m.py  [N_DOCS]
Results transcribed into docs/SCALE.md §Dedup.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/docs/", 1)[0])
sys.path.insert(0, __file__.rsplit("/dup_span_1m.py", 1)[0])

from pyspark.sql import functions as F

from curation_1m import corpus, shuffle_totals
from end_to_end_data_engineering_pipeline_spark.operators.text import (
    dup_span_stats,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="dup_span_probe")
    docs = corpus(spark, n)
    docs.write.mode("overwrite").parquet("/tmp/dup_span_probe_docs")
    docs = spark.read.parquet("/tmp/dup_span_probe_docs")
    print(f"corpus: {docs.count():,} docs")

    r0, w0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    out = dup_span_stats(docs, n=5, min_count=2)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("dup_fraction") > 0).cast("long")).alias("touched"),
        F.sum((F.col("dup_fraction") >= 0.5).cast("long")).alias("mostly"),
        F.round(F.avg("dup_fraction"), 4).alias("avg_frac"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    r1, w1 = shuffle_totals(spark)
    print(f"docs={agg.docs:,} dup-touched={agg.touched:,} "
          f"mostly-dup={agg.mostly:,} avg_frac={agg.avg_frac}")
    print(f"wall: {wall:.1f}s")
    if r0 >= 0:
        print(f"shuffle read:  {(r1 - r0) / 1e9:.2f} GB")
        print(f"shuffle write: {(w1 - w0) / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
