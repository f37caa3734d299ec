"""p15 corpus-release composition probe at 1M documents.

The release pipeline is THE product of the curation engine: quality
gate (broadcast-weights linear scorer) -> corpus-wide exact dedup ->
benchmark decontamination -> lang-partitioned snapshot commit. The
per-stage probes measure each operator alone; this runs the p15
composition end-to-end at 1M docs (curation probe corpus + a lang
column + a mod-97 benchmark split) and records per-stage wall, the
commit wall, and total shuffle bytes.

Run:  python docs/probes/release_1m.py  [N_DOCS]
Results transcribed into docs/SCALE.md §Curation-composition.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/docs/", 1)[0])
sys.path.insert(0, __file__.rsplit("/release_1m.py", 1)[0])

from pyspark.sql import functions as F

from curation_1m import corpus, shuffle_totals
from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
    contamination_hits,
    exact_dedup,
)
from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
    snapshot_read,
    snapshot_write_partitioned,
)
from end_to_end_data_engineering_pipeline_spark.operators.text import (
    quality_score_linear,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="release_probe")
    docs = corpus(spark, n).withColumn(
        "lang",
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("de"), F.lit("sw")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ),
    )
    docs.write.mode("overwrite").parquet("/tmp/release_probe_docs")
    docs = spark.read.parquet("/tmp/release_probe_docs")
    print(f"corpus: {docs.count():,} docs")

    bench = docs.where(F.col("doc_id") % 97 == 0)
    raw = docs.where(F.col("doc_id") % 97 != 0)
    store = tempfile.mkdtemp(prefix="release_probe_") + "/rel"

    r0, w0 = shuffle_totals(spark)
    t_total = time.perf_counter()
    stages: dict[str, float] = {}

    t0 = time.perf_counter()
    scores = quality_score_linear(raw, dim=64)
    keep = scores.where(
        F.col("raw_score") + F.col("n_tokens") >= 0
    ).select("doc_id")
    gated = raw.join(keep, "doc_id")
    n_gated = gated.count()
    stages["1_quality_gate"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ded = exact_dedup(gated)
    n_ded = ded.count()
    stages["2_exact_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    hits = contamination_hits(ded, bench).select(
        F.col("id").alias("doc_id")
    )
    release = ded.join(F.broadcast(hits), "doc_id", "left_anti")
    n_rel = release.count()
    stages["3_decontaminate"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    snapshot_write_partitioned(
        spark, store, release, "lang", extra={"probe": True}
    )
    stages["4_versioned_commit"] = time.perf_counter() - t0
    assert snapshot_read(spark, store).count() == n_rel  # round-trip

    total = time.perf_counter() - t_total
    r1, w1 = shuffle_totals(spark)
    print(f"quality-gated:  {n_gated:,}")
    print(f"exact-deduped:  {n_ded:,}")
    print(f"released:       {n_rel:,}")
    for k, v in stages.items():
        print(f"{k}: {v:.1f}s")
    print(f"total: {total:.1f}s")
    if r0 >= 0:
        print(f"shuffle read:  {(r1 - r0) / 1e9:.2f} GB")
        print(f"shuffle write: {(w1 - w0) / 1e9:.2f} GB")
    shutil.rmtree(store.rsplit("/", 1)[0], ignore_errors=True)


if __name__ == "__main__":
    main()
