"""Dump ``.explain("formatted")`` for registry keys (the judge-facing
plan evidence under plans/<tag>/): builds each named query at
$SPARK_GRAFT_SF_DIR and writes the formatted physical plan to
plans/<tag>/<short>_<suffix>.txt.

Keys whose declared query returns a PINNED (driver-local) result or
runs its work at construction time (lifecycle/mutation keys, and any
loop that materializes through checkpoints) have a trivial final plan;
for those, pass an internal probe name from PROBES below instead —
each probe rebuilds the interesting intermediate frame and dumps THAT
plan (e.g. ``t12cc`` = the pre-checkpoint pair set feeding
connected_components, the r16 verdict #7 ask).

Run: python scripts/dump_plan.py --tag=r17 --suffix=before t58 t42 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_data_engineering_pipeline_spark.queries import all_queries
from end_to_end_data_engineering_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _t12_cc_input(spark, sf_dir):
    """The pair set t12 feeds connected_components — the frame the
    operator localCheckpoints (r16 verdict #7: the committed t12 dumps
    showed only the trivial post-checkpoint 2-node plan)."""
    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        minhash_lsh_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.3)


def _t46_round1_seq(spark, sf_dir):
    """Round 1's pre-checkpoint merged symbol table — the per-round
    plan the BPE loop actually executes (t46's declared output is a
    driver-built metrics frame, so its final plan is trivial)."""
    from pyspark.sql import Window, functions as F

    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators import text as T

    docs = load(spark, sf_dir, "documents")
    wf = T.bpe_word_freq(docs)
    chars = wf.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    ).select(
        "word", "freq", "i", F.expr("substring(word, i, 1)").alias("sym")
    )
    wq = Window.partitionBy("word").orderBy("i")
    seq = chars.withColumn("nxt", F.lead("sym").over(wq))
    pairs = (
        seq.where(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    top = pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()
    mx, my = top[0]["l"], top[0]["r"]
    return T._bpe_apply_merge(seq, mx, my).withColumn(
        "nxt", F.lead("sym").over(wq)
    )


def _q94_rank(spark, sf_dir):
    """q94's 3-superstep rank frame PRE-topk (the declared query pins
    its top-20 driver-local, so the final plan is a trivial RDD scan;
    this probe rebuilds the frame that carries the cost — same capture
    the r16 dumps used)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.queries.relational_ext3 import (
        _Q94_SCALE,
    )

    li = load(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + 1000000000).cast("long").alias("dst"),
    ).distinct()
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(F.col("dst"))
        .cache()
    )
    deg = (
        edges.groupBy("dst")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("dst").alias("src"), "deg")
        .cache()
    )
    nodes = deg.select(F.col("src").alias("node"))
    n_nodes = int(nodes.count())
    tel = (15 * _Q94_SCALE) // (100 * n_nodes)
    r = nodes.select("node", F.lit(_Q94_SCALE // n_nodes).alias("pr"))
    for _ in range(3):
        rd = r.join(deg, r["node"] == deg["src"]).select(
            "src", F.expr("(85 * pr) div (100 * deg)").alias("c")
        )
        contribs = (
            edges.join(F.broadcast(rd), "src")
            .select("dst", "c")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = contribs.select(
            F.col("dst").alias("node"),
            (F.lit(tel) + F.col("s")).cast("long").alias("pr"),
        )
    return r


def _t58_prefix(spark, sf_dir):
    """t58's pre-checkpoint prefix pipeline (r17: the committed plan
    truncates at the LogicalRDD, so this probe rebuilds the subtree
    that the checkpoint materializes — dfreq window + rank windows +
    prefix filter)."""
    from pyspark.sql import Window, functions as F

    from end_to_end_data_engineering_pipeline_spark.catalog import load
    from end_to_end_data_engineering_pipeline_spark.operators.dedup_fuzzy import (
        shingled_docs,
    )

    docs = load(spark, sf_dir, "documents")
    base = shingled_docs(docs, "doc_id", "text", 3).select(
        "id", F.col("sh").alias("elems")
    )
    toks = (
        base.select("id", F.explode_outer("elems").alias("tok"))
        .where(F.col("tok").isNotNull())
        .cache()
    )
    w_tok = Window.partitionBy("tok")
    w_ord = Window.partitionBy("id").orderBy("tok_df", "tok")
    w_doc = Window.partitionBy("id")
    ranked = toks.withColumn(
        "tok_df", F.count(F.lit(1)).over(w_tok)
    ).select(
        "id",
        "tok",
        (F.row_number().over(w_ord) - 1).alias("pos"),
        F.count(F.lit(1)).over(w_doc).alias("n"),
    )
    return ranked.where(
        F.col("pos") < F.expr("n - ((n * 3 + 4) DIV 5) + 1")
    )


PROBES = {
    "t12cc": _t12_cc_input,
    "t46round": _t46_round1_seq,
    "q94rank": _q94_rank,
    "t58prefix": _t58_prefix,
}


def main() -> None:
    tag = "r17"
    suffix = "now"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            names.append(a)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    qs = all_queries()
    full = {n.split("_", 1)[0]: n for n in qs}
    spark = get_spark(app_name="dump_plan")
    for n in names:
        if n in PROBES:
            df = PROBES[n](spark, SF_DIR)
        else:
            df = qs[full.get(n, n)](spark, SF_DIR)
        txt = _explain(df)
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{path}: {len(txt)} bytes", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
