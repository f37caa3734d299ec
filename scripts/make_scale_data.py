"""Tile the driver's sf0.1 fixtures K-fold into a larger scale factor
for the headline scaling sweep (docs/SCALE.md "Measured scaling").

Usage: python scripts/make_scale_data.py OUT_DIR [K]

Produces OUT_DIR/sf{0.1*K}/<table>.parquet with the same schemas as
/root/testdata/sf0.1 and K x the fact rows, plus an sf0.001 symlink so
bench.py's warm pass resolves. Tiling rules keep the data STATISTICALLY
comparable to a genuinely bigger corpus instead of K copies of the same
bytes:

- region/nation stay single-copy (dimensions grow slower than facts;
  they must remain broadcast-able, as at 100 TB).
- every fact/entity key shifts by copy_index * (max_base_key + 1), so
  referential joins (orders->customer, lineitem->orders/part/supplier)
  keep exactly K x the matches — never cross-copy fan-out.
- documents get a per-copy token marker spliced into the text (copy 0
  is byte-identical to the base), so shingle/minhash/simhash families
  see K x the corpus with the SAME duplicate rate — without this,
  every base near-dup cluster would merge across copies and pair
  counts would grow K^2, an artifact of tiling rather than scale.
  The marker is ASCII-only: m4's oracle rests on VARCHAR-substring ≡
  byte-slice equivalence and guards against multibyte text.
- embeddings keep their vectors but shift label blocks per copy for
  the same reason (label-blocked pair generation stays linear).

This is a measurement harness for timing ratios only: derived columns
that depend on text content (documents.n_chars) are recomputed, and
correctness at this scale is NOT oracle-graded (the driver's gate runs
at sf0.01; scaling runs only read timings).
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"


def main() -> None:
    out_root = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf = round(0.1 * k, 4)
    out = os.path.join(out_root, f"sf{sf}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"'{BASE}/{t}.parquet'"

    def copy(sql: str, t: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    def stride(t: str, key: str) -> int:
        return con.sql(f"SELECT MAX({key}) + 1 FROM {src(t)}").fetchone()[0]

    copies = f"(SELECT UNNEST(range(0, {k})) AS i)"
    sc = stride("customer", "c_custkey")
    ss = stride("supplier", "s_suppkey")
    sp = stride("part", "p_partkey")
    so = stride("orders", "o_orderkey")
    se = stride("events", "event_id")
    su = stride("events", "user_id")
    sd = stride("documents", "doc_id")
    sv = stride("embeddings", "vec_id")
    sl = stride("embeddings", "label")

    copy(f"SELECT * FROM {src('region')}", "region")
    copy(f"SELECT * FROM {src('nation')}", "nation")
    copy(
        f"SELECT c_custkey + i*{sc} AS c_custkey, c_name, c_nationkey,"
        f" c_acctbal, c_mktsegment FROM {src('customer')}, {copies}",
        "customer",
    )
    copy(
        f"SELECT s_suppkey + i*{ss} AS s_suppkey, s_name, s_nationkey,"
        f" s_acctbal FROM {src('supplier')}, {copies}",
        "supplier",
    )
    copy(
        f"SELECT p_partkey + i*{sp} AS p_partkey, p_name, p_brand, p_type,"
        f" p_size, p_retailprice FROM {src('part')}, {copies}",
        "part",
    )
    copy(
        f"SELECT o_orderkey + i*{so} AS o_orderkey,"
        f" o_custkey + i*{sc} AS o_custkey, o_orderstatus, o_totalprice,"
        f" o_orderdate, o_orderpriority FROM {src('orders')}, {copies}",
        "orders",
    )
    copy(
        f"SELECT l_orderkey + i*{so} AS l_orderkey,"
        f" l_partkey + i*{sp} AS l_partkey,"
        f" l_suppkey + i*{ss} AS l_suppkey, l_linenumber, l_quantity,"
        f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        f" l_shipdate FROM {src('lineitem')}, {copies}",
        "lineitem",
    )
    copy(
        f"SELECT event_id + i*{se} AS event_id, ts,"
        f" user_id + i*{su} AS user_id, event_type, value, props"
        f" FROM {src('events')}, {copies}",
        "events",
    )
    copy(
        f"""SELECT doc_id + i*{sd} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE replace(text, ' ', ' c' || i || 'q') END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE replace(text, ' ', ' c' || i || 'q') END)
                    AS BIGINT) AS n_chars
            FROM {src('documents')}, {copies}""",
        "documents",
    )
    copy(
        f"SELECT vec_id + i*{sv} AS vec_id, embedding,"
        f" CAST(label + i*{sl} AS INTEGER) AS label"
        f" FROM {src('embeddings')}, {copies}",
        "embeddings",
    )

    warm = os.path.join(out_root, "sf0.001")
    if not os.path.exists(warm):
        os.symlink("/root/testdata/sf0.001", warm)
    print(f"done: {out} (sf={sf}, K={k})")


if __name__ == "__main__":
    main()
