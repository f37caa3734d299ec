"""Full-registry DuckDB-oracle verification (the r16/r17 green-tree
audit): run every declared query at a small SF and compare against its
declared oracle SQL with the driver-strict canonicalization in
tests/oracle_harness.py.

Usage: python scripts/verify_oracle.py [sf_dir] [key_prefix ...]
  sf_dir defaults to /root/testdata/sf0.01; optional key prefixes
  (e.g. q94 t58) restrict the run to matching keys.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from oracle_harness import canonicalize, duckdb_con  # noqa: E402

from end_to_end_data_engineering_pipeline_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)
from end_to_end_data_engineering_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    prefixes = args[1:] if args and os.path.isdir(args[0]) else args
    qs, os_ = all_queries(), all_oracles()
    names = sorted(qs)
    if prefixes:
        names = [
            n for n in names
            if any(n == p or n.startswith(p + "_") or n.startswith(p)
                   for p in prefixes)
        ]
    spark = get_spark(app_name="verify_oracle")
    con = duckdb_con(sf)
    bad = []
    for name in names:
        try:
            got = canonicalize(qs[name](spark, sf).toPandas())
            want = canonicalize(con.execute(os_[name]).df())
            ok = got == want
        except Exception as e:  # noqa: BLE001
            ok = False
            print(f"{name} ERROR {e}", flush=True)
        if ok:
            print(f"{name} OK", flush=True)
        else:
            bad.append(name)
            print(f"{name} MISMATCH", flush=True)
    print("DONE bad=", len(bad), bad, flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
