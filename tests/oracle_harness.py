"""Local re-implementation of the driver's DuckDB-oracle comparison.

Strictest interpretation: columns sorted by name, every cell rendered
to a canonical string, rows sorted, exact equality. If queries pass
here they should pass any order-insensitive value-hash.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np
import pandas as pd

from end_to_end_data_engineering_pipeline_spark.catalog import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return f"{int(f)}.0"
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return str(bool(v))
    return str(v)


def canonicalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if len(spdf) != len(oracle_pdf):
        problems.append(f"{name}: rowcount spark={len(spdf)} oracle={len(oracle_pdf)}")
    scols, srows = canonicalize(spdf)
    ocols, orows = canonicalize(oracle_pdf)
    if scols != ocols:
        problems.append(f"{name}: columns spark={scols} oracle={ocols}")
        return problems
    if srows != orows:
        n_bad = 0
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"{name}: row {i} spark={a} oracle={b}")
        extra = abs(len(srows) - len(orows))
        problems.append(f"{name}: {n_bad} differing rows, {extra} extra")
    return problems
