"""Multi-format source/sink surface: Parquet (default), ORC, CSV, JSON,
and JDBC/Delta stubs.

The reference moves data through Parquet files and Postgres tables
(SURVEY §2.1); the engine's native interchange is Parquet, with the
other formats exposed for ingest/export edges. All readers take an
explicit schema — inference is banned on production paths (one full
extra scan, and type drift breaks the layer contracts in schemas.py).

Format guidance at scale: columnar (parquet/orc) for anything queried
(pushdown + pruning); line formats (csv/json) only at the very edge,
converted to parquet on first touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_WRITERS = {
    "parquet": lambda w: w.parquet,
    "orc": lambda w: w.orc,
    "csv": lambda w: w.option("header", True).csv,
    "json": lambda w: w.json,
}


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    if fmt not in _WRITERS:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(_WRITERS)}")
    _WRITERS[fmt](df.write.mode(mode))(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "csv":
        if schema is None:
            raise ValueError("csv requires an explicit schema (no inference)")
        return reader.option("header", True).csv(path)
    if fmt == "json":
        if schema is None:
            raise ValueError("json requires an explicit schema (no inference)")
        return reader.json(path)
    raise ValueError(f"unsupported format {fmt!r}")


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC source (the reference's Postgres edge). Needs the driver jar
    on the classpath — absent in this image, so this raises a clear
    error instead of a Py4J stack."""
    try:
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .options(**options)
            .load()
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "JDBC read failed — is the driver jar on spark.jars? "
            f"(url={url!r}, table={table!r})"
        ) from e


def delta_available(spark: SparkSession) -> bool:
    """True if Delta Lake classes are on the classpath (they are not in
    this image; merge.py falls back to anti-join+union MERGE)."""
    try:
        # py4j resolves attribute chains lazily (a missing package still
        # yields a JavaPackage object) — Class.forName is the real probe
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False
