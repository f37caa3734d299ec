"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline (Ilyesse-soc/
end-to-end-data-engineering-pipeline), rebuilt Spark-first.

Layout:
  session      - SparkSession factory (UTC, AQE, Arrow)
  catalog      - testdata table registry / loaders
  schemas      - explicit StructTypes per layer (bronze/silver/gold)
  sources/     - ingestion adapters (REST fetch, parquet IO, batch log)
  operators/   - custom operators (flatten, dedup, merge-upsert, text,
                 similarity) built as DataFrame compositions
  functions/   - scalar helpers (surrogate keys, ISO date parts,
                 oracle-stable decimal aggregates)
  quality/     - expectations module + fail-fast gate + audit sink
  plans/       - model runner (view/table materializations), star schema
  streaming/   - Structured Streaming surface (windowed aggs, dedup)
  queries/     - the registered query surface consumed by
                 __spark_entry__.py (queries() + oracle_sql())
"""

__version__ = "0.1.0"
