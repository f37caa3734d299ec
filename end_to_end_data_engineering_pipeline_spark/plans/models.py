"""Model runner: the dbt layer re-expressed (SURVEY §3 entry point 3).

Each model is a function ``(SparkSession) -> DataFrame`` registered
with a name + materialization:
  - "view"  -> createOrReplaceTempView (dbt staging layer,
               dbt/dbt_project.yml:17-18 / S11)
  - "table" -> overwrite Parquet + register view (dbt analytics layer,
               dbt_project.yml:19-21 / S12 — full rebuild each run)

Dependencies are implicit: a model's body reads upstream models via
``spark.table(name)`` (the analog of dbt ``ref()``); registration
order is execution order (the reference DAG is linear, SURVEY §3).
Views are Catalyst plan subtrees — all rewrites (pushdown, pruning)
apply through them, so "view" models cost nothing at plan time.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

ModelFn = Callable[[SparkSession], DataFrame]


@dataclass
class Model:
    name: str
    fn: ModelFn
    materialization: str = "view"  # "view" | "table"


@dataclass
class ModelRunner:
    warehouse_dir: str
    models: list[Model] = field(default_factory=list)

    def model(self, name: str, materialization: str = "view"):
        def deco(fn: ModelFn) -> ModelFn:
            self.models.append(Model(name, fn, materialization))
            return fn

        return deco

    def run(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Build every model in registration order; return name -> DF."""
        out: dict[str, DataFrame] = {}
        for m in self.models:
            df = m.fn(spark)
            if m.materialization == "table":
                path = os.path.join(self.warehouse_dir, m.name)
                tmp = path + ".__tmp"
                df.write.mode("overwrite").parquet(tmp)
                if os.path.isdir(path):
                    import shutil

                    shutil.rmtree(path)
                os.rename(tmp, path)
                df = spark.read.parquet(path)
            df.createOrReplaceTempView(m.name)
            out[m.name] = df
        return out
