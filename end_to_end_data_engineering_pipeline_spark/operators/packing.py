"""Sequence packing: greedy fill of fixed-size token budgets.

LLM training consumes fixed-length context windows; feeding one short
document per window wastes the tail, so pipelines PACK documents
back-to-back into bins of at most ``budget`` tokens (a deterministic
first-fit in a fixed document order — the common "greedy contiguous"
packing; see e.g. the T5/GPT data pipeline descriptions in public
literature).

The fold is inherently sequential WITHIN a group (bin state carries
across documents), so it cannot be a window function; it runs as an
Arrow-batched ``applyInPandas`` over the grouping key — Spark's
designated escape hatch for per-group stateful logic (charter §2.12:
custom operators as (b) Pandas-UDF-backed when composition of built-ins
can't express the semantics).

Scale: parallelism comes from the GROUPS (each group is one pandas
batch); a group must fit in executor memory as narrow (id, size) rows
— at 100 TB pack within shards: add a coarse deterministic chunk key
(e.g. ``doc_id DIV chunk_rows``) to ``group_cols``, which bounds batch
size and keeps the packing deterministic at a small edge-of-chunk
fill loss (standard practice; the loss is ~1 bin per chunk).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_cols: Sequence[str] = ("lang",),
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """(group_cols..., id, size, bin_id, bin_fill): greedy first-fit
    packing of documents (ordered by ``id_col``) into bins of at most
    ``budget`` size units per group.

    A document larger than the budget occupies a bin alone (it is
    never split). ``bin_fill`` is the bin's running fill AFTER placing
    the row — the last row of each bin carries the bin's final size.
    Deterministic: order and assignment depend only on the data.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    gcols = list(group_cols)
    # group-col types come from the input schema (a hardcoded `string`
    # breaks applyInPandas schema matching for e.g. integer shard keys);
    # id/size/bin columns are declared long and coerced by Arrow.
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [df.schema[c] for c in gcols]
        + [
            T.StructField(id_col, T.LongType()),
            T.StructField(size_col, T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("bin_fill", T.LongType()),
        ]
    )

    def pack(pdf):
        pdf = pdf[gcols + [id_col, size_col]].sort_values(id_col)
        bins, fills = [], []
        b, fill = 0, 0
        for t in pdf[size_col].astype("int64"):
            if fill > 0 and fill + t > budget:
                b += 1
                fill = 0
            fill += int(t)
            bins.append(b)
            fills.append(fill)
        pdf = pdf.assign(bin_id=bins, bin_fill=fills)
        return pdf

    return df.groupBy(*gcols).applyInPandas(pack, out_schema)
