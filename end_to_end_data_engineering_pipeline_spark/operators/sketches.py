"""Deterministic count-min sketch (CMS) over a token stream.

q31's HLL++/KLL twins are approximate-by-design with opaque seeds, so
they sit under rows-only checks. CMS is different: given a FIXED hash
family it is a deterministic function of the input multiset — every
counter and every estimate is exactly replayable in another engine.
This module uses the repo's shared hash32 primitive
(``h_i(t) = hash32(t || '#' || i) % w``), so the full sketch pipeline
(build → point query) hash-matches a DuckDB replay (t29), while the
CMS guarantee (estimate >= true count, overestimate bounded by
collisions) is pytest-pinned.

Scale story (Cormode/Muthukrishnan '05): the counter table is d*w
rows REGARDLESS of corpus size — partial aggregation IS the sketch
merge, so each map task emits at most d*w counters and the shuffle
carries kilobytes from a 100 TB token stream. Point queries broadcast
the counter table (d*w rows) against the key set. The d-fold stream
expansion happens IN-ROW by exploding positions (``sequence(0,d-1)``)
and hashing per exploded row — one md5 per (token, row), never a
re-evaluated array-building chain (docs/SCALE.md HOF staging rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash32, whitespace_tokens


def _bucket(token: Column, i: Column, w: int) -> Column:
    return hash32(F.concat(token, F.lit("#"), i.cast("string"))) % w


def cms_build(
    df: DataFrame,
    d: int = 4,
    w: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """(i, bucket, c): the d x w counter table for the corpus token
    stream. One aggregate; group cardinality d*w, so map-side combine
    collapses every partition to <= d*w rows before the exchange."""
    toks = df.select(
        F.explode(whitespace_tokens(text_col)).alias("token")
    )
    expanded = toks.select(
        "token",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
    )
    return expanded.groupBy(
        F.col("i").cast("int").alias("i"),
        _bucket(F.col("token"), F.col("i"), w).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    d: int = 4,
    w: int = 64,
    key_col: str = "token",
) -> DataFrame:
    """(token, cms_n): CMS point estimate per key — min over the d
    rows of the key's bucket counters (0 when a bucket is empty, i.e.
    the key never occurred and nothing collided with it). The counter
    table is broadcast: d*w rows against however many keys."""
    probes = keys.select(key_col).select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
    )
    probes = probes.select(
        key_col,
        F.col("i").cast("int").alias("i"),
        _bucket(F.col(key_col), F.col("i"), w).alias("bucket"),
    )
    joined = probes.join(F.broadcast(counters), ["i", "bucket"], "left_outer")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("c", F.lit(0))).cast("long").alias("cms_n")
    )


# ---------------------------------------------------------------------------
# Bloom filter: deterministic build-side membership prefilter
# ---------------------------------------------------------------------------


def bloom_positions(key: Column, d: int, m: int) -> list[Column]:
    """The d bit positions of a key (hash32 of key || '!' || i, mod m).
    String-cast keys so any key type shares one hash recipe."""
    return [
        hash32(F.concat(key.cast("string"), F.lit("!"), F.lit(str(i)))) % m
        for i in range(d)
    ]


def bloom_bitmap(
    build: DataFrame, key_col: str, d: int = 3, m: int = 4096
) -> list[int]:
    """Build the filter: the m-bit bitmap as ``ceil(m/64)`` int64 words.
    The distinct occupied-position set is collected driver-side — it is
    bounded by m (filter metadata, like IVF centroids), never by build
    rows; the aggregation that produces it is one distinct over
    d x |build| narrow position rows."""
    rows = build.select(
        F.explode(
            F.array(*bloom_positions(F.col(key_col), d, m))
        ).alias("pos")
    ).distinct()
    words = [0] * ((m + 63) // 64)
    for r in rows.collect():
        p = int(r.pos)
        words[p // 64] |= 1 << (p % 64)
    # keep values in signed-int64 range for the Spark literal array
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_member(key: Column, words: list[int], d: int, m: int) -> Column:
    """In-row membership test against the literal bitmap: d O(1) word
    lookups (element_at + shift), no join, no explode — the probe side
    of a 100 TB scan pays a few ALU ops per row, which is the entire
    point of shipping a bloom filter to the scan instead of the build
    table. May return true for a key never inserted (false positive,
    rate ~(1-e^{-dn/m})^d); never false for an inserted key."""
    # one SQL-text parse for the word array: op-by-op Column literals
    # would pay ~len(words) Py4J round trips of plan build (docs/
    # SCALE.md "plan BUILD time is a cost too")
    arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    checks = []
    for pos in bloom_positions(key, d, m):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        # call_function: the SQL shiftright accepts a COLUMN shift
        # amount (the python F.shiftright wrapper takes only literals)
        checks.append(
            F.call_function(
                "shiftright", word, (pos % 64).cast("int")
            ).bitwiseAND(F.lit(1)) == 1
        )
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (register table + raw estimate)
# ---------------------------------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}  # Flajolet et al. 2007
HLL_ALPHA = _HLL_ALPHA[HLL_P]


def _hll_rho(key: Column, p: int = HLL_P) -> tuple[Column, Column]:
    """(register, rho) for one key: the shared 32-bit hash's top ``p``
    bits pick the register; rho is 1 + the count of leading zeros in
    the remaining ``32-p`` bits (w=0 -> rho = 32-p+1). Leading zeros
    come from the BINARY-STRING length — ``length(bin(w))`` is
    floor(log2(w))+1 for w>0 in Spark and DuckDB alike — so rho is a
    pure integer function of md5, never a float log."""
    h = hash32(key)
    tail_bits = 32 - p
    reg = (h / F.lit(1 << tail_bits)).cast("long")  # top p bits
    w = h % (1 << tail_bits)
    rho = F.when(w == 0, F.lit(tail_bits + 1)).otherwise(
        tail_bits + 1 - F.length(F.bin(w))
    )
    return reg.cast("int"), rho.cast("int")


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = HLL_P,
) -> DataFrame:
    """HyperLogLog register table: per group, ``2^p`` rows of
    (register, max rho). Like the CMS (t29), the q31 objection —
    approximate sketches hide opaque seeds — does not apply when the
    hash family is FIXED: the register table is a deterministic
    function of the input SET (duplicate keys cannot change a max),
    exactly replayable by any engine with md5.

    Scale story (Flajolet et al. 2007 / Heule et al. 2013): registers
    merge by MAX, and max is what partial aggregation computes — each
    map task emits <= 2^p rows per group whatever its input size, so
    the shuffle carries register tables, not keys. This is how a
    100 TB distinct-count runs without moving the keys: the exact
    answer needs a shuffle of every distinct key; the sketch needs
    64 rows per group. Estimating UNIONS across groups (or days) is a
    further max of their register tables — no re-scan."""
    gcols = list(group_cols or [])
    reg, rho = _hll_rho(F.col(key_col).cast("string"), p)
    return (
        df.select(*gcols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*gcols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = HLL_P,
) -> DataFrame:
    """Raw HLL estimate per group from a register table:
    ``alpha_m * m^2 / (zeros + sum(2^-max_rho))`` with ``m - n_regs``
    absent registers contributing 2^0 each. ENGINE-EXACT by
    construction: every 2^-rho is a dyadic rational with denominator
    <= 2^27, so the double harmonic sum is exact in any order, and
    the final multiply-divide is one correctly-rounded IEEE op — the
    raw estimate hash-matches across engines with NO rounding fudge
    (the small-range ln() correction is deliberately omitted: ln is
    not correctly-rounded in every engine, and the raw estimate is
    the deterministic core; accuracy itself is pytest-pinned).
    Returns (group..., n_registers_set, raw_estimate)."""
    gcols = list(group_cols or [])
    m = 1 << p
    alpha = _HLL_ALPHA.get(p, 0.7213 / (1 + 1.079 / m))
    # 1.0 / (1 << rho), not pow(): a division by a power of two is one
    # correctly-rounded op onto an exactly-representable value in any
    # engine; pow()'s rounding is libm's business
    harm = F.sum(F.expr("CAST(1 AS DOUBLE) / shiftleft(1, max_rho)"))
    nset = F.count(F.lit(1))
    return registers.groupBy(*gcols).agg(
        nset.cast("long").alias("n_registers_set"),
        F.round(
            F.lit(alpha * m * m) / (harm + (F.lit(m) - nset)), 6
        ).alias("raw_estimate"),
    )
