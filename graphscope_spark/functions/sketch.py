"""Deterministic, engine-portable HyperLogLog cardinality sketch.

Estimating distinct counts (vocabulary size, unique URLs, unique users)
at 100 TB is a one-pass aggregate with a sketch; Spark's builtin
``approx_count_distinct`` uses an engine-private hash, so its output
can't be cross-checked against another engine.  This HLL is built
entirely from md5 — which Spark and DuckDB share bit-for-bit — so the
WHOLE sketch (every register) is reproducible in plain SQL and the
driver's DuckDB oracle verifies the estimate exactly, not just
approximately.

Construction (classic Flajolet HLL, m = 2**b registers):
- h = md5(value) as 32 hex chars;
- register = first 3 hex digits (12 bits) mod m;
- rank     = 1 + (# leading zero bits) of the NEXT 15 hex digits
  (60 bits), i.e. 4·(leading zero hex digits) + extra bits of the
  first non-zero digit + 1; an all-zero window ranks 61.
- estimate = alpha_m · m² / Σ 2^(-M_j) with the standard small-range
  correction E ≤ 2.5m → m·ln(m/V) when V (empty registers) > 0.

Plan shape: explode/select → ONE hash aggregate keyed (groups, reg)
with map-side partials (at most m rows per group survive the partial,
so the shuffle is bounded by |groups|·m regardless of input size) →
ONE second aggregate to fold registers into the estimate.  No UDF.

Accuracy: σ ≈ 1.04/√m → ~3.3% at b=10; pytest pins observed error vs
exact distinct counts.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


# extra leading zero BITS contributed by the first non-zero hex digit
_EXTRA = {1: 3, 2: 2, 3: 2, 4: 1, 5: 1, 6: 1, 7: 1}


def _rank_expr(hexwin: Column) -> Column:
    """1 + leading-zero-bit count of the 60-bit window given as 15 hex
    chars; all-zero window → 61."""
    zeros = F.length(F.regexp_extract(hexwin, r"^(0*)", 1))
    first = F.substring(F.concat(F.regexp_replace(hexwin, r"^0+", ""), F.lit("x")), 1, 1)
    extra = F.when(first == "x", F.lit(0))
    for d, e in _EXTRA.items():
        extra = extra.when(first == format(d, "x"), F.lit(e))
    extra = extra.otherwise(F.lit(0))
    return (F.lit(4) * zeros + extra + F.lit(1)).cast("int")


def hll_registers(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    b: int = 10,
) -> DataFrame:
    """(group_cols..., reg, max_rank): the materialized sketch."""
    m = 1 << b
    gc = [F.col(c) for c in (group_cols or [])]
    h = F.md5(F.col(col).cast("string"))
    reg = (F.conv(F.substring(h, 1, 3), 16, 10).cast("int") % m).alias("reg")
    rank = _rank_expr(F.substring(h, 4, 15))
    return (
        df.where(F.col(col).isNotNull())
        .select(*gc, reg, rank.alias("rank"))
        .groupBy(*(group_cols or []), "reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_cardinality(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    b: int = 10,
) -> DataFrame:
    """Distinct-count estimate per group (1 row per group; one global
    row when group_cols is None).  Columns: group_cols..., estimate
    (rounded 8dp — both engines agree to far tighter than that),
    n_registers (non-empty registers, an exactness witness)."""
    m = 1 << b
    alpha = _alpha(m)
    regs = hll_registers(df, col, group_cols, b)
    gb = regs.groupBy(*(group_cols or []))
    folded = gb.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_registers"),
    )
    # empty registers contribute 2^0 = 1 each
    s = F.col("s_present") + (F.lit(m) - F.col("n_registers")) * F.lit(1.0)
    raw = F.lit(alpha * m * m) / s
    v = F.lit(m) - F.col("n_registers")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return folded.select(
        *(group_cols or []),
        F.round(est, 8).alias("estimate"),
        F.col("n_registers").cast("long").alias("n_registers"),
    )


def hll_oracle_sql(
    source_sql: str,
    col: str,
    group_cols: list[str] | None = None,
    b: int = 10,
) -> str:
    """The DuckDB twin of hll_cardinality, generated from the same
    constants so the two engines can never drift.  ``source_sql`` is a
    query producing the input table (must expose ``col`` and the group
    columns)."""
    m = 1 << b
    alpha = _alpha(m)
    gc = list(group_cols or [])
    gsel = (", ".join(gc) + ",") if gc else ""
    gby = ("group by " + ", ".join(gc)) if gc else ""
    gby_reg = "group by " + ", ".join(gc + ["reg"])
    extra_cases = " ".join(
        f"when '{d:x}' then {e}" for d, e in _EXTRA.items()
    )
    return f"""
      with src as ({source_sql}),
      h as (
        select {gsel} md5(cast({col} as varchar)) as hx
        from src where {col} is not null
      ),
      rr as (
        select {gsel}
               ((instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 256
                + (instr('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16
                + (instr('0123456789abcdef', substr(hx, 3, 1)) - 1)) % {m} as reg,
               cast(4 * length(regexp_extract(substr(hx, 4, 15), '^(0*)', 1))
                 + case substr(regexp_replace(substr(hx, 4, 15), '^0+', '') || 'x', 1, 1)
                     {extra_cases} else 0 end
                 + 1 as int) as rank
        from h
      ),
      regs as (
        select {gsel} reg, max(rank) as max_rank from rr {gby_reg}
      ),
      folded as (
        select {gsel} sum(power(2.0, -max_rank)) as s_present,
               count(*) as n_registers
        from regs {gby}
      )
      select {gsel}
             round(case when cast({alpha * m * m!r} as double)
                          / (s_present + ({m} - n_registers) * 1.0)
                            <= cast({2.5 * m!r} as double)
                        and ({m} - n_registers) > 0
                   then cast({float(m)!r} as double)
                        * ln(cast({float(m)!r} as double) / ({m} - n_registers))
                   else cast({alpha * m * m!r} as double)
                          / (s_present + ({m} - n_registers) * 1.0)
                   end, 8) as estimate,
             cast(n_registers as bigint) as n_registers
      from folded
    """
