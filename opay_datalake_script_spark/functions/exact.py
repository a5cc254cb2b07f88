"""Exact fixed-point display arithmetic shared by every query that
shows a rounded money/quantity aggregate (SURVEY.md §2 cross-cutting).

The hazard this module exists to kill, in two layers:

1. **Sum order.** Summing doubles is order-sensitive; a 2-dp display
   rounding can flip between engines/summation orders when the true sum
   sits near a half-cent. Fix: accumulate in exact integer
   ten-thousandths (`e4`) — fixture values carry <= 4 decimals, so e4
   is lossless and integer sums are order-insensitive.
2. **Quotient rounding.** Even with an exact integer sum, rounding the
   DOUBLE quotient sum/1e4 still diverges: Spark rounds doubles via
   their shortest decimal repr ('622758.695' -> .70, HALF_UP) while
   DuckDB rounds the binary value (622758.69499... -> .69). Fix: never
   round a double — Spark divides and HALF_UP-rounds in DECIMAL
   (decimal/int division stays decimal at scale >= 6, exact for <=4-dp
   quotients), DuckDB spells HALF_UP in pure HUGEINT floor-division
   (its decimal division degrades to DOUBLE, measured), and only the
   final 2-dp value is cast to double for display. Fuzzed bit-identical
   across engines on 10k values including constructed half-cent tails
   (tests/test_properties.py::test_e4_display_rounding_exact_on_half_cent_tails);
   the display double is exact up to 2^53 cents per group, past which
   any double display is approximate by nature.

For quotients with a NON-CONSTANT denominator (averages: q = n * 1e4),
the decimal-scale argument breaks down (the nearest boundary is
1/(2q) away, below decimal scale-6 error once n > ~100), so both
engines use the same pure-integer half-up identity instead:
``round_half_up(s / q, dp) = sign(s) * floor((2*10^dp*|s| + q) / (2q))
/ 10^dp`` — floor computed via the nonnegative-remainder trick on the
Spark side (`(x - pmod(x, d)) / d`, exactly divisible, so the decimal
division is an exact integer) and via `//` on nonnegative HUGEINTs in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def e4(c) -> Column:
    """Exact integer ten-thousandths of a <=4-decimal double. decimal
    accumulator (not long): a 100 TB group can sum past int64 — Spark's
    long sum would wrap silently while DuckDB widens to HUGEINT."""
    return F.round(c * 10000, 0).cast("decimal(20,0)")


def sum_e4_2dp(c, denom: int = 10000) -> Column:
    """round(sum(c) / (denom/10000), 2) with constant ``denom``: decimal
    division + decimal HALF_UP, cast to double only for display."""
    return F.round(F.sum(e4(c)) / denom, 2).cast("double")


def display_2dp(sum_col: Column, denom: int = 10000) -> Column:
    """The display step alone, for a pre-computed e4 decimal sum (e.g. a
    windowed sum or a reused aggregate column)."""
    return F.round(sum_col / denom, 2).cast("double")


def round_div_e4(sum_col: Column, denom_col: Column, dp: int = 2) -> Column:
    """Exact HALF_UP of an integer-valued decimal ``sum_col`` divided by
    an integer-valued positive ``denom_col`` (column, e.g. n*10000),
    displayed at ``dp`` decimals as double. Pure integer arithmetic —
    see the module docstring for why averages cannot use the decimal
    round path."""
    scale = 10**dp
    num = F.abs(sum_col) * (2 * scale) + denom_col
    den = denom_col * 2
    q = (num - F.pmod(num, den)) / den  # exactly divisible -> exact integer
    signed = F.when(sum_col < 0, -q).otherwise(q)
    return (signed / scale).cast("double")


def sql_sum_e4(expr: str) -> str:
    """DuckDB: the e4 integer sum of a <=4-decimal expression."""
    return f"sum(CAST(round(({expr}) * 10000, 0) AS BIGINT))"


def sql_display_2dp(sum_sql: str, denom: int = 10000) -> str:
    """DuckDB twin of display_2dp for a HUGEINT-valued ``sum_sql``."""
    mag = f"((200 * abs({sum_sql}) + {denom}) // ({2 * denom}))"
    return f"((CASE WHEN {sum_sql} < 0 THEN -{mag} ELSE {mag} END)::DOUBLE / 100)"


def sql_sum_e4_2dp(expr: str, denom: int = 10000) -> str:
    """DuckDB twin of sum_e4_2dp."""
    return sql_display_2dp(sql_sum_e4(expr), denom)


def sql_round_div_e4(sum_sql: str, denom_sql: str, dp: int = 2) -> str:
    """DuckDB twin of round_div_e4 (non-constant denominator)."""
    scale = 10**dp
    mag = (
        f"(({2 * scale} * abs({sum_sql}) + ({denom_sql}))"
        f" // (2 * ({denom_sql})))"
    )
    return (
        f"((CASE WHEN {sum_sql} < 0 THEN -{mag} ELSE {mag} END)::DOUBLE"
        f" / {scale})"
    )


def spark_sql_sum_e4_2dp(expr: str, denom: int = 10000) -> str:
    """Spark-SQL-text twin of sum_e4_2dp, for queries that run as SQL
    strings (GROUPING SETS, the HiveQL dialect module): decimal
    accumulator + decimal division + decimal HALF_UP, double only at
    the end. Spark SQL's round() on decimal is the same BigDecimal
    HALF_UP as F.round."""
    return (
        f"CAST(round(sum(CAST(round(({expr}) * 10000, 0) AS DECIMAL(20,0)))"
        f" / {denom}, 2) AS DOUBLE)"
    )


def quantize_e6(x: Column) -> Column:
    """floor(x*1e6 + 0.5) as LongType — deterministic HALF-UP
    quantization of a double that both engines compute identically:
    floor acts on the BINARY value (unlike round(), whose
    shortest-repr-vs-binary split diverges on boundary doubles). Only
    meaningful when ``x`` itself is bit-identical across engines (e.g.
    the left-associated cosine chains in llmdata/similarity.py)."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5))


def sql_quantize_e6(expr: str) -> str:
    """DuckDB twin of quantize_e6 (BIGINT result)."""
    return f"CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)"


def display_q6(x: Column) -> Column:
    """quantize_e6 displayed back at 6 decimals as double: the long /
    1e6 division is one deterministic IEEE op on identical operands in
    both engines, so the displayed double is bit-identical too."""
    return quantize_e6(x) / F.lit(1000000.0)


def sql_display_q6(expr: str) -> str:
    """DuckDB twin of display_q6."""
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"
