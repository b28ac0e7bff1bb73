"""Scalar normalizer functions as native Column expressions.

The column-level twins of the pure-Python normalizers in
``extract/rules.py`` — for use when the same semantics are needed over
table columns (JVM codegen path) rather than inside the per-document
Arrow batch. Each cites the reference behavior it re-expresses; the
quirk-preserving details (first-match order, operator precedence)
follow SURVEY.md §7.3 risk 1.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered first-match-wins ladder (utils.py:1140-1212). Order is
# load-bearing: 'nlp' before 'lp', '20/1600' before '20/160', etc.
#
# IEEE signed zero: the 20/20 rung is round(-log10(1.0), 6) == -0.0.
# Spark's F.lit(-0.0) keeps the sign bit while DuckDB parses the -0.0
# literal in the generated oracle CASE as DECIMAL (no signed zero), so
# the two engines hash differently despite comparing == . Normalize
# every rung with `+ 0.0` (IEEE: -0.0 + 0.0 == +0.0) so both engines
# see the identical bit pattern. (r02 verdict item 1.)


def _unsign_zero(v: float) -> float:
    return v + 0.0 if v == 0 else v


LOGMAR_LADDER: tuple[tuple[str, float], ...] = tuple(
    [
        ("cf", _unsign_zero(round(-math.log10(0.0025), 6))),
        ("hm", _unsign_zero(round(-math.log10(0.002), 6))),
        ("nlp", _unsign_zero(round(-math.log10(0.0013), 6))),
        ("lp", _unsign_zero(round(-math.log10(0.0016), 6))),
    ]
    + [
        (f"20/{d}", _unsign_zero(round(-math.log10(20 / d), 6)))
        for d in (1600, 1250, 1000, 800, 650, 500, 400, 350, 300, 250, 225, 200,
                  160, 150, 125, 120, 100, 80, 70, 63, 60, 50, 40, 32, 30, 25,
                  20, 16, 15, 10)
    ]
)


def logmar_expr(va: Column) -> Column:
    """Visual-acuity string → logMAR (F15)."""
    low = F.lower(va)
    expr = None
    for key, val in LOGMAR_LADDER:
        cond = F.instr(low, key) > 0
        expr = F.when(cond, F.lit(val)) if expr is None else expr.when(cond, F.lit(val))
    return expr


def occurrences(col: Column, sub: str) -> Column:
    """Count non-overlapping occurrences of a literal substring —
    engine-portable replacement for regex counting (F12)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit("")))) / len(sub)
    ).cast("long")


def laterality_expr(left_count: Column, right_count: Column) -> Column:
    """left>right → 1, right>left → 0, tie → NULL (F13, utils.py:1127-1137)."""
    return (
        F.when(left_count > right_count, F.lit(1))
        .when(right_count > left_count, F.lit(0))
        .otherwise(F.lit(None))
        .cast("long")
    )


def reversed_pct_expr(tok: Column) -> Column:
    """Un-reverse tokens that lead with '%' (F8,
    extract_onh_rnfl_report_text_ou.py:163-164)."""
    return F.when(F.substring(tok, 1, 1) == "%", F.reverse(tok)).otherwise(tok)


def reversed_zero_expr(tok: Column) -> Column:
    """Un-reverse numeric tokens that lead with '0' (F8 clock variant,
    extract_onh_rnfl_report_text_ou.py:215-216)."""
    return F.when(
        tok.rlike(r"\d") & (F.length(tok) > 1) & (F.substring(tok, 1, 1) == "0"),
        F.reverse(tok),
    ).otherwise(tok)


def um_repair_expr(tok: Column) -> Column:
    """μm glyph repair on short thickness tokens; 'mm' passes through
    (F9, extract_onh_rnfl_report_text_ou.py:134-159)."""
    return F.when(
        (F.length(tok) <= 5) & tok.contains("m") & ~tok.contains("mm"),
        F.replace(tok, F.lit("m"), F.lit("μm")),
    ).otherwise(tok)


def area_suffix_expr(tok: Column) -> Column:
    """Append the implicit ^2 to area/volume values (F10)."""
    return F.concat(tok, F.lit("^2"))


def spherical_equivalent_expr(sph: Column, cyl: Column) -> Column:
    """spheq = sph + 0.5 * cyl in exact decimal (F16, utils.py:1215-1217)."""
    return sph.cast("decimal(18,2)") + F.lit(0.5).cast("decimal(18,2)") * cyl.cast(
        "decimal(18,2)"
    )
