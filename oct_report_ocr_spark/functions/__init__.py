from .normalizers import (
    area_suffix_expr,
    laterality_expr,
    logmar_expr,
    occurrences,
    reversed_pct_expr,
    reversed_zero_expr,
    spherical_equivalent_expr,
    um_repair_expr,
)

__all__ = [
    "area_suffix_expr",
    "laterality_expr",
    "logmar_expr",
    "occurrences",
    "reversed_pct_expr",
    "reversed_zero_expr",
    "spherical_equivalent_expr",
    "um_repair_expr",
]
