"""Anchor/regex field pullers over an ordered line list (stdlib only).

Re-expresses the reference's rule-based extraction core — keyword
anchors + positional offsets + regex + token normalizers — as
table-driven pure functions over ``lines: list[str]`` (the ``txts``
analog). Citations are into /root/reference/.

Two report templates are routed (D1 analog of the per-script
``DocumentTitle like`` predicates, extract_gcc_report_text_ou.py:26 /
extract_onh_rnfl_report_text_ou.py:56):

- ``gcc``  — signal strength + 12 interleaved OD/OS slots + Average /
             Minimum anchored pairs (extract_gcc_report_text_ou.py:83-143)
- ``rnfl`` — signal strength + μm-repaired thickness + symmetry/rim/
             disc/CD/cup + 8 quadrant slots + 24 clock-hour slots in 4
             anchored segments (extract_onh_rnfl_report_text_ou.py:112-255)

Anything else is ``generic``: main-content text only, no fields.

All functions are deterministic and never raise on malformed input —
missing anchors simply yield no field (the reference's per-doc
try/except D9 is handled one level up, in core.extract_one).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_DIGIT_RE = re.compile(r"\d")
_SIGNAL_RE = re.compile(r"\d{1,2}/10")


def has_numbers(s: str) -> bool:
    """utils.py:1758-1759 (F6)."""
    return bool(_DIGIT_RE.search(s))


def is_numeric_line(s: str) -> bool:
    """Measurement-line classifier: has a digit, no '%', no alpha
    (extract_onh_rnfl_report_text_ou.py:188)."""
    return has_numbers(s) and "%" not in s and not any(c.isalpha() for c in s)


def fix_reversed_pct(s: str) -> str:
    """F8: OCR sometimes reverses tokens; a leading '%' means the token
    is backwards (extract_onh_rnfl_report_text_ou.py:163-164)."""
    if s and s[0] == "%":
        return s[::-1]
    return s


def fix_reversed_zero(s: str) -> str:
    """F8 clock-section variant: numeric token with a leading '0' is
    reversed (extract_onh_rnfl_report_text_ou.py:215-216)."""
    if has_numbers(s) and len(s) > 1 and s[0] == "0":
        return s[::-1]
    return s


def um_repair(s: str) -> str | None:
    """F9: unit-glyph repair — in short tokens each bare 'm' is really
    'μm'; 'mm' tokens are a different unit and pass through untouched
    (extract_onh_rnfl_report_text_ou.py:134-159). Returns None when the
    token is not a repairable thickness value."""
    low = s.lower()
    if "mm" in low:
        return None
    if "m" in low and len(s) <= 5:
        out = []
        for c in s:
            if c == "m":
                out.append("μ" + c)
            else:
                out.append(c)
        return "".join(out)
    return None


def area_suffix(s: str) -> str:
    """F10: area/volume values carry an implicit ^2
    (extract_onh_rnfl_report_text_ou.py:169-182)."""
    return s + "^2"


@dataclass(frozen=True)
class Field:
    label: str
    value: str
    line_idx: int  # index into `lines` the value was read from (-1: synthetic)


def _get(lines: list[str], i: int) -> str | None:
    return lines[i] if 0 <= i < len(lines) else None


# --- search ranges (F4/F5 analogs) ------------------------------------------


def gcc_search_range(lines: list[str]) -> tuple[int, int] | None:
    """Bounded anchor-to-anchor scan: slots live between the last line
    containing '/' and the last line containing 'ave'
    (utils.py:1782-1788, last-match-wins loop semantics preserved)."""
    start = end = None
    for i, s in enumerate(lines):
        if "/" in s:
            start = i + 1
        if "ave" in s.lower():
            end = i
    if start is None or end is None or start >= end:
        return None
    return start, end


def rnfl_quadrant_search_range(lines: list[str]) -> tuple[int, int] | None:
    """Multi-anchor scan with last-match-wins: start after
    'diversified' (or one before 'normative'), end two past 'quadrants'
    (utils.py:1746-1756)."""
    start = end = None
    for i, s in enumerate(lines):
        low = s.lower()
        if "normative" in low:
            start = i - 1
        if "diversified" in low:
            start = i + 1
        if "quadrants" in low:
            end = i + 2
    if start is None or end is None:
        return None
    return start, end + 1


def rnfl_clock_search_range(lines: list[str]) -> tuple[int, int] | None:
    """Clock-hour segment scan: start three past the 'quadrants' line,
    end at EOF (utils.py:1773-1780)."""
    start = None
    for i, s in enumerate(lines):
        if "quadrants" in s.lower():
            start = i + 3
    if start is None:
        return None
    return start, len(lines)


# --- template routing (D1) ----------------------------------------------------


def route_template(lines: list[str]) -> str:
    joined = "\n".join(lines).lower()
    if "ganglion cell" in joined:
        return "gcc"
    if "rnfl" in joined:
        return "rnfl"
    return "generic"


# --- signal strength (shared by both templates) -------------------------------


def pull_signal_strength(lines: list[str]) -> list[Field]:
    """F1/F2/F3: anchor 'signal strength', pull `d{1,2}/10` values; fall
    back to neighbor lines when the regex misses
    (extract_gcc_report_text_ou.py:83-103). The reference special-cases
    anchor index 0 vs 1 because OCR puts the header first; on web pages
    the anchor can sit anywhere, so the neighbor fallback is uniformly
    (i+1, i+2) — the i==0 branch of the reference."""
    out: list[Field] = []
    for i, s in enumerate(lines):
        if "signal strength" in s.lower():
            r1 = _SIGNAL_RE.findall(s)
            if not r1:
                nxt1, nxt2 = _get(lines, i + 1), _get(lines, i + 2)
                if nxt1 is not None and nxt2 is not None:
                    out.append(Field("signal_strength_od", nxt1, i + 1))
                    out.append(Field("signal_strength_os", nxt2, i + 2))
            elif len(r1) == 1:
                nxt1 = _get(lines, i + 1)
                out.append(Field("signal_strength_od", r1[0], i))
                if nxt1 is not None:
                    out.append(Field("signal_strength_os", nxt1, i + 1))
            else:
                out.append(Field("signal_strength_od", r1[0], i))
                out.append(Field("signal_strength_os", r1[1], i))
            break
    return out


# --- GCC template -------------------------------------------------------------

# Output-order permutation of the 12 interleaved OD/OS slots
# (extract_gcc_report_text_ou.py:113-136).
GCC_SLOT_PERMUTATION: tuple[tuple[str, int], ...] = (
    ("S_OD", 0),
    ("S_OS", 6),
    ("SN_OD", 2),
    ("SN_OS", 7),
    ("IN_OD", 4),
    ("IN_OS", 9),
    ("I_OD", 5),
    ("I_OS", 11),
    ("IT_OD", 3),
    ("IT_OS", 10),
    ("ST_OD", 1),
    ("ST_OS", 8),
)


def pull_gcc_fields(lines: list[str]) -> list[Field]:
    out = pull_signal_strength(lines)

    rng = gcc_search_range(lines)
    slots: list[tuple[str, int]] = []
    if rng is not None:
        start, end = rng
        for j, s in enumerate(lines[start:end]):
            if len(slots) < 12:
                slots.append((s, start + j))
    for label, idx in GCC_SLOT_PERMUTATION:
        if idx < len(slots):
            out.append(Field(label, slots[idx][0], slots[idx][1]))

    # Average / Minimum anchored pairs (extract_gcc_report_text_ou.py:137-143)
    for i, s in enumerate(lines):
        low = s.lower()
        if "ave" in low:
            n1, n2 = _get(lines, i + 1), _get(lines, i + 2)
            if n1 is not None:
                out.append(Field("avg_thickness_od", n1, i + 1))
            if n2 is not None:
                out.append(Field("avg_thickness_os", n2, i + 2))
        if "min" in low:
            n1, n2 = _get(lines, i + 1), _get(lines, i + 2)
            if n1 is not None:
                out.append(Field("min_thickness_od", n1, i + 1))
            if n2 is not None:
                out.append(Field("min_thickness_os", n2, i + 2))
    return out


# --- RNFL template ------------------------------------------------------------

# Quadrant slot permutation (extract_onh_rnfl_report_text_ou.py:196-203).
RNFL_QUADRANT_PERMUTATION: tuple[tuple[str, int], ...] = (
    ("S_OD", 0),
    ("S_OS", 1),
    ("T_OD", 2),
    ("T_OS", 5),
    ("N_OD", 3),
    ("N_OS", 4),
    ("I_OD", 6),
    ("I_OS", 7),
)

# Clock-hour permutation: (hour, segment, od_idx, os_seg, os_idx), where
# segments are the 4 anchor-delimited runs with expected arities
# (10, 4, 2, 8) (extract_onh_rnfl_report_text_ou.py:218-255).
RNFL_CLOCK_PERMUTATION: tuple[tuple[int, int, int, int, int], ...] = (
    (1, 0, 3, 0, 5),
    (2, 0, 7, 0, 9),
    (3, 1, 1, 1, 3),
    (4, 2, 1, 3, 1),
    (5, 3, 4, 3, 7),
    (6, 3, 3, 3, 6),
    (7, 3, 2, 3, 5),
    (8, 2, 0, 3, 0),
    (9, 1, 0, 1, 2),
    (10, 0, 6, 0, 8),
    (11, 0, 2, 0, 4),
    (12, 0, 0, 0, 1),
)
_CLOCK_SEGMENT_ARITY = (10, 4, 2, 8)


def _two_value_anchor(
    lines: list[str],
    i: int,
    label_od: str,
    label_os: str,
    suffix: bool = False,
    require_numbers: bool = False,
) -> list[Field]:
    n1, n2 = _get(lines, i + 1), _get(lines, i + 2)
    if n1 is None or n2 is None:
        return []
    if require_numbers and not (has_numbers(n1) and has_numbers(n2)):
        return []
    if suffix:
        n1, n2 = area_suffix(n1), area_suffix(n2)
    return [Field(label_od, n1, i + 1), Field(label_os, n2, i + 2)]


def pull_rnfl_fields(lines: list[str]) -> list[Field]:
    out = pull_signal_strength(lines)
    lines = list(lines)  # local copy: reversed-token fixes mutate in place

    # average RNFL thickness with μm repair
    # (extract_onh_rnfl_report_text_ou.py:134-159)
    for i, s in enumerate(lines):
        low = s.lower()
        if "average" in low and "rnfl" in low and "thickness" in low:
            repaired: list[tuple[str, int]] = []
            for j, t in enumerate(lines[i : i + 4]):
                r = um_repair(t)
                if r is not None:
                    repaired.append((r, i + j))
            if repaired:
                out.append(Field("avg_rnfl_thickness_od", repaired[0][0], repaired[0][1]))
            if len(repaired) > 1:
                out.append(Field("avg_rnfl_thickness_os", repaired[1][0], repaired[1][1]))
            break

    for i, s in enumerate(lines):
        low = s.lower()
        if "rnfl" in low and "symmetry" in low:
            nxt = _get(lines, i + 1)
            if nxt is not None:
                lines[i + 1] = fix_reversed_pct(nxt)
                out.append(Field("rnfl_symmetry", lines[i + 1], i + 1))
        if "rim" in low and "area" in low:
            out.extend(
                _two_value_anchor(lines, i, "rim_area_od", "rim_area_os", suffix=True, require_numbers=True)
            )
        if "disc" in low and "area" in low:
            out.extend(_two_value_anchor(lines, i, "disc_area_od", "disc_area_os", suffix=True))
        if "average" in low and ("c/d" in low or "cd" in low):
            out.extend(_two_value_anchor(lines, i, "avg_cd_ratio_od", "avg_cd_ratio_os"))
        if "vertical" in low and ("c/d" in low or "cd" in low):
            out.extend(_two_value_anchor(lines, i, "vert_cd_ratio_od", "vert_cd_ratio_os"))
        if "cup" in low and "vol" in low:
            out.extend(_two_value_anchor(lines, i, "cup_volume_od", "cup_volume_os", suffix=True))

    # 8 quadrant slots (extract_onh_rnfl_report_text_ou.py:184-203)
    rng = rnfl_quadrant_search_range(lines)
    if rng is not None:
        start, end = rng
        start = max(0, start)
        quad: list[tuple[str, int]] = []
        for j, s in enumerate(lines[start:end]):
            if is_numeric_line(s) and len(quad) < 8:
                quad.append((s, start + j))
        for label, idx in RNFL_QUADRANT_PERMUTATION:
            if idx < len(quad):
                out.append(Field(f"quadrant_{label}", quad[idx][0], quad[idx][1]))

    # 24 clock-hour slots in 4 anchored segments
    # (extract_onh_rnfl_report_text_ou.py:205-255)
    rng = rnfl_clock_search_range(lines)
    if rng is not None:
        start, end = rng
        rnfl_i = clock_i = hours_i = None
        for i in range(start, min(end, len(lines))):
            low = lines[i].lower()
            if "rnfl" in low:
                rnfl_i = i
            if "clock" in low:
                clock_i = i
            if "hours" in low:
                hours_i = i
            lines[i] = fix_reversed_zero(lines[i])
        if rnfl_i is not None and clock_i is not None and hours_i is not None:
            segs: list[list[tuple[str, int]]] = [
                [(lines[k], k) for k in range(start, rnfl_i)],
                [(lines[k], k) for k in range(rnfl_i + 1, clock_i)],
                [(lines[k], k) for k in range(clock_i + 1, hours_i)],
                [(lines[k], k) for k in range(hours_i + 1, min(end, len(lines)))],
            ]
            # defensive padding (F22, extract_onh_rnfl_report_text_ou.py:223-230)
            for seg, arity in zip(segs, _CLOCK_SEGMENT_ARITY):
                if len(seg) < arity:
                    seg.append(("", -1))
            for hour, od_seg, od_idx, os_seg, os_idx in RNFL_CLOCK_PERMUTATION:
                if od_idx < len(segs[od_seg]):
                    v, li = segs[od_seg][od_idx]
                    out.append(Field(f"clock_{hour}_od", v, li))
                if os_idx < len(segs[os_seg]):
                    v, li = segs[os_seg][os_idx]
                    out.append(Field(f"clock_{hour}_os", v, li))
    return out


def pull_fields(lines: list[str], template: str) -> list[Field]:
    if template == "gcc":
        return pull_gcc_fields(lines)
    if template == "rnfl":
        return pull_rnfl_fields(lines)
    return []
