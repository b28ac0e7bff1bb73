"""Property-based tests for the scalar token normalizers (SURVEY.md §5.2(6)).

Targets the quirk-preserving normalizers F6/F8/F9/F10 re-expressed in
oct_report_ocr_spark.extract.rules (reference behavior at
extract_onh_rnfl_report_text_ou.py:134-216).
"""

import string

from hypothesis import given
from hypothesis import strategies as st

from oct_report_ocr_spark.extract import rules

printable = st.text(alphabet=string.printable, max_size=40)
token = st.text(alphabet=string.ascii_letters + string.digits + "%.", max_size=12)


@given(printable)
def test_fix_reversed_pct_idempotent_unless_palindromic_trigger(s):
    once = rules.fix_reversed_pct(s)
    # applying again only flips back if the reversed token ALSO starts
    # with '%' (i.e. original ended with '%'); otherwise idempotent —
    # this is the reference's exact semantics, quirk included
    if not (s.startswith("%") and s.endswith("%")):
        assert rules.fix_reversed_pct(once) == once


@given(printable)
def test_fix_reversed_pct_preserves_chars(s):
    assert sorted(rules.fix_reversed_pct(s)) == sorted(s)


@given(token)
def test_fix_reversed_zero_preserves_chars(s):
    assert sorted(rules.fix_reversed_zero(s)) == sorted(s)


@given(token)
def test_um_repair_mm_passthrough(s):
    if "mm" in s.lower():
        assert rules.um_repair(s) is None


@given(st.integers(min_value=0, max_value=999))
def test_um_repair_thickness_token(n):
    tok = f"{n} m"
    if len(tok) <= 5:
        assert rules.um_repair(tok) == f"{n} μm"


@given(printable)
def test_has_numbers_matches_digit_presence(s):
    assert rules.has_numbers(s) == any(c.isdigit() for c in s)


@given(printable)
def test_is_numeric_line_excludes_alpha_and_pct(s):
    if rules.is_numeric_line(s):
        assert any(c.isdigit() for c in s)
        assert "%" not in s
        assert not any(c.isalpha() for c in s)


@given(token)
def test_area_suffix(s):
    assert rules.area_suffix(s) == s + "^2"


@given(st.lists(st.text(alphabet=string.ascii_lowercase + string.digits + " /", max_size=20), max_size=30))
def test_search_ranges_never_raise(lines):
    rules.gcc_search_range(lines)
    rules.rnfl_quadrant_search_range(lines)
    rules.rnfl_clock_search_range(lines)
    rules.pull_fields(lines, rules.route_template(lines))


@given(st.binary(max_size=4096))
def test_extract_one_total_on_arbitrary_bytes(payload):
    """D9 totality: extract_one never raises, whatever the bytes — the
    result either carries text or an error tag, never both."""
    from oct_report_ocr_spark.extract import extract_one

    r = extract_one(payload, "https://fuzz.example/x")
    assert (r.error is None) != (r.extracted_text is None)


@given(st.text(max_size=200))
def test_ws_collapse_split_join_equals_regex_form(s):
    """The segmenter's hot-path whitespace collapse uses
    `" ".join(s.split())`; byte-identity (the north-rule invariant)
    relies on it being EXACTLY `re.sub(r"\\s+", " ", s).strip()` for all
    of Unicode — freeze that equivalence."""
    import re

    assert " ".join(s.split()) == re.sub(r"\s+", " ", s).strip()
