"""Property-based tests for the salted-exchange width resolver.

``salt_width`` silently sizes every salted exchange at 100 TB scale
(VERDICT r04 item 8), so it gets more than example asserts: monotone
in each argument, never narrower than the sink bucket count, and
immune to Catalyst's missing-stats sentinels (``sizeInBytes`` defaults
to ``Long.MaxValue`` when stats are not computed).
"""

from hypothesis import given
from hypothesis import strategies as st

from oct_report_ocr_spark.jobs import extract_job
from oct_report_ocr_spark.jobs.extract_job import _ABSURD_BYTES, SALT_TASK_BYTES, salt_width

buckets_s = st.integers(min_value=1, max_value=1 << 20)
par_s = st.integers(min_value=1, max_value=1 << 20)
# valid byte estimates: positive and below the sentinel cutoff
bytes_s = st.integers(min_value=1, max_value=_ABSURD_BYTES - 1)
# sentinel territory: None, zero/negative, or >= the absurd cutoff
sentinel_s = st.one_of(
    st.none(),
    st.integers(min_value=-(1 << 40), max_value=0),
    st.integers(min_value=_ABSURD_BYTES, max_value=(1 << 63) - 1),
)
maybe_bytes_s = st.one_of(bytes_s, sentinel_s)


@given(buckets_s, par_s, maybe_bytes_s)
def test_never_narrower_than_sink_buckets(buckets, par, est):
    assert salt_width(buckets, par, est) >= buckets


@given(buckets_s, par_s, maybe_bytes_s)
def test_parallelism_floor(buckets, par, est):
    assert salt_width(buckets, par, est) >= 5 * par


@given(buckets_s, par_s, bytes_s)
def test_byte_floor_exact_when_valid(buckets, par, est):
    w = salt_width(buckets, par, est)
    ceil_tasks = -(-est // SALT_TASK_BYTES)
    assert w == max(buckets, 5 * par, ceil_tasks)
    # the floor guarantees <= SALT_TASK_BYTES of payload per salt key
    assert est <= w * SALT_TASK_BYTES


@given(buckets_s, par_s, sentinel_s)
def test_sentinel_bytes_ignored(buckets, par, sent):
    assert salt_width(buckets, par, sent) == salt_width(buckets, par)


@given(buckets_s, buckets_s, par_s, maybe_bytes_s)
def test_monotone_in_buckets(b1, b2, par, est):
    lo, hi = sorted((b1, b2))
    assert salt_width(lo, par, est) <= salt_width(hi, par, est)


@given(buckets_s, par_s, par_s, maybe_bytes_s)
def test_monotone_in_parallelism(buckets, p1, p2, est):
    lo, hi = sorted((p1, p2))
    assert salt_width(buckets, lo, est) <= salt_width(buckets, hi, est)


@given(buckets_s, par_s, bytes_s, bytes_s)
def test_monotone_in_bytes(buckets, par, e1, e2):
    lo, hi = sorted((e1, e2))
    assert salt_width(buckets, par, lo) <= salt_width(buckets, par, hi)


def test_module_export():
    # bench/scale harnesses resolve it via the module attribute
    assert extract_job.salt_width is salt_width
