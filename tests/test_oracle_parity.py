"""Spark-vs-DuckDB parity for every registered query (SURVEY.md §5.2(2)).

Runs the same comparison the driver's correctness gate runs — row
count, schema, order-insensitive value multiset — at sf0.001 for speed
(the driver runs sf0.01; scripts/check_oracle.py covers that manually).
"""

import os
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entry
from scripts.check_oracle import TABLES, norm, type_drift

from .conftest import SF_SMOKE

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_SMOKE)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in ORACLES:
        assert srows is not None  # rows-only check for non-SQL ops
        return
    res = ddb.sql(ORACLES[name])
    dtypes = res.types
    drows, dcols = res.fetchall(), res.columns
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(c.lower() for c in dcols)
    # output-type equivalence (VERDICT r01: HUGEINT/DECIMAL drift broke
    # the driver's value hash while rows and rounded values matched)
    assert type_drift(scols, sdf.dtypes, dcols, dtypes) == []
    s_order = sorted(range(len(scols)), key=lambda i: scols[i])
    d_lower = [c.lower() for c in dcols]
    d_order = sorted(range(len(dcols)), key=lambda i: d_lower[i])
    smulti = Counter(tuple(norm(r[i]) for i in s_order) for r in srows)
    dmulti = Counter(tuple(norm(r[i]) for i in d_order) for r in drows)
    assert smulti == dmulti


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "url", "warc_ts", "extracted_text", "template", "n_lines", "n_spans", "error",
        "meta",
    }
    assert all(r.url for r in rows)


def _is_negative_zero(v: float) -> bool:
    import struct

    return v == 0 and struct.pack(">d", float(v)) != struct.pack(">d", 0.0)


def test_no_negative_zero_literals():
    """No float constant that reaches an output column (or a generated
    oracle SQL literal) may be IEEE negative zero — Spark's F.lit keeps
    the sign bit while DuckDB parses `-0.0` as unsigned DECIMAL, so the
    two engines hash-diverge on rows that compare equal (r02 verdict
    item 1/3; the logmar_ladder 20/20 rung was -0.0 for two rounds)."""
    from oct_report_ocr_spark.functions.normalizers import LOGMAR_LADDER
    from oct_report_ocr_spark.operators import similarity

    for key, val in LOGMAR_LADDER:
        assert not _is_negative_zero(val), f"ladder rung {key} is -0.0"
    for p in range(similarity.N_PLANES):
        for d in range(similarity.DIM):
            w = float(similarity._plane_weight(p, d))
            assert not _is_negative_zero(w), f"plane weight ({p},{d}) is -0.0"
    # Every generated oracle SQL must be free of bare `-0.0` literals
    # (exact literal, not prefixes of e.g. -0.09691).
    import re

    neg_zero = re.compile(r"-0\.0+(?![0-9.])")
    for name, sql in entry.oracle_sql().items():
        m = neg_zero.search(sql)
        assert m is None, f"oracle {name} embeds a -0.0 literal: {m.group(0)!r}"


def test_norm_is_bit_exact_on_floats():
    """The local gate must distinguish -0.0 from +0.0 and canonicalize
    NaN payloads — i.e. be at least as strict as the driver's value hash
    (r02 verdict item 2)."""
    assert norm(-0.0) != norm(0.0)
    assert norm(float("nan")) == norm(float("-nan")) == "NaN"
    assert norm(1.5) == norm(1.5)
