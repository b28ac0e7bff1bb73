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
