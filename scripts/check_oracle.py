"""Local mimic of the driver's Spark-vs-DuckDB correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin on
the same parquet, compares row count, sorted column names, and an
order-insensitive multiset of normalized row values. Usage:

    python scripts/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import os
import struct
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        # Bit-level comparison (r02 verdict item 2): round(v, 9) hid the
        # -0.0 vs +0.0 divergence that failed the driver's hash gate
        # (logmar_ladder) while passing locally. Pack to IEEE-754 bits so
        # the local gate is at least as strict as the driver's value hash;
        # canonicalize every NaN payload to one token first.
        if math.isnan(v):
            return "NaN"
        return struct.pack(">d", v).hex()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


_DUCK_CANON = {
    "VARCHAR": "string",
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "UBIGINT": "HUGEINT-like (no Spark equivalent)",
    "HUGEINT": "HUGEINT (no Spark equivalent — CAST the oracle column)",
    "DOUBLE": "double",
    "FLOAT": "float",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "BLOB": "binary",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
}


def canon_duck(t: str) -> str:
    """DuckDB type string → Spark dtype string, for drift detection."""
    t = str(t).strip()
    if t.endswith("[]"):
        return f"array<{canon_duck(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return _DUCK_CANON.get(t, f"UNMAPPED({t})")


def canon_spark(t: str) -> str:
    return t.strip().lower().replace(" ", "")


def type_drift(scols, sdtypes, dcols, dtypes) -> list[str]:
    """Per-column Spark-dtype vs DuckDB-type equivalence (VERDICT item 10).

    Round 1 lost 3 gate rows to DuckDB returning HUGEINT for SUM(int) and
    DECIMAL for float literals while Spark produced bigint/double — rows and
    rounded values matched but the driver's value hash didn't.  This catches
    that class of bug locally before the driver gate runs.
    """
    smap = {c: canon_spark(t) for (c, t) in sdtypes}
    dmap = {c.lower(): canon_duck(t) for c, t in zip(dcols, dtypes)}
    out = []
    for c in scols:
        st, dtp = smap.get(c), dmap.get(c)
        if dtp is None:
            continue  # schema check reports missing columns
        if st != dtp:
            out.append(f"type[{c}] spark={st} duckdb={dtp}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from oct_report_ocr_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(queries)
    failed = []
    for name in names:
        fn = queries[name]
        try:
            sdf = fn(spark, args.sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            dtypes = res.types
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(c.lower() for c in dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            problems.extend(type_drift(scols, sdf.dtypes, dcols, dtypes))
            s_order = sorted(range(len(scols)), key=lambda i: scols[i])
            d_lower = [c.lower() for c in dcols]
            d_order = sorted(range(len(dcols)), key=lambda i: d_lower[i])
            smulti = Counter(tuple(norm(r[i]) for i in s_order) for r in srows)
            dmulti = Counter(tuple(norm(r[i]) for i in d_order) for r in drows)
            if smulti != dmulti:
                diff_s = smulti - dmulti
                diff_d = dmulti - smulti
                ex_s = next(iter(diff_s), None)
                ex_d = next(iter(diff_d), None)
                problems.append(
                    f"values differ ({sum(diff_s.values())} spark-only / "
                    f"{sum(diff_d.values())} duckdb-only); e.g. spark={ex_s} duckdb={ex_d}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name} ({len(srows)} rows)")

    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
