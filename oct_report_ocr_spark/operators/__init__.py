"""Operator registry: every implemented query/operator with its oracle.

``all_queries()`` returns {name: (fn, oracle_sql_or_None)}; fn takes
(spark, sf_dir) and returns a DataFrame. Oracle-less entries (None) are
genuinely non-SQL-expressible and get the driver's rows-only check.
"""

from __future__ import annotations


def all_queries() -> dict:
    from . import relational

    out: dict = {}
    out.update(relational.QUERIES)
    try:
        from . import textops

        out.update(textops.QUERIES)
    except ImportError:
        pass
    try:
        from . import dedup

        out.update(dedup.QUERIES)
    except ImportError:
        pass
    try:
        from . import similarity

        out.update(similarity.QUERIES)
    except ImportError:
        pass
    try:
        from . import extra

        out.update(extra.QUERIES)
    except ImportError:
        pass
    try:
        from . import cohort

        out.update(cohort.QUERIES)
    except ImportError:
        pass
    try:
        from . import temporal

        out.update(temporal.QUERIES)
    except ImportError:
        pass
    return out
