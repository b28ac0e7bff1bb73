"""Unit tests for the round-3 tail queries (operators/windows.py plus
the snapshot-diff / bigram-association / incremental-LSH additions).

The oracle sweep proves Spark-vs-DuckDB parity; these pin the
*semantics* independently, so a bug mirrored into both engines'
expressions can't pass silently.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from oct_report_ocr_spark.operators import curation, dedup, windows
from oct_report_ocr_spark.operators.relational import load


def test_rolling_stats_matches_python_replay(spark):
    """Per-user 3-row frame replayed in plain Python over the same
    (ts_us, event_id) order: sums, counts, and the single-division
    mean must agree exactly."""
    out = {r.event_id: r for r in windows.q_rolling_stats(spark, SF_SMOKE).collect()}
    ev = (
        load(spark, SF_SMOKE, "events")
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    n_checked = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts_us, r.event_id))
        for i, r in enumerate(rows):
            frame = rows[max(0, i - 2) : i + 1]
            got = out[r.event_id]
            assert got.roll_sum == sum(x.cents for x in frame)
            assert got.roll_n == len(frame)
            assert got.roll_avg == float(sum(x.cents for x in frame)) / len(frame)
            n_checked += 1
    assert n_checked == len(out) > 0


def test_ntile_bins_partition_and_ordering(spark):
    """Quartile cells reconcile to per-lang doc counts, sizes differ by
    at most 1 within a lang, and char ranges are monotone across
    quartiles (ties on n_chars may touch at the boundary, never
    invert)."""
    rows = windows.q_ntile_bins(spark, SF_SMOKE).collect()
    by_lang = defaultdict(dict)
    for r in rows:
        by_lang[r.lang][r.quartile] = r
    truth = {
        r.lang: r.n
        for r in load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, cells in by_lang.items():
        assert sorted(cells) == [1, 2, 3, 4]
        sizes = [cells[q].n_docs for q in (1, 2, 3, 4)]
        assert sum(sizes) == truth[lang]
        assert max(sizes) - min(sizes) <= 1
        for q in (1, 2, 3):
            assert cells[q].max_chars <= cells[q + 1].min_chars
        for q in (1, 2, 3, 4):
            assert cells[q].min_chars <= cells[q].max_chars


def test_snapshot_diff_statuses_follow_id_arithmetic(spark):
    """Status is fully determined by doc_id under the synthetic split:
    A drops %10==9 (so those appear as added in B), B drops %10==0
    (removed), else %7==0 → changed (B rewrites content), else
    unchanged."""
    rows = curation.q_snapshot_diff(spark, SF_SMOKE).collect()
    ids = {
        r.doc_id
        for r in load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id")
        .collect()
    }
    assert {r.doc_id for r in rows} == ids
    for r in rows:
        if r.doc_id % 10 == 9:
            want = "added"
        elif r.doc_id % 10 == 0:
            want = "removed"
        elif r.doc_id % 7 == 0:
            want = "changed"
        else:
            want = "unchanged"
        assert r.status == want, r


def test_bigram_assoc_lift_arithmetic_and_order(spark):
    """Every returned lift is exactly n_xy·N/(n_x·n_y) with N the
    independently-counted corpus token total; the threshold holds and
    the ordering is (lift desc, bigram asc)."""
    rows = curation.q_bigram_assoc(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    from oct_report_ocr_spark.operators.extra import _toks

    n_total = (
        load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .select(F.explode(_toks()).alias("w"))
        .count()
    )
    for r in rows:
        assert r.n_xy >= curation.BIGRAM_MIN_COUNT
        assert r.lift == float(r.n_xy * n_total) / float(r.n_x * r.n_y)
    keys = [(-r.lift, r.bigram) for r in rows]
    assert keys == sorted(keys)


def test_shared_ngrams_intersect_is_distinct_set_intersection(spark):
    """INTERSECT semantics replayed in Python: output = the distinct
    trigram sets of src0 and src1 intersected, each row unique."""
    rows = [r.trigram for r in curation.q_shared_ngrams_intersect(spark, SF_SMOKE).collect()]
    assert len(rows) == len(set(rows))  # distinct semantics

    def tri_set(src):
        from oct_report_ocr_spark.operators.extra import _toks

        return {
            r.t
            for r in load(spark, SF_SMOKE, "documents")
            .filter((F.col("n_chars") > 0) & (F.col("source") == src))
            .select(F.explode(curation._trigrams(_toks())).alias("t"))
            .collect()
        }

    assert set(rows) == tri_set("src0") & tri_set("src1")
    assert rows  # non-vacuous at oracle scale


def test_removed_content_except_multiset_difference(spark):
    """EXCEPT ALL semantics replayed in Python: per-trigram output
    multiplicity == max(0, count_A - count_B) under the snapshot
    split, and only A-side trigrams appear."""
    from collections import Counter

    got = Counter(
        r.trigram for r in curation.q_removed_content_except(spark, SF_SMOKE).collect()
    )
    from oct_report_ocr_spark.operators.extra import _toks

    base = load(spark, SF_SMOKE, "documents").filter(F.col("n_chars") > 0)
    a = Counter(
        r.t
        for r in base.filter(F.col("doc_id") % 10 != 9)
        .select(F.explode(curation._trigrams(_toks())).alias("t"))
        .collect()
    )
    text_b = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b = Counter(
        r.t
        for r in base.filter(F.col("doc_id") % 10 != 0)
        .select(text_b.alias("text"))
        .select(F.explode(curation._trigrams(_toks())).alias("t"))
        .collect()
    )
    want = Counter({t: a[t] - b[t] for t in a if a[t] > b[t]})
    assert got == want and got


def test_mix_sample_threshold_draw_properties(spark):
    """The temperature-weighted sample must be a pure hash-threshold
    draw: per source, every kept doc's portable hash is strictly below
    every dropped doc's (a single threshold separates them), the
    total is near MIX_SAMPLE_TARGET, and a rerun returns the identical
    set (PRNG-free, retry-stable)."""
    import hashlib

    kept = {(r.doc_id, r.source) for r in curation.q_mix_sample(spark, SF_SMOKE).collect()}
    assert kept == {
        (r.doc_id, r.source) for r in curation.q_mix_sample(spark, SF_SMOKE).collect()
    }
    corpus = [
        (r.doc_id, r.source)
        for r in load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "source")
        .collect()
    ]
    assert kept <= set(corpus)
    assert 0.3 * curation.MIX_SAMPLE_TARGET < len(kept) < 1.7 * curation.MIX_SAMPLE_TARGET

    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1000000

    by_source = defaultdict(lambda: ([], []))
    for doc_id, source in corpus:
        by_source[source][0 if (doc_id, source) in kept else 1].append(h(doc_id))
    n_sources_with_both = 0
    for source, (kept_h, dropped_h) in by_source.items():
        if kept_h and dropped_h:
            assert max(kept_h) < min(dropped_h), source
            n_sources_with_both += 1
    assert n_sources_with_both > 0  # the draw actually separates somewhere


def test_tokenizer_cross_engine_edge_strings(spark):
    """The _toks / _TOKS_SQL twin pair must agree OUTSIDE the word-soup
    corpus too — empty strings, pure punctuation, repeated/leading/
    trailing whitespace, tabs/newlines, digits, mixed case. The corpus
    oracle can never exercise these (31-token lowercase vocabulary), so
    a semantic drift between Java regex and DuckDB RE2 tokenization
    would ship blind without this pin."""
    import duckdb

    from oct_report_ocr_spark.operators.extra import _TOKS_SQL, _toks

    cases = [
        "",
        " ",
        "   ",
        "abc",
        "ABC def",
        "a1b2 c3",
        "...",
        "a  b",
        " a b ",
        "tab\tsep",
        "new\nline",
        "UPPER lower MiXeD",
        "a-b_c",
        "9",
        "!@#$%",
        "ends with space ",
        " leading",
        "a" * 50,
        ("word " * 20).strip(),
        "punct.in.the middle, of words!",
    ]
    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "text"])
    got_spark = {
        r.i: list(r.t) for r in sdf.select("i", _toks().alias("t")).collect()
    }
    con = duckdb.connect()
    values = ", ".join(f"({i}, ?)" for i in range(len(cases)))
    got_duck = {
        i: list(t)
        for i, t in con.execute(
            f"SELECT i, {_TOKS_SQL} FROM (VALUES {values}) AS documents(i, text)",
            cases,
        ).fetchall()
    }
    assert got_spark == got_duck


def test_norm_cross_engine_edge_strings(spark):
    """_NORM / _NORM_SQL (the dedup-normalization twin feeding
    dedup_normalized, incremental_dedup, and the Bloom contract) must
    agree on inputs the corpus never produces: mixed case, digits,
    punctuation runs, irregular whitespace, empty strings."""
    import duckdb

    from oct_report_ocr_spark.operators.curation import _NORM, _NORM_SQL

    cases = [
        "",
        "   ",
        "Hello, World!",
        "a1 B2 c3",
        "UPPER   lower",
        "tabs\tand\nnewlines",
        "!!!",
        " trailing and leading ",
        "digits 123 kept 456",
        "dash-dot.slash/keep none",
    ]
    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "text"])
    got_spark = {r.i: r.n for r in sdf.select("i", _NORM(F.col("text")).alias("n")).collect()}
    con = duckdb.connect()
    values = ", ".join(f"({i}, ?)" for i in range(len(cases)))
    got_duck = dict(
        con.execute(
            f"SELECT i, {_NORM_SQL} FROM (VALUES {values}) AS documents(i, text)",
            cases,
        ).fetchall()
    )
    assert got_spark == got_duck


def test_canon_url_cross_engine_edge_urls(spark):
    """_canon_url / _canon_url_sql must agree on adversarial urls: only
    scheme+host lowercased, query/fragment stripped at the FIRST ?/#,
    trailing slash runs trimmed, schemeless and path-free forms."""
    import duckdb

    from oct_report_ocr_spark.operators.curation import _canon_url, _canon_url_sql

    cases = [
        "https://Example.COM/Path/To/Page",
        "HTTPS://HOST/PATH?q=1#frag",
        "http://host",
        "http://host/",
        "http://host////",
        "http://host/a//b///",
        "http://host/p?x=1?y=2",
        "http://host/p#a#b",
        "http://host/p#a?late=q",
        "ftp://Mixed.Case/KeepCase",
        "not a url at all",
        "http://host/UPPER/path?utm_source=x",
    ]
    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "raw_url"])
    got_spark = {
        r.i: r.c for r in sdf.select("i", _canon_url(F.col("raw_url")).alias("c")).collect()
    }
    con = duckdb.connect()
    values = ", ".join(f"({i}, ?)" for i in range(len(cases)))
    got_duck = dict(
        con.execute(
            f"SELECT i, {_canon_url_sql('raw_url')} FROM (VALUES {values}) AS t(i, raw_url)",
            cases,
        ).fetchall()
    )
    assert got_spark == got_duck


def test_minhash_incremental_consistent_with_lsh_pairs(spark):
    """A batch doc (doc_id % 10 == 0) is flagged iff the full LSH pair
    table contains a pair linking it to an index doc; matched_rep and
    the collision count must agree with that pair table."""
    inc = {r.doc_id: r for r in dedup.q_minhash_incremental(spark, SF_SMOKE).collect()}
    pairs = dedup.q_minhash_lsh_pairs(spark, SF_SMOKE).collect()
    partners = defaultdict(set)
    for p in pairs:
        for batch, other in ((p.doc_a, p.doc_b), (p.doc_b, p.doc_a)):
            if batch % 10 == 0 and other % 10 != 0:
                partners[batch].add(other)
    for doc_id, r in inc.items():
        exp = partners.get(doc_id, set())
        assert r.is_near_dup == bool(exp), (doc_id, exp)
        assert r.n_index_collisions == len(exp)
        assert r.matched_rep == (min(exp) if exp else None)
    # every flagged-by-pairs batch doc must appear in the incremental output
    assert set(partners) <= set(inc)
