"""Unit tests for the round-3 curation operators (operators/curation.py).

The oracle sweep proves Spark-vs-DuckDB parity; these tests pin the
*semantics* independently of the oracle, so a bug mirrored into both
engines' expressions can't pass silently.
"""

import pytest
from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMOKE

from oct_report_ocr_spark.operators import curation


def test_trigrams_short_docs_empty(spark):
    """Docs with < 3 tokens must yield an empty trigram list — Spark's
    sequence() DESCENDS when stop < start, which would fabricate
    trigrams from out-of-range element_at NULLs."""
    df = spark.createDataFrame(
        [Row(text="one two"), Row(text="one"), Row(text=""), Row(text="a b c d")]
    )
    out = df.select(F.size(curation._trigrams()).alias("n")).collect()
    assert [r.n for r in out] == [0, 0, 0, 2]


def test_trigrams_materialized_matches_inline(spark):
    """_trigrams(toks_column) is a pure performance rewrite — identical
    output to the inline form on real corpus text."""
    from oct_report_ocr_spark.operators.extra import _toks
    from oct_report_ocr_spark.operators.relational import load

    d = load(spark, SF_SMOKE, "documents").filter(F.col("n_chars") > 0).limit(50)
    inline = d.select("doc_id", curation._trigrams().alias("tri"))
    mat = d.select("doc_id", _toks().alias("toks")).select(
        "doc_id", curation._trigrams(F.col("toks")).alias("tri")
    )
    assert inline.collect() == mat.collect()


def test_pii_scrub_counts_and_redaction(spark):
    """Planted-PII arithmetic: doc_id % 4 == 0 plants exactly one email,
    doc_id % 6 == 0 exactly one phone; redaction removes every match."""
    out = curation.q_pii_scrub(spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "pii_scrub returned no rows"
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 4 == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % 6 == 0 else 0), r
    # redacted text must contain no residual matches: re-scan the
    # scrubbed string (recomputed, since only its md5 is projected)
    d = curation.load(spark, SF_SMOKE, "documents").filter(F.col("n_chars") > 0)
    note = curation._planted_note()
    scrubbed = F.regexp_replace(
        F.regexp_replace(note, curation._EMAIL_RE, "[EMAIL]"),
        curation._PHONE_RE,
        "[PHONE]",
    )
    residual = d.select(
        (
            F.regexp_count(scrubbed, F.lit(curation._EMAIL_RE))
            + F.regexp_count(scrubbed, F.lit(curation._PHONE_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total"))
    assert residual.collect()[0].total == 0


def test_quality_filter_verdict_partition(spark):
    """Every doc gets exactly one verdict; reject reasons follow
    first-match-wins; thresholds are non-vacuous on the corpus (both
    keeps and rejects present)."""
    out = curation.q_quality_filter(spark, SF_SMOKE).collect()
    verdicts = {r.verdict for r in out}
    assert "keep" in verdicts and ("too_short" in verdicts or "no_stopwords" in verdicts)
    for r in out:
        if r.n_words < 30:
            assert r.verdict == "too_short", r
        elif r.verdict == "too_short":
            pytest.fail(f"too_short verdict on {r.n_words}-word doc: {r}")


def test_paragraph_dedup_finds_exactly_planted_templates(spark):
    """The two planted boilerplate templates are the only cross-doc
    paragraphs, each shared by every doc_id % 25 in {7, 13}."""
    out = curation.q_paragraph_dedup(spark, SF_SMOKE).collect()
    d = curation.load(spark, SF_SMOKE, "documents").filter(F.col("n_chars") > 0)
    ids = [r.doc_id for r in d.select("doc_id").collect()]
    expect_a = [i for i in ids if i % 25 == 7]
    expect_b = [i for i in ids if i % 25 == 13]
    assert sorted(r.n_docs for r in out) == sorted([len(expect_a), len(expect_b)])
    assert {r.survivor_id for r in out} == {min(expect_a), min(expect_b)}


def test_dedup_normalized_collapses_planted_twins(spark):
    """Each doc_id % 20 == 3 original and its mangled twin (id + 10^6)
    collapse to one cluster with the original as survivor."""
    out = curation.q_dedup_normalized(spark, SF_SMOKE).collect()
    d = curation.load(spark, SF_SMOKE, "documents").filter(F.col("n_chars") > 0)
    planted = [r.doc_id for r in d.select("doc_id").collect() if r.doc_id % 20 == 3]
    assert len(out) == len(planted)
    assert {r.survivor_id for r in out} == set(planted)
    assert all(r.n_docs == 2 for r in out)


def test_decontaminate_overlap_bounds(spark):
    """Overlap counts are positive and bounded by each doc's own
    distinct-trigram count; benchmark docs (doc_id % 97 == 0) never
    appear in the output."""
    out = curation.q_decontaminate(spark, SF_SMOKE).collect()
    assert out
    assert all(r.doc_id % 97 != 0 for r in out)
    assert all(r.n_overlap > 0 for r in out)


def test_norm_key_idempotent_and_variant_invariant(spark):
    """The normalized-dedup key is a fixpoint (norm(norm(x)) == norm(x))
    and invariant under the mangling used for planted twins."""
    from hypothesis import given, settings, strategies as st

    import re

    def norm_py(s: str) -> str:
        return re.sub(" +", " ", re.sub("[^a-z0-9 ]", "", s.lower())).strip()

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=80))
    def check(s):
        once = norm_py(s)
        assert norm_py(once) == once
        mangled = once.upper().replace(" ", "  ") + " !!"
        assert norm_py(mangled) == once

    check()
    # and the Spark expression agrees with the Python model on corpus text
    d = curation.load(spark, SF_SMOKE, "documents").filter(F.col("n_chars") > 0).limit(20)
    rows = d.select("text", curation._NORM(F.col("text")).alias("nk")).collect()
    for r in rows:
        assert r.nk == norm_py(r.text)


def test_quality_tiers_partition_and_totals(spark):
    """Tiers partition the corpus: per-tier doc counts sum to the corpus
    size, total_words agrees with quality_filter's per-doc n_words, and
    mean_word_len is the exact ratio of the integer sums."""
    tiers = {r.tier: r for r in curation.q_quality_tiers(spark, SF_SMOKE).collect()}
    assert set(tiers) <= {"high", "mid", "low"}
    per_doc = curation.q_quality_filter(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in tiers.values()) == len(per_doc)
    assert sum(r.total_words for r in tiers.values()) == sum(
        r.n_words for r in per_doc
    )
    for r in tiers.values():
        assert 1.0 < r.mean_word_len < 20.0


def test_lang_rollup_levels_reconcile(spark):
    """The three rollup levels agree: leaves sum to each lang subtotal,
    subtotals sum to the grand total, and grouping flags mark levels."""
    rows = curation.q_lang_rollup(spark, SF_SMOKE).collect()
    grand = [r for r in rows if r.g_lang == 1 and r.g_source == 1]
    subtot = [r for r in rows if r.g_lang == 0 and r.g_source == 1]
    leaves = [r for r in rows if r.g_lang == 0 and r.g_source == 0]
    assert len(grand) == 1 and grand[0].lang is None and grand[0].source is None
    assert grand[0].n_docs == sum(r.n_docs for r in subtot)
    assert grand[0].total_chars == sum(r.total_chars for r in leaves)
    for s in subtot:
        mine = [r for r in leaves if r.lang == s.lang]
        assert s.n_docs == sum(r.n_docs for r in mine)
        assert s.total_chars == sum(r.total_chars for r in mine)


def test_latest_capture_picks_newer_capture(spark):
    """Every url keeps exactly one row; recaptured urls (doc_id % 7 == 2)
    report 2 captures and the UPDATED content hash, all others 1 capture
    and the original hash."""
    import hashlib

    out = {r.doc_id: r for r in curation.q_latest_capture(spark, SF_SMOKE).collect()}
    src = (
        curation.load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "text")
        .collect()
    )
    assert len(out) == len(src)
    for r in src:
        got = out[r.doc_id]
        if r.doc_id % 7 == 2:
            want = hashlib.md5((r.text + " updated v2").encode()).hexdigest()
            assert got.n_captures == 2 and got.latest_md5 == want
        else:
            want = hashlib.md5(r.text.encode()).hexdigest()
            assert got.n_captures == 1 and got.latest_md5 == want


def test_mix_weights_temperature_upsamples_small_sources(spark):
    rows = curation.q_mix_weights(spark, SF_SMOKE).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    total_docs = sum(r.n_docs for r in rows)
    # α < 1 compresses the range: every source's sampled share sits
    # closer to uniform than its raw document share
    n_src = len(rows)
    for r in rows:
        raw = r.n_docs / total_docs
        uniform = 1.0 / n_src
        assert (
            min(raw, uniform) - 1e-6
            <= r.mix_weight
            <= max(raw, uniform) + 1e-6
        )
        if raw < uniform:
            assert r.mix_weight > raw  # small source upsampled
    # exact integer columns agree with an independent recount
    src = (
        curation.load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .collect()
    )
    want: dict = {}
    for s in src:
        n, c = want.get(s.source, (0, 0))
        want[s.source] = (n + 1, c + s.n_chars)
    assert {r.source: (r.n_docs, r.n_chars_total) for r in rows} == want


def test_context_pack_matches_greedy_recompute(spark):
    import hashlib

    rows = curation.q_context_pack(spark, SF_SMOKE).collect()
    src = (
        curation.load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .collect()
    )
    # independent recompute: hash order per (lang, bucket), exclusive
    # running token count, chunked assignment
    import re

    groups: dict = {}
    for s in src:
        h = hashlib.md5(s.text.encode()).hexdigest()
        n_tok = len(re.split(" +", s.text.strip()))
        groups.setdefault((s.lang, h[0]), []).append((h, s.doc_id, n_tok))
    want = {}
    for (lang, bucket), docs in groups.items():
        cum = 0
        for h, doc_id, n_tok in sorted(docs):
            want[doc_id] = (lang, bucket, n_tok, cum // curation.PACK_TOKEN_BUDGET)
            cum += n_tok
    got = {r.doc_id: (r.lang, r.bucket, r.n_tokens, r.seq_id) for r in rows}
    assert got == want
    # packing is non-trivial at this sf: some group fills >1 sequence
    assert any(seq > 0 for _, _, _, seq in got.values())


def test_quantile_sketch_contract(spark):
    """Exact quantiles match an independent linear-interpolation
    reference per lang ((1-g)*lower + g*upper — the symmetric lerp form
    both engines use; the lower+(upper-lower)*g ordering differs in the
    last ulp), and the sketch contract holds at this sf."""

    def lerp_quantile(sorted_vals, p):
        k = (len(sorted_vals) - 1) * p
        lo = int(k)
        hi = min(lo + 1, len(sorted_vals) - 1)
        g = k - lo
        return (1 - g) * sorted_vals[lo] + g * sorted_vals[hi]

    rows = curation.q_quantile_sketch_check(spark, SF_SMOKE).collect()
    src = (
        curation.load(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .select("lang", "n_chars")
        .collect()
    )
    by_lang: dict = {}
    for r in src:
        by_lang.setdefault(r.lang, []).append(r.n_chars)
    assert {r.lang for r in rows} == set(by_lang)
    for r in rows:
        vals = sorted(float(v) for v in by_lang[r.lang])
        assert r.exact_p50 == lerp_quantile(vals, 0.5)
        assert r.exact_p90 == lerp_quantile(vals, 0.9)
        assert r.p50_within_5pct and r.p90_within_5pct


def test_tier_label_streaming_matches_batch(spark, tmp_path):
    """The tier rule is stateless map-only, so the IDENTICAL labeling
    must come out of a Structured Streaming availableNow run over the
    same documents — the property that lets tier extraction run on the
    live crawl instead of waiting for snapshot batches."""
    import shutil

    from oct_report_ocr_spark.operators.curation import q_tier_extract, tier_label

    sf_dir = "/root/testdata/sf0.001"
    in_dir = tmp_path / "docs_stream"
    in_dir.mkdir()
    shutil.copy(
        f"{sf_dir}/documents.parquet", str(in_dir / "documents.parquet")
    )
    batch = {
        (r.doc_id, r.lang, r.tier, r.n_words, r.has_stop)
        for r in q_tier_extract(spark, sf_dir).collect()
    }
    docs = spark.readStream.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).parquet(str(in_dir))
    labeled = tier_label(docs).select("doc_id", "lang", "tier", "n_words", "has_stop")
    q = (
        labeled.writeStream.format("memory")
        .queryName("tiers_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM tiers_stream").collect()
    }
    assert got == batch and len(got) > 0


def test_incremental_dedup_invariants(spark):
    """Survivor keys must be disjoint from the snapshot index, cover
    every unseen new-batch fingerprint exactly once, and pick the
    lowest new doc_id per key."""
    from oct_report_ocr_spark.operators.curation import _NORM, q_incremental_dedup

    sf_dir = "/root/testdata/sf0.001"
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", F.md5(_NORM(F.col("text"))).alias("k"))
    )
    index = {r.k for r in d.filter(F.col("doc_id") % 10 < 8).collect()}
    fresh = [(r.doc_id, r.k) for r in d.filter(F.col("doc_id") % 10 >= 8).collect()]
    got = {r.content_key: (r.survivor_id, r.n_new) for r in q_incremental_dedup(spark, sf_dir).collect()}
    assert set(got) & index == set()
    expect = {}
    for doc_id, k in fresh:
        if k in index:
            continue
        sid, n = expect.get(k, (doc_id, 0))
        expect[k] = (min(sid, doc_id), n + 1)
    assert got == expect and len(got) > 0


def test_host_rollup_invariants(spark):
    """Per-host masses must re-aggregate to the corpus totals, mean and
    short_frac must be the exact rational of the integer columns, and
    the planted host space (source × doc_id%7) must have multi-doc
    cells so the rollup is non-vacuous."""
    from oct_report_ocr_spark.operators.curation import q_host_rollup

    sf_dir = "/root/testdata/sf0.001"
    rows = q_host_rollup(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("n_chars") > 0)
    assert sum(r.n_docs for r in rows) == d.count()
    assert sum(r.total_chars for r in rows) == d.agg(F.sum("n_chars")).first()[0]
    assert max(r.n_docs for r in rows) >= 2
    for r in rows:
        assert r.mean_chars == r.total_chars / r.n_docs
        assert r.host_blocked == ((r.short_frac) > 0.5)
        assert 1 <= r.n_langs <= 5


def test_url_canonical_dedup_collapses_variants(spark):
    """Every doc_id % 5 == 1 doc must collapse its tracking-variant
    capture (n_captures == 2, survivor = byte-wise min raw url — the
    UPPERCASE variant, since 'H' < 'h' in ASCII); all others stay
    singletons; canonical urls carry no query/fragment/trailing slash
    and a lowercased scheme+host."""
    from oct_report_ocr_spark.operators.curation import q_url_canonical_dedup

    rows = q_url_canonical_dedup(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert r.n_captures == (2 if r.doc_id % 5 == 1 else 1)
        assert "?" not in r.canon_url and "#" not in r.canon_url
        assert not r.canon_url.endswith("/")
        assert r.canon_url.startswith("https://")
        if r.n_captures == 2:
            assert r.survivor_url.startswith("HTTPS://")  # 'H' < 'h'
        else:
            assert r.survivor_url.startswith("https://")
        host = r.canon_url.split("://", 1)[1].split("/", 1)[0]
        assert host == host.lower()


def test_host_blocklist_prefix_semantics(spark):
    """Blocked counts must equal a driver-side replay of the rules:
    host equality AND path startswith — nothing more (no substring or
    regex semantics leaking in)."""
    from oct_report_ocr_spark.operators.curation import (
        _BLOCK_RULES,
        q_host_blocklist_filter,
    )

    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("n_chars") > 0)
    pages = [
        (f"{r.source}-{r.doc_id % 7}.example.com", f"/docs/{r.lang}/{r.doc_id}", r.doc_id)
        for r in d.select("source", "doc_id", "lang").collect()
    ]
    expect = {}
    for host, prefix in _BLOCK_RULES:
        hits = [i for h, p, i in pages if h == host and p.startswith(prefix)]
        if hits:
            expect[(host, prefix)] = (len(hits), min(hits))
    got = {
        (r.rule_host, r.path_prefix): (r.n_blocked, r.first_blocked_id)
        for r in q_host_blocklist_filter(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0


def test_cms_frequency_check_contract(spark):
    """Replay the D×W sketch in pure Python (hashlib md5, same fold)
    and assert (a) the operator's estimates equal the replay exactly,
    (b) est >= exact for every probe (the CMS guarantee), (c) at least
    one probe shows a real collision so the contract is non-vacuous."""
    import hashlib
    import re as _re
    from collections import Counter

    from oct_report_ocr_spark.operators.curation import (
        CMS_D,
        CMS_W,
        CMS_PROBE_MIN,
        q_cms_frequency_check,
    )

    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("n_chars") > 0)
    toks = []
    for r in d.select("text").collect():
        cleaned = _re.sub(" +", " ", _re.sub("[^a-z ]", "", r.text.lower())).strip()
        toks.extend(cleaned.split(" "))

    def bucket(seed, token):
        h = hashlib.md5(f"{seed}:{token}".encode()).hexdigest()
        return int(h[:8], 16) % CMS_W

    cells = Counter()
    for t in toks:
        for s in range(CMS_D):
            cells[(s, bucket(s, t))] += 1
    exact = Counter(toks)
    expect = {}
    for t, n in exact.items():
        if n >= CMS_PROBE_MIN:
            est = min(cells[(s, bucket(s, t))] for s in range(CMS_D))
            expect[t] = (n, est, est - n, est >= n)
    got = {
        r.token: (r.exact_n, r.est_n, r.overcount, r.never_underestimates)
        for r in q_cms_frequency_check(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0
    assert all(v[3] for v in got.values())
    assert any(v[2] > 0 for v in got.values())


def test_bloom_prefilter_contract(spark):
    """Replay the Bloom filter in pure Python (hashlib md5 + the same
    hex fold) and assert (a) the operator's verdicts equal the replay
    exactly, (b) zero false negatives (the Bloom guarantee), (c) false
    positives exist so the contract is non-vacuous, (d) every planted
    twin is flagged as a true dup."""
    import hashlib
    import re as _re

    from oct_report_ocr_spark.operators.curation import (
        BLOOM_K,
        BLOOM_M,
        q_bloom_prefilter_check,
    )

    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("n_chars") > 0)

    def key(text):
        norm = _re.sub(" +", " ", _re.sub("[^a-z0-9 ]", "", text.lower())).strip()
        return hashlib.md5(norm.encode()).hexdigest()

    keyed = [(r.doc_id, key(r.text)) for r in d.select("doc_id", "text").collect()]
    newb = [(i, k) for i, k in keyed if i % 10 >= 8] + [
        (i + 1000000, k) for i, k in keyed if i % 20 == 3
    ]
    idx = {k for i, k in keyed if i % 10 < 8}

    def bits(k):
        return [
            int(hashlib.md5(f"{s}:{k}".encode()).hexdigest()[:8], 16) % BLOOM_M
            for s in range(BLOOM_K)
        ]

    bloom = {b for k in idx for b in bits(k)}
    expect = {}
    for i, k in newb:
        pos = all(b in bloom for b in bits(k))
        true_dup = k in idx
        expect[i] = (true_dup, pos, not (true_dup and not pos))
    got = {
        r.doc_id: (r.is_true_dup, r.bloom_positive, r.no_false_negative)
        for r in q_bloom_prefilter_check(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0
    assert all(v[2] for v in got.values())  # no false negatives, ever
    assert any(v[1] and not v[0] for v in got.values())  # real collisions
    assert all(got[i + 1000000][0] for i, k in keyed if i % 20 == 3)
