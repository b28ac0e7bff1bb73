"""``extract_one`` — the pure per-document extraction core.

One document in, one result row out — the analog of the reference's
per-document loop body (download → decode → crop → OCR → rules → CSV
row, /root/reference/extract_gcc_report_text_ou.py:40-144), minus all
I/O. The function is:

- **pure**: bytes in, plain data out; no filesystem, network, clock,
  or global mutable state — so Arrow-batch order, partition count and
  retry count cannot change any output byte (SURVEY.md §7.3 risk 2).
- **total**: never raises. Malformed documents come back with
  ``error`` set and land in the quarantine output, mirroring the
  reference's per-doc blanket try/except
  (extract_gcc_report_text_ou.py:189-190, D9).
- **byte-deterministic**: ``extracted_text`` for a given (html, url)
  is frozen by the golden-fixture suite (tests/fixtures/golden/).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import htmlseg, rules

MAX_HTML_BYTES = 64 * 1024 * 1024  # refuse absurd payloads instead of OOMing a worker


@dataclass
class Span:
    label: str
    start: int
    end: int
    text: str
    line_idx: int = -1  # index into the extracted line list (-1: synthetic)


@dataclass
class ExtractResult:
    url: str
    extracted_text: str | None
    spans: list[Span] = field(default_factory=list)
    template: str = "generic"
    n_blocks: int = 0
    n_lines: int = 0
    error: str | None = None
    # typed head projection (S12 depth): dict with keys title,
    # meta_description, charset, canonical_url, og_type — None until
    # the payload decodes, then always a dict (values may be None)
    meta: dict | None = None


def _spans_for_fields(
    lines: list[str], line_offsets: list[int], fields: list[rules.Field]
) -> list[Span]:
    """Resolve each pulled field to char offsets into extracted_text.

    A field value read from line ``li`` is located inside that line via
    ``str.find`` (first occurrence — deterministic); normalizer-produced
    values (μm repair, ^2 suffix, reversed tokens) that no longer occur
    verbatim in the line get the whole line as their span, with the
    normalized value kept in ``text`` — the audit contract (D8): a human
    can always jump from a span to the source region.
    """
    spans: list[Span] = []
    for f in fields:
        if f.line_idx < 0 or f.line_idx >= len(lines):
            spans.append(Span(f.label, -1, -1, f.value, -1))
            continue
        base = line_offsets[f.line_idx]
        line = lines[f.line_idx]
        pos = line.find(f.value)
        if pos >= 0:
            spans.append(
                Span(f.label, base + pos, base + pos + len(f.value), f.value, f.line_idx)
            )
        else:
            spans.append(Span(f.label, base, base + len(line), f.value, f.line_idx))
    return spans


def extract_one(html: bytes | None, url: str) -> ExtractResult:
    """Decode → segment → boilerplate-strip → route → pull fields."""
    try:
        if html is None or len(html) == 0:
            return ExtractResult(url=url, extracted_text=None, error="empty")
        if len(html) > MAX_HTML_BYTES:
            return ExtractResult(url=url, extracted_text=None, error="oversize")
        try:
            text = htmlseg.decode_html(bytes(html))
        except (ValueError, UnicodeDecodeError):
            return ExtractResult(url=url, extracted_text=None, error="decode-error")

        meta = htmlseg.page_metadata(text)
        lines, n_blocks = htmlseg.extract_lines(text)
        if not lines:
            return ExtractResult(
                url=url, extracted_text=None, n_blocks=n_blocks, error="no-content",
                meta=meta,
            )

        extracted_text = "\n".join(lines)
        line_offsets: list[int] = []
        off = 0
        for ln in lines:
            line_offsets.append(off)
            off += len(ln) + 1  # +1 for the '\n' joiner

        template = rules.route_template(lines)
        fields = rules.pull_fields(lines, template)
        spans = _spans_for_fields(lines, line_offsets, fields)
        return ExtractResult(
            url=url,
            extracted_text=extracted_text,
            spans=spans,
            template=template,
            n_blocks=n_blocks,
            n_lines=len(lines),
            meta=meta,
        )
    except Exception as e:  # noqa: BLE001 — D9: one bad doc never fails the job
        return ExtractResult(
            url=url, extracted_text=None, error=f"internal:{type(e).__name__}"
        )
