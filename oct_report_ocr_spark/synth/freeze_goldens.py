"""Freeze golden extraction fixtures (run once; outputs are committed).

Picks a deterministic covering set of synthetic documents (both
templates, all signal-strength variants, every dirty kind, one huge
page) and writes:

- tests/fixtures/pages/{case}.html        — input bytes
- tests/fixtures/golden/{case}.txt        — expected extracted_text bytes
- tests/fixtures/golden/{case}.spans.json — expected spans
- tests/fixtures/golden/{case}.meta.json  — url/template/error/n_lines

The byte-identity contract (BASELINE.json input_hint): the extractor —
standalone or through the Spark job — must reproduce these bytes
exactly. Re-running this script must be a no-op unless extraction
semantics deliberately changed (then the diff is the review artifact).
"""

from __future__ import annotations

import json
import os

from oct_report_ocr_spark.extract import extract_one
from oct_report_ocr_spark.synth.gen_corpus import make_doc

SEED = 42
FIXTURE_COUNT_PER_KIND = {
    "gcc": 8,
    "rnfl": 8,
    "generic": 3,
    "huge": 1,
    "dirty-empty": 2,
    "dirty-truncated": 2,
    "dirty-utf8": 2,
}


def select_cases() -> list[tuple[str, int]]:
    need = dict(FIXTURE_COUNT_PER_KIND)
    out: list[tuple[str, int]] = []
    i = 0
    while any(v > 0 for v in need.values()) and i < 100_000:
        d = make_doc(SEED, i)
        t = d["_template"]
        if need.get(t, 0) > 0:
            need[t] -= 1
            out.append((f"{t}_{i:05d}", i))
        i += 1
    return out


def main() -> None:
    root = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures")
    pages, golden = os.path.join(root, "pages"), os.path.join(root, "golden")
    os.makedirs(pages, exist_ok=True)
    os.makedirs(golden, exist_ok=True)

    cases = select_cases()
    index = []
    for case, doc_id in cases:
        d = make_doc(SEED, doc_id)
        r = extract_one(d["html"], d["url"])
        with open(os.path.join(pages, f"{case}.html"), "wb") as f:
            f.write(d["html"])
        with open(os.path.join(golden, f"{case}.txt"), "wb") as f:
            f.write((r.extracted_text or "").encode("utf-8"))
        with open(os.path.join(golden, f"{case}.spans.json"), "w") as f:
            json.dump(
                [{"label": s.label, "start": s.start, "end": s.end, "text": s.text, "line_idx": s.line_idx} for s in r.spans],
                f,
                indent=1,
                ensure_ascii=False,
            )
        with open(os.path.join(golden, f"{case}.meta.json"), "w") as f:
            json.dump(
                {
                    "url": d["url"],
                    "doc_id": doc_id,
                    "template": r.template,
                    "error": r.error,
                    "n_lines": r.n_lines,
                    "n_blocks": r.n_blocks,
                    "meta": r.meta,
                    "truth": d["_truth"],
                },
                f,
                indent=1,
                ensure_ascii=False,
            )
        index.append(case)
    with open(os.path.join(golden, "INDEX.json"), "w") as f:
        json.dump(index, f, indent=1)
    print(f"froze {len(index)} golden cases")


if __name__ == "__main__":
    main()
