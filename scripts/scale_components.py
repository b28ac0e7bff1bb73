"""Scale-behavior harness for the dedup connected-components loop
(VERDICT r03 item 6): run the SAME pair-graph construction +
alternating large-star/small-star loop (Kiveris et al. SoCC 2014 —
the r04 rewrite of components_from_pairs after this very harness
exposed the old BSP min-label/pointer-jumping loop's O(diameter)
descending-id worst case) at two corpus scales and record

- rounds-to-convergence (the O(log² n) claim: a 16× graph must
  converge in ~log₂(largest family) rounds, nowhere near
  CC_MAX_ROUNDS),
- per-round wall time and shuffle read/write bytes (the per-round
  shuffle must track the EDGE GRAPH size, not blow up non-linearly),
- pair-construction vs loop time split.

Inputs: a documents-table sf dir (e.g. /root/testdata/sf0.1) or an
extraction corpus dir (url/html/text — e.g. the sf1.6 scaling corpus
under .cache/), from which a documents-shaped table is derived
deterministically (doc_id = xxhash64(url)) and cached.

Usage:
    python scripts/scale_components.py --input /root/testdata/sf0.1
    python scripts/scale_components.py --input .cache/corpus_v2_sf1.6_seed42

Prints ONE JSON line per run; paste results into BENCH/ notes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _documents_dir(spark, input_path: str, cache_root: str) -> str:
    """Return an sf-style dir containing documents.parquet for the
    input: passthrough when it already has one, else derive it from the
    (url, text, lang) corpus shape and cache it."""
    if os.path.exists(os.path.join(input_path, "documents.parquet")):
        return input_path
    from pyspark.sql import functions as F

    name = os.path.basename(os.path.normpath(input_path))
    out = os.path.join(cache_root, f"docs_from_{name}")
    dest = os.path.join(out, "documents.parquet")
    if not os.path.exists(dest):
        corpus = spark.read.parquet(input_path)
        docs = corpus.select(
            F.xxhash64("url").alias("doc_id"),
            "text",
            "lang",
            F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("source"),
            F.length("text").cast("bigint").alias("n_chars"),
        ).filter(F.col("text").isNotNull())
        docs.write.mode("overwrite").parquet(dest)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from oct_report_ocr_spark.operators.dedup import (
        CC_MAX_ROUNDS,
        components_from_pairs,
        dup_pairs,
    )
    from oct_report_ocr_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        app_name="scale_components",
        cores=args.cores,
        # the per-round shuffle-byte probe reads the UI REST status store
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )

    sf_dir = _documents_dir(spark, args.input, os.path.join(repo, ".cache"))
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    t0 = time.monotonic()
    pairs = dup_pairs(spark, sf_dir).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.monotonic() - t0

    stats: list = []
    t1 = time.monotonic()
    comp = components_from_pairs(spark, pairs, stats=stats)
    from pyspark.sql import functions as F

    summary = comp.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("component_id").alias("n_components"),
        F.max("n_members").alias("max_members"),
    ).collect()[0]
    t_loop = time.monotonic() - t1

    rounds = [s for s in stats if "round" in s]
    print(
        json.dumps(
            {
                "input": args.input,
                "n_docs": int(n_docs),
                "n_pairs": int(n_pairs),
                "pair_construction_sec": round(t_pairs, 2),
                "loop_sec": round(t_loop, 2),
                "rounds_to_convergence": len(rounds),
                "cc_max_rounds": CC_MAX_ROUNDS,
                "graph": stats[0] if stats else None,
                "per_round": rounds,
                "n_nodes": int(summary.n_nodes),
                "n_components": int(summary.n_components),
                "max_members": int(summary.max_members),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
