#!/usr/bin/env python
"""spark-submit entry point for the web-text curation pipeline.

    spark-submit --py-files gdal_spark.zip scripts/run_curation.py \
        --in /data/documents.parquet --out /tmp/curated --blocklist bad,words

Runs the one-call hygiene chain (``gdal_spark.text.pipeline.curate``:
Gopher quality filter → blocklist screen → PII scrub → CCNet line dedup
→ exact dedup), writes the curated corpus as parquet, and prints one
metrics JSON line (doc counts in/out, token totals, stage attrition).
With no --in it synthesizes a deterministic corpus from the testdata
documents table so the CLI is runnable anywhere in-sandbox.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp",
                    default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", default="/tmp/gdal_spark_curated")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--blocklist", default="",
                    help="comma-separated exact-token blocklist")
    ap.add_argument("--no-pii", action="store_true")
    ap.add_argument("--line-keep", default="first", choices=["first", "none"])
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    from gdal_spark.session import get_spark
    from gdal_spark.text.analysis import token_metrics
    from gdal_spark.text.pipeline import curate

    spark = get_spark(shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = spark.read.parquet(args.inp)
    n_in = docs.count()
    curated = curate(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        blocklist=[w for w in args.blocklist.split(",") if w] or None,
        redact_pii=not args.no_pii,
        line_keep=args.line_keep,
    )
    curated.write.mode("overwrite").parquet(args.out)
    out_df = spark.read.parquet(args.out)
    stats = token_metrics(out_df, args.text_col).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_ws_tokens").alias("ws_tokens"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
        F.sum(F.length(F.col(args.text_col)).cast("long")).alias("chars"),
    ).collect()[0]
    print(json.dumps({
        "metric": "curation throughput",
        "docs_in": n_in,
        "docs_out": int(stats["docs"]),
        "kept_pct": round(100.0 * int(stats["docs"]) / max(n_in, 1), 2),
        "ws_tokens": int(stats["ws_tokens"] or 0),
        "bpe_tokens": int(stats["bpe_tokens"] or 0),
        "chars": int(stats["chars"] or 0),
        "elapsed_sec": round(time.time() - t0, 2),
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
