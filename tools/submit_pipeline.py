"""spark-submit entry point for the full KG-construction pipeline.

Cluster usage (the north_rule's deployment shape):

    spark-submit --py-files codepropertygraph_spark.zip \\
        tools/submit_pipeline.py \\
        --transcripts <path-or-iceberg-table> \\
        --alias-dict <path> \\
        --warehouse <output-warehouse-dir> \\
        [--master local[32]]

Local smoke:

    python tools/submit_pipeline.py --tier sf0.001 --warehouse /tmp/wh

The job is idempotent: rerunning after any failure resumes from the last
committed overlay (LayerCreator skip semantics); per-pass wall time and row
counters land in each overlay's ``_COMMIT.json`` and in the ``meta`` view.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", help="parquet path of the transcripts table")
    ap.add_argument("--alias-dict", help="parquet path of the alias dictionary")
    ap.add_argument("--tier", help="generated tier shortcut (sf0.001/sf0.01/sf0.1)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--validate", action="store_true", help="run the schema validator after the pipeline")
    args = ap.parse_args()

    from codepropertygraph_spark import testdata as td
    from codepropertygraph_spark.plans import pipeline as P
    from codepropertygraph_spark.session import get_spark

    spark = get_spark(app_name="kg-pipeline", master=args.master)
    if args.tier:
        d = td.ensure_generated(args.tier)
        transcripts = spark.read.parquet(f"{d}/transcripts.parquet")
        alias_dict = spark.read.parquet(f"{d}/alias_dict.parquet")
    else:
        if not (args.transcripts and args.alias_dict):
            ap.error("need --tier or both --transcripts and --alias-dict")
        transcripts = spark.read.parquet(args.transcripts)
        alias_dict = spark.read.parquet(args.alias_dict)

    cat = P.run_pipeline(spark, transcripts, alias_dict, args.warehouse)
    print("overlays:", cat.overlay_names())
    if args.validate:
        n = P.validate(cat).count()
        print("validator violations:", n)
        if n:
            sys.exit(2)


if __name__ == "__main__":
    main()
