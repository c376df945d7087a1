"""Physical-plan audit: prints .explain("formatted") for the headline
queries and greps for the plan properties the engine is designed around:

- broadcast hash joins on every dictionary probe (no shuffle on hub keys),
- whole-stage codegen spans over the extraction path,
- partial (map-side) aggregation before every exchange,
- no Python row-at-a-time UDFs (only ArrowEvalPython / FlatMapGroupsInPandas
  where a pandas stage is intended).

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def audit(name: str, df) -> None:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    checks = {
        "BroadcastHashJoin": "broadcast join present",
        "WholeStageCodegen": "codegen spans",
        "partial": "map-side partial aggregation",
    }
    print(f"\n===== {name} =====")
    for pat, why in checks.items():
        n = len(re.findall(pat, plan))
        print(f"  {why:34s} {pat}: {n}")
    bad = len(re.findall(r"BatchEvalPython", plan))
    print(f"  row-at-a-time Python stages       BatchEvalPython: {bad} (must be 0)")
    n_exchange = len(re.findall(r"Exchange", plan))
    print(f"  exchanges (shuffles)              Exchange: {n_exchange}")
    if "--full" in sys.argv:
        print(plan)


def main() -> None:
    import __spark_entry__ as E
    from codepropertygraph_spark.session import get_spark

    spark = get_spark(master="local[8]")
    qs = E.queries()
    for name in (
        "kg_triples",
        "kg_mentions",
        "kg_raw_triples",
        "kg_linked_mentions",
        "kg_reaching_defs",
        "dedup_minhash_pairs",
        "ann_cosine_topk",
        "tpch_q1",
    ):
        audit(name, qs[name](spark, SF_DIR))


if __name__ == "__main__":
    main()
