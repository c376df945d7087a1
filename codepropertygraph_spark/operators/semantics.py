"""Flow-semantics rules — the dataflow engine's semantics loader analog.

The reference loads per-method propagation rules from a semantics file —
lines of ``"<methodFullName>" <srcParam> -> <dstParam>, ...`` — parsed by
``dataflowengineoss/.../semanticsloader/Parser.scala:34-76`` into a
``Semantics`` table the query engine consults at every call site to decide
which argument flows propagate (``Engine.scala`` uses them to prune edges).

Domain translation: our "call sites" are predicate clauses; a rule declares,
per predicate, which direction(s) taint propagates between subject and
object. The rule file format mirrors the reference's:

    # comments and blank lines ignored
    "uses_tool"  subj -> obj
    "mentions"   subj -> obj, obj -> subj
    "asks_about" obj -> subj
    "refers_to"  -          # no propagation

Rules are parsed driver-side into a tiny DataFrame and applied as a
broadcast join that REWRITES the triple set into a directed flow-edge set —
the application point the reference has in its engine's expandIn/expandOut.
Everything downstream (reachability, flows) then runs on the pruned edges:
the rules table is entity-scale, the join map-side, so semantics filtering
adds zero shuffles to the plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SEMANTICS = """
# default transcript-KG flow semantics (predicate -> propagation directions)
"uses_tool"  subj -> obj
"mentions"   subj -> obj, obj -> subj
"asks_about" obj -> subj
"refers_to"  subj -> obj
"follows"    subj -> obj
"""

_RULE_RE = re.compile(r'^"(?P<name>[^"]+)"\s*(?P<maps>.*)$')
_MAP_RE = re.compile(r"^(subj|obj)\s*->\s*(subj|obj)$")


def parse_semantics(text: str) -> list[tuple[str, str, str]]:
    """Parse a semantics document into (predicate, src_role, dst_role) rows.
    ``"-"`` (or an empty mapping list) declares NO propagation — the
    predicate is consulted but contributes no flow edges, exactly like a
    reference rule with no parameter mappings (Parser.scala:50-61)."""
    rules: list[tuple[str, str, str]] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _RULE_RE.match(line)
        if not m:
            raise ValueError(f"unparseable semantics line: {raw!r}")
        name = m.group("name")
        maps = m.group("maps").strip()
        if maps in ("", "-"):
            continue
        for part in (p.strip() for p in maps.split(",")):
            pm = _MAP_RE.match(part)
            if not pm:
                raise ValueError(f"unparseable mapping {part!r} in {raw!r}")
            rules.append((name, pm.group(1), pm.group(2)))
    return rules


def semantics_table(spark: SparkSession, text: str = DEFAULT_SEMANTICS) -> DataFrame:
    """The parsed rules as a (pred, src_role, dst_role) DataFrame."""
    rows = parse_semantics(text)
    return spark.createDataFrame(
        rows or [(None, None, None)],
        "pred string, src_role string, dst_role string",
    ).where(F.col("pred").isNotNull())


def flow_edges(triples: DataFrame, rules: DataFrame) -> DataFrame:
    """Application point: rewrite (conv_id, subj, pred, obj) triples into the
    directed flow-edge set (conv_id, s, o) the rules allow. A triple whose
    predicate has k mappings contributes k edges; predicates with no rule
    (or a '-' rule) contribute none. Broadcast join — map-only."""
    joined = triples.join(F.broadcast(rules), "pred")
    return joined.select(
        "conv_id",
        F.when(F.col("src_role") == "subj", F.col("subj"))
        .otherwise(F.col("obj"))
        .alias("s"),
        F.when(F.col("dst_role") == "subj", F.col("subj"))
        .otherwise(F.col("obj"))
        .alias("o"),
    ).dropDuplicates(["conv_id", "s", "o"])
