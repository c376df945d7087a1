"""Export jobs — JSON and Graphviz dot (SURVEY.md §2.E; reference
``Steps.toJson`` ``semanticcpg/.../language/Steps.scala:85-97`` and the dot
generators ``semanticcpg/.../dotgenerator/AstGenerator.scala:11``,
``CfgGenerator.scala:14``, ``dataflowengineoss/.../dotgenerator/
DdgGenerator.scala``).

JSON export is a distributed write job; dot export renders ONE
conversation's subgraph (a driver-side string, like the reference's
per-method dot dumps) — deterministic ordering throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_json(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Write the graph as JSON-lines (sorted for determinism)."""
    nodes.orderBy("id").write.mode("overwrite").json(f"{out_dir}/nodes")
    edges.orderBy("src", "dst", "label").write.mode("overwrite").json(
        f"{out_dir}/edges"
    )


def conversation_to_dot(
    nodes: DataFrame, edges: DataFrame, conv_id: str, edge_labels: tuple[str, ...] = ("AST", "NEXT")
) -> str:
    """Graphviz dot of one conversation's containment/order subgraph —
    the AstGenerator/CfgGenerator analog (per-method → per-conversation)."""
    sub_nodes = nodes.where(F.col("conv_id") == conv_id).select(
        "id", "label", "name", "order"
    )
    ids = {r.id: r for r in sub_nodes.collect()}
    sub_edges = (
        edges.where(F.col("label").isin(list(edge_labels)))
        .where(F.col("src").isin(list(ids)) | F.col("dst").isin(list(ids)))
        .select("src", "dst", "label")
        .collect()
    )
    lines = [f'digraph "{conv_id}" {{']
    for nid in sorted(ids):
        r = ids[nid]
        label = f"{r.label}" + (f": {r.name}" if r.name else "")
        lines.append(f'  "{nid}" [label="{label}"];')
    for e in sorted(sub_edges, key=lambda e: (e.src, e.dst, e.label)):
        if e.src in ids and e.dst in ids:
            lines.append(f'  "{e.src}" -> "{e.dst}" [label="{e.label}"];')
    lines.append("}")
    return "\n".join(lines)


def conversation_to_graphml(
    nodes: DataFrame,
    edges: DataFrame,
    conv_id: str,
    edge_labels: tuple[str, ...] = ("AST", "NEXT"),
) -> str:
    """GraphML of one conversation's subgraph — the interchange-format
    sibling of the dot export (deterministic ordering; node label/name as
    data keys). Attribute and text values are XML-escaped, so names
    containing &, <, > or quotes stay well-formed."""
    from xml.sax.saxutils import escape, quoteattr

    sub_nodes = nodes.where(F.col("conv_id") == conv_id).select("id", "label", "name")
    ids = {r.id: r for r in sub_nodes.collect()}
    sub_edges = (
        edges.where(F.col("label").isin(list(edge_labels)))
        .select("src", "dst", "label")
        .collect()
    )
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="labelV" for="node" attr.name="label" attr.type="string"/>',
        '  <key id="name" for="node" attr.name="name" attr.type="string"/>',
        '  <key id="labelE" for="edge" attr.name="label" attr.type="string"/>',
        f"  <graph id={quoteattr(str(conv_id))} edgedefault=\"directed\">",
    ]
    for nid in sorted(ids):
        r = ids[nid]
        out.append(f'    <node id="n{nid}">')
        out.append(f'      <data key="labelV">{escape(str(r.label))}</data>')
        if r.name:
            out.append(f'      <data key="name">{escape(str(r.name))}</data>')
        out.append("    </node>")
    for e in sorted(
        (e for e in sub_edges if e.src in ids and e.dst in ids),
        key=lambda e: (e.src, e.dst, e.label),
    ):
        out.append(
            f'    <edge source="n{e.src}" target="n{e.dst}">'
            f'<data key="labelE">{escape(str(e.label))}</data></edge>'
        )
    out += ["  </graph>", "</graphml>"]
    return "\n".join(out)
