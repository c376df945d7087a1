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
    # both-endpoint membership pushed into the scan (the dot variant's
    # discipline): only the conversation's own edges reach the driver —
    # collecting the label-filtered FULL edge table OOMs at scale.
    sub_edges = (
        edges.where(F.col("label").isin(list(edge_labels)))
        .where(F.col("src").isin(list(ids)) & F.col("dst").isin(list(ids)))
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


# ---------------------------------------------------------------------------
# full-graph interchange bundle (the cpg.bin.zip analog)
# ---------------------------------------------------------------------------

BUNDLE_VERSION = 1

#: canonical on-disk column order; map props are serialized as a key-sorted
#: entry array so two writes of the same graph are content-identical
#: (parquet part FILENAMES embed task uuids, so identity is defined over the
#: manifest's content hashes + row sets, not raw file bytes — the same
#: contract as comparing two cpg.bin.zip by their proto payloads).
_NODE_COLS = ["id", "label", "name", "full_name", "code", "order", "conv_id", "turn_idx"]
_EDGE_COLS = ["src", "dst", "label"]


def _canonical(df: DataFrame, cols: list[str]) -> DataFrame:
    entries = F.array_sort(F.map_entries(F.coalesce(
        F.col("props"), F.create_map().cast("map<string,string>"))))
    return df.select(*cols, entries.alias("props_entries"))


def _content_hash(df: DataFrame) -> dict:
    """Order-free content fingerprint computed distributively: per-row
    xxhash64 over the canonical JSON, combined with sum + xor + count (no
    driver-side sort, no collect). The sum runs in decimal(38,0) — exact and
    ANSI-overflow-free up to ~1e19 rows, where summing raw int64 hashes
    overflows after a handful."""
    h = F.xxhash64(F.to_json(F.struct(*df.columns)))
    row = df.select(h.alias("h")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
        F.expr("bit_xor(h)").alias("hxor"),
    ).collect()[0]
    return {"rows": row.n, "sum": str(row.hsum), "xor": str(row.hxor)}


def export_bundle(
    nodes: DataFrame, edges: DataFrame, out_dir: str, n_files: int = 8
) -> dict:
    """Write the WHOLE graph as a deterministic interchange bundle — the
    ``cpg.bin.zip`` full-graph serialization analog
    (``codepropertygraph/.../cpgloading/ProtoCpgLoader.scala:23`` reads the
    zip of proto node/edge lists; here the payload is schema'd parquet).

    Layout: ``<out_dir>/nodes`` + ``<out_dir>/edges`` parquet (props as
    key-sorted entry arrays, hash-bucketed into ``n_files`` deterministic
    buckets, sorted within each) + ``<out_dir>/manifest.json`` carrying
    version, schema, row counts and order-free content hashes. Distributed
    end to end — no driver-side materialization, any n_files works at any
    scale."""
    import json
    import os

    n = _canonical(nodes, _NODE_COLS).repartition(
        n_files, F.pmod(F.xxhash64("id"), F.lit(n_files))
    ).sortWithinPartitions("id", "label")
    e = _canonical(edges, _EDGE_COLS).repartition(
        n_files, F.pmod(F.xxhash64("src", "dst", "label"), F.lit(n_files))
    ).sortWithinPartitions("src", "dst", "label", "props_entries")
    n.write.mode("overwrite").parquet(f"{out_dir}/nodes")
    e.write.mode("overwrite").parquet(f"{out_dir}/edges")
    manifest = {
        "bundle_version": BUNDLE_VERSION,
        "node_cols": _NODE_COLS,
        "edge_cols": _EDGE_COLS,
        "nodes": _content_hash(_canonical(nodes, _NODE_COLS)),
        "edges": _content_hash(_canonical(edges, _EDGE_COLS)),
    }
    # the parquet payload goes through the Spark writer (any Hadoop-supported
    # filesystem), so the manifest must too: write-tmp-then-rename through the
    # Hadoop FileSystem resolved FROM out_dir's scheme — a local open()/
    # os.replace here would silently drop the manifest on an HDFS/S3 out_dir.
    spark = nodes.sparkSession
    jvm = spark._jvm
    payload = json.dumps(manifest, indent=1, sort_keys=True).encode()
    hpath = jvm.org.apache.hadoop.fs.Path(os.path.join(out_dir, "manifest.json"))
    tmp = jvm.org.apache.hadoop.fs.Path(os.path.join(out_dir, "manifest.json.tmp"))
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(tmp, True)
    try:
        stream.write(payload)
    finally:
        stream.close()
    fs.delete(hpath, False)  # rename is not overwrite-atomic on every FS
    if not fs.rename(tmp, hpath):
        raise IOError(f"manifest rename failed: {tmp} -> {hpath}")
    return manifest


def load_bundle(spark, out_dir: str) -> tuple[DataFrame, DataFrame, dict]:
    """Read a bundle back into (nodes, edges, manifest) with the ORIGINAL
    schemas (props entry arrays restored to maps). Verifies the manifest's
    content hashes against what was read — a corrupted or partially-written
    bundle fails loudly (the proto loader's zip CRC analog)."""
    import json

    # wholetext read through Spark: the manifest loads from whatever
    # filesystem holds the bundle, mirroring the writer.
    manifest = json.loads(
        spark.read.text(f"{out_dir}/manifest.json", wholetext=True).collect()[0][0]
    )
    if manifest["bundle_version"] != BUNDLE_VERSION:
        raise ValueError(f"unsupported bundle version {manifest['bundle_version']}")
    rn = spark.read.parquet(f"{out_dir}/nodes")
    re_ = spark.read.parquet(f"{out_dir}/edges")
    got_n, got_e = _content_hash(rn.select(*manifest["node_cols"], "props_entries")), _content_hash(
        re_.select(*manifest["edge_cols"], "props_entries")
    )
    if got_n != manifest["nodes"] or got_e != manifest["edges"]:
        raise ValueError(
            f"bundle content mismatch: nodes {got_n} vs {manifest['nodes']}, "
            f"edges {got_e} vs {manifest['edges']}"
        )
    back = lambda df, cols: df.select(
        *cols, F.map_from_entries("props_entries").alias("props")
    )
    return back(rn, manifest["node_cols"]), back(re_, manifest["edge_cols"]), manifest
