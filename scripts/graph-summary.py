"""Graph summary: node and edge counts by label (the console's
`cpg.graph` one-liner analog; run via kgql --script or
workspace.run_script). Returns a dict of label -> count tables."""


def run(g, params):
    nodes = {
        r["label"]: r["n"]
        for r in g.nodes.groupBy("label").count().withColumnRenamed("count", "n").collect()
    }
    edges = {
        r["label"]: r["n"]
        for r in g.edges.groupBy("label").count().withColumnRenamed("count", "n").collect()
    }
    return {"nodes": nodes, "edges": edges}
