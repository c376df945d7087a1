"""Top-k entities by integer-PageRank salience over the REL graph.
Params: k (default 10), iters (default 5)."""


def run(g, params):
    k = int(params.get("k", 10))
    iters = int(params.get("iters", 5))
    pr = g.entity_pagerank(iters=iters)
    names = g.entities().df.select("id", "name")
    return [
        (r["name"], r["score_micro"])
        for r in pr.join(names, pr.node == names.id)
        .orderBy(F.col("score_micro").desc(), F.col("name").asc())
        .limit(k)
        .collect()
    ]
