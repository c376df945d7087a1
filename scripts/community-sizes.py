"""Entity community size distribution (label propagation over REL).
Params: iters (default 3), top (default 10)."""


def run(g, params):
    cm = g.entity_communities(iters=int(params.get("iters", 3)))
    return [
        (r["community"], r["n"])
        for r in cm.groupBy("community")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy(F.col("n").desc(), F.col("community").asc())
        .limit(int(params.get("top", 10)))
        .collect()
    ]
