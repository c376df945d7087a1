"""Tool-call usage frequencies (the reference scripts' list-funcs
shape): TOOLCALL nodes grouped by name, descending."""


def run(g, params):
    return [
        (r["name"], r["n"])
        for r in g.toolcalls()
        .df
        .groupBy("name")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy(F.col("n").desc(), F.col("name").asc())
        .collect()
    ]
