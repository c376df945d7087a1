"""codepropertygraph_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the data model and pass/overlay semantics of
m1cm1c/codepropertygraph (the reference at /root/reference), re-expressed as
partition-parallel Spark DataFrame transforms over multi-turn conversation /
agent transcripts.

Reference concepts → this package (see SURVEY.md for the full mapping):

- schema-typed property graph (reference ``schema/src/main/resources/schemas/
  base.json``)                          → :mod:`codepropertygraph_spark.schema`
- KeyPool deterministic id intervals (reference ``codepropertygraph/src/main/
  scala/io/shiftleft/passes/KeyPool.scala:23-98``)
                                        → :mod:`codepropertygraph_spark.ids`
- construction / enhancement passes (reference ``semanticcpg/.../passes``)
                                        → :mod:`codepropertygraph_spark.operators`
- DiffGraph + overlay serialization (reference ``codepropertygraph/.../passes/
  DiffGraph.scala``, ``SerializedCpg.scala``)
                                        → :mod:`codepropertygraph_spark.plans.pipeline`

This package is NOT a port: the reference is a single-JVM OverflowDB engine
with lazy Scala iterators; here every pass is a declarative DataFrame job
that Catalyst optimizes and that scales by partitioning.
"""

__version__ = "0.1.0"
