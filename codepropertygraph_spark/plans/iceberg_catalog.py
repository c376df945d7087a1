"""Iceberg-backed overlay store — the managed-table form of
:class:`codepropertygraph_spark.plans.pipeline.Catalog`.

SURVEY.md §1.3/§2.B maps the reference's overlay serialization
(``codepropertygraph/.../cpgloading/ProtoCpgLoader.scala:23`` — load base
layer then apply overlay zips in order; ``CpgLoader.createIndexes:110`` —
post-load indexes) onto Iceberg's snapshot model. The shipped parquet
``Catalog`` implements those semantics with overlay dirs + ``_COMMIT.json``
markers because this sandbox has no Iceberg jar; THIS module is the same
contract expressed as Iceberg operations, activated wherever the runtime
ships ``iceberg-spark-runtime``:

  Catalog concept              Iceberg realization
  ---------------------------  -------------------------------------------
  overlay commit (marker)      one table snapshot; overlay name + counters
                               in snapshot summary properties
  committed_overlays()         snapshots table (ordered, with summaries)
  rollback_to(i)               CALL <cat>.system.rollback_to_snapshot
  compact()                    CALL <cat>.system.rewrite_data_files
  sortWithinPartitions index   ALTER TABLE ... WRITE ORDERED BY
  per-partition lineage        files metadata table (per-file row counts)

Nothing here imports Iceberg classes directly — everything goes through
``spark.sql`` so the module imports cleanly without the jar; calls fail
fast with a clear error when :func:`iceberg_available` is false.
``tests/test_iceberg_seam.py`` runs the full commit/rollback/lineage cycle
when the jar is present and skips otherwise (surface-parity checks always
run), which is exactly the claim SURVEY makes: the overlay semantics map
1:1, the binding is a deployment concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath — add "
            "iceberg-spark-runtime and a catalog config "
            "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog) "
            "or use plans.pipeline.Catalog, the parquet overlay store with "
            "the same commit/rollback semantics"
        )


class IcebergCatalog:
    """Same surface as :class:`pipeline.Catalog`, bound to Iceberg tables
    ``<namespace>.nodes`` / ``<namespace>.edges`` in Spark catalog ``cat``.

    Overlay-commit discipline: each :meth:`commit_overlay` is ONE snapshot
    per table, stamped with ``overlay-name``/``pass-index`` summary
    properties via the write's ``snapshot-property.`` options — the
    ``_COMMIT.json`` marker analog, but transactional in the table format
    itself (a killed writer leaves no half-commit for a reader to trip on,
    which the directory store has to handle with marker ordering)."""

    def __init__(self, spark: SparkSession, cat: str, namespace: str):
        _require(spark)
        self.spark = spark
        self.cat = cat
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.{namespace}")

    def _tbl(self, table: str) -> str:
        return f"{self.cat}.{self.namespace}.{table}"

    # -- overlay bookkeeping ------------------------------------------------

    def committed_overlays(self, table: str = "nodes") -> list[dict]:
        """Ordered commit records from the snapshots metadata table."""
        rows = self.spark.sql(
            f"SELECT snapshot_id, committed_at, summary "
            f"FROM {self._tbl(table)}.snapshots ORDER BY committed_at"
        ).collect()
        out = []
        for r in rows:
            s = dict(r.summary or {})
            if "overlay-name" in s:
                out.append(
                    {
                        "overlay": s["overlay-name"],
                        "pass_index": int(s.get("pass-index", -1)),
                        "snapshot_id": r.snapshot_id,
                        "committed_at": str(r.committed_at),
                        "counters": {table: int(s.get("added-records", 0))},
                    }
                )
        return out

    def overlay_names(self) -> list[str]:
        return [c["overlay"] for c in self.committed_overlays()]

    def commit_overlay(
        self, index: int, name: str, tables: dict[str, DataFrame]
    ) -> dict:
        """Append each table's rows as one stamped snapshot. The snapshot
        summary carries the overlay identity; counters come back from the
        table's own bookkeeping, not a side file."""
        record: dict = {"overlay": name, "pass_index": index, "counters": {}}
        for tname, df in tables.items():
            (
                df.writeTo(self._tbl(tname))
                .option("snapshot-property.overlay-name", name)
                .option("snapshot-property.pass-index", str(index))
                .createOrReplace()
                if not self.spark.catalog.tableExists(self._tbl(tname))
                else df.writeTo(self._tbl(tname))
                .option("snapshot-property.overlay-name", name)
                .option("snapshot-property.pass-index", str(index))
                .append()
            )
            record["counters"][tname] = df.count()
        return record

    def rollback_to(self, table: str, snapshot_id: int) -> None:
        """The Catalog.rollback_to analog — one metadata operation, no data
        rewrite (vs the directory store's marker deletion)."""
        self.spark.sql(
            f"CALL {self.cat}.system.rollback_to_snapshot"
            f"('{self.namespace}.{table}', {snapshot_id})"
        )

    def compact(self, table: str) -> None:
        """Catalog.compact analog: bin-pack small files, keep snapshots."""
        self.spark.sql(
            f"CALL {self.cat}.system.rewrite_data_files"
            f"('{self.namespace}.{table}')"
        )

    def build_index(self, table: str = "nodes") -> None:
        """CpgLoader.createIndexes analog: declare the write sort order so
        every future file carries pruning-friendly column stats — the
        managed-table form of the parquet store's sortWithinPartitions +
        hash-bucket index table."""
        order = "label, full_name, id" if table == "nodes" else "label, src, dst"
        self.spark.sql(f"ALTER TABLE {self._tbl(table)} WRITE ORDERED BY {order}")

    def lineage(self, table: str = "nodes") -> DataFrame:
        """Per-partition lineage (north_rule): per-file row counts from the
        files metadata table — the _COMMIT.json partition_rows analog,
        maintained by the format instead of recomputed at commit time."""
        return self.spark.sql(
            f"SELECT file_path, record_count FROM {self._tbl(table)}.files"
        )

    def read_table(self, table: str) -> DataFrame:
        return self.spark.table(self._tbl(table))

    def nodes(self) -> DataFrame:
        return self.read_table("nodes")

    def edges(self) -> DataFrame:
        return self.read_table("edges")
