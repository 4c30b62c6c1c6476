"""Table catalog: Iceberg-style append/overwrite semantics over parquet.

On a production cluster these writes are Iceberg
(``df.writeTo("idx.postings").append()``, snapshot-per-merge-pass,
partition-by term shard, min/max column stats for data skipping).  This
sandbox has no Iceberg runtime jar, so the catalog provides the same
contract on plain parquet directories: atomic-enough phase outputs gated
on Spark's ``_SUCCESS`` marker, partitioned layouts, and phase
checkpoint/resume by output existence.  The engine code only talks to this
interface, so swapping the backend for Iceberg is a one-module change.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class IndexCatalog:
    def __init__(self, spark: SparkSession, warehouse: str | Path):
        self.spark = spark
        self.warehouse = Path(warehouse)
        self.warehouse.mkdir(parents=True, exist_ok=True)

    def path(self, table: str) -> Path:
        return self.warehouse / table

    def exists(self, table: str) -> bool:
        # complete only if the writer finished (Spark drops _SUCCESS last)
        return (self.path(table) / "_SUCCESS").exists()

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(str(self.path(table)))

    def write(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
        options: dict | None = None,
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.parquet(str(self.path(table)))

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)

    def swap(self, tmp_table: str, table: str) -> None:
        """Replace ``table`` with the fully-written ``tmp_table`` (the
        Iceberg snapshot-commit analogue).  Needed whenever a new
        generation is DERIVED from the current one (e.g. the tiered
        append copies untouched packed rows): Spark reads lazily during
        the write, so overwriting a table in place while reading it
        races with itself — write the new generation elsewhere, then
        swap directories."""
        if not self.exists(tmp_table):
            raise ValueError(f"swap source {tmp_table} incomplete (no _SUCCESS)")
        self.drop(table)
        self.path(tmp_table).rename(self.path(table))

    # --- lineage + metrics sidecars (north-rule requirement) ---------------

    def log_phase(self, phase: str, df_out: DataFrame | str,
                  extra: dict | None = None) -> None:
        """Record per-partition output row counts for a completed phase.

        Counts come from the written files' parquet FOOTERS (driver-side
        pyarrow metadata read, one output file = one write partition) — no
        Spark job and no data scan, so lineage costs O(files), not O(rows).
        Appended as JSON lines — cheap, append-only, human-auditable.
        """
        import pyarrow.parquet as pq

        table = df_out if isinstance(df_out, str) else None
        if table is None:
            # derive the table dir from the DataFrame's input files
            files = df_out.inputFiles()
            paths = [f.removeprefix("file:") for f in files]
        else:
            paths = [str(p) for p in self.path(table).rglob("*.parquet")]
        per_part = [
            {
                "file": p.rsplit("/", 1)[-1],
                "rows": pq.ParquetFile(p).metadata.num_rows,
            }
            for p in sorted(paths)
        ]
        rec = {
            "phase": phase,
            "ts": dt.datetime.now(dt.timezone.utc).isoformat(),
            "partitions": per_part,
            "total_rows": sum(p["rows"] for p in per_part),
            **(extra or {}),
        }
        lineage = self.warehouse / "lineage.jsonl"
        with lineage.open("a") as f:
            f.write(json.dumps(rec) + "\n")

    # --- table properties (Iceberg table-properties analogue) --------------

    def set_prop(self, key: str, value) -> None:
        p = self.warehouse / "properties.json"
        props = json.loads(p.read_text()) if p.exists() else {}
        props[key] = value
        p.write_text(json.dumps(props))

    def get_prop(self, key: str, default=None):
        p = self.warehouse / "properties.json"
        if not p.exists():
            return default
        return json.loads(p.read_text()).get(key, default)

    def clear_props(self) -> None:
        """Drop ALL table properties.  A force rebuild must call this:
        properties describe the CURRENT tables (pack layout, pack-time
        avgdl fingerprint, append-applied idempotence flags), and any of
        them surviving a rebuild is a stale fact about dropped data — an
        append_<label>_applied flag left behind would make a later append
        that reuses the label silently no-op against the new base."""
        p = self.warehouse / "properties.json"
        if p.exists():
            p.unlink()

    def write_metrics_tables(self) -> None:
        """Materialize the append-only lineage JSONL as queryable tables:
        ``lineage`` (one row per phase) and ``metrics`` (one row per
        phase × output file, with row counts) — the north-rule sidecar
        tables.  Idempotent; call after a build completes."""
        recs = self.lineage_records()
        if not recs:
            return
        lineage_rows = [
            {
                "phase": r["phase"],
                "ts": r["ts"],
                "total_rows": int(r["total_rows"]),
                "n_partitions": len(r.get("partitions", [])),
                "seconds": float(r["seconds"]) if "seconds" in r else None,
            }
            for r in recs
        ]
        metrics_rows = [
            {
                "phase": r["phase"],
                "ts": r["ts"],
                "file": p.get("file", str(p.get("partition_id", ""))),
                "rows": int(p["rows"]),
            }
            for r in recs
            for p in r.get("partitions", [])
        ]
        spark = self.spark
        self.write(
            "lineage",
            spark.createDataFrame(
                lineage_rows,
                "phase string, ts string, total_rows long, "
                "n_partitions int, seconds double",
            ),
        )
        self.write(
            "metrics",
            spark.createDataFrame(
                metrics_rows, "phase string, ts string, file string, rows long"
            ),
        )

    def lineage_records(self) -> list[dict]:
        p = self.warehouse / "lineage.jsonl"
        if not p.exists():
            return []
        return [json.loads(line) for line in p.read_text().splitlines() if line]
