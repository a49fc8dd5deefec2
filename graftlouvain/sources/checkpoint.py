"""Checkpoint sink + resume (S4 — SURVEY.md §2a, [north-star]).

Per superstep/level the engine persists community labels, vertex degrees, and
coarsened edges with a manifest recording per-partition lineage (row counts per
Spark partition) and metrics (moves, modularity, wall time) so a run can
resume mid-level (BASELINE.json north_star).

No Iceberg runtime jar ships in this sandbox, so the layout is
**Parquet + a JSON-lines manifest we write ourselves** (snapshot id = the
(algorithm, level, superstep) triple; a manifest line is appended only after
the parquet write completes, which is the commit point — readers ignore
directories with no manifest line, giving atomic-enough snapshot semantics on
a real object store too). When an Iceberg catalog IS configured,
``table_format='iceberg'`` switches the writes to real Iceberg tables.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Manifest record format. v2 renamed write_wall_ms -> persist_wall_ms (the
# timer spans materialization + lineage + file write, not just the write);
# records carry manifest_version so cross-round consumers aggregating timing
# fields can dispatch on it instead of seeing silent gaps. v1 records (no
# version field) predate the rename.
MANIFEST_VERSION = 2


class CheckpointManager:
    def __init__(self, base_dir: str, table_format: str = "parquet"):
        self.base_dir = base_dir
        self.table_format = table_format
        os.makedirs(base_dir, exist_ok=True)
        self.manifest_path = os.path.join(base_dir, "manifest.jsonl")

    # -- write ------------------------------------------------------------

    def _write(self, df: DataFrame, rel: str) -> tuple[str, list[dict], int]:
        path = os.path.join(self.base_dir, rel)
        t0 = time.monotonic()
        # Cache first, derive lineage from the cache, then write FROM the
        # cache: one compute + one write, and the lineage describes the exact
        # partition layout that lands in the files (a recompute after the
        # write could lay partitions out differently under shuffle/AQE).
        # The timer therefore spans materialization + lineage + file write —
        # the manifest records it as persist_wall_ms to say exactly that.
        cached = df.cache()
        lineage = [
            {"partition_id": int(r["pid"]), "rows": int(r["rows"])}
            for r in cached.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        writer = cached.write.mode("overwrite")
        if self.table_format == "iceberg":
            writer.format("iceberg").save(path)
        else:
            writer.parquet(path)
        cached.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        return path, lineage, wall_ms

    def _append_manifest(self, record: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    def save_superstep(
        self,
        algorithm: str,
        level: int,
        superstep: int,
        assignments: DataFrame,
        moves: int,
        wall_ms: int,
        modularity: float | None = None,
    ) -> None:
        rel = f"{algorithm}/level={level}/superstep={superstep}/assignments"
        path, lineage, write_ms = self._write(assignments, rel)
        self._append_manifest(
            {
                "manifest_version": MANIFEST_VERSION,
                "kind": "superstep",
                "algorithm": algorithm,
                "level": level,
                "superstep": superstep,
                "path": path,
                "lineage": lineage,
                "moves": moves,
                "modularity": modularity,
                "superstep_wall_ms": wall_ms,
                "persist_wall_ms": write_ms,
            }
        )

    def save_level(
        self,
        algorithm: str,
        level: int,
        assignments: DataFrame | None,
        degrees: DataFrame | None,
        coarse_edges: DataFrame | None,
        modularity: float | None,
    ) -> None:
        record = {
            "manifest_version": MANIFEST_VERSION,
            "kind": "level",
            "algorithm": algorithm,
            "level": level,
            "modularity": modularity,
        }
        if assignments is not None:
            path, lineage, _ = self._write(
                assignments, f"{algorithm}/level={level}/final_assignments"
            )
            record["assignments_path"] = path
            record["assignments_lineage"] = lineage
        if degrees is not None:
            path, lineage, _ = self._write(degrees, f"{algorithm}/level={level}/degrees")
            record["degrees_path"] = path
        if coarse_edges is not None:
            path, lineage, _ = self._write(
                coarse_edges, f"{algorithm}/level={level}/coarse_edges"
            )
            record["coarse_edges_path"] = path
        self._append_manifest(record)

    # -- read / resume ----------------------------------------------------

    def manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def latest_superstep(self, algorithm: str) -> dict | None:
        """The most recent completed superstep record (commit point = manifest
        line), i.e. where resume restarts."""
        records = [
            r for r in self.manifest()
            if r["kind"] == "superstep" and r["algorithm"] == algorithm
        ]
        if not records:
            return None
        return max(records, key=lambda r: (r["level"], r["superstep"]))

    def load_assignments(self, spark: SparkSession, record: dict) -> DataFrame:
        if self.table_format == "iceberg":
            return spark.read.format("iceberg").load(record["path"])
        return spark.read.parquet(record["path"])
