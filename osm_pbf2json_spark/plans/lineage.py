"""Per-partition lineage manifests + checkpointed restart.

North-rule requirement: jobs are "resumable from checkpoint with
per-partition lineage + metrics". The reference is a one-shot in-memory
pipeline with nothing comparable; this layer implements job-level restart
semantics for batch Spark (SURVEY.md §2.7): the unit of recovery is an
output partition, not streaming state.

Design:
- work is partitioned by an explicit `part_id` column (e.g. H3 prefix);
- each completed partition writes `part=<id>` parquet via dynamic
  partition overwrite (idempotent) plus a manifest JSON line
  (partition id, row count, value checksum, input fingerprint, wall ms);
- on restart, `remaining_partitions` diffs the manifest against the
  plan and the driver re-submits only the missing ones.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


class LineageWriter:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_path = os.path.join(out_dir, "_lineage_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        done[str(rec["part_id"])] = rec
        return done

    def remaining_partitions(self, planned: list) -> list:
        done = self.completed()
        return [p for p in planned if str(p) not in done]

    def write_partition(
        self, df: DataFrame, part_id, input_fingerprint: str = ""
    ) -> dict:
        """Idempotent write of one partition + manifest record.

        The checksum is an order-insensitive xor-of-row-hashes
        (bit_xor(xxhash64(row))) so restarts can verify content, not just
        counts.
        """
        t0 = time.time()
        part_dir = os.path.join(self.out_dir, f"part={part_id}")
        stats = df.select(
            F.count("*").alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64(F.to_json(F.struct("*")))), F.lit(0)
            ).alias("checksum"),
        ).collect()[0]
        df.write.mode("overwrite").parquet(part_dir)
        rec = {
            "part_id": str(part_id),
            "rows": stats["n"],
            "checksum": int(stats["checksum"]),
            "input_fingerprint": input_fingerprint,
            "wall_ms": int((time.time() - t0) * 1000),
        }
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    def append_records(self, recs: list[dict]):
        with open(self.manifest_path, "a") as f:
            for rec in recs:
                f.write(json.dumps(rec) + "\n")


def run_partitioned(
    df: DataFrame,
    part_col: str,
    out_dir: str,
    input_fingerprint: str = "",
) -> list[dict]:
    """Execute a partitioned job with restart: skip partitions already in
    the manifest, write the rest. Returns the manifest records written.

    ONE write pass for all remaining partitions (`partitionBy` + dynamic
    partition overwrite) — the upstream plan executes once, not once per
    partition. On a fresh run there is no planning scan at all; on restart
    the input is filtered to the manifest-diff remainder. Per-partition
    row counts and checksums come from one aggregation over the
    read-back parquet (cheap column scan of what was just written), so the
    manifest verifies the bytes on disk, not the plan.
    """
    writer = LineageWriter(out_dir)
    spark = df.sparkSession
    done = writer.completed()
    todo_df = df
    if done:
        planned = [r[0] for r in df.select(part_col).distinct().collect()]
        todo = writer.remaining_partitions(sorted(planned))
        if not todo:
            return []
        todo_df = df.filter(
            F.col(part_col).cast("string").isin([str(p) for p in todo])
        )
    t0 = time.time()
    (
        todo_df.withColumnRenamed(part_col, "part")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part")
        .parquet(writer.out_dir)
    )
    wall_ms = int((time.time() - t0) * 1000)
    back = spark.read.parquet(writer.out_dir)
    data_cols = [c for c in back.columns if c != "part"]
    stats = (
        back.filter(~F.col("part").cast("string").isin(list(done.keys())) if done else F.lit(True))
        .groupBy("part")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64(F.to_json(F.struct(*data_cols)))), F.lit(0)
            ).alias("checksum"),
        )
        .collect()
    )
    recs = [
        {
            "part_id": str(r["part"]),
            "rows": r["n"],
            "checksum": int(r["checksum"]),
            "input_fingerprint": input_fingerprint,
            "wall_ms": wall_ms,
        }
        for r in sorted(stats, key=lambda r: str(r["part"]))
    ]
    writer.append_records(recs)
    return recs
