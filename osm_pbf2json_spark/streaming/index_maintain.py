"""Incremental near-dup index maintenance (streaming + mergeable
sketches).

Minhash signatures merge by elementwise min (operators/dedup.py:
merge_signatures), so a streaming corpus keeps its dedup index fresh by
SIGNING only each microbatch — the expensive normalize→shingle→hash
pass is O(|batch|), never O(corpus). The fold into the index is a
full-outer join that reads the previous version and writes the next, so
merge I/O is O(|index|) per epoch — batch the stream accordingly (the
signing pass, not the merge, is the dominant cost for text corpora).

The index is a versioned parquet directory: each epoch writes
`v=<epoch_id>` with mode=overwrite and reads the newest version
STRICTLY OLDER than its own epoch, so a retried epoch re-reads the same
input version and overwrites its own partial output — idempotent, and
never "overwrite the path being read". Old versions beyond
`keep_versions` are pruned after a successful write.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith("v=") and d.split("=", 1)[1].isdigit():
            if os.path.exists(os.path.join(path, d, "_SUCCESS")):
                out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def read_signature_index(
    spark: SparkSession, path: str, before: int | None = None
) -> DataFrame | None:
    """Latest committed (id, sig) index version (optionally strictly
    older than `before`), or None if there is none."""
    vs = [v for v in _versions(path) if before is None or v < before]
    if not vs:
        return None
    return spark.read.parquet(os.path.join(path, f"v={vs[-1]}"))


def maintain_signature_index(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint: str,
    num_perm: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_versions: int = 2,
    trigger: dict | None = None,
):
    """Start a foreachBatch query folding each microbatch's signatures
    into the persisted index. `trigger` kwargs go to
    DataStreamWriter.trigger (default: availableNow=True — drain
    available input and stop; pass e.g. {"processingTime": "1 minute"}
    for continuous maintenance). Returns the StreamingQuery."""
    from ..operators.dedup import merge_signatures, minhash_signatures

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new_sigs = minhash_signatures(
            batch_df, num_perm=num_perm, n=n, text_col=text_col, id_col=id_col
        )
        # strictly-older read: a RETRIED epoch sees the same input
        # version and overwrites its own (possibly partial) output —
        # idempotent, never reading the path it writes
        prev = read_signature_index(spark, index_path, before=epoch_id)
        merged = merge_signatures(prev, new_sigs) if prev is not None else new_sigs
        merged.write.mode("overwrite").parquet(
            os.path.join(index_path, f"v={epoch_id}")
        )
        for v in _versions(index_path)[:-keep_versions]:
            shutil.rmtree(os.path.join(index_path, f"v={v}"), ignore_errors=True)

    writer = stream_docs.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()
