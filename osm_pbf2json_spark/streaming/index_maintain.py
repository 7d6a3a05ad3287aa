"""Incremental near-dup index maintenance (streaming + mergeable
sketches).

Minhash signatures merge by elementwise min (operators/dedup.py:
merge_signatures), so a streaming corpus can keep its dedup index fresh
by signing ONLY each microbatch and folding it into the persisted
index: per-batch cost is O(|batch|), never O(corpus). The index is a
versioned parquet directory — each epoch writes `v=<epoch>` with
mode=overwrite, which makes a retried epoch idempotent (same input +
same previous version ⇒ byte-same output), the foreachBatch analog of
plans/lineage.py's idempotent partition overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def _latest_version(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    vs = [
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    return max(vs) if vs else None


def read_signature_index(spark: SparkSession, path: str) -> DataFrame | None:
    """Latest committed (id, sig) index version, or None before the
    first epoch."""
    v = _latest_version(path)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def maintain_signature_index(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint: str,
    num_perm: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start a foreachBatch query folding each microbatch's signatures
    into the persisted index. Returns the StreamingQuery (caller picks
    the trigger semantics via .awaitTermination / availableNow source
    options)."""
    from ..operators.dedup import merge_signatures, minhash_signatures

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new_sigs = minhash_signatures(
            batch_df, num_perm=num_perm, n=n, text_col=text_col, id_col=id_col
        )
        prev = read_signature_index(spark, index_path)
        merged = merge_signatures(prev, new_sigs) if prev is not None else new_sigs
        merged.write.mode("overwrite").parquet(
            os.path.join(index_path, f"v={epoch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
