"""Incremental near-dup index maintenance (streaming + mergeable
sketches).

Minhash signatures merge by elementwise min (operators/dedup.py:
merge_signatures), so a streaming corpus keeps its dedup index fresh by
SIGNING only each microbatch — the expensive normalize→shingle→hash
pass is O(|batch|), never O(corpus). The fold into the index is a
full-outer join that reads the previous version and writes the next, so
merge I/O is O(|index|) per epoch — batch the stream accordingly (the
signing pass, not the merge, is the dominant cost for text corpora).

The index is a versioned parquet directory. Versions are allocated from
the INDEX ITSELF (max existing + 1), not from the streaming epoch id:
epoch ids are checkpoint-scoped, so a fresh checkpoint pointed at an
existing index would restart them at 0 and clobber/lose history. Each
epoch's allocation is persisted as an `_epochs/epoch-<id>` marker BEFORE
the data write, so a RETRIED epoch reuses its original version: it
re-reads the same strictly-older input version and overwrites its own
(possibly partial) output — idempotent, and never "overwrite the path
being read". Old versions beyond `keep_versions` (and their markers) are
pruned after a successful write. The checkpoint and index dirs may
therefore be wiped independently — a fresh checkpoint simply continues
the index's version sequence.
"""

from __future__ import annotations

import hashlib
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


def _epoch_dir(path: str) -> str:
    return os.path.join(path, "_epochs")


def _claimed_versions(path: str) -> dict[str, int]:
    """marker name -> allocated version, from the persisted markers
    (claims survive crashes, so a version number is never reused even if
    its data write failed before _SUCCESS)."""
    d = _epoch_dir(path)
    if not os.path.isdir(d):
        return {}
    out: dict[str, int] = {}
    for f in os.listdir(d):
        if f.startswith("epoch-"):
            try:
                out[f] = int(open(os.path.join(d, f)).read().strip())
            except (ValueError, OSError):
                continue
    return out


def _allocate_version(path: str, checkpoint: str, epoch_id: int) -> int:
    """Version for this epoch: the marker's value if one exists (retry),
    else max(committed, claimed) + 1, persisted as a marker before any
    data is written. Markers are keyed by (checkpoint, epoch): a RETRY
    of an epoch shares the checkpoint and reuses its allocation, while a
    FRESH checkpoint (epoch ids restart at 0) gets new versions and
    folds into the existing index instead of clobbering it."""
    ck = hashlib.sha1(os.path.abspath(checkpoint).encode()).hexdigest()[:12]
    marker = f"epoch-{ck}-{epoch_id}"
    claims = _claimed_versions(path)
    if marker in claims:
        return claims[marker]
    version = max(_versions(path) + list(claims.values()), default=-1) + 1
    os.makedirs(_epoch_dir(path), exist_ok=True)
    tmp = os.path.join(_epoch_dir(path), f".{marker}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(_epoch_dir(path), marker))
    return version


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
        # version comes from the index (max+1), persisted per-epoch so a
        # RETRIED epoch reuses its allocation: same strictly-older input
        # version, overwrites its own (possibly partial) output —
        # idempotent, never reading the path it writes
        version = _allocate_version(index_path, checkpoint, epoch_id)
        prev = read_signature_index(spark, index_path, before=version)
        merged = merge_signatures(prev, new_sigs) if prev is not None else new_sigs
        merged.write.mode("overwrite").parquet(
            os.path.join(index_path, f"v={version}")
        )
        pruned = set(_versions(index_path)[:-keep_versions])
        for v in pruned:
            shutil.rmtree(os.path.join(index_path, f"v={v}"), ignore_errors=True)
        # prune markers for pruned versions AND any marker older than the
        # oldest retained committed version — an epoch that crashed
        # before its data write claims a version that never commits, so
        # matching only the just-pruned set would leak it forever (and
        # permanently advance the max(claims) version counter)
        retained = _versions(index_path)
        oldest_kept = retained[0] if retained else version
        for mname, v in _claimed_versions(index_path).items():
            if v in pruned or v < oldest_kept:
                try:
                    os.remove(os.path.join(_epoch_dir(index_path), mname))
                except OSError:
                    pass

    writer = stream_docs.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()
