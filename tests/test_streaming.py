"""Structured Streaming surface: file-source → windowed tile counts →
memory sink, deterministic via availableNow trigger."""

import os

import pyspark.sql.functions as F

from osm_pbf2json_spark.streaming.tiles_stream import (
    streaming_pip_flags,
    streaming_tile_counts,
)


def test_streaming_tile_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    batch = spark.createDataFrame(
        [
            ("2024-01-01 00:00:10", 13.40, 52.50),
            ("2024-01-01 00:00:20", 13.40, 52.50),
            ("2024-01-01 00:01:30", 13.40, 52.50),
            ("2024-01-01 00:00:40", -73.9, 40.7),
        ],
        "ts_s string, lon double, lat double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "lon", "lat")
    batch.write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema("ts timestamp, lon double, lat double").parquet(src)
    counts = streaming_tile_counts(stream, res=9, window="1 minute")
    q = (
        counts.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("append" if False else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from tile_counts").collect()
    # berlin tile: 2 events in minute 0, 1 in minute 1; nyc tile: 1 event
    by_key = {(r["window_start"].minute, r["tile"]): r["n_events"] for r in rows}
    tiles = {r["tile"] for r in rows}
    assert len(tiles) == 2
    counts_sorted = sorted(by_key.values())
    assert counts_sorted == [1, 1, 2]


def test_streaming_pip_flags(spark, tmp_path):
    src = str(tmp_path / "pipsrc")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 50.0, 50.0)], "id long, lon double, lat double"
    ).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema("id long, lon double, lat double").parquet(src)
    square = {"key": "A", "polygons": [[[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]]}
    flagged = streaming_pip_flags(stream, [square])
    q = (
        flagged.writeStream.format("memory")
        .queryName("pip_flags")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["polygon_key"] for r in spark.sql("select * from pip_flags").collect()}
    assert got == {1: "A", 2: None}


def test_streaming_dedup(spark, tmp_path):
    from osm_pbf2json_spark.streaming.tiles_stream import streaming_dedup

    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    batch = spark.createDataFrame(
        [
            ("2024-01-01 00:00:01", 1, "alpha beta"),
            ("2024-01-01 00:00:02", 2, "ALPHA   beta!"),  # same fingerprint as 1
            ("2024-01-01 00:00:03", 3, "gamma delta"),
            ("2024-01-01 00:00:04", 4, "alpha beta"),      # dup again
        ],
        "ts_s string, doc_id long, text string",
    ).select(F.to_timestamp("ts_s").alias("ts"), "doc_id", "text")
    batch.write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema("ts timestamp, doc_id long, text string").parquet(src)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_stream").collect()
    # one survivor per distinct normalized text
    texts = sorted({r["text"].lower().replace("!", "").split()[0] for r in rows})
    assert len(rows) == 2 and texts == ["alpha", "gamma"]


def test_incremental_signature_index(spark, tmp_path):
    """foreachBatch index maintenance: two microbatches (one file each)
    min-merged into a versioned index that equals the batch signatures
    of the full corpus."""
    from osm_pbf2json_spark.operators.dedup import minhash_signatures
    from osm_pbf2json_spark.streaming.index_maintain import (
        maintain_signature_index,
        read_signature_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    src = str(tmp_path / "docs_src")
    # one file per half -> maxFilesPerTrigger=1 makes two microbatches
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        src + "/p=0", mode="overwrite"
    )
    docs.filter(F.col("doc_id") % 2 != 0).coalesce(1).write.parquet(
        src + "/p=1", mode="overwrite"
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/p=*")
    )
    q = maintain_signature_index(
        stream, str(tmp_path / "idx"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    idx = read_signature_index(spark, str(tmp_path / "idx"))
    full = minhash_signatures(docs)
    assert idx.count() == full.count() == 60
    diff = (
        idx.alias("i")
        .join(full.alias("f"), "id")
        .filter(F.col("i.sig") != F.col("f.sig"))
        .count()
    )
    assert diff == 0


def test_signature_index_retry_idempotent(spark, tmp_path):
    """A re-run epoch reads the version strictly OLDER than itself, so
    retrying after a committed write neither crashes ('overwrite a path
    being read') nor double-merges."""
    import pyspark.sql.functions as F
    from osm_pbf2json_spark.operators.dedup import minhash_signatures
    from osm_pbf2json_spark.streaming.index_maintain import read_signature_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    idx = str(tmp_path / "idx")
    sigs = minhash_signatures(docs)
    sigs.write.mode("overwrite").parquet(idx + "/v=0")
    # simulate epoch 1 running twice: both runs read v=0, not v=1
    assert read_signature_index(spark, idx, before=1).count() == 40
    sigs.write.mode("overwrite").parquet(idx + "/v=1")
    again = read_signature_index(spark, idx, before=1)
    assert again.count() == 40  # still v=0
    assert read_signature_index(spark, idx).count() == 40  # latest = v=1
