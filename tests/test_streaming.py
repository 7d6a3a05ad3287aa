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


def test_signature_index_fresh_checkpoint_existing_index(spark, tmp_path):
    """Index versions come from the index (max+1), NOT the epoch id: a
    fresh checkpoint pointed at an existing index dir must fold the new
    batch into the prior signatures instead of silently losing them
    (epoch restarts at 0; the old scheme wrote v=0, pruned it, and kept
    serving the stale max)."""
    from osm_pbf2json_spark.operators.dedup import minhash_signatures
    from osm_pbf2json_spark.streaming.index_maintain import (
        maintain_signature_index,
        read_signature_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 != 0)
    src_a, src_b = str(tmp_path / "src_a"), str(tmp_path / "src_b")
    half_a.coalesce(1).write.parquet(src_a, mode="overwrite")
    half_b.coalesce(1).write.parquet(src_b, mode="overwrite")
    idx = str(tmp_path / "idx")

    # run 1: checkpoint ck1, consumes half_a
    q = maintain_signature_index(
        spark.readStream.schema(docs.schema).parquet(src_a),
        idx,
        str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    assert read_signature_index(spark, idx).count() == half_a.count()

    # run 2: FRESH checkpoint ck2 (epoch ids restart at 0), same index
    q = maintain_signature_index(
        spark.readStream.schema(docs.schema).parquet(src_b),
        idx,
        str(tmp_path / "ck2"),
    )
    q.awaitTermination(120)
    merged = read_signature_index(spark, idx)
    full = minhash_signatures(docs)
    assert merged.count() == 60
    diff = (
        merged.alias("i")
        .join(full.alias("f"), "id")
        .filter(F.col("i.sig") != F.col("f.sig"))
        .count()
    )
    assert diff == 0


def test_signature_index_crashed_epoch_marker_pruned(spark, tmp_path):
    """A marker from an epoch that crashed BEFORE its data write commits
    claims a version that never commits. Once retention passes that
    version, the marker must be pruned too — otherwise _epochs/ leaks
    entries and max(claims) permanently advances the version counter."""
    import os

    from osm_pbf2json_spark.streaming.index_maintain import (
        _claimed_versions,
        maintain_signature_index,
        read_signature_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    idx = str(tmp_path / "idx")
    # fake crashed epoch: claims v=0, never writes v=0 data
    os.makedirs(idx + "/_epochs")
    with open(idx + "/_epochs/epoch-deadbeef0000-0", "w") as f:
        f.write("0")

    for i, src in enumerate(("src_a", "src_b", "src_c")):
        p = str(tmp_path / src)
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            p, mode="overwrite"
        )
        q = maintain_signature_index(
            docs.sparkSession.readStream.schema(docs.schema).parquet(p),
            idx,
            str(tmp_path / f"ck{i}"),
            keep_versions=2,
        )
        q.awaitTermination(120)

    # the 3 real epochs allocated v=1..3 (crashed claim advanced the
    # counter once — acceptable); retention keeps v=2,3 and the orphan
    # marker for never-committed v=0 is gone
    claims = _claimed_versions(idx)
    assert "epoch-deadbeef0000-0" not in claims
    assert all(v >= 2 for v in claims.values()), claims
    assert read_signature_index(spark, idx).count() == 30


def test_pbf_unsupported_compression_raises(tmp_path):
    """A Blob carrying an lzma/lz4/zstd payload raises instead of being
    silently skipped (silent entity loss on files from other writers)."""
    import struct

    import pytest

    from osm_pbf2json_spark.sources.pbf import decode_pbf, scan_blob_index

    def field(fnum, wire, payload):
        key = (fnum << 3) | wire
        if wire == 2:
            out = bytes([key])
            n = len(payload)
            while True:
                b = n & 0x7F
                n >>= 7
                out += bytes([b | (0x80 if n else 0)])
                if not n:
                    break
            return out + payload
        raise AssertionError

    # Blob with field 7 (zstd_data) — decoder must refuse loudly
    blob = field(7, 2, b"\x28\xb5\x2f\xfd not-really-zstd")
    header = field(1, 2, b"OSMData") + field(3, 2, b"")[:0]
    # BlobHeader: type=OSMData (field 1), datasize (field 3, varint)
    hdr = field(1, 2, b"OSMData") + bytes([0x18]) + bytes([len(blob)])
    p = tmp_path / "zstd.pbf"
    p.write_bytes(struct.pack(">i", len(hdr)) + hdr + blob)
    assert scan_blob_index(str(p)) == [(4 + len(hdr), len(blob))]
    with pytest.raises(NotImplementedError, match="zstd"):
        decode_pbf(str(p))


def test_pbf_index_truncation_raises_at_index_time(tmp_path):
    """A file truncated mid-payload fails in scan_blob_index with the
    offending offset — not later as an opaque decode error in a task."""
    import pytest

    from osm_pbf2json_spark.sources.pbf import scan_blob_index

    path = "/root/reference/tests/data/alexanderplatz.pbf"
    data = open(path, "rb").read()
    full = scan_blob_index(path)
    assert full, "fixture should contain OSMData blobs"
    # cut inside the LAST blob's payload: header still parses, payload short
    off, size = full[-1]
    cut = off + size // 2
    p = tmp_path / "trunc.pbf"
    p.write_bytes(data[:cut])
    with pytest.raises(EOFError, match="truncated"):
        scan_blob_index(str(p))


def test_cli_pbf_driver_ship_fallback(spark):
    """load_pbf_tables(distributed=False) — the remote-master fallback —
    produces the same objects output as the blob-parallel path."""
    from osm_pbf2json_spark.cli import load_pbf_tables
    from osm_pbf2json_spark.operators.objects import objects
    from osm_pbf2json_spark.sinks import objects_json_lines

    path = "/root/reference/tests/data/alexanderplatz.pbf"
    t_dist = load_pbf_tables(spark, path)  # local master → distributed
    t_ship = load_pbf_tables(spark, path, distributed=False)
    a = sorted(r["value"] for r in objects_json_lines(objects(t_dist, "amenity")).collect())
    b = sorted(r["value"] for r in objects_json_lines(objects(t_ship, "amenity")).collect())
    assert a == b and len(a) > 0
