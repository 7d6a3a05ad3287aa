"""Stateful sessionization: gap-closed sessions across micro-batches with
state carried between batches (applyInPandasWithState)."""

import os
import time

from osm_pbf2json_spark.streaming.sessionize import sessionize


def test_sessionize_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)

    def write_batch(rows, name):
        spark.createDataFrame(rows, "key string, ts_ms long").coalesce(1).write.parquet(
            os.path.join(src, name)
        )

    # two file-batches processed as separate micro-batches (state carries):
    # u1: events 1s apart, then one far past the gap → first session closes
    # u2: second event within gap → session stays open (held in state)
    write_batch([("u1", 1_000), ("u1", 2_000), ("u2", 500)], "b1")
    time.sleep(1.1)  # file-source orders batches by modification time
    write_batch([("u1", 200_000), ("u2", 10_000)], "b2")

    stream = (
        spark.readStream.schema("key string, ts_ms long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        sessionize(stream, gap_ms=60_000)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["key"], r["session_start"], r["session_end"], r["n_events"]) == (
        "u1",
        1_000,
        2_000,
        2,
    )
