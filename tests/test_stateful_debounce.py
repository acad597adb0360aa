"""applyInPandasWithState quiescence debounce — the custom stateful
operator mapping of the reference watcher (SURVEY §2.9)."""

import datetime as dt
import time

from pypdfocr_spark import stream


def test_stateful_debounce_emits_after_quiescence(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("u1", t0), ("u2", t0)], "url string, warc_ts timestamp"
    ).coalesce(1).write.parquet(src)

    sdf = spark.readStream.schema("url string, warc_ts timestamp").parquet(src)
    ready = stream.debounced_ready_stateful(sdf, gap_seconds=2)
    q = (
        ready.writeStream.format("memory")
        .queryName("stateful_debounce")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # a second touch for u1 inside the gap re-arms its timeout
        # (the watcher's update-timestamp transition, ref
        # pypdfocr_watcher.py:97-108)
        time.sleep(1.0)
        spark.createDataFrame(
            [("u1", t0)], "url string, warc_ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM stateful_debounce").collect()
            if sum(r["n_events"] for r in rows) >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()

    # every key emits only after quiescence, and no event is lost: u1's
    # 2 touches emit as one consolidated row (touch within the gap) or —
    # on a slow machine where the first timeout fires before the second
    # touch lands — as two rows; either way the totals are exact
    totals = {}
    for r in rows:
        totals[r["url"]] = totals.get(r["url"], 0) + r["n_events"]
    assert totals == {"u1": 2, "u2": 1}, rows
