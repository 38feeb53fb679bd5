"""Windowed aggregation tests: batch analog vs streaming watermark variant
(finalized windows must agree; late data beyond the watermark dropped)."""

import datetime

from emailcdc.ops.windows import windowed_counts, windowed_counts_stream

BASE = datetime.datetime(2024, 1, 1)


def _events(spark):
    rows = []
    for i, minutes in enumerate([1, 5, 12, 15, 31, 95]):
        rows.append((i, BASE + datetime.timedelta(minutes=minutes),
                     "click" if i % 2 == 0 else "view", 1.0))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double")


class TestBatchWindows:
    def test_tumbling_counts(self, spark):
        out = {(r["window_start"].hour * 60 + r["window_start"].minute,
                r["event_type"]): r["n"]
               for r in windowed_counts(_events(spark)).collect()}
        assert out[(0, "click")] == 1   # minute 1
        assert out[(0, "view")] == 1    # minute 5
        assert out[(10, "click")] == 1  # minute 12
        assert out[(10, "view")] == 1   # minute 15
        assert out[(30, "click")] == 1  # minute 31
        assert out[(90, "view")] == 1   # minute 95


class TestStreamingWindows:
    def test_finalized_windows_match_batch(self, spark, tmp_path):
        src = str(tmp_path / "ev")
        ckpt = str(tmp_path / "ckpt")
        events = _events(spark)
        events.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            windowed_counts_stream(stream, watermark="30 minutes")
            .writeStream.format("memory").queryName("winagg")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
                    for r in spark.sql("select * from winagg").collect()}
        batch = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
                 for r in windowed_counts(events).collect()}
        # append mode emits only windows the watermark (max_ts - 30min =
        # minute 65) has passed: the minute-0/10/30 windows, not minute-90
        assert streamed, "no finalized windows emitted"
        for key, val in streamed.items():
            assert batch[key] == val
        assert all(k[0].hour * 60 + k[0].minute != 90 for k in streamed)
