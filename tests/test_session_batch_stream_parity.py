"""The stateful streaming sessionizer and the oracle-checked batch
gaps-and-islands query (ev2_sessions) are two implementations of one
semantics — after the stream drains they must agree session-for-
session."""

from __future__ import annotations

from aistore_spark.benchqueries import QUERIES


def test_streaming_sessions_match_batch_mirror(spark, sf_dir, tmp_path):
    from aistore_spark.streaming.ingest import sessionize_users, stream_events

    sessions = sessionize_users(stream_events(spark, sf_dir), gap_minutes=30)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_parity")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (
            r.user_id,
            r.session_start_ns // 1000,
            r.session_end_ns // 1000,
            r.n_events,
        )
        for r in spark.sql("SELECT * FROM sess_parity").collect()
    }
    batch = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in QUERIES["ev2_sessions"](spark, sf_dir).collect()
    }
    assert streamed == batch
