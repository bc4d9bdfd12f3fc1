"""WebSocket ETL control-channel analogue (streaming/etl_channel.py):
per-connection in-order response matching, direct-put acks, abort
drain, and stream==batch parity — the contract of the reference's
stateful communicator (ext/etl/websocket_comm.go)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from aistore_spark.sources.tables import load_table
from aistore_spark.streaming.etl_channel import (
    pack_pipeline,
    ws_etl_session,
    ws_etl_stream,
)

SF_SMALL = "/root/testdata/sf0.001"


def _tasks(spark, n=200):
    return (
        load_table(spark, SF_SMALL, "documents")
        .limit(n)
        .select(
            F.col("doc_id").alias("seq"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("dst/"), F.col("doc_id").cast("string")),
            )
            .otherwise(
                F.concat(F.lit("obj/"), F.col("doc_id").cast("string"))
            )
            .alias("path"),
            F.col("text").cast("binary").alias("data"),
        )
    )


def test_order_witness_per_connection(spark):
    """Responses must match requests in send order per connection:
    within each conn_id, rows sorted by the EXECUTED resp_order must
    have strictly increasing seq, and resp_order must be the dense
    0..n-1 counter (one response per request, none lost/duplicated)."""
    rows = ws_etl_session(_tasks(spark), ["md5"], multiplier=4).collect()
    by_conn: dict[int, list] = {}
    for r in rows:
        by_conn.setdefault(r["conn_id"], []).append(r)
    assert set(by_conn) == set(range(4))
    for conn_rows in by_conn.values():
        conn_rows.sort(key=lambda r: r["resp_order"])
        assert [r["resp_order"] for r in conn_rows] == list(
            range(len(conn_rows))
        )
        seqs = [r["seq"] for r in conn_rows]
        assert seqs == sorted(seqs)


def test_direct_put_acks_and_transform_results(spark):
    """dst/-routed tasks come back as bare acks (no payload, written =
    delivered size — the TextMessage-ack / ErrSkip contract); the rest
    carry the transformed bytes. ctrl carries the packed pipeline."""
    rows = ws_etl_session(
        _tasks(spark), ["md5"], multiplier=4, direct_put_prefix="dst/"
    ).collect()
    assert rows and all(r["ctrl"] == "md5" for r in rows)
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").limit(200).collect()
    }
    n_acked = 0
    for r in rows:
        want = hashlib.md5(docs[r["seq"]].encode()).hexdigest().encode()
        if r["path"].startswith("dst/"):
            n_acked += 1
            assert r["acked"] and r["out"] is None and r["written"] == 32
        else:
            assert not r["acked"] and bytes(r["out"]) == want
            assert r["written"] == 32
        assert r["err"] is None
    assert n_acked == sum(1 for d in docs if d % 3 == 0)


def test_abort_drains_queued_tasks_with_cause(spark):
    """Tasks past the abort bound are DRAINED: no transform runs, the
    response row carries the abort cause — Finish() draining the work
    channel with errCause."""
    rows = ws_etl_session(
        _tasks(spark, n=100),
        ["md5"],
        multiplier=2,
        abort_after=40,
        abort_cause="user abort",
    ).collect()
    drained = [r for r in rows if r["seq"] > 40]
    live = [r for r in rows if r["seq"] <= 40]
    assert drained and live
    for r in drained:
        assert r["err"] == "aborted: user abort"
        assert r["out"] is None and not r["acked"] and r["written"] == 0
    for r in live:
        assert r["err"] is None and r["out"] is not None


def test_stream_session_matches_batch(spark, tmp_path):
    """The long-lived communicator form (file-source stream +
    foreachBatch) must produce the same response set as one batch
    session, and keep the per-connection order witness within each
    micro-batch."""
    tasks = _tasks(spark, n=120)
    tasks_dir = str(tmp_path / "tasks")
    tasks.write.parquet(tasks_dir)
    out_table = "ws_etl_out_test"
    spark.sql(f"DROP TABLE IF EXISTS {out_table}")
    q = ws_etl_stream(
        spark,
        tasks_dir,
        "seq bigint, path string, data binary",
        ["md5"],
        checkpoint=str(tmp_path / "ckpt"),
        out_table=out_table,
        multiplier=4,
        direct_put_prefix="dst/",
    )
    q.awaitTermination(120)
    got = {
        (r["conn_id"], r["seq"], r["acked"], r["written"], r["err"],
         bytes(r["out"]) if r["out"] is not None else None)
        for r in spark.table(out_table).collect()
    }
    want = {
        (r["conn_id"], r["seq"], r["acked"], r["written"], r["err"],
         bytes(r["out"]) if r["out"] is not None else None)
        for r in ws_etl_session(
            tasks, ["md5"], multiplier=4, direct_put_prefix="dst/"
        ).collect()
    }
    assert got == want
    spark.sql(f"DROP TABLE IF EXISTS {out_table}")


def test_pack_pipeline_matches_reference_pack():
    def custom(data, path, args):
        return data

    assert pack_pipeline(["md5", "compress", custom]) == "md5>compress>custom"
