"""Real-bytes sources + streaming + SDK surface: write genuine TAR
shards to disk, read them back through binaryFile + expansion; stream
the events table through a windowed aggregation; drive the BatchLoader
iterator; execute a (fake-fetch) download job."""

from __future__ import annotations

from pyspark.sql import functions as F

from aistore_spark.api import BatchLoader
from aistore_spark.catalog import members_catalog
from aistore_spark.operators.archive import build_tar, synth_payload
from aistore_spark.sources.binary import (
    expand_tar_members,
    read_binary_objects,
)
from aistore_spark.sources.downloader import (
    execute_download,
    fake_fetch,
    range_job_plan,
)
from aistore_spark.sources.tables import load_table
from aistore_spark.streaming.ingest import stream_events, windowed_event_counts


def test_binaryfile_tar_expansion_roundtrip(spark, tmp_path):
    # build 3 real shards with known members
    expected = {}
    for s in range(3):
        names = [f"rec-{s}{i:04d}.jpg" for i in range(20)]
        payloads = [f"{n}:payload".encode() for n in names]
        (tmp_path / f"shard-{s}.tar").write_bytes(build_tar(names, payloads))
        expected.update(
            {(f"shard-{s}.tar", n): p for n, p in zip(names, payloads)}
        )
    members = expand_tar_members(
        read_binary_objects(spark, str(tmp_path / "*.tar"))
    ).collect()
    assert len(members) == 60
    for r in members:
        shard = r.shard.rsplit("/", 1)[-1]
        assert bytes(r.bytes) == expected[(shard, r.member)]
        assert r.size == len(expected[(shard, r.member)])
        assert r.offset % 512 == 0 and r.offset > 0


def test_member_index_without_bytes(spark, tmp_path):
    names = [f"a/{i}.bin" for i in range(5)]
    (tmp_path / "s.tar").write_bytes(build_tar(names, [b"x" * i for i in range(5)]))
    meta = expand_tar_members(
        read_binary_objects(spark, str(tmp_path / "s.tar")), with_bytes=False
    )
    assert "bytes" not in meta.columns
    assert meta.count() == 5


def test_batch_loader_order_and_sentinels(spark, sf_dir):
    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    existing = [
        r.member
        for r in members.filter(F.col("ext") == "jpg").limit(3).collect()
    ]
    loader = BatchLoader(spark, members).add(
        existing[0], "rec-99999999.jpg", existing[1], existing[2]
    )
    got = list(loader.get())
    assert len(got) == 4
    assert got[0][0].endswith(existing[0]) and got[0][1] is not None
    assert got[1][0].startswith("__404__/") and got[1][1] is None
    assert got[2][0].endswith(existing[1])
    assert [g[0].split("/")[-1] for g in got if g[1] is not None] == existing


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    events = stream_events(spark, sf_dir)
    agg = windowed_event_counts(events, window="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("evt_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM evt_counts").collect()
    assert out, "stream produced no windows"
    total = sum(r.n_events for r in out)
    assert total == load_table(spark, sf_dir, "events").count()
    types = {r.event_type for r in out}
    assert "purchase" in types and "error" in types


def test_download_execution_deterministic(spark):
    plan = range_job_plan(spark, "http://h/x/f-{00..09}.bin", dest_prefix="in/")
    out = execute_download(plan, fetch=fake_fetch).collect()
    assert len(out) == 10
    for r in out:
        assert r.objname.startswith("in/f-")
        assert r.size == 32
        assert bytes(r.data) == fake_fetch(r.url)


def test_stateful_sessionization(spark, sf_dir, tmp_path):
    from aistore_spark.streaming.ingest import sessionize_users

    events = stream_events(spark, sf_dir)
    sessions = sessionize_users(events, gap_minutes=30)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    open_tails = [r for r in rows if not r.closed]
    assert len(open_tails) == n_users, "exactly one open session per user"
    # every session obeys the gap invariant and event counts add up
    total_events = sum(r.n_events for r in rows)
    assert total_events == ev.count()
    for r in rows:
        assert r.session_start_ns <= r.session_end_ns


def test_offset_based_extraction_is_range_read(spark, tmp_path):
    """P2's point: with the member index, extracting one archived file
    is a seek+read of exactly (offset, size) — no tar scan. Prove it by
    reading raw bytes at the indexed offset and comparing."""
    names = [f"d/{i:03d}.bin" for i in range(30)]
    payloads = [bytes([i]) * (37 * i + 1) for i in range(30)]
    shard_path = tmp_path / "x.tar"
    shard_path.write_bytes(build_tar(names, payloads))

    index = expand_tar_members(
        read_binary_objects(spark, str(shard_path)), with_bytes=False
    ).collect()
    by_member = {r.member: r for r in index}
    raw = shard_path.read_bytes()
    for name, payload in zip(names, payloads):
        r = by_member[name]
        assert raw[r.offset : r.offset + r.size] == payload


def test_mixed_mime_expansion_roundtrip(spark, tmp_path):
    """ZIP/TGZ/TAR.GZ shards expand identically to TAR — the
    reference's uniform archive read path (cmn/archive/mime.go:25-29,
    cmn/archive/read.go:137-165). Round-trips our own writers."""
    from aistore_spark.operators.archive import build_tgz, build_zip
    from aistore_spark.sources.binary import expand_archive_members

    names = [f"rec-{i:04d}.jpg" for i in range(15)]
    payloads = [f"{n}:payload".encode() for n in names]
    (tmp_path / "s0.tar").write_bytes(build_tar(names, payloads))
    (tmp_path / "s1.tgz").write_bytes(build_tgz(names, payloads))
    (tmp_path / "s2.tar.gz").write_bytes(build_tgz(names, payloads))
    (tmp_path / "s3.zip").write_bytes(build_zip(names, payloads))
    rows = expand_archive_members(
        read_binary_objects(spark, str(tmp_path / "s*"))
    ).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard.rsplit("/", 1)[-1], {})[r.member] = bytes(
            r.bytes
        )
    assert set(by_shard) == {"s0.tar", "s1.tgz", "s2.tar.gz", "s3.zip"}
    want = dict(zip(names, payloads))
    for shard, got in by_shard.items():
        assert got == want, shard
    # offsets: monotonically increasing seek points within each shard
    for shard in by_shard:
        offs = [r.offset for r in rows if r.shard.endswith(shard)]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_mime_detection_by_magic(spark, tmp_path):
    """Extensionless objects resolve by file signature, the reference's
    fallback detection (mime.go:54-60: ustar@257, gzip 1f8b, zip PK)."""
    import pytest

    from aistore_spark.sources.binary import detect_mime

    names, payloads = ["m.bin"], [b"zz"]
    tar = build_tar(names, payloads)
    from aistore_spark.operators.archive import build_tgz, build_zip

    assert detect_mime("noext", tar) == ".tar"
    assert detect_mime("noext", build_tgz(names, payloads)) == ".tar.gz"
    assert detect_mime("noext", build_zip(names, payloads)) == ".zip"
    assert detect_mime("x.tgz", b"") == ".tar.gz"
    assert detect_mime("x.tar.lz4", b"") == ".tar.lz4"
    with pytest.raises(ValueError):
        detect_mime("noext", b"\x00" * 600)


def test_token_bucket_rate_limits_on_virtual_time():
    """BytesPerHour token bucket (ext/dload/api.go:70-73): after the
    1-second burst, total virtual sleep must equal the byte deficit
    over the refill rate (bytes/3600 per sec)."""
    from aistore_spark.sources.downloader import TokenBucket

    clock_now = [0.0]
    slept = []

    def clock():
        return clock_now[0]

    def sleep(s):
        slept.append(s)
        clock_now[0] += s

    bph = 3600 * 1000  # 1000 B/s, burst 1000 B
    tb = TokenBucket(bph, clock=clock, sleep=sleep)
    for _ in range(10):
        tb.throttle(500)  # 5000 B total
    # 1000 B burst free; remaining 4000 B at 1000 B/s -> 4 s of sleep
    assert abs(sum(slept) - 4.0) < 1e-9
    # steady-state: each further 500 B costs 0.5 s
    slept.clear()
    tb.throttle(500)
    assert abs(sum(slept) - 0.5) < 1e-9


def test_download_exec_with_throttle(spark):
    """execute_download wires the bucket into the fetch stage: per-
    stream share = bytes_per_hour/connections; with a virtual-time
    bucket the results are unchanged (throttle affects timing only)."""
    from aistore_spark.sources.downloader import (
        TokenBucket,
        execute_download,
        fake_fetch,
        range_job_plan,
    )

    plan = range_job_plan(
        spark, "http://data.example.com/c/p-{00..19}.bin"
    )

    def factory(per_stream):
        return TokenBucket(
            int(per_stream),
            clock=lambda: 0.0,
            sleep=lambda s: None,
        )

    out = execute_download(
        plan,
        fetch=fake_fetch,
        connections=4,
        bytes_per_hour=3600 * 64,
        bucket_factory=factory,
    ).collect()
    assert len(out) == 20
    assert all(r.size == 32 for r in out)


def test_batch_loader_mixed_entries(spark, sf_dir):
    """G4 over the full MossIn surface: archpath extraction and byte
    ranges in the same batch, sentinel for an unsatisfiable range."""
    from aistore_spark.operators.archive import synth_payload

    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    plain = members.filter(F.col("ext") == "jpg").limit(1).collect()[0]
    arch = members.filter(F.col("ext") == "cls").limit(1).collect()[0]
    full = synth_payload(plain.member, plain.key_str)  # noqa: F841
    loader = (
        BatchLoader(spark, members)
        .add(plain.member)
        .add_entry(arch.shard, archpath=arch.member)
        .add_entry(plain.member, start=2, length=5)
        .add_entry(plain.member, start=10**9, length=5)  # out of bounds
    )
    got = list(loader.get())
    assert len(got) == 4
    assert got[0][1] is not None
    assert got[1][0].endswith(f"{arch.shard}/{arch.member}")
    assert got[1][1] is not None
    assert got[2][1] == got[0][1][2:7]
    assert got[3][0].startswith("__404__/") and got[3][1] is None


def test_assemble_batches_zip_format(spark, sf_dir):
    """S13 output formats: the same batch assembled as zip produces the
    same entry fingerprint/payloads, different archive bytes
    (MossReq.OutputFormat, api/apc/ml.go:101)."""
    from aistore_spark.catalog import batch_requests
    from aistore_spark.operators import joins
    from aistore_spark.operators.archive import assemble_batches

    req = batch_requests(load_table(spark, sf_dir, "events")).limit(200)
    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    j = joins.get_batch_join(req, members).withColumn(
        "batch_id", (F.col("req_idx") % 4).cast("bigint")
    )
    tar = {r.batch_id: r for r in assemble_batches(j).collect()}
    zf = {r.batch_id: r for r in assemble_batches(j, output_format="zip").collect()}
    assert set(tar) == set(zf)
    for b in tar:
        assert tar[b].entries_md5 == zf[b].entries_md5
        assert tar[b].payload_bytes == zf[b].payload_bytes
        assert tar[b].tar_bytes != zf[b].tar_bytes


def test_streaming_get_batch_matches_batch(spark, sf_dir, tmp_path):
    """G3 StreamingGet: per-micro-batch assembly over a request stream
    equals the one-shot batch assembly — same batches, same order
    fingerprints (the incremental path adds orchestration, not
    semantics)."""
    from aistore_spark.catalog import batch_requests, members_catalog
    from aistore_spark.operators.archive import assemble_batches
    from aistore_spark.operators.joins import get_batch_join
    from aistore_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        streaming_get_batch,
    )

    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    ev_stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    req_stream = batch_requests(ev_stream)
    spark.sql("DROP TABLE IF EXISTS moss_stream_t")
    q = streaming_get_batch(
        req_stream,
        members,
        checkpoint=str(tmp_path / "ckpt"),
        query_name="moss_stream_t",
    ).start()
    q.awaitTermination(180)
    got = {
        r.batch_id: (r.n_entries, r.n_missing, r.entries_md5)
        for r in spark.sql("SELECT * FROM moss_stream_t").collect()
    }
    j = get_batch_join(
        batch_requests(load_table(spark, sf_dir, "events")), members
    ).withColumn("batch_id", F.floor(F.col("req_idx") / 250).cast("bigint"))
    want = {
        r.batch_id: (r.n_entries, r.n_missing, r.entries_md5)
        for r in assemble_batches(j).collect()
    }
    spark.sql("DROP TABLE IF EXISTS moss_stream_t")
    assert got == want and len(got) > 0


def test_streaming_dedup_bounded_state(spark, sf_dir, tmp_path):
    from aistore_spark.streaming.ingest import dedup_stream, stream_documents

    stream = dedup_stream(stream_documents(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = spark.sql("SELECT checksum FROM dedup_out").collect()
    batch = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("checksum"))
        .distinct()
        .collect()
    )
    # exactly one survivor per distinct content hash
    assert sorted(r.checksum for r in kept) == sorted(
        r.checksum for r in batch
    )


def test_download_throttle_job_limit_below_stream_count(spark):
    """Regression: 0 < bytes_per_hour < connections used to build a
    zero-rate bucket (int truncation) and divide by zero on the first
    throttle. The per-stream share clamps to >= 1 B/h instead."""
    from aistore_spark.sources.downloader import (
        TokenBucket,
        execute_download,
        fake_fetch,
        range_job_plan,
    )

    plan = range_job_plan(spark, "http://data.example.com/c/p-{00..03}.bin")

    def factory(per_stream):
        assert per_stream > 0
        return TokenBucket(per_stream, clock=lambda: 0.0, sleep=lambda s: None)

    out = execute_download(
        plan,
        fetch=fake_fetch,
        connections=8,
        bytes_per_hour=3,  # < connections
        bucket_factory=factory,
    ).collect()
    assert len(out) == 4

    import pytest

    with pytest.raises(ValueError):
        TokenBucket(0)


def test_late_events_stream_matches_batch_mirror(spark, sf_dir, tmp_path):
    """The stateful lateness stream (applyInPandasWithState, running
    max in the state store across micro-batches) must drain to EXACTLY
    the ev4_late_events batch mirror — including the deterministic 24h
    back-dating fixture. Events are split into 5 event_id-ranged
    parquet files streamed one per trigger, so the state genuinely
    crosses micro-batch boundaries."""
    from aistore_spark.benchqueries import QUERIES
    from aistore_spark.streaming.ingest import late_events_stream
    from aistore_spark.util import ntz_micros_sql

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            (
                F.expr(ntz_micros_sql("ts"))
                - F.when(F.col("event_id") % 17 == 0, 86_400_000_000).otherwise(0)
            ).alias("t_us"),
        )
    )
    n_total = ev.count()
    chunk = (n_total + 4) // 5
    src = tmp_path / "late_src"
    src.mkdir()
    for i in range(5):
        part = ev.where(
            (F.col("event_id") >= i * chunk) & (F.col("event_id") < (i + 1) * chunk)
        )
        part.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("t_us", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = late_events_stream(stream, watermark_minutes=10)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("late_upd")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM late_upd").collect()
    assert rows
    # final per-user answer = the update with the largest n_events
    final = {}
    for r in rows:
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r
    batch = {
        r.user_id: r for r in QUERIES["ev4_late_events"](spark, sf_dir).collect()
    }
    assert final.keys() == batch.keys()
    for uid, b in batch.items():
        s = final[uid]
        assert (s.n_events, s.n_late, s.max_late_us) == (
            b.n_events,
            b.n_late,
            b.max_late_us,
        ), uid


def test_batch_loader_get_matches_frame(spark, sf_dir):
    """G4 oracle contract: BatchLoader.get()'s streamed (name, bytes)
    must equal frame()'s hash-checked rows — order, sentinels, and
    payload md5s — so the driver-green g4 row covers the iterator."""
    import hashlib

    from aistore_spark.catalog import members_catalog

    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    hits = [
        r.member
        for r in members.filter(F.col("ext") == "jpg").limit(2).collect()
    ]
    shard_hit = members.filter(F.col("ext") == "cls").first()
    loader = (
        BatchLoader(spark, members)
        .add(hits[0], "rec-99999999.jpg")
        .add_entry(shard_hit.shard, archpath=shard_hit.member)
        .add_entry(hits[1], start=2, length=5)
        .add_entry(hits[0], start=3, length=-1)
    )
    frame = {
        r.req_idx: r for r in loader.frame().orderBy("req_idx").collect()
    }
    got = list(loader.get())
    assert len(got) == len(frame) == 5
    for i, (name, payload) in enumerate(got):
        assert name == frame[i].out_name
        if payload is None:
            assert frame[i].status != "ok" and frame[i].payload_md5 is None
        else:
            assert frame[i].status == "ok"
            assert hashlib.md5(payload).hexdigest() == frame[i].payload_md5


def test_http_fixture_serves_deterministic_bodies():
    """The loopback fixture's contract (sources/http_fixture.py): the
    previously-dead http_fetch path (verdict-r10 #4) moves REAL bytes
    over a REAL socket, and the body is the documented pure function
    of the URL path — md5hex(path) repeated 1+(md5[0:2]%32) times."""
    import hashlib

    from aistore_spark.sources.downloader import http_fetch
    from aistore_spark.sources.http_fixture import body_for_path, loopback_url

    base = loopback_url()
    assert loopback_url() == base  # singleton: one server per process
    for path in ("/ds2/dl-0.bin", "/ds2/dl-8.bin", "/x/other.bin"):
        body = http_fetch(base + path)
        assert body == body_for_path(path)
        h = hashlib.md5(path.encode()).hexdigest()
        rep = 1 + (int(h[:2], 16) % 32)
        assert body == (h * rep).encode()
        assert len(body) == 32 * rep


def test_download_http_throttles_on_wall_clock(spark):
    """The token bucket enforces BytesPerHour on REAL wall-clock time
    through the real HTTP path (ext/dload/api.go:70-73): with the rate
    set to half the payload volume per second, the job must spend at
    least the deficit/rate in sleep; untrottled, the same fetches are
    fast."""
    import time

    from aistore_spark.sources.downloader import execute_download, http_fetch
    from aistore_spark.sources.http_fixture import body_for_path, loopback_url

    base = loopback_url()
    paths = [f"/thr/o-{i}.bin" for i in range(12)]
    total = sum(len(body_for_path(p)) for p in paths)
    plan = spark.createDataFrame(
        [(base + p, p.rsplit("/", 1)[-1]) for p in paths],
        schema="url string, objname string",
    )

    # unmeasured warm-up: the first mapInPandas pass pays Python-worker
    # startup; under host contention that dwarfed the ~1 s throttle
    # sleep and flipped the relative assertion (round-13 flake)
    execute_download(plan, fetch=http_fetch, connections=1).collect()

    t0 = time.monotonic()
    fast = execute_download(plan, fetch=http_fetch, connections=1).collect()
    fast_wall = time.monotonic() - t0
    assert len(fast) == 12
    assert all(r.data == body_for_path("/thr/" + r.objname) for r in fast)

    # rate = total/2 B/s with a total/2 burst -> >= ~1 s of enforced
    # sleep for the second half of the volume
    t0 = time.monotonic()
    slow = execute_download(
        plan,
        fetch=http_fetch,
        connections=1,
        bytes_per_hour=3600 * (total // 2),
    ).collect()
    slow_wall = time.monotonic() - t0
    assert len(slow) == 12
    assert slow_wall - fast_wall >= 0.6, (
        f"throttle did not bite: fast={fast_wall:.2f}s slow={slow_wall:.2f}s"
    )


def test_download_continue_on_err_emits_error_rows(spark):
    """verdict-r12 item 2: per-item error semantics mirror the
    reference's TaskErrInfo (ext/dload/api.go:67,108-112) — with
    continue_on_err the job finishes and yields exactly one error row
    per bad URL; without it the first bad URL fails the job."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from aistore_spark.sources.downloader import ERR_CHECKSUM, ERR_SIZE

    def flaky(url: str) -> bytes:
        if "bad" in url:
            raise OSError(f"connection refused: {url}")
        return fake_fetch(url)

    plan = spark.createDataFrame(
        [(f"http://h/{k}-{i}.bin", f"{k}-{i}.bin")
         for i in range(5) for k in ("ok", "bad")],
        schema="url string, objname string",
    )
    # strict mode (default): one bad URL raises out of the job
    with pytest.raises(PythonException, match="connection refused"):
        execute_download(plan, fetch=flaky).collect()
    # continue mode: every work item lands, bad ones as error rows
    out = execute_download(plan, fetch=flaky, continue_on_err=True).collect()
    assert len(out) == 10
    good = [r for r in out if r.err == ""]
    bad = [r for r in out if r.err != ""]
    assert len(good) == 5 and len(bad) == 5
    for r in bad:
        assert r.objname.startswith("bad-")
        assert r.err == f"connection refused: {r.url}"
        assert r.size == ERR_SIZE and r.checksum == ERR_CHECKSUM
        assert r.data is None
    for r in good:
        assert r.size == 32 and bytes(r.data) == fake_fetch(r.url)


def test_download_404_over_real_http(spark):
    """The loopback fixture's deterministic /404/ class exercises the
    REAL http_fetch error path end to end."""
    from aistore_spark.sources.downloader import ERR_SIZE, http_fetch
    from aistore_spark.sources.http_fixture import (
        NOT_FOUND_PREFIX,
        body_for_path,
        loopback_url,
    )

    base = loopback_url()
    plan = spark.createDataFrame(
        [
            (base + "/t/a.bin", "a.bin"),
            (base + NOT_FOUND_PREFIX + "b.bin", "b.bin"),
        ],
        schema="url string, objname string",
    )
    rows = {
        r.objname: r
        for r in execute_download(
            plan, fetch=http_fetch, continue_on_err=True
        ).collect()
    }
    assert rows["a.bin"].err == ""
    assert bytes(rows["a.bin"].data) == body_for_path("/t/a.bin")
    assert rows["b.bin"].err == "HTTP Error 404: Not Found"
    assert rows["b.bin"].size == ERR_SIZE
