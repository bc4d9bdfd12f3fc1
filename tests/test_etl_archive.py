"""ETL + archive semantics: transform contract, pipeline composition,
tar round-trips (the reference's own style — unpack every output shard
and check contents, ais/test/dsort_test.go:363-510)."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from aistore_spark.catalog import members_catalog
from aistore_spark.operators import etl
from aistore_spark.operators.archive import (
    build_tar,
    expected_tar_size,
    pack_members,
    synth_payload,
)
from aistore_spark.sources.tables import load_table


def test_tar_roundtrip_preserves_order_and_bytes():
    names = [f"x/{i:04d}.bin" for i in range(50)]
    payloads = [bytes([i % 251]) * (i * 17 % 3000) for i in range(50)]
    blob = build_tar(names, payloads)
    assert len(blob) == expected_tar_size(len(p) for p in payloads)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
        got = [(m.name, tar.extractfile(m).read()) for m in tar.getmembers()]
    assert got == list(zip(names, payloads)), "order + bytes must round-trip"


def test_compress_decompress_pipeline_roundtrip():
    fn = etl.resolve(["compress", "decompress"])
    data = b"aistore" * 1000
    assert fn(data, "p", "") == data
    # deterministic gzip: same input -> same bytes
    c = etl.resolve(["compress"])
    assert c(data, "p", "") == c(data, "p", "")


def test_etl_stream_matches_inline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    df = docs.select(
        F.col("doc_id").cast("string").alias("name"),
        F.encode("text", "UTF-8").alias("data"),
    )
    inline = etl.etl_inline(df, ["md5"]).select(
        "name", F.col("out").cast("string").alias("out")
    )
    streamed = etl.etl_stream(
        df, ["md5"], schema="name string, data binary, out binary"
    ).select("name", F.col("out").cast("string").alias("out"))
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, streamed.collect())
    )


def test_pack_members_builds_real_tars(spark, sf_dir):
    members = members_catalog(load_table(spark, sf_dir, "lineitem")).filter(
        F.col("shard") == "shard-00000.tar"
    )
    stats = pack_members(members).collect()
    assert len(stats) == 1
    s = stats[0]
    rows = members.orderBy("member", "size").collect()
    sizes = [len(synth_payload(r.member, r.key_str)) for r in rows]
    assert s.n_members == len(rows)
    assert s.payload_bytes == sum(sizes)
    assert s.tar_bytes == expected_tar_size(sizes)


def test_all_archive_formats_roundtrip():
    """Format parity with cmn/archive/mime.go:25-29 — the full MIME set
    TAR/TGZ/ZIP/TAR.LZ4 round-trips through real bytes."""
    import gzip
    import zipfile

    from aistore_spark.functions import lz4frame
    from aistore_spark.operators.archive import build_tar_lz4, build_tgz, build_zip

    names = [f"r/{i:03d}.bin" for i in range(10)]
    payloads = [bytes([i]) * (100 * i + 1) for i in range(10)]

    tgz = build_tgz(names, payloads)
    assert tgz == build_tgz(names, payloads), "tgz must be deterministic"
    with tarfile.open(fileobj=io.BytesIO(gzip.decompress(tgz))) as tar:
        assert [m.name for m in tar.getmembers()] == names

    zp = build_zip(names, payloads)
    assert zp == build_zip(names, payloads), "zip must be deterministic"
    with zipfile.ZipFile(io.BytesIO(zp)) as zf:
        assert zf.namelist() == names
        assert all(zf.read(n) == p for n, p in zip(names, payloads))

    tl4 = build_tar_lz4(names, payloads)
    assert tl4 == build_tar_lz4(names, payloads), "tar.lz4 must be deterministic"
    with tarfile.open(fileobj=io.BytesIO(lz4frame.decompress(tl4))) as tar:
        assert [m.name for m in tar.getmembers()] == names
        assert all(
            tar.extractfile(m).read() == p
            for m, p in zip(tar.getmembers(), payloads)
        )


def test_fast_tar_builder_byte_identical_to_tarfile():
    """The direct-assembly USTAR builder (r16) must emit the exact
    bytes tarfile.USTAR_FORMAT does — headers, padding, EOF blocks,
    RECORDSIZE tail — for representative name/size shapes, including
    empty payloads, block-boundary sizes, and duplicate names."""
    from aistore_spark.operators.archive import _build_tar_tarfile, build_tar

    cases = [
        ([], []),
        (["a.txt"], [b""]),
        (["dir/sub/file.bin"], [b"x" * 512]),
        (
            ["rec-000000001.jpg", "rec-000000001.cls", "z" * 100],
            [b"p" * 511, b"q" * 513, b"\0" * 10240],
        ),
        (["dup.txt", "dup.txt"], [b"one", b"two"]),
        (["uénicode.txt"], [b"payload"]),
    ]
    for names, payloads in cases:
        assert build_tar(names, payloads) == _build_tar_tarfile(
            names, payloads
        ), names
    # >100-byte names take the tarfile fallback (prefix-field handling)
    long = ["d/" * 60 + "f.txt"]
    assert build_tar(long, [b"p"]) == _build_tar_tarfile(long, [b"p"])
