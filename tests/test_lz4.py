"""Pure-Python LZ4 frame codec (functions/lz4frame.py) — the TAR.LZ4
shard MIME (cmn/archive/mime.go:25-29) needs a real round trip in a
runtime without the native binding."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aistore_spark.functions import lz4frame


def test_xxh32_known_vectors():
    # public xxHash test vectors (seed 0)
    assert lz4frame.xxh32(b"") == 0x02CC5D05
    assert lz4frame.xxh32(b"a") == 0x550D7456
    assert lz4frame.xxh32(b"abc") == 0x32D153FF
    assert lz4frame.xxh32(b"Hello World") == 0xB1FD16EE


CASES = [
    b"",
    b"a",
    b"abcd" * 100,
    b"\x00" * 200_000,  # spans multiple 64 KiB blocks
    b"the quick brown fox " * 5000,
    b"x" * 12,  # below the min-match window
    b"x" * 13,
]


@pytest.mark.parametrize("data", CASES, ids=lambda d: f"len{len(d)}")
def test_frame_round_trip(data):
    frame = lz4frame.compress(data)
    assert lz4frame.decompress(frame) == data
    # deterministic: same input -> same frame bytes (oracle relies on it)
    assert lz4frame.compress(data) == frame


def test_block_round_trip_random():
    rng = random.Random(42)
    for n in (0, 1, 13, 100, 65_536, 70_000):
        data = bytes(rng.randrange(4) for _ in range(n))
        assert lz4frame.decompress_block(lz4frame.compress_block(data)) == data


def test_compression_actually_compresses():
    frame = lz4frame.compress(b"\x00" * 100_000)
    assert len(frame) < 2_000  # RLE-style overlap matches must kick in


def test_incompressible_data_stored_raw():
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(70_000))
    frame = lz4frame.compress(data)
    # raw-stored blocks cost 4 bytes of framing each, never blow up
    assert len(frame) <= len(data) + 64
    assert lz4frame.decompress(frame) == data


def test_skippable_frame_is_skipped():
    import struct

    payload = b"hello lz4"
    frame = lz4frame.compress(payload)
    skip = struct.pack("<II", 0x184D2A50, 6) + b"ignore"
    assert lz4frame.decompress(skip + frame) == payload


def test_native_binding_interop():
    lz4 = pytest.importorskip("lz4.frame")
    data = b"interop " * 10_000
    assert lz4.decompress(lz4frame.compress(data)) == data
    assert lz4frame.decompress(lz4.compress(data)) == data


def test_tar_lz4_expand_path(spark):
    """expand_archive_members must treat .tar.lz4 uniformly with the
    other shard MIMEs (read path cmn/archive/read.go:137-165)."""
    from aistore_spark.operators.archive import build_tar_lz4
    from aistore_spark.sources.binary import expand_archive_members

    names = [f"d/{i:03d}.bin" for i in range(5)]
    payloads = [bytes([65 + i]) * (37 * i + 1) for i in range(5)]
    blob = build_tar_lz4(names, payloads)
    df = spark.createDataFrame(
        [("x.tar.lz4", blob)], "path string, content binary"
    )
    rows = sorted(
        expand_archive_members(df).collect(), key=lambda r: r.member
    )
    assert [r.member for r in rows] == names
    assert [bytes(r.bytes) for r in rows] == payloads


def test_truncated_streams_raise_value_error():
    """Regression: truncated/malformed input must raise a consistent
    ValueError, never struct.error / IndexError / silent short output."""
    frame = lz4frame.compress(b"the quick brown fox " * 500)
    for cut in (2, 5, 7, len(frame) // 2, len(frame) - 1):
        with pytest.raises(ValueError):
            lz4frame.decompress(frame[:cut])
    # truncated blocks: ValueError, or a clean prefix decode when the
    # cut happens to land on a sequence boundary — never struct/Index
    block = lz4frame.compress_block(b"abcd" * 600)
    for cut in range(len(block)):
        try:
            lz4frame.decompress_block(block[:cut])
        except ValueError:
            pass
    # oversized literal run: token declares 15+ext literals, body short
    with pytest.raises(ValueError):
        lz4frame.decompress_block(bytes([0xF0, 200]) + b"x" * 10)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_arbitrary_bytes_never_crash_unsafely(junk):
    """Decoder total on garbage: ValueError or a successful decode,
    nothing else."""
    try:
        lz4frame.decompress_block(junk)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000))
def test_block_round_trip_property(data):
    assert lz4frame.decompress_block(lz4frame.compress_block(data)) == data


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=40), st.integers(1, 400)),
        max_size=20,
    )
)
def test_frame_round_trip_repetitive_property(chunks):
    # repetitive inputs drive the match/offset/overlap paths hard
    data = b"".join(piece * reps for piece, reps in chunks)
    assert lz4frame.decompress(lz4frame.compress(data)) == data
