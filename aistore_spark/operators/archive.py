"""Archive pack / unpack / batch assembly (P1-P6, G1, S13).

The reference treats TAR/TGZ/ZIP shards as first-class: pack selected
objects into shards (``xact/xs/archive.go``), extract single members or
regex matches (``ais/tgtobj.go:1341-1400``), and assemble get-batch
responses as TARs in exact request order (``xact/xs/moss.go:637-749``).

Spark-first: packing is ``groupBy(dst_shard).applyInPandas(tar_builder)``
— one builder per output shard, embarrassingly parallel, each group
sized by the packing policy (D6) so memory per task is bounded. The
member *catalog* (P5's shard index) is how extraction avoids touching
tar bytes at all: P2/P3 are catalog filters.

Determinism: TARs are built with zeroed uid/gid/mtime (USTAR), so their
byte size is an exact function of member names+sizes::

    tar_size = roundup(sum(512 + ceil(size/512)*512) + 1024, 10240)

The oracle recomputes that formula in SQL — if our tarfile output ever
deviates (long names → extended headers, format drift), the size check
catches it.
"""

from __future__ import annotations

import hashlib
import io
import tarfile
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAR_BLOCK = 512
TAR_EOF = 1024  # two zero blocks
TAR_RECORDSIZE = 10240  # tarfile pads archives to RECORDSIZE


def expected_tar_size(sizes: Iterable[int]) -> int:
    """Size in bytes of a USTAR archive holding members of *sizes*."""
    body = sum(TAR_BLOCK + -(-s // TAR_BLOCK) * TAR_BLOCK for s in sizes)
    total = body + TAR_EOF
    return -(-total // TAR_RECORDSIZE) * TAR_RECORDSIZE


def _build_tar_tarfile(names: list[str], payloads: list[bytes]) -> bytes:
    """tarfile-based USTAR builder — the reference implementation the
    fast path below must byte-match, kept as the fallback for names
    that need the prefix field or non-USTAR sizes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
        for name, payload in zip(names, payloads):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def _ustar_header(name_b: bytes, size: int) -> bytes:
    """One 512-byte USTAR header, byte-identical to what
    ``tarfile.USTAR_FORMAT`` emits for a zeroed regular-file TarInfo
    (mode 0644, uid/gid/mtime 0, empty uname/gname; checksum computed
    with the checksum field as 8 spaces, then written ``%06o\\0 `` —
    pinned by tests/test_etl_archive.py's byte-equality test)."""
    hdr = bytearray(512)
    hdr[0 : len(name_b)] = name_b
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = b"%011o\x00" % size
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b"        "
    hdr[156] = 0x30  # typeflag '0': regular file
    hdr[257:265] = b"ustar\x0000"
    hdr[148:156] = b"%06o\x00 " % sum(hdr)
    return bytes(hdr)


def build_tar(names: list[str], payloads: list[bytes]) -> bytes:
    """Deterministic USTAR archive: zeroed uid/gid/mtime, entries in the
    given order (the get-batch order guarantee, api/apc/ml.go:26-28).

    Headers are emitted by direct byte assembly (r16, guide §4.2 —
    the write-side twin of the fast parse in sources/binary.py):
    tarfile pays a TarInfo + tobuf + copyfileobj round per member,
    which dominates many-small-member packs. Output is byte-identical
    to the tarfile USTAR form (test-pinned); names over 100 bytes or
    sizes outside the 11-octal-digit range fall back to tarfile for
    the whole archive so prefix-field handling stays the library's.
    """
    parts: list[bytes] = []
    pos = 0
    for name, payload in zip(names, payloads):
        name_b = name.encode("utf-8")
        size = len(payload)
        if len(name_b) > 100 or size >= 8**11:
            return _build_tar_tarfile(names, payloads)
        parts.append(_ustar_header(name_b, size))
        parts.append(payload)
        pad = -size % TAR_BLOCK
        if pad:
            parts.append(b"\0" * pad)
        pos += TAR_BLOCK + size + pad
    pos += TAR_EOF
    parts.append(b"\0" * (TAR_EOF + (-pos % TAR_RECORDSIZE)))
    return b"".join(parts)


def synth_payload(member: str, key_str: str) -> bytes:
    """Deterministic member payload for catalogs that carry no real
    bytes (testdata): ``member:key_str`` ASCII."""
    return f"{member}:{key_str}".encode("ascii")


def pack_members(
    members: DataFrame,
    shard_col: str = "shard",
    order_cols: tuple[str, ...] = ("member", "size"),
) -> DataFrame:
    """P1: pack members into one archive per *shard_col* value
    (``ArchiveMsg``, api/apc/multiobj.go:158-180; writers
    ``ext/dsort/shard/tar.go``).

    Builds REAL tar bytes per group and reports the shard manifest:
    ``(shard, n_members, payload_bytes, tar_bytes, entries_md5)`` where
    ``entries_md5`` fingerprints the exact entry order.
    """
    schema = (
        f"{shard_col} string, n_members bigint, payload_bytes bigint, "
        "tar_bytes bigint, entries_md5 string"
    )
    order = list(order_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        payloads = [
            synth_payload(m, k) for m, k in zip(pdf["member"], pdf["key_str"])
        ]
        tar = build_tar(list(pdf["member"]), payloads)
        fp = hashlib.md5(",".join(pdf["member"]).encode()).hexdigest()
        return pd.DataFrame(
            {
                shard_col: [pdf[shard_col].iloc[0]],
                "n_members": [len(pdf)],
                "payload_bytes": [sum(len(p) for p in payloads)],
                "tar_bytes": [len(tar)],
                "entries_md5": [fp],
            }
        )

    n = members.sparkSession.sparkContext.defaultParallelism
    return (
        members.repartition(n, shard_col)
        .groupBy(shard_col)
        .applyInPandas(pack, schema=schema)
    )


def extract_member(members: DataFrame, shard: str, member: str) -> DataFrame:
    """P2: single archived-file read (``GET ?archpath=``,
    ais/tgtobj.go:1341-1368). The member catalog IS the shard index
    (P5), so this is a point lookup, not a tar scan."""
    return members.filter(
        (F.col("shard") == shard) & (F.col("member") == member)
    )


def extract_matching(
    members: DataFrame, pattern: str, mode: str = "regexp"
) -> DataFrame:
    """P3: multi-match extraction (``GET ?archregx=&archmode=``,
    cmn/archive/read.go:25-38) — filter the member catalog, then pack
    the hits as a streamed TAR (P1)."""
    from aistore_spark.operators.filters import select_regex

    return select_regex(members, pattern, mode=mode, name_col="member")


def assemble_batches(
    joined: DataFrame,
    batch_col: str = "batch_id",
    output_format: str = "tar",
) -> DataFrame:
    """G1/S13: get-batch TAR assembly in exact request order.

    Input is the get-batch join output (J1) plus a ``batch_col``
    grouping requests into response batches. Per batch, entries are
    written in ``req_idx`` order — missing objects appear as their
    ``__404__/`` sentinel with size 0 (api/apc/ml.go:37-41). The
    ``entries_md5`` fingerprint is over the ordered entry names, so any
    order violation changes the output.

    ``output_format`` selects the response archive mime — tar | tgz |
    zip | tar.lz4 (``MossReq.OutputFormat``, api/apc/ml.go:101 +
    cmn/archive/mime.go:25-29); ``tar_bytes`` is the built archive's
    size in that format (only tar has the closed-form size oracle).

    Scale: one task per batch; a batch is bounded by the loader's
    request size, so payload materialization per task is bounded. The
    shuffle is on ``batch_col`` only — via an explicit
    ``repartition(defaultParallelism, batch_col)``: the shuffled rows
    are tiny (name+size) but the per-group pack is CPU-bound, so AQE's
    byte-based partition coalescing would serialize the builders onto
    2-3 tasks; a user-specified partition count keeps the pack wide
    and satisfies the groupBy's clustering, so no second exchange.
    """
    builder = ARCHIVE_BUILDERS[output_format]
    schema = (
        f"{batch_col} bigint, n_entries bigint, n_missing bigint, "
        "payload_bytes bigint, tar_bytes bigint, entries_md5 string"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("req_idx", kind="mergesort")
        payloads = [b"\0" * int(s) for s in pdf["size"]]
        tar = builder(list(pdf["out_name"]), payloads)
        fp = hashlib.md5(",".join(pdf["out_name"]).encode()).hexdigest()
        return pd.DataFrame(
            {
                batch_col: [pdf[batch_col].iloc[0]],
                "n_entries": [len(pdf)],
                # every error kind lands under __404__/ (missing object,
                # missing archived file, unsatisfiable range) — moss.go
                # addMissingIn handles them uniformly
                "n_missing": [int((pdf["status"] != "ok").sum())],
                "payload_bytes": [int(pdf["size"].sum())],
                "tar_bytes": [len(tar)],
                "entries_md5": [fp],
            }
        )

    n = joined.sparkSession.sparkContext.defaultParallelism
    return (
        joined.repartition(n, batch_col)
        .groupBy(batch_col)
        .applyInPandas(pack, schema=schema)
    )


def assemble_batches_bytes(
    joined: DataFrame, batch_col: str = "batch_id"
) -> DataFrame:
    """G1 real-I/O variant: identical batch assembly to
    :func:`assemble_batches`, but member payloads are REAL bytes
    carried on the rows (binary ``payload`` column, read from on-disk
    shards via ``sources/binary.py``) instead of being synthesized from
    the catalog's size column — the disk-bound workload the reference's
    get-batch bands describe (``docs/get_batch.md:574-577``).

    Adds ``content_md5``: md5 over the req_idx-ordered per-entry
    payload md5s, so the oracle proves the actual bytes that crossed
    the scan, not just names and sizes. Missing entries contribute the
    empty payload (md5 of b"" — the sentinel's 0-byte body).

    Scale: same shuffle contract as :func:`assemble_batches` (explicit
    ``repartition(defaultParallelism, batch_col)``, bounded payload per
    task) — only the payload bytes now ride the shuffle, which is the
    honest cost of a disk-backed get-batch.
    """
    schema = (
        f"{batch_col} bigint, n_entries bigint, n_missing bigint, "
        "payload_bytes bigint, tar_bytes bigint, entries_md5 string, "
        "content_md5 string"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("req_idx", kind="mergesort")
        payloads = [
            bytes(p) if p is not None else b"" for p in pdf["payload"]
        ]
        tar = build_tar(list(pdf["out_name"]), payloads)
        fp = hashlib.md5(",".join(pdf["out_name"]).encode()).hexdigest()
        cfp = hashlib.md5(
            ",".join(hashlib.md5(p).hexdigest() for p in payloads).encode()
        ).hexdigest()
        return pd.DataFrame(
            {
                batch_col: [pdf[batch_col].iloc[0]],
                "n_entries": [len(pdf)],
                "n_missing": [int((pdf["status"] != "ok").sum())],
                "payload_bytes": [sum(len(p) for p in payloads)],
                "tar_bytes": [len(tar)],
                "entries_md5": [fp],
                "content_md5": [cfp],
            }
        )

    n = joined.sparkSession.sparkContext.defaultParallelism
    return (
        joined.repartition(n, batch_col)
        .groupBy(batch_col)
        .applyInPandas(pack, schema=schema)
    )


def assemble_batches_formats(
    joined: DataFrame,
    batch_col: str = "batch_id",
    formats: tuple[str, ...] = ("tar", "tgz", "zip", "tar.lz4"),
) -> DataFrame:
    """G3: the get-batch output-format matrix — every response batch
    built in EVERY requested archive mime (``MossReq.OutputFormat``,
    api/apc/ml.go:101 + cmn/archive/mime.go:25-29) in one pass.

    One task per batch builds all formats from the same ordered entry
    list (one row out per (batch, format)), and each row carries the
    format's analytically-checkable size:

    - ``tar``: the archive size itself (closed-form USTAR layout);
    - ``tgz`` / ``tar.lz4``: the size of the **decompressed** stream —
      the builder gunzips/un-lz4s its own output, so the value proves a
      real compression round trip AND equals the tar closed form;
    - ``zip``: the archive size (STORED entries: 30+len(name) local
      header + payload, 46+len(name) central entry, 22-byte EOCD).

    Scale: identical to :func:`assemble_batches` — shuffle on
    ``batch_col`` only (explicit width, see there), bounded payload per
    task; the format loop adds CPU, not movement.
    """
    import gzip

    builders = {f: ARCHIVE_BUILDERS[f] for f in formats}  # fail fast
    schema = (
        f"{batch_col} bigint, format string, n_entries bigint, "
        "payload_bytes bigint, check_bytes bigint, entries_md5 string"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        from aistore_spark.functions import lz4frame

        pdf = pdf.sort_values("req_idx", kind="mergesort")
        names = list(pdf["out_name"])
        payloads = [b"\0" * int(s) for s in pdf["size"]]
        fp = hashlib.md5(",".join(names).encode()).hexdigest()
        rows: dict[str, list] = {
            batch_col: [], "format": [], "n_entries": [],
            "payload_bytes": [], "check_bytes": [], "entries_md5": [],
        }
        # tar, tgz and tar.lz4 share one underlying USTAR stream: build
        # it once per batch instead of three times. The compression
        # settings for the two round-trip formats are free to differ
        # from the shared builders' (gzip level 1; 4 MiB LZ4 blocks)
        # because the reported value is the DECOMPRESSED length — any
        # spec-valid encoding of the same tar yields the same check.
        base_tar: bytes | None = None

        def tar_stream() -> bytes:
            nonlocal base_tar
            if base_tar is None:
                base_tar = build_tar(names, payloads)
            return base_tar

        for fmt in formats:
            if fmt == "tar":
                blob = tar_stream()
                check = len(blob)
            elif fmt == "tgz":
                blob = gzip.compress(tar_stream(), compresslevel=1, mtime=0)
                check = len(gzip.decompress(blob))
            elif fmt == "tar.lz4":
                blob = lz4frame.compress(tar_stream(), bd_code=7)
                check = len(lz4frame.decompress(blob))
            else:  # zip: the archive size is the closed form
                blob = builders[fmt](names, payloads)
                check = len(blob)
            rows[batch_col].append(int(pdf[batch_col].iloc[0]))
            rows["format"].append(fmt)
            rows["n_entries"].append(len(pdf))
            rows["payload_bytes"].append(int(pdf["size"].sum()))
            rows["check_bytes"].append(check)
            rows["entries_md5"].append(fp)
        return pd.DataFrame(rows)

    n = joined.sparkSession.sparkContext.defaultParallelism
    return (
        joined.repartition(n, batch_col)
        .groupBy(batch_col)
        .applyInPandas(pack, schema=schema)
    )


def zip_round_trip_listing(members: DataFrame) -> DataFrame:
    """S4-family over a real ZIP: pack the selected members (deduped to
    one row per member, deterministic member order) into an actual ZIP
    via :func:`build_zip`, then list it back by reading the central
    directory — member offsets/sizes come from genuine zip bytes (the
    reference's uniform archive read path, ``cmn/archive/mime.go:25-29``
    / ``cmn/archive/read.go:137-165``).

    The oracle re-derives the layout arithmetically: a STORED zip entry
    occupies ``30 + len(name)`` local-header bytes plus the payload, so
    ``zoffset_i = sum_{j<i} (30 + len(name_j) + size_j)`` — if our
    writer or reader ever drifts (extra fields, zip64, descriptor
    flags), the offsets stop matching.

    Scale: one task per response archive, the P3/S13 bounded shape.
    """
    sel = members.groupBy("member").agg(F.min("key_str").alias("key_str"))
    schema = "member string, zoffset bigint, size bigint"

    def pack_expand(pdf: pd.DataFrame) -> pd.DataFrame:
        import zipfile

        pdf = pdf.sort_values("member", kind="mergesort")
        payloads = [
            synth_payload(m, k) for m, k in zip(pdf["member"], pdf["key_str"])
        ]
        blob = build_zip(list(pdf["member"]), payloads)
        rows: dict[str, list] = {"member": [], "zoffset": [], "size": []}
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            for info in zf.infolist():
                rows["member"].append(info.filename)
                rows["zoffset"].append(info.header_offset)
                rows["size"].append(info.file_size)
        return pd.DataFrame(rows)

    return (
        sel.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda pdf: pack_expand(pdf), schema=schema)
    )


def tar_lz4_round_trip_listing(members: DataFrame) -> DataFrame:
    """S4-family over a real TAR.LZ4: pack the selected members into an
    actual lz4-framed tar via :func:`build_tar_lz4` (pure-Python LZ4,
    ``functions/lz4frame.py``), decompress, and list members back with
    their payload offsets in the DECOMPRESSED tar stream — the seek
    points a ranged extract uses after inflate
    (``cmn/archive/mime.go:25-29`` / ``cmn/archive/read.go:137-165``).

    The oracle re-derives the USTAR layout arithmetically:
    ``toffset_i = 512 + sum_{j<i} (512 + ceil(size_j/512)*512)`` — any
    drift in the tar writer (extended headers) or the lz4 round-trip
    breaks the match.
    """
    sel = members.groupBy("member").agg(F.min("key_str").alias("key_str"))
    schema = "member string, toffset bigint, size bigint"

    def pack_expand(pdf: pd.DataFrame) -> pd.DataFrame:
        from aistore_spark.functions import lz4frame

        pdf = pdf.sort_values("member", kind="mergesort")
        payloads = [
            synth_payload(m, k) for m, k in zip(pdf["member"], pdf["key_str"])
        ]
        blob = build_tar_lz4(list(pdf["member"]), payloads)
        rows: dict[str, list] = {"member": [], "toffset": [], "size": []}
        with tarfile.open(fileobj=io.BytesIO(lz4frame.decompress(blob))) as tar:
            for info in tar.getmembers():
                rows["member"].append(info.name)
                rows["toffset"].append(info.offset_data)
                rows["size"].append(info.size)
        return pd.DataFrame(rows)

    return (
        sel.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda pdf: pack_expand(pdf), schema=schema)
    )


def build_tgz(names: list[str], payloads: list[bytes]) -> bytes:
    """TAR.GZ shard: deterministic (zeroed gzip mtime, fixed level)."""
    import gzip

    return gzip.compress(build_tar(names, payloads), compresslevel=6, mtime=0)


def _build_zip_zipfile(names: list[str], payloads: list[bytes]) -> bytes:
    """zipfile-based STORED writer — the reference implementation the
    direct path below must byte-match, kept as the fallback for inputs
    that need zip64 records."""
    import warnings
    import zipfile

    buf = io.BytesIO()
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", message="Duplicate name")
        with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
            for name, payload in zip(names, payloads):
                info = zipfile.ZipInfo(
                    filename=name, date_time=(1980, 1, 1, 0, 0, 0)
                )
                zf.writestr(info, payload)
    return buf.getvalue()


def build_zip(names: list[str], payloads: list[bytes]) -> bytes:
    """ZIP shard (STORED — the reference archives already-compressed
    media; date_time pinned for determinism). A batch may legitimately
    request the same object twice, so duplicate names are kept, like
    tar does.

    Direct record assembly (r17): emits byte-for-byte what the zipfile
    path wrote — version 20, flags 0 (0x800 for utf-8 names), method
    STORED, DOS time 0 / date 33 (the pinned 1980-01-01), unix create
    system with 0o600 external attrs, no extra fields — as one
    bytes-join instead of zipfile's per-member stream machinery
    (measured 3.8x on a 250 x ~25 KiB batch, close to the mandatory
    crc32 floor; tests pin byte equality). Anything in zip64 territory
    falls back to zipfile."""
    import struct
    import zlib

    pieces: list[bytes] = []
    central: list[bytes] = []
    off = 0
    n = 0
    for name, payload in zip(names, payloads):
        try:
            nb = name.encode("ascii")
            flags = 0
        except UnicodeEncodeError:
            nb = name.encode("utf-8")
            flags = 0x800
        sz = len(payload)
        if sz >= 0xFFFFFFFF or off >= 0xFFFFFFFF or n >= 0xFFFF:
            return _build_zip_zipfile(names, payloads)
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        lfh = struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 20, flags, 0, 0, 33, crc, sz, sz, len(nb), 0,
        )
        pieces += (lfh, nb, payload)
        central += (
            struct.pack(
                "<IHHHHHHIIIHHHHHII",
                0x02014B50, 788, 20, flags, 0, 0, 33, crc, sz, sz,
                len(nb), 0, 0, 0, 0, 0o600 << 16, off,
            ),
            nb,
        )
        off += len(lfh) + len(nb) + sz
        n += 1
    if off >= 0xFFFFFFFF:
        return _build_zip_zipfile(names, payloads)
    cd = b"".join(central)
    pieces += (
        cd,
        struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, n, n, len(cd), off, 0),
    )
    return b"".join(pieces)


def build_tar_lz4(names: list[str], payloads: list[bytes]) -> bytes:
    """TAR.LZ4 shard (``cmn/archive/mime.go:25-29`` lists it first-
    class). Uses the in-repo pure-Python LZ4 frame codec — deterministic
    output regardless of whether a native binding is installed."""
    from aistore_spark.functions import lz4frame

    return lz4frame.compress(build_tar(names, payloads))


ARCHIVE_BUILDERS = {
    "tar": build_tar,
    "tgz": build_tgz,
    "zip": build_zip,
    "tar.lz4": build_tar_lz4,
}
