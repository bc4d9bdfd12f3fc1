"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (beyond-reference, SURVEY.md §7.8).

Two tiers, both Arrow-batched ``mapInPandas`` stages with bounded
batch sizes:

- **Real codecs, stdlib-only** — WAV PCM (``decode_wav_meta``), BMP
  (``decode_bmp_meta``), PNG incl. full DEFLATE+unfilter
  (``decode_png_pixels``/``decode_png_meta``), GIF incl. a hand-built
  LZW decoder and animated multi-frame files (``decode_gif_meta``),
  magic-byte dispatch (``decode_media_meta``), plus real pixel-level
  resize (``png_thumbnail``), block-grid features
  (``png_grid_features``) and selective frame extraction
  (``gif_extract_frames``).
- **Library-gated plumbing contract** — ``decode_media``/
  ``resize_media``/``extract_features`` run a deterministic
  digest-stub (or a Pillow/torchaudio/PyAV hook via ``_decode_real``)
  so the schemas/batching/partitioning shape is exercised for formats
  whose codecs aren't stdlib-expressible (JPEG, MP4).

At 100 TB: content lives in object storage; the catalog carries
(name, media_type, nbytes, metadata). Decode stages are
embarrassingly parallel; ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds decoded-frame memory, and `.repartition` by size buckets evens
skew from mixed media sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "name string, media_type string, n_bytes bigint, "
    "width bigint, height bigint, n_frames bigint, checksum string"
)


def _decode_real(data: bytes, media_type: str):
    """Real decoder hook — wire Pillow/torchaudio/PyAV here when the
    runtime has them. Deliberately unimplemented in this container."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake=True (deterministic stub) or install codecs"
    )


def _decode_fake(data: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in: dimensions derived from the content
    digest, so tests are stable and the full pipeline shape runs."""
    h = hashlib.md5(data).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    n_frames = 1 if media_type == "image" else 1 + h[2] % 240
    return width, height, n_frames


def decode_media(
    df: DataFrame,
    data_col: str = "data",
    name_col: str = "name",
    type_col: str = "media_type",
    fake: bool = True,
) -> DataFrame:
    """Decode a binary media column into typed metadata via
    ``mapInPandas`` (iterator form — never materializes a partition).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_fake if fake else _decode_real
        for pdf in batches:
            out = {
                "name": pdf[name_col],
                "media_type": pdf[type_col],
                "n_bytes": pdf[data_col].map(len),
                "width": [],
                "height": [],
                "n_frames": [],
                "checksum": [],
            }
            ws, hs, fr, ck = [], [], [], []
            for data, mt in zip(pdf[data_col], pdf[type_col]):
                w, h, n = decode(data, mt)
                ws.append(w)
                hs.append(h)
                fr.append(n)
                ck.append(hashlib.md5(data).hexdigest())
            out["width"], out["height"], out["n_frames"], out["checksum"] = (
                ws,
                hs,
                fr,
                ck,
            )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "name string, width bigint, height bigint, rs_width bigint, "
    "rs_height bigint, rs_checksum string"
)


def resize_media(
    decoded: DataFrame,
    target_width: int = 224,
) -> DataFrame:
    """Resize stage: aspect-preserving scale to *target_width* via
    ``mapInPandas`` (the Arrow-batched stage a Pillow/torchvision
    resize plugs into; the pixel op itself is the stubbed codec —
    the fake emits a deterministic output checksum so the stage is
    value-checkable end-to-end).

    ``rs_height = height * target // width`` — integer floor-division,
    exact in both engines.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rs_w = [target_width] * len(pdf)
            rs_h = [
                int(h) * target_width // int(w)
                for w, h in zip(pdf["width"], pdf["height"])
            ]
            rs_ck = [
                hashlib.md5(f"{c}:{w}x{h}".encode()).hexdigest()
                for c, w, h in zip(pdf["checksum"], rs_w, rs_h)
            ]
            yield pd.DataFrame(
                {
                    "name": pdf["name"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "rs_width": rs_w,
                    "rs_height": rs_h,
                    "rs_checksum": rs_ck,
                }
            )

    return decoded.mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_features(
    df: DataFrame,
    data_col: str = "data",
    name_col: str = "name",
    dim: int = 4,
) -> DataFrame:
    """Feature-extract stage: binary content → fixed-dim feature
    vector via ``mapInPandas`` (where a real embedding model runs; the
    fake derives features from the content digest so the batch shape,
    schema and determinism are tested). Features are emitted as a
    comma-joined string of *dim* 8-hex-char words — engine-portable
    for the oracle's value hash.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf[data_col]:
                h = hashlib.md5(data).hexdigest()
                feats.append(",".join(h[i * 8 : i * 8 + 8] for i in range(dim)))
            yield pd.DataFrame(
                {
                    "name": pdf[name_col],
                    "features": feats,
                    "feature_dim": [dim] * len(pdf),
                }
            )

    return df.mapInPandas(
        run, schema="name string, features string, feature_dim bigint"
    )


def frame_sample_plan(
    decoded: DataFrame, every_n: int = 30, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plan for video rows: which frame indices a
    downstream extract stage should pull. Pure column expressions
    (sequence + slice), one row in → one row out. Rows with
    ``n_frames <= 0`` get an empty sample list — an unguarded
    ``sequence(0, -1, step)`` would fail the whole job with
    ILLEGAL_SEQUENCE_BOUNDARIES."""
    idx = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<bigint>"))
    return decoded.withColumn(
        "sample_frames", F.slice(idx, 1, max_frames)
    ).withColumn("n_sampled", F.size("sample_frames").cast("bigint"))


# ---- real audio codec (stdlib WAV) ----------------------------------------

WAV_META_SCHEMA = (
    "doc_id bigint, n_channels bigint, sample_width bigint, "
    "sample_rate bigint, n_frames bigint, duration_ms bigint, "
    "rms bigint, n_bytes bigint"
)


def synth_wav(doc_id: int, sample_rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV: a square wave whose length
    and amplitude derive from *doc_id* (period 16 samples), written
    with the stdlib ``wave`` module — REAL container bytes, analytic
    metadata."""
    import io
    import struct
    import wave

    n_frames = 800 + doc_id % 800
    amp = 1000 + doc_id % 9000
    frames = bytearray()
    for i in range(n_frames):
        frames += struct.pack("<h", amp if (i // 8) % 2 == 0 else -amp)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def decode_wav_meta(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "wav"
) -> DataFrame:
    """REAL audio decode — no stub: parse WAV containers with the
    stdlib ``wave`` reader and compute integer-exact signal stats
    (RMS via isqrt of the mean square, numpy int64 accumulation).
    The mapInPandas stage is the exact shape a torchaudio/ffmpeg
    decoder drops into when those libs exist; WAV proves the path
    end-to-end with genuine codec bytes."""
    import io
    import math
    import wave

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_channels", "sample_width", "sample_rate",
                "n_frames", "duration_ms", "rms", "n_bytes",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                data = bytes(blob)
                with wave.open(io.BytesIO(data)) as w:
                    nch, sw, sr = (
                        w.getnchannels(), w.getsampwidth(), w.getframerate()
                    )
                    if sr <= 0:
                        raise ValueError(f"WAV sample rate {sr} <= 0")
                    nf = w.getnframes()
                    raw = w.readframes(nf)
                # dtype must follow the container's sample width —
                # decoding 8/24/32-bit PCM as '<i2' yields garbage stats
                if sw == 1:  # 8-bit PCM is unsigned, midpoint 128
                    pcm = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
                elif sw == 2:
                    pcm = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                elif sw == 3:  # 24-bit: assemble + sign-extend
                    b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
                    pcm = (
                        b[:, 0].astype(np.int64)
                        | (b[:, 1].astype(np.int64) << 8)
                        | (b[:, 2].astype(np.int64) << 16)
                    )
                    pcm -= (pcm >> 23) << 24
                elif sw == 4:
                    pcm = np.frombuffer(raw, dtype="<i4").astype(np.int64)
                else:
                    raise ValueError(f"unsupported WAV sample width {sw}")
                sq = int((pcm * pcm).sum())
                rows["doc_id"].append(int(doc_id))
                rows["n_channels"].append(nch)
                rows["sample_width"].append(sw)
                rows["sample_rate"].append(sr)
                rows["n_frames"].append(nf)
                rows["duration_ms"].append(nf * 1000 // sr)
                rows["rms"].append(math.isqrt(sq // max(len(pcm), 1)))
                rows["n_bytes"].append(len(data))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=WAV_META_SCHEMA)


def synth_wav_frame(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real synthesized WAV binary column per id row
    (mapInPandas — the generator stands in for an object-store read)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "wav": [synth_wav(int(i)) for i in pdf[id_col]],
                }
            )

    from aistore_spark.util import spread as _spread

    return _spread(ids).mapInPandas(run, schema="doc_id bigint, wav binary")


BMP_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, bpp bigint, "
    "row_stride bigint, mean_blue bigint, mean_red bigint, n_bytes bigint"
)


def synth_bmp(doc_id: int) -> bytes:
    """Deterministic 24-bpp bottom-up BMP (BITMAPINFOHEADER): solid
    BGR color and dimensions derived from *doc_id* — REAL image
    container bytes with analytic metadata."""
    import struct

    w = 4 + doc_id % 61
    h = 4 + doc_id % 37
    b, g, r = doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256
    stride = (3 * w + 3) & ~3
    row = (bytes((b, g, r)) * w) + b"\x00" * (stride - 3 * w)
    pixels = row * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def decode_bmp_meta(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "img"
) -> DataFrame:
    """REAL image decode, no stub: parse the BMP file + info headers
    with ``struct`` and fold the pixel array (numpy, stride-aware) into
    integer-exact channel means — the mapInPandas stage a Pillow
    decoder drops into, proven here with genuine container bytes."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "bpp", "row_stride",
                "mean_blue", "mean_red", "n_bytes",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                data = bytes(blob)
                magic, _fsz, _r1, _r2, off = struct.unpack_from("<2sIHHI", data, 0)
                if magic != b"BM":
                    raise ValueError("not a BMP")
                _hsz, w, h, _pl, bpp = struct.unpack_from("<IiiHH", data, 14)
                if bpp != 24:
                    # the channel-slice math below is 3-bytes-per-pixel;
                    # decoding other depths with it would yield silently
                    # wrong means
                    raise ValueError(f"unsupported BMP bpp {bpp} (need 24)")
                stride = (bpp // 8 * w + 3) & ~3
                px = np.frombuffer(
                    data, dtype=np.uint8, count=stride * abs(h), offset=off
                ).reshape(abs(h), stride)
                blue = px[:, 0 : 3 * w : 3].astype(np.int64)
                red = px[:, 2 : 3 * w : 3].astype(np.int64)
                n = w * abs(h)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(abs(h))
                rows["bpp"].append(bpp)
                rows["row_stride"].append(stride)
                rows["mean_blue"].append(int(blue.sum()) // n)
                rows["mean_red"].append(int(red.sum()) // n)
                rows["n_bytes"].append(len(data))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=BMP_META_SCHEMA)


def synth_bmp_frame(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real synthesized BMP binary column per id row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "img": [synth_bmp(int(i)) for i in pdf[id_col]],
                }
            )

    from aistore_spark.util import spread as _spread

    return _spread(ids).mapInPandas(run, schema="doc_id bigint, img binary")


# ---- real compressed-image codec (stdlib PNG: zlib + scanline filters) ----

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

PNG_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, bit_depth bigint, "
    "color_type bigint, n_idat bigint, mean_red bigint, mean_green bigint, "
    "mean_blue bigint, n_pixels bigint"
)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_rgb(
    raw_rows: list[bytes], width: int, filters: list[int] | None = None
) -> bytes:
    """Encode raw RGB scanlines as a real 8-bit truecolor PNG.

    *raw_rows* is one ``3*width``-byte string per scanline; *filters*
    picks the spec filter type per row (default ``y % 5`` so all five
    — None/Sub/Up/Average/Paeth — appear in any image ≥5 rows tall).
    The filter math here is the encode direction of the spec;
    :func:`decode_png_meta` implements the decode direction, and the
    property test drives arbitrary pixels through both.
    """
    import struct
    import zlib

    bpp = 3
    stream = bytearray()
    prior = bytes(bpp * width)
    for y, row in enumerate(raw_rows):
        if len(row) != bpp * width:
            raise ValueError("scanline length != 3*width")
        ft = (filters[y] if filters is not None else y % 5) % 5
        stream.append(ft)
        if ft == 0:
            stream += row
        elif ft == 1:  # Sub
            stream += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(row))
            )
        elif ft == 2:  # Up
            stream += bytes(
                (row[i] - prior[i]) & 0xFF for i in range(len(row))
            )
        elif ft == 3:  # Average
            stream += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2)
                & 0xFF
                for i in range(len(row))
            )
        else:  # Paeth
            stream += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(len(row))
            )
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, len(raw_rows), 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + _png_chunk(b"IEND", b"")
    )


def synth_png(doc_id: int) -> bytes:
    """Deterministic 8-bit truecolor PNG with REAL compression and
    REAL scanline filtering: pixel (x, y) is
    ``(R, G, B) = ((doc_id + x) % 256, (3*doc_id + 7*y) % 256,
    (x + y) % 256)`` and scanline y is encoded with filter type
    ``y % 5`` — all five spec filters (None/Sub/Up/Average/Paeth) are
    exercised in every image, so a decoder that mishandles any one of
    them cannot reproduce the analytic channel sums."""
    w = 4 + doc_id % 29
    h = 5 + doc_id % 17
    raw_rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row += bytes(
                (
                    (doc_id + x) % 256,
                    (3 * doc_id + 7 * y) % 256,
                    (x + y) % 256,
                )
            )
        raw_rows.append(bytes(row))
    return encode_png_rgb(raw_rows, w)


def decode_png_pixels(data: bytes):
    """Decode a supported-profile PNG to its pixel array: CRC-verified
    chunk walk, zlib inflate, per-scanline unfilter (all five spec
    filter types). Returns ``(w, h, n_idat, int64 ndarray[h, w, 3])``.
    """
    import struct
    import zlib

    import numpy as np

    def unfilter(stream: bytes, w: int, h: int, bpp: int = 3) -> np.ndarray:
        rowlen = bpp * w
        out = np.zeros((h, rowlen), dtype=np.uint8)
        pos = 0
        for y in range(h):
            ft = stream[pos]
            pos += 1
            cur = bytearray(stream[pos : pos + rowlen])
            pos += rowlen
            if len(cur) != rowlen:
                raise ValueError("truncated PNG pixel stream")
            prior = out[y - 1] if y else np.zeros(rowlen, dtype=np.uint8)
            if ft == 0:
                pass
            elif ft == 1:  # Sub
                for i in range(bpp, rowlen):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            elif ft == 2:  # Up
                for i in range(rowlen):
                    cur[i] = (cur[i] + prior[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(rowlen):
                    left = cur[i - bpp] if i >= bpp else 0
                    cur[i] = (cur[i] + (left + int(prior[i])) // 2) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(rowlen):
                    left = cur[i - bpp] if i >= bpp else 0
                    ul = int(prior[i - bpp]) if i >= bpp else 0
                    cur[i] = (cur[i] + _paeth(left, int(prior[i]), ul)) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        return out

    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    n_idat = 0
    w = h = None
    while pos < len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        cname = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(cname + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {cname!r}")
        pos += 12 + clen
        if cname == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or inter != 0:
                raise ValueError(
                    "unsupported PNG profile (need 8-bit truecolor "
                    f"non-interlaced): depth={depth} color_type={ctype} "
                    f"interlace={inter}"
                )
        elif cname == b"IDAT":
            idat += body
            n_idat += 1
        elif cname == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    px = unfilter(zlib.decompress(bytes(idat)), w, h)
    import numpy as np

    return w, h, n_idat, px.reshape(h, w, 3).astype(np.int64)


def decode_png_meta(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "img"
) -> DataFrame:
    """REAL compressed-image decode, no stub and no image library:
    walk the chunk stream (CRC-verified), inflate IDAT with stdlib
    ``zlib``, reverse the per-scanline filters (all five spec types —
    None/Sub/Up/Average/Paeth) and fold the reconstructed truecolor
    array into integer-exact channel means. This is the mapInPandas
    stage a Pillow decoder drops into; PNG proves the compressed-format
    path end-to-end the way mm5/mm6 proved WAV/BMP.

    Supports the synthesizable profile: 8-bit truecolor (color type 2),
    non-interlaced. Anything else raises rather than mis-decoding.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "bit_depth", "color_type",
                "n_idat", "mean_red", "mean_green", "mean_blue", "n_pixels",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                w, h, n_idat, rgb = decode_png_pixels(bytes(blob))
                depth, ctype = 8, 2
                n = w * h
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["bit_depth"].append(depth)
                rows["color_type"].append(ctype)
                rows["n_idat"].append(n_idat)
                rows["mean_red"].append(int(rgb[:, :, 0].sum()) // n)
                rows["mean_green"].append(int(rgb[:, :, 1].sum()) // n)
                rows["mean_blue"].append(int(rgb[:, :, 2].sum()) // n)
                rows["n_pixels"].append(n)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=PNG_META_SCHEMA)


def synth_png_frame(
    ids: DataFrame, id_col: str = "doc_id", content_col: str | None = None
) -> DataFrame:
    """Attach a real synthesized PNG binary column per id row.
    ``content_col`` (default: the id itself) picks the column that
    seeds the PIXEL CONTENT — distinct rows can carry identical
    images, which is how near-duplicate image fixtures are built
    (mm11)."""
    src = content_col or id_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "img": [synth_png(int(i)) for i in pdf[src]],
                }
            )

    from aistore_spark.util import spread as _spread

    return _spread(ids).mapInPandas(run, schema="doc_id bigint, img binary")


# ---- real dictionary-coded image codec (stdlib GIF87a / LZW) --------------

GIF_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_colors bigint, "
    "n_frames bigint, mean_index bigint, mean_green bigint, n_pixels bigint"
)


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: variable-width codes starting at
    ``min_code_size + 1`` bits, CLEAR/END codes, dictionary reset at
    4096 — the encode direction of the public GIF87a specification."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # GIF encoders grow the width when the NEXT code to assign
            # no longer fits the current width
            width += 1
        elif next_code == 4097:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_byte(data: bytes, pos: int) -> int:
    """``data[pos]`` with the truncation contract the other hardened
    decoders establish (lz4frame, _lzw_decode): a container cut short
    raises ValueError, never a raw IndexError."""
    if pos >= len(data):
        raise ValueError("truncated GIF")
    return data[pos]


def _gif_need(data: bytes, pos: int, n: int) -> None:
    """Require *n* readable bytes at *pos* or raise ValueError."""
    if pos + n > len(data):
        raise ValueError("truncated GIF")


def _lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """LZW decode per the GIF87a spec: variable code width, CLEAR
    resets, KwKwK case, END terminates. Truncated/invalid streams
    raise ValueError."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    pos = 0
    bitbuf = 0
    bitcnt = 0

    def read(width: int) -> int:
        nonlocal pos, bitbuf, bitcnt
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            bitbuf |= data[pos] << bitcnt
            pos += 1
            bitcnt += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        return code

    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def synth_gif(doc_id: int, n_frames: int = 1) -> bytes:
    """Deterministic GIF87a with REAL LZW compression: 256-entry
    global palette where entry ``i`` is ``(i, (2*i) % 256, (7*i) %
    256)`` and frame ``f``'s pixel ``(x, y)`` holds palette index
    ``(doc_id + 3*x + 5*y + 11*f) % 256`` — analytic, so the oracle
    re-derives the decoded channel means with no reference to the
    bytes. ``n_frames > 1`` writes one full-frame image block per
    frame — a genuine multi-frame (video-shaped) container."""
    import struct

    w = 6 + doc_id % 27
    h = 4 + doc_id % 19
    palette = bytearray()
    for i in range(256):
        palette += bytes((i, (2 * i) % 256, (7 * i) % 256))
    body = bytearray()
    for f in range(n_frames):
        indices = bytes(
            (doc_id + 3 * x + 5 * y + 11 * f) % 256
            for y in range(h)
            for x in range(w)
        )
        lzw = _lzw_encode(indices)
        body += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        body.append(8)  # LZW min code size
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            body.append(len(chunk))
            body += chunk
        body.append(0)  # block terminator
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 colors
        + bytes(palette)
        + bytes(body)
        + b"\x3b"  # trailer
    )


def decode_gif_meta(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "img"
) -> DataFrame:
    """REAL dictionary-coded image decode, stdlib only: parse the
    GIF87a container (screen descriptor, global palette, image
    descriptor, sub-block stream), LZW-decode the pixel indices and
    fold them into integer-exact stats. Completes the codec matrix:
    mm5 PCM audio, mm6 raw bitmaps, mm7 DEFLATE (PNG), mm8 LZW (GIF).
    Supports the synthesizable profile (global 256-color table, single
    non-interlaced image, no extensions); anything else raises."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_colors", "n_frames",
                "mean_index", "mean_green", "n_pixels",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                data = bytes(blob)
                if data[:6] not in (b"GIF87a", b"GIF89a"):
                    raise ValueError("not a GIF")
                _gif_need(data, 6, 7)
                w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
                if not flags & 0x80:
                    raise ValueError("GIF without global color table")
                n_colors = 2 << (flags & 0x07)
                pos = 13
                _gif_need(data, pos, 3 * n_colors)
                palette = np.frombuffer(
                    data, dtype=np.uint8, count=3 * n_colors, offset=pos
                ).reshape(n_colors, 3)
                pos += 3 * n_colors
                idx_sum = 0
                g_sum = 0
                n_px = 0
                frames = 0
                iw = ih = 0
                while _gif_byte(data, pos) != 0x3B:  # until trailer
                    if data[pos] != 0x2C:
                        raise ValueError(
                            f"unsupported GIF block 0x{data[pos]:02x} "
                            "(extensions not in the synthesizable profile)"
                        )
                    _gif_need(data, pos + 1, 9)
                    _ix, _iy, iw, ih, iflags = struct.unpack_from(
                        "<HHHHB", data, pos + 1
                    )
                    if iflags & 0xC0:
                        raise ValueError("local table/interlace unsupported")
                    pos += 10
                    min_code = _gif_byte(data, pos)
                    pos += 1
                    lzw = bytearray()
                    while True:
                        blen = _gif_byte(data, pos)
                        pos += 1
                        if blen == 0:
                            break
                        _gif_need(data, pos, blen)
                        lzw += data[pos : pos + blen]
                        pos += blen
                    idx = np.frombuffer(
                        _lzw_decode(bytes(lzw), min_code), dtype=np.uint8
                    )
                    if len(idx) != iw * ih:
                        raise ValueError(
                            f"LZW output {len(idx)} != {iw}x{ih} pixels"
                        )
                    idx_sum += int(idx.astype(np.int64).sum())
                    g_sum += int(palette[idx, 1].astype(np.int64).sum())
                    n_px += iw * ih
                    frames += 1
                if frames == 0:
                    raise ValueError("GIF with no image block")
                rows["doc_id"].append(int(doc_id))
                # report the LOGICAL SCREEN dims (w, h) — per-frame
                # image blocks may legally differ in size, and the
                # last frame's iw/ih would be arbitrary
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_colors"].append(n_colors)
                rows["n_frames"].append(frames)
                rows["mean_index"].append(idx_sum // n_px)
                rows["mean_green"].append(g_sum // n_px)
                rows["n_pixels"].append(n_px)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=GIF_META_SCHEMA)


def synth_gif_frame(
    ids: DataFrame, id_col: str = "doc_id", n_frames_of=None
) -> DataFrame:
    """Attach a real synthesized GIF binary column per id row;
    ``n_frames_of(doc_id)`` makes them animated (multi-frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "img": [
                        synth_gif(
                            int(i),
                            n_frames=(
                                n_frames_of(int(i)) if n_frames_of else 1
                            ),
                        )
                        for i in pdf[id_col]
                    ],
                }
            )

    from aistore_spark.util import spread as _spread

    return _spread(ids).mapInPandas(run, schema="doc_id bigint, img binary")


# ---- real media-type dispatch (the decode_media contract, no stub) --------

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, width bigint, height bigint, "
    "n_frames bigint"
)


def sniff_media_type(data: bytes) -> str:
    """Magic-byte container sniff — the reference's mime detection
    applied to media (cmn/archive/mime.go does the same for shards)."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:8] == PNG_SIGNATURE:
        return "image/png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    raise ValueError(f"unknown media container (magic {data[:8]!r})")


def synth_media_frame(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Mixed-media corpus: each id gets a REAL container chosen by
    ``doc_id % 4`` — WAV audio, BMP, PNG, or an ANIMATED multi-frame
    GIF (``1 + doc_id % 5`` frames — the video-shaped case)."""

    def one(doc_id: int) -> bytes:
        k = doc_id % 4
        if k == 0:
            return synth_wav(doc_id)
        if k == 1:
            return synth_bmp(doc_id)
        if k == 2:
            return synth_png(doc_id)
        return synth_gif(doc_id, n_frames=1 + doc_id % 5)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "data": [one(int(i)) for i in pdf[id_col]],
                }
            )

    from aistore_spark.util import spread as _spread

    return _spread(ids).mapInPandas(run, schema="doc_id bigint, data binary")


def decode_media_meta(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """The ``decode_media`` contract with NO stub: sniff the container
    by magic bytes and extract typed metadata with the real parsers —
    WAV header (PCM frame count = the audio "n_frames"), BMP header,
    PNG IHDR (CRC-verified), GIF block walk counting image frames
    (animated GIFs are the multi-frame/video case). This is the
    dispatch layer a mixed-media lake needs before routing content to
    the per-format pixel/sample decoders (mm5-mm8)."""
    import io
    import struct
    import wave
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "media_type", "width", "height", "n_frames",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                data = bytes(blob)
                mt = sniff_media_type(data)
                if mt == "audio/wav":
                    with wave.open(io.BytesIO(data)) as w:
                        width, height, frames = 0, 0, w.getnframes()
                elif mt == "image/bmp":
                    _hsz, bw, bh, _pl, _bpp = struct.unpack_from(
                        "<IiiHH", data, 14
                    )
                    width, height, frames = bw, abs(bh), 1
                elif mt == "image/jpeg":
                    from aistore_spark.functions.jpegcodec import jpeg_dims

                    width, height, _nc = jpeg_dims(data)
                    frames = 1
                elif mt == "image/png":
                    (clen,) = struct.unpack_from(">I", data, 8)
                    cname = data[12:16]
                    body = data[16 : 16 + clen]
                    (crc,) = struct.unpack_from(">I", data, 16 + clen)
                    if cname != b"IHDR" or (
                        zlib.crc32(cname + body) & 0xFFFFFFFF
                    ) != crc:
                        raise ValueError("bad PNG IHDR")
                    pw, ph = struct.unpack_from(">II", body, 0)
                    width, height, frames = pw, ph, 1
                else:  # image/gif — walk blocks, count frames
                    _gif_need(data, 0, 13)
                    flags = data[10]
                    pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
                    gw, gh = struct.unpack_from("<HH", data, 6)
                    frames = 0
                    while _gif_byte(data, pos) != 0x3B:
                        if data[pos] != 0x2C:
                            raise ValueError("unsupported GIF block")
                        _gif_need(data, pos, 11)
                        pos += 10
                        pos += 1  # min code size
                        while True:
                            blen = _gif_byte(data, pos)
                            pos += 1
                            if blen == 0:
                                break
                            _gif_need(data, pos, blen)
                            pos += blen
                        frames += 1
                    width, height = gw, gh
                rows["doc_id"].append(int(doc_id))
                rows["media_type"].append(mt)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["n_frames"].append(frames)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


# ---- REAL resize and frame extraction over the decoded codecs -------------

THUMB_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, rs_width bigint, "
    "rs_height bigint, rs_mean_red bigint, rs_mean_green bigint, "
    "rs_mean_blue bigint"
)


def png_thumbnail(
    df: DataFrame,
    target_w: int = 7,
    target_h: int = 5,
    id_col: str = "doc_id",
    data_col: str = "img",
) -> DataFrame:
    """REAL resize, no stub: decode the PNG pixels (full unfilter
    path) and nearest-neighbor-resample to ``target_w x target_h`` —
    thumbnail pixel ``(u, v)`` is source pixel ``(u*w div W,
    v*h div H)``, the canonical floor mapping, so the result is
    bit-exact reproducible and the oracle can re-derive the thumbnail
    channel means straight from the source pixel formula."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "rs_width", "rs_height",
                "rs_mean_red", "rs_mean_green", "rs_mean_blue",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                w, h, _n, rgb = decode_png_pixels(bytes(blob))
                ux = np.array([u * w // target_w for u in range(target_w)])
                vy = np.array([v * h // target_h for v in range(target_h)])
                thumb = rgb[np.ix_(vy, ux)]
                n = target_w * target_h
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["rs_width"].append(target_w)
                rows["rs_height"].append(target_h)
                rows["rs_mean_red"].append(int(thumb[:, :, 0].sum()) // n)
                rows["rs_mean_green"].append(int(thumb[:, :, 1].sum()) // n)
                rows["rs_mean_blue"].append(int(thumb[:, :, 2].sum()) // n)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=THUMB_SCHEMA)


FRAME_EXTRACT_SCHEMA = (
    "doc_id bigint, n_frames bigint, frame_idx bigint, mean_index bigint"
)


def gif_extract_frames(
    df: DataFrame,
    every_n: int = 2,
    max_frames: int = 3,
    id_col: str = "doc_id",
    data_col: str = "img",
) -> DataFrame:
    """REAL frame sampling + extraction, no stub: walk the animated
    GIF's image blocks, LZW-DECODE ONLY the sampled frames (indices
    ``0, every_n, 2*every_n, ...`` capped at *max_frames* — the mm4
    sampling plan) and skip the rest at sub-block speed without
    decoding — the selective-decode pattern a video pipeline needs.
    One output row per (doc, sampled frame) with the frame's exact
    mean palette index."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_frames", "frame_idx", "mean_index",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                data = bytes(blob)
                if data[:6] not in (b"GIF87a", b"GIF89a"):
                    raise ValueError("not a GIF")
                _gif_need(data, 0, 13)
                flags = data[10]
                pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
                frames: list[tuple[int, int]] = []  # (mean, n) per sampled
                f = 0
                while _gif_byte(data, pos) != 0x3B:
                    if data[pos] != 0x2C:
                        raise ValueError("unsupported GIF block")
                    _gif_need(data, pos + 1, 9)
                    _ix, _iy, iw, ih, _fl = struct.unpack_from(
                        "<HHHHB", data, pos + 1
                    )
                    pos += 10
                    min_code = _gif_byte(data, pos)
                    pos += 1
                    wanted = (f % every_n == 0) and (
                        f // every_n < max_frames
                    )
                    lzw = bytearray()
                    while True:
                        blen = _gif_byte(data, pos)
                        pos += 1
                        if blen == 0:
                            break
                        _gif_need(data, pos, blen)
                        if wanted:
                            lzw += data[pos : pos + blen]
                        pos += blen  # skipped frames: no decode at all
                    if wanted:
                        idx = np.frombuffer(
                            _lzw_decode(bytes(lzw), min_code), dtype=np.uint8
                        )
                        frames.append(
                            (f, int(idx.astype(np.int64).sum()) // (iw * ih))
                        )
                    f += 1
                for fi, mean in frames:
                    rows["doc_id"].append(int(doc_id))
                    rows["n_frames"].append(f)
                    rows["frame_idx"].append(fi)
                    rows["mean_index"].append(mean)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_EXTRACT_SCHEMA)


GRID_FEATURE_SCHEMA = (
    "doc_id bigint, qx bigint, qy bigint, n_px bigint, "
    "mean_red bigint, mean_green bigint, mean_blue bigint"
)


def png_grid_features(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "img"
) -> DataFrame:
    """REAL feature extraction, no stub: 2x2 block-grid channel
    pooling over genuinely decoded PNG pixels (spatial-pyramid level-1
    — the classic hand-crafted image descriptor a learned embedding
    replaces). One row per (doc, grid cell) with exact integer channel
    means; cell of pixel (x, y) is ``(2x div w, 2y div h)``."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "qx", "qy", "n_px",
                "mean_red", "mean_green", "mean_blue",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                w, h, _n, rgb = decode_png_pixels(bytes(blob))
                qx = (2 * np.arange(w)) // w
                qy = (2 * np.arange(h)) // h
                for gy in (0, 1):
                    for gx in (0, 1):
                        cell = rgb[np.ix_(qy == gy, qx == gx)]
                        n = cell.shape[0] * cell.shape[1]
                        if n == 0:
                            continue
                        rows["doc_id"].append(int(doc_id))
                        rows["qx"].append(gx)
                        rows["qy"].append(gy)
                        rows["n_px"].append(n)
                        rows["mean_red"].append(int(cell[:, :, 0].sum()) // n)
                        rows["mean_green"].append(int(cell[:, :, 1].sum()) // n)
                        rows["mean_blue"].append(int(cell[:, :, 2].sum()) // n)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=GRID_FEATURE_SCHEMA)


TRANSCODE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, png_bytes bigint, "
    "mean_red bigint, mean_green bigint, mean_blue bigint"
)


def transcode_bmp_to_png(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "img"
) -> DataFrame:
    """REAL media transcode, no stub: parse the BMP (stride-aware,
    bottom-up, BGR), re-encode the pixel array as a genuine PNG
    (deflate + scanline filters via :func:`encode_png_rgb`), then
    decode the PNG BACK and report its exact channel means — the
    round trip proves both codec directions on the same bytes, which
    is the image-ETL transform surface (the reference's transform
    templates re-encode media the same way). ``png_bytes`` is the real
    compressed size (not oracle-checkable; the means are)."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "png_bytes",
                "mean_red", "mean_green", "mean_blue",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                data = bytes(blob)
                magic, _fsz, _r1, _r2, off = struct.unpack_from("<2sIHHI", data, 0)
                if magic != b"BM":
                    raise ValueError("not a BMP")
                _hsz, w, h, _pl, bpp = struct.unpack_from("<IiiHH", data, 14)
                if bpp != 24:
                    raise ValueError(f"unsupported BMP bpp {bpp}")
                stride = (3 * w + 3) & ~3
                px = np.frombuffer(
                    data, dtype=np.uint8, count=stride * abs(h), offset=off
                ).reshape(abs(h), stride)
                bgr = px[:, : 3 * w].reshape(abs(h), w, 3)
                if h > 0:  # bottom-up: flip to top-down
                    bgr = bgr[::-1]
                rgb = bgr[:, :, ::-1]  # BGR -> RGB
                raw_rows = [bytes(rgb[y].reshape(-1)) for y in range(abs(h))]
                png = encode_png_rgb(raw_rows, w)
                pw, ph, _n, back = decode_png_pixels(png)
                n = pw * ph
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(pw)
                rows["height"].append(ph)
                rows["png_bytes"].append(len(png))
                rows["mean_red"].append(int(back[:, :, 0].sum()) // n)
                rows["mean_green"].append(int(back[:, :, 1].sum()) // n)
                rows["mean_blue"].append(int(back[:, :, 2].sum()) // n)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=TRANSCODE_SCHEMA)


# ---- real lossy-DCT image codec (baseline JFIF) ---------------------------

JPEG_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_components bigint, "
    "n_blocks bigint, restart_interval bigint, q00_luma bigint, "
    "mean_y bigint, mean_cb bigint, mean_cr bigint"
)


def synth_jpeg_frame(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real synthesized baseline-JFIF binary column per id
    row (mapInPandas — the generator stands in for an object-store
    read of a JPEG shard)."""
    from aistore_spark.functions.jpegcodec import synth_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "img": [synth_jpeg(int(i)) for i in pdf[id_col]],
                }
            )

    from aistore_spark.util import spread as _spread

    return _spread(ids).mapInPandas(run, schema="doc_id bigint, img binary")


def decode_jpeg_meta(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "img"
) -> DataFrame:
    """REAL lossy-DCT image decode, no stub and no image library: full
    baseline-JFIF pipeline (marker walk, file-carried DQT/DHT,
    canonical Huffman decode with byte unstuffing + restart markers,
    DC prediction, dequant, un-zigzag, IDCT) and integer-exact channel
    means over the decoded pixels. Completes the codec matrix with the
    lossy transform family: PCM (mm5), raw bitmap (mm6), DEFLATE/PNG
    (mm7), LZW/GIF (mm8), DCT/JPEG (mm10) — the container the
    reference's torchvision/keras image ETL actually transforms
    (python/aistore/sdk/etl/etl_templates.py)."""
    from aistore_spark.functions.jpegcodec import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_components", "n_blocks",
                "restart_interval", "q00_luma", "mean_y", "mean_cb",
                "mean_cr",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                info, planes = decode_jpeg(bytes(blob))
                means = [
                    int(p.astype(np.int64).sum()) // p.size for p in planes
                ]
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(info["width"])
                rows["height"].append(info["height"])
                rows["n_components"].append(info["n_components"])
                rows["n_blocks"].append(info["n_blocks"])
                rows["restart_interval"].append(info["restart_interval"])
                # file-carried luma Q00 from the parsed DQT — the
                # oracle recomputes it from the quality-scaling closed
                # form, pinning the DQT round trip
                rows["q00_luma"].append(info["q00_luma"])
                rows["mean_y"].append(means[0])
                rows["mean_cb"].append(means[1] if len(means) > 1 else -1)
                rows["mean_cr"].append(means[2] if len(means) > 1 else -1)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=JPEG_META_SCHEMA)


# ---- real rational audio resample (the ffmpeg_audio surface) --------------

RESAMPLE_SCHEMA = (
    "doc_id bigint, src_rate bigint, dst_rate bigint, n_frames_in bigint, "
    "n_frames_out bigint, first_out bigint, last_out bigint, "
    "rms_out bigint, n_bytes bigint"
)


def resample_pcm(pcm, src_rate: int, dst_rate: int):
    """Integer-exact rational resample (linear interpolation) of a
    mono int PCM array from *src_rate* to *dst_rate*.

    Contract: ratio reduced to P/Q; output length ``n_in*P // Q``;
    ``out[j] = trunc((in[i]*(P-r) + in[i+1]*r) / P)`` with
    ``i = j*Q // P``, ``r = j*Q % P`` and the tail clamped to the last
    sample. Division TRUNCATES TOWARD ZERO — the semantics of SQL
    integer division in both Spark and DuckDB — so the whole resampler
    has a closed form an oracle can recompute (numpy floor-division
    alone would floor negatives and drift by 1)."""
    import math

    import numpy as np

    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError("sample rates must be positive")
    pcm = np.asarray(pcm, dtype=np.int64)
    g = math.gcd(src_rate, dst_rate)
    p, q = dst_rate // g, src_rate // g
    n_in = len(pcm)
    n_out = n_in * p // q
    j = np.arange(n_out, dtype=np.int64)
    pos = j * q
    i = pos // p
    r = pos - i * p
    i2 = np.minimum(i + 1, max(n_in - 1, 0))
    num = pcm[i] * (p - r) + pcm[i2] * r
    return np.sign(num) * (np.abs(num) // p)


def resample_wav_bytes(data: bytes, dst_rate: int) -> bytes:
    """Decode a 16-bit mono WAV, resample (resample_pcm), and re-encode
    a REAL container at the target rate — the ffmpeg -ar analogue as a
    bytes->bytes transform (pluggable into the canned-ETL registry)."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("resample profile: 16-bit mono PCM")
        src = w.getframerate()
        pcm_raw = w.readframes(w.getnframes())
    import numpy as np

    pcm = np.frombuffer(pcm_raw, dtype="<i2")
    out = resample_pcm(pcm, src, dst_rate)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as ww:
        ww.setnchannels(1)
        ww.setsampwidth(2)
        ww.setframerate(dst_rate)
        ww.writeframes(out.astype("<i2").tobytes())
    return buf.getvalue()


def resample_wav(
    df: DataFrame,
    dst_rate_of=None,
    id_col: str = "doc_id",
    data_col: str = "wav",
) -> DataFrame:
    """REAL audio resample stage, no stub: decode the WAV container,
    rational linear-interp resample (integer-exact, see resample_pcm),
    re-encode a genuine WAV at the target rate, then decode THAT
    container back for the reported stats — so container write, rate
    change, and sample math are all on the verified path.
    ``dst_rate_of(doc_id)`` picks the per-row target (up- and
    down-sampling in one pass)."""
    import io
    import math
    import wave

    import numpy as np

    dst_rate_of = dst_rate_of or (lambda d: 16000)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "src_rate", "dst_rate", "n_frames_in",
                "n_frames_out", "first_out", "last_out", "rms_out",
                "n_bytes",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                data = bytes(blob)
                with wave.open(io.BytesIO(data)) as w:
                    src, n_in = w.getframerate(), w.getnframes()
                dst = dst_rate_of(int(doc_id))
                enc = resample_wav_bytes(data, dst)
                with wave.open(io.BytesIO(enc)) as w2:
                    if w2.getframerate() != dst:
                        raise ValueError("re-encoded rate drifted")
                    back = np.frombuffer(
                        w2.readframes(w2.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                n_out = len(back)
                rows["doc_id"].append(int(doc_id))
                rows["src_rate"].append(src)
                rows["dst_rate"].append(dst)
                rows["n_frames_in"].append(n_in)
                rows["n_frames_out"].append(n_out)
                rows["first_out"].append(int(back[0]) if n_out else 0)
                rows["last_out"].append(int(back[-1]) if n_out else 0)
                rows["rms_out"].append(
                    math.isqrt(int((back * back).sum()) // max(n_out, 1))
                )
                rows["n_bytes"].append(len(enc))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=RESAMPLE_SCHEMA)


DHASH_SCHEMA = "doc_id bigint, band int, val bigint"


def png_dhash(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "img"
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REALLY-decoded PNG
    pixels: nearest-neighbor-resample to a 9x8 grid (the canonical
    ``u*w div 9`` floor mapping, same contract as png_thumbnail),
    integer BT.601 luminance ``(299R + 587G + 114B) div 1000``, one
    bit per horizontally-adjacent comparison ``gray(u+1,v) >
    gray(u,v)`` — 64 bits held as FOUR 16-bit band values (long form
    ``(doc_id, band, val)``), which keeps every value unsigned-exact
    in a BIGINT and is already the shape the LSH band join wants.

    Scale: Arrow-batched mapInPandas decode (the only Python stage);
    everything downstream is band-keyed DataFrame joins. The input
    is spread() so single-row-group fixtures still decode on all
    cores (no-op on naturally-split data).
    """
    import numpy as np

    from aistore_spark.util import spread

    df = spread(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "band": [], "val": []}
            for doc_id, blob in zip(pdf[id_col], pdf[data_col]):
                w, h, _n, rgb = decode_png_pixels(bytes(blob))
                ux = np.array([u * w // 9 for u in range(9)])
                vy = np.array([v * h // 8 for v in range(8)])
                sample = rgb[np.ix_(vy, ux)]
                gray = (
                    299 * sample[:, :, 0]
                    + 587 * sample[:, :, 1]
                    + 114 * sample[:, :, 2]
                ) // 1000
                bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64)
                flat = bits.reshape(-1)  # idx = v*8 + u, row-major
                for band in range(4):
                    val = 0
                    for i in range(16):
                        val |= int(flat[band * 16 + i]) << i
                    out["doc_id"].append(int(doc_id))
                    out["band"].append(band)
                    out["val"].append(val)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=DHASH_SCHEMA)


def dhash_pairs(bands: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs from dHash bands: candidates share
    at least one identical 16-bit band (pigeonhole: any pair within
    Hamming distance 3 of a 4-band 64-bit hash must agree on >= 1
    band — the same banding argument as simhash_pairs), then the
    EXACT Hamming distance is verified band-wise
    (``bit_count(xor)``) and thresholded.

    Returns ``(doc_a, doc_b, hamming)`` with doc_a < doc_b. Scale:
    the candidate join keys on (band, val) — selective by
    construction; the verify join re-keys the (small) candidate set
    by doc id. No all-pairs product anywhere.

    The bands frame is PINNED (r16, guide §2.4): four plan branches
    consume it (both candidate sides + both verify sides), and
    upstream sits the full Arrow-batched PNG decode — without the pin
    the decode executed once per branch. The cache is one short row
    per (image, band).
    """
    from aistore_spark.util import pin

    bands = pin(bands)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "val")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "val")
    cand = (
        a.join(b, ["band", "val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    xa = bands.select(F.col("doc_id").alias("doc_a"), "band", F.col("val").alias("va"))
    xb = bands.select(F.col("doc_id").alias("doc_b"), "band", F.col("val").alias("vb"))
    return (
        cand.join(xa, "doc_a")
        .join(xb, ["doc_b", "band"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.bit_count(F.col("va").bitwiseXOR(F.col("vb"))))
            .cast("bigint")
            .alias("hamming")
        )
        .where(F.col("hamming") <= max_hamming)
    )
