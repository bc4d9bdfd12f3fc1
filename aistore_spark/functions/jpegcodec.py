"""Baseline JFIF (JPEG) encode/decode in pure numpy + stdlib.

The reference's image-ETL surface is torchvision/keras transforms over
JPEG shards (``python/aistore/sdk/etl/etl_templates.py:3-380``); this
module supplies the codec layer those transforms assume, with zero
image-library dependencies, in the style of the repo's PNG
(``multimodal.decode_png_meta``) and GIF/LZW codecs: a deterministic
synthesizer producing REAL baseline JFIF containers, and a general
decoder that does the full pipeline — marker walk, DQT/DHT parse,
canonical Huffman decode with byte unstuffing and restart markers, DC
prediction, dequantization, un-zigzag, float IDCT, level shift.

Spec profile (ITU-T T.81 baseline sequential DCT):

- SOF0 only (progressive/hierarchical raise), 8-bit precision,
  YCbCr 4:4:4 interleaved (all sampling factors 1x1) or grayscale.
- Quantization and Huffman tables are FILE-CARRIED (DQT/DHT), as the
  spec requires — the Annex K tables are informative examples only, so
  the synthesizer emits its own deterministic monotone quant tables
  and complete canonical Huffman tables (every DC category 0-11,
  every AC (run,size) symbol incl. ZRL and EOB). The decoder reads
  whatever tables the container declares; nothing is hardcoded.
- Byte stuffing (FF 00), DRI/RSTn restart intervals with predictor
  reset and 1-padding to byte boundaries.

Integer-exactness contract (what the oracle pins): rounding after the
IDCT is ``floor(x + 0.5 + 1e-6)`` — round-half-up with a boundary
nudge three orders above the float IDCT's ~1e-12 error, so a
coefficient landing exactly on a representable .5 boundary rounds
deterministically up. For a DC-only block (constant color) the decoded
value is therefore EXACTLY ``clamp(0, 255, (qdc*Q00 + 4) // 8 + 128)``
with ``qdc = (2*dc + Q00) // (2*Q00)`` for the non-negative ``dc =
8*(v-128)`` the synthesizer emits — a closed form DuckDB can compute.

Truncated or out-of-profile containers raise ``ValueError`` (the same
contract as lz4frame/_lzw_decode/PNG).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- shared constants -----------------------------------------------------


def zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) coordinates in JPEG zigzag scan order,
    generated (not memorized): diagonal s = r+c; odd diagonals walk
    down-left (row ascending), even diagonals up-right."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        out.extend(diag if s % 2 else reversed(diag))
    return out


ZIGZAG = zigzag_order()

#: forward DCT-II matrix M (orthonormal): F = M f M^T, f = M^T F M
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def base_quant_table(component: int) -> np.ndarray:
    """Deterministic monotone 8x8 base tables (natural order).
    Q00 is 16 (luma) / 17 (chroma) — the only entry the constant-block
    analytic oracle depends on; the rest grow with frequency like any
    visually-weighted table."""
    r, c = np.mgrid[0:8, 0:8]
    if component == 0:
        return (16 + 3 * r + 2 * c).astype(np.int64)
    return (17 + 2 * r + 3 * c).astype(np.int64)


def scaled_quant_table(component: int, quality: int) -> np.ndarray:
    """libjpeg-style linear quality scaling, integer-exact:
    scale = 5000//q (q<50) else 200-2q; Q = clamp(1,255,(base*scale+50)//100)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} out of [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base_quant_table(component) * scale + 50) // 100
    return np.clip(q, 1, 255)


# ---- canonical Huffman tables ---------------------------------------------


def _dc_table_spec() -> tuple[list[int], list[int]]:
    """(BITS, HUFFVAL) for DC: 12 categories (0-11) all at length 4 —
    canonical codes 0000..1011; the all-ones code stays unused as the
    spec requires (padding bits must not decode)."""
    bits = [0] * 16
    bits[3] = 12  # index 3 => code length 4
    return bits, list(range(12))


def _ac_table_spec() -> tuple[list[int], list[int]]:
    """(BITS, HUFFVAL) for AC: the complete symbol set — EOB (0x00),
    every (run 0-15, size 1-10), ZRL (0xF0) — 162 symbols, all at
    length 8 (162 < 255, so 11111111 stays unused)."""
    bits = [0] * 16
    bits[7] = 162
    vals = [0x00]
    for run in range(16):
        for size in range(1, 11):
            if (run << 4 | size) != 0xF0:
                vals.append(run << 4 | size)
    vals.append(0xF0)
    return bits, vals


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for li, n in enumerate(bits):
        for _ in range(n):
            codes[vals[k]] = (code, li + 1)
            code += 1
            k += 1
        code <<= 1
    return codes


def _canonical_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decode direction."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ---- bit I/O with byte stuffing -------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


class _BitReader:
    """MSB-first reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        return v

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(value: int, size: int) -> int:
    """T.81 EXTEND: map the raw *size*-bit field to its signed value."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(value: int) -> int:
    return int(value).bit_length() if value >= 0 else int(-value).bit_length()


# ---- encoder --------------------------------------------------------------


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    """Forward DCT + quantize + entropy-code one 8x8 block; returns the
    new DC predictor."""
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.floor(f / quant + 0.5 + 1e-6).astype(np.int64)
    zz = np.array([q[r, c] for r, c in ZIGZAG], dtype=np.int64)

    diff = int(zz[0]) - pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    writer.put(code, length)
    if cat:
        writer.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)

    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            code, length = ac_codes[0x00]  # EOB
            writer.put(code, length)
            break
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            writer.put(code, length)
            run -= 16
        v = int(zz[k])
        size = _category(v)
        if size > 10:
            raise ValueError(f"AC coefficient {v} exceeds size-10 profile")
        code, length = ac_codes[run << 4 | size]
        writer.put(code, length)
        writer.put(v if v >= 0 else v + (1 << size) - 1, size)
        k += 1
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg(
    planes: list[np.ndarray], quality: int = 75, restart_interval: int = 0
) -> bytes:
    """Encode 1 (grayscale) or 3 (YCbCr 4:4:4) uint8 planes of equal
    shape (h, w), h and w multiples of 8, into a baseline JFIF blob.

    Bound: the shipped Annex-K-style AC Huffman table carries
    categories 1-10 only. At quality 99-100 the quant entries clamp to
    1, and extreme high-contrast content (e.g. a full-amplitude
    checkerboard) can produce |AC| >= 1024 (category 11), which raises
    ValueError rather than emitting an undecodable symbol. Quality
    <= 98, or any natural-image content, never hits it."""
    n_comp = len(planes)
    if n_comp not in (1, 3):
        raise ValueError("1 or 3 planes")
    h, w = planes[0].shape
    if h % 8 or w % 8 or any(p.shape != (h, w) for p in planes):
        raise ValueError("planes must share (h, w) with 8-aligned dims")

    quants = [scaled_quant_table(min(ci, 1), quality) for ci in range(n_comp)]
    dc_spec, ac_spec = _dc_table_spec(), _ac_table_spec()
    dc_codes = _canonical_codes(*dc_spec)
    ac_codes = _canonical_codes(*ac_spec)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in range(min(n_comp, 2)):
        zzq = bytes(int(quants[tid][r, c]) for r, c in ZIGZAG)
        out += _seg(0xFFDB, bytes([tid]) + zzq)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += _seg(0xFFC0, sof)
    for cls in (0, 1):
        for tid in range(min(n_comp, 2)):
            bits, vals = (dc_spec, ac_spec)[cls]
            out += _seg(
                0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
            )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        tid = min(ci, 1)
        sos += bytes([ci + 1, tid << 4 | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    writer = _BitWriter()
    preds = [0] * n_comp
    mcu = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.pad_to_byte()
                out += writer.out
                writer = _BitWriter()
                rst = (mcu // restart_interval - 1) % 8
                out += bytes([0xFF, 0xD0 + rst])
                preds = [0] * n_comp
            for ci in range(n_comp):
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(
                    writer, block, quants[min(ci, 1)], dc_codes, ac_codes,
                    preds[ci],
                )
            mcu += 1
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder --------------------------------------------------------------


def _need(data: bytes, pos: int, n: int) -> None:
    if pos + n > len(data):
        raise ValueError("truncated JPEG")


def decode_jpeg(data: bytes) -> tuple[dict, list[np.ndarray]]:
    """Decode a baseline JFIF blob -> (info, planes).

    info: width, height, n_components, quality-independent header
    facts (restart_interval, n_blocks). planes: uint8 (h, w) per
    component. Fully table-driven: quant + Huffman tables come from
    the container's DQT/DHT segments."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, qtab)]), set by SOF0
    scan_tabs: list[tuple[int, int]] = []

    while True:
        _need(data, pos, 2)
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while data[pos + 1] == 0xFF:  # T.81 B.1.1.2 fill bytes
            pos += 1
            _need(data, pos, 2)
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data before EOI")
        if 0xC1 <= marker <= 0xCF and marker != 0xC4:
            raise ValueError("only baseline SOF0 is supported")
        _need(data, pos, 2)
        (seglen,) = struct.unpack_from(">H", data, pos)
        _need(data, pos, seglen)
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if len(body) < bp + 65:
                    raise ValueError("truncated JPEG")
                t = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(ZIGZAG):
                    t[r, c] = body[bp + 1 + i]
                quants[tq] = t
                bp += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                cls, tid = body[bp] >> 4, body[bp] & 15
                if len(body) < bp + 17:
                    raise ValueError("truncated JPEG")
                bits = list(body[bp + 1 : bp + 17])
                n = sum(bits)
                if len(body) < bp + 17 + n:
                    raise ValueError("truncated JPEG")
                vals = list(body[bp + 17 : bp + 17 + n])
                huff[(cls, tid)] = _canonical_decoder(bits, vals)
                bp += 17 + n
        elif marker == 0xC0:  # SOF0
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("only 1x1 sampling (4:4:4) supported")
                comps.append((cid, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tabs = [
                (body[2 + 2 * ci] >> 4, body[2 + 2 * ci] & 15)
                for ci in range(ns)
            ]
            break
        # APPn/COM and other tables: skipped (already consumed)

    fh, fw, comps = frame
    if fh % 8 or fw % 8:
        raise ValueError("non-8-aligned dims out of the synthesis profile")
    n_comp = len(comps)

    # split the entropy-coded data into restart segments, unstuffed
    segments: list[bytes] = []
    cur = bytearray()
    while True:
        _need(data, pos, 1)
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        _need(data, pos, 2)
        m = data[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        elif m == 0xD9:
            segments.append(bytes(cur))
            pos += 2
            break
        else:
            raise ValueError(f"unexpected marker FF{m:02x} in scan")

    planes = [np.zeros((fh, fw), dtype=np.uint8) for _ in range(n_comp)]
    mcus = [(by, bx) for by in range(fh // 8) for bx in range(fw // 8)]
    per_seg = restart_interval or len(mcus)
    expected_segs = -(-len(mcus) // per_seg)
    if len(segments) != expected_segs:
        raise ValueError(
            f"restart segmentation mismatch: {len(segments)} != {expected_segs}"
        )

    mi = 0
    for seg in segments:
        reader = _BitReader(seg)
        preds = [0] * n_comp
        for by, bx in mcus[mi : mi + per_seg]:
            for ci in range(n_comp):
                dc_tab = huff.get((0, scan_tabs[ci][0]))
                ac_tab = huff.get((1, scan_tabs[ci][1]))
                quant = quants.get(comps[ci][1])
                if dc_tab is None or ac_tab is None or quant is None:
                    raise ValueError("scan references undeclared table")
                zz = np.zeros(64, dtype=np.int64)
                cat = reader.read_huffman(dc_tab)
                diff = _extend(reader.read(cat), cat) if cat else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = reader.read_huffman(ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 15
                    k += run
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(reader.read(size), size)
                    k += 1
                coef = np.zeros((8, 8), dtype=np.float64)
                for i, (r, c) in enumerate(ZIGZAG):
                    coef[r, c] = zz[i] * quant[r, c]
                px = _C.T @ coef @ _C + 128.0
                # boundary-nudged round-half-up (see module docstring)
                px = np.floor(px + 0.5 + 1e-6)
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    px, 0, 255
                ).astype(np.uint8)
            mi += 1

    info = {
        "width": fw,
        "height": fh,
        "n_components": n_comp,
        "n_blocks": (fh // 8) * (fw // 8),
        "restart_interval": restart_interval,
        # the DQT actually carried by the file — lets a caller (and the
        # oracle) pin the quality-scaling round trip from decoded facts
        "q00_luma": int(quants[comps[0][1]][0, 0]),
    }
    return info, planes


# ---- deterministic synthesis (the oracle-checkable profile) ---------------


def synth_jpeg(doc_id: int) -> bytes:
    """A real baseline JFIF parameterized by doc_id: YCbCr 4:4:4,
    per-8x8-block CONSTANT planes (so every block is DC-only and the
    decoded pixels have the closed form the oracle recomputes),
    ``quality = 50 + doc_id % 45``, restart interval 4 on even ids.

    Block value for component c at scan index bi:
    ``v = 128 + (doc_id*7 + bi*13 + c*29) % 100`` — always >= 128, so
    the quantized DC is non-negative and round-half-up has a pure
    integer form."""
    bx = 2 + doc_id % 5
    by = 1 + doc_id % 4
    quality = 50 + doc_id % 45
    dri = 4 if doc_id % 2 == 0 else 0
    planes = []
    for c in range(3):
        plane = np.zeros((by * 8, bx * 8), dtype=np.uint8)
        for yy in range(by):
            for xx in range(bx):
                bi = yy * bx + xx
                v = 128 + (doc_id * 7 + bi * 13 + c * 29) % 100
                plane[yy * 8 : yy * 8 + 8, xx * 8 : xx * 8 + 8] = v
        planes.append(plane)
    return encode_jpeg(planes, quality=quality, restart_interval=dri)


def jpeg_dims(data: bytes) -> tuple[int, int, int]:
    """Header-only parse: walk markers to SOF0 and return (width,
    height, n_components) without entropy-decoding — what a dispatch/
    listing stage needs at object-catalog speed."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while True:
        _need(data, pos, 4)
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while data[pos + 1] == 0xFF:  # T.81 B.1.1.2 fill bytes
            pos += 1
            _need(data, pos, 4)
        marker = data[pos + 1]
        if marker == 0xC0:
            _need(data, pos, 9)
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", data, pos + 4)
            return fw, fh, nc
        if 0xC1 <= marker <= 0xCF and marker != 0xC4:
            raise ValueError("only baseline SOF0 is supported")
        if marker in (0xD9, 0xDA):
            raise ValueError("no SOF0 before scan/EOI")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        _need(data, pos + 2, seglen)
        pos += 2 + seglen
