"""Pure-Python LZ4 frame codec.

The reference lists TAR.LZ4 as a first-class shard MIME
(``cmn/archive/mime.go:25-29``); this runtime has no lz4 binding, so
the format is re-implemented from the public specifications
(lz4_Block_format.md / lz4_Frame_format.md, BSD-licensed spec text —
no code copied). Compression is a greedy single-probe matcher — not
the reference encoder's parsing, but it produces spec-valid streams
any LZ4 decoder accepts, and :func:`decompress` accepts streams from
any spec-conforming encoder (tested against the ``lz4`` binding when
present).

Determinism: a given input always yields the same frame bytes here
(fixed block size, fixed matcher), which the archive-size oracles rely
on — a native binding's output can drift across library versions.
"""

from __future__ import annotations

import struct

MAGIC = 0x184D2204
_SKIP_MIN, _SKIP_MAX = 0x184D2A50, 0x184D2A5F

# xxHash32 primes (public spec; the frame header checksum needs xxh32)
_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 re-implemented from the public algorithm description."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            a, b, c, d = struct.unpack_from("<4I", data, i)
            v1 = (_rotl32((v1 + a * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + b * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + c * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + d * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + k * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---- block format --------------------------------------------------------

_MIN_MATCH = 4
# spec: the last match must start >= 12 bytes before block end, and the
# last 5 bytes are always literals
_MFLIMIT = 12
_LAST_LITERALS = 5
_HASH_LOG = 16


def _write_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block compression (single hash probe, 64 Ki table)."""
    n = len(src)
    out = bytearray()
    if n < _MFLIMIT + 1:
        # too short to hold any match: one literals-only sequence
        token_lit = n
        out.append(min(token_lit, 15) << 4)
        if token_lit >= 15:
            _write_len(out, token_lit - 15)
        out += src
        return bytes(out)

    table: dict[int, int] = {}
    anchor = 0
    pos = 0
    match_limit = n - _LAST_LITERALS
    scan_limit = n - _MFLIMIT
    u32 = struct.unpack_from
    while pos <= scan_limit:
        (seq,) = u32("<I", src, pos)
        h = (seq * _P1) & _M32
        h >>= 32 - _HASH_LOG
        cand = table.get(h)
        table[h] = pos
        if (
            cand is None
            or pos - cand > 0xFFFF
            or src[cand : cand + 4] != src[pos : pos + 4]
        ):
            pos += 1
            continue
        # extend the match forward (never into the last-5 literals) —
        # chunked slice compares first, so long runs (zero padding,
        # repeated records) extend at memcmp speed instead of one
        # Python iteration per byte
        m = pos + _MIN_MATCH
        c = cand + _MIN_MATCH
        for step in (4096, 256, 16):
            while m + step <= match_limit and src[m : m + step] == src[c : c + step]:
                m += step
                c += step
        while m < match_limit and src[m] == src[c]:
            m += 1
            c += 1
        lit_len = pos - anchor
        match_len = m - pos
        token = (min(lit_len, 15) << 4) | min(match_len - _MIN_MATCH, 15)
        out.append(token)
        if lit_len >= 15:
            _write_len(out, lit_len - 15)
        out += src[anchor:pos]
        out += struct.pack("<H", pos - cand)
        if match_len - _MIN_MATCH >= 15:
            _write_len(out, match_len - _MIN_MATCH - 15)
        pos = m
        anchor = m
    # trailing literals-only sequence
    lit_len = n - anchor
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        _write_len(out, lit_len - 15)
    out += src[anchor:]
    return bytes(out)


def decompress_block(src: bytes) -> bytes:
    """LZ4 block decoding per the public block format.

    Every read is bounds-checked: truncated or malformed blocks raise
    ``ValueError('truncated LZ4 stream')`` instead of surfacing as
    ``struct.error``/``IndexError`` or silently short output.
    """
    out = bytearray()
    i = 0
    n = len(src)

    def _need(k: int) -> None:
        if i + k > n:
            raise ValueError("truncated LZ4 stream")

    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                _need(1)
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        _need(lit_len)
        out += src[i : i + lit_len]
        i += lit_len
        if i >= n:
            break  # last sequence: literals only
        _need(2)
        (offset,) = struct.unpack_from("<H", src, i)
        i += 2
        if offset == 0:
            raise ValueError("LZ4 block: zero match offset")
        match_len = (token & 0xF) + _MIN_MATCH
        if token & 0xF == 15:
            while True:
                _need(1)
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("LZ4 block: offset before output start")
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            # overlap: the match repeats the trailing `offset` bytes —
            # replicate the pattern instead of appending byte-by-byte
            pattern = bytes(out[start:])
            reps = -(-match_len // offset)
            out += (pattern * reps)[:match_len]
    return bytes(out)


# ---- frame format --------------------------------------------------------

_BLOCK_MAX_CODE = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}
_DEFAULT_BD_CODE = 4  # 64 KiB blocks: bounded per-block Python cost


def compress(data: bytes, bd_code: int = _DEFAULT_BD_CODE) -> bytes:
    """Wrap *data* in a single LZ4 frame (block-independent, no
    checksums/content-size — the minimal spec-valid descriptor)."""
    block_max = _BLOCK_MAX_CODE[bd_code]
    flg = 0b01100000  # version=01, block-independence=1
    bd = bd_code << 4
    desc = bytes([flg, bd])
    hc = (xxh32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", MAGIC) + desc + bytes([hc]))
    for i in range(0, len(data), block_max):
        chunk = data[i : i + block_max]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode one-or-more concatenated LZ4 frames (skippable frames are
    skipped; optional checksums are consumed, content checksum is not
    verified — integrity here rides on the tar round-trip oracle)."""
    out = bytearray()
    i = 0
    n = len(data)

    def _need(at: int, k: int) -> None:
        if at + k > n:
            raise ValueError("truncated LZ4 stream")

    while i < n:
        _need(i, 4)
        (magic,) = struct.unpack_from("<I", data, i)
        i += 4
        if _SKIP_MIN <= magic <= _SKIP_MAX:
            _need(i, 4)
            (sz,) = struct.unpack_from("<I", data, i)
            _need(i + 4, sz)
            i += 4 + sz
            continue
        if magic != MAGIC:
            raise ValueError(f"not an LZ4 frame (magic {magic:#x})")
        _need(i, 2)
        flg = data[i]
        bd = data[i + 1]
        i += 2
        if (flg >> 6) != 0b01:
            raise ValueError("unsupported LZ4 frame version")
        if (bd >> 4) & 0x7 not in _BLOCK_MAX_CODE:
            raise ValueError("invalid LZ4 block-maxsize code")
        has_content_size = bool(flg & 0x08)
        has_content_cks = bool(flg & 0x04)
        has_block_cks = bool(flg & 0x10)
        has_dict_id = bool(flg & 0x01)
        if has_content_size:
            i += 8
        if has_dict_id:
            i += 4
        i += 1  # header checksum byte
        _need(i, 0)
        while True:
            _need(i, 4)
            (bsz,) = struct.unpack_from("<I", data, i)
            i += 4
            if bsz == 0:
                break
            raw = bool(bsz & 0x80000000)
            bsz &= 0x7FFFFFFF
            _need(i, bsz)
            chunk = data[i : i + bsz]
            i += bsz
            if has_block_cks:
                _need(i, 4)
                i += 4
            out += chunk if raw else decompress_block(chunk)
        if has_content_cks:
            _need(i, 4)
            i += 4
    return bytes(out)
