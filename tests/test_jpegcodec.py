"""Baseline-JFIF codec (functions/jpegcodec.py): DC-exact closed form,
general AC round trips, restart markers, byte stuffing, truncation
contract, and out-of-profile rejection."""

from __future__ import annotations

import numpy as np
import pytest

from aistore_spark.functions import jpegcodec as jc


def _analytic_means(doc_id: int) -> list[int]:
    """The oracle's closed form, reimplemented independently."""
    bx, by = 2 + doc_id % 5, 1 + doc_id % 4
    qual = 50 + doc_id % 45
    scale = 5000 // qual if qual < 50 else 200 - 2 * qual
    means = []
    for c in range(3):
        base = 16 if c == 0 else 17
        q00 = min(255, max(1, (base * scale + 50) // 100))
        s = 0
        for bi in range(bx * by):
            v = 128 + (doc_id * 7 + bi * 13 + c * 29) % 100
            dc = 8 * (v - 128)
            qdc = (2 * dc + q00) // (2 * q00)
            s += min(255, (qdc * q00 + 4) // 8 + 128)
        means.append(s // (bx * by))
    return means


def test_zigzag_is_a_permutation_with_spec_prefix():
    zz = jc.zigzag_order()
    assert sorted(zz) == [(r, c) for r in range(8) for c in range(8)]
    # the first 10 entries of the T.81 scan, hand-checkable
    assert zz[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert zz[-1] == (7, 7)


def test_canonical_huffman_tables_are_prefix_free_without_all_ones():
    for bits, vals in (jc._dc_table_spec(), jc._ac_table_spec()):
        codes = jc._canonical_codes(bits, vals)
        assert len(codes) == len(vals) == len(set(vals))
        seen = set()
        for sym, (code, length) in codes.items():
            assert code != (1 << length) - 1, "all-ones code is reserved"
            assert (code, length) not in seen
            seen.add((code, length))
        # prefix-freedom: no code is a prefix of a longer one
        by_len = sorted(codes.values(), key=lambda cl: cl[1])
        for i, (c1, l1) in enumerate(by_len):
            for c2, l2 in by_len[i + 1 :]:
                if l2 > l1:
                    assert (c2 >> (l2 - l1)) != c1


def test_dc_only_profile_matches_closed_form():
    """synth_jpeg -> decode_jpeg must land EXACTLY on the analytic
    per-block formula the DuckDB oracle uses, over many parameter
    combinations (all bx/by/quality/restart strata)."""
    for d in range(0, 300, 7):
        info, planes = jc.decode_jpeg(jc.synth_jpeg(d))
        got = [int(p.astype(np.int64).sum()) // p.size for p in planes]
        assert got == _analytic_means(d), f"doc {d}"
        assert info["width"] == 8 * (2 + d % 5)
        assert info["height"] == 8 * (1 + d % 4)
        assert info["restart_interval"] == (4 if d % 2 == 0 else 0)
        qual = 50 + d % 45
        assert info["q00_luma"] == min(
            255, max(1, (16 * (200 - 2 * qual) + 50) // 100)
        )


def test_general_ac_roundtrip_quality_95():
    """Arbitrary smooth content exercises the full AC path (run/size
    symbols, EOB) both directions; at quality 95 reconstruction error
    stays within a few levels."""
    rng = np.random.RandomState(7)
    h, w = 16, 24
    base = rng.randint(60, 200, size=(h // 8, w // 8))
    planes = []
    for c in range(3):
        y, x = np.mgrid[0:h, 0:w]
        p = (
            np.kron(base, np.ones((8, 8)))
            + 5 * np.sin(x / 3.0 + c)
            + 5 * np.cos(y / 4.0)
        ).clip(0, 255)
        planes.append(p.astype(np.uint8))
    _, dec = jc.decode_jpeg(jc.encode_jpeg(planes, quality=95))
    err = max(
        np.abs(dec[c].astype(int) - planes[c].astype(int)).max()
        for c in range(3)
    )
    assert err <= 6


def test_noise_roundtrip_exercises_zrl_and_stuffing():
    """Hard random noise produces large ACs, ZRL runs and 0xFF bytes
    in the entropy stream (byte stuffing); decode must survive and
    stay within the quantization error bound q*4 (sum over 64
    coefficients of q/2 spread by the orthonormal IDCT)."""
    rng = np.random.RandomState(11)
    planes = [rng.randint(0, 256, size=(8, 16)).astype(np.uint8)]
    blob = jc.encode_jpeg(planes, quality=99)
    # with enough noise blocks some stuffed 0xFF must appear; assert
    # the stream declares itself 1-component grayscale and decodes
    info, dec = jc.decode_jpeg(blob)
    assert info["n_components"] == 1
    err = np.abs(dec[0].astype(int) - planes[0].astype(int)).max()
    assert err <= 16


def test_restart_interval_changes_stream_not_pixels():
    rng = np.random.RandomState(3)
    planes = [
        (rng.randint(0, 32, size=(16, 32)) * 8).astype(np.uint8)
        for _ in range(3)
    ]
    b0 = jc.encode_jpeg(planes, quality=80, restart_interval=0)
    b1 = jc.encode_jpeg(planes, quality=80, restart_interval=1)
    assert b0 != b1 and b"\xff\xd0" in b1[100:]
    _, d0 = jc.decode_jpeg(b0)
    _, d1 = jc.decode_jpeg(b1)
    assert all((a == b).all() for a, b in zip(d0, d1))


def test_truncation_raises_value_error_at_every_prefix():
    full = jc.synth_jpeg(11)
    for cut in range(2, len(full) - 1, max(1, len(full) // 80)):
        with pytest.raises(ValueError):
            jc.decode_jpeg(full[:cut])


def test_fill_bytes_between_markers_are_skipped():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker; a spec-legal padded file must parse identically."""
    full = jc.synth_jpeg(7)
    _, want = jc.decode_jpeg(full)
    # pad before APP0 (right after SOI) and before the SOF0 marker
    sof = full.find(b"\xff\xc0")
    padded = full[:2] + b"\xff" * 3 + full[2:sof] + b"\xff" * 2 + full[sof:]
    info, got = jc.decode_jpeg(padded)
    assert all((a == b).all() for a, b in zip(want, got))
    w, h, nc = jc.jpeg_dims(padded)
    assert (w, h, nc) == (info["width"], info["height"], info["n_components"])


def test_out_of_profile_rejection():
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg(b"\x89PNG")
    # progressive SOF2 must be rejected, not misdecoded
    blob = bytearray(jc.synth_jpeg(4))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jc.decode_jpeg(bytes(blob))
    # corrupt a Huffman stream byte -> ValueError, not garbage
    with pytest.raises(ValueError):
        jc.decode_jpeg(jc.synth_jpeg(5)[:-40] + b"\x00" * 40)


def test_quality_scaling_is_monotone_and_clamped():
    q_prev = None
    for qual in (1, 10, 25, 50, 75, 94, 100):
        t = jc.scaled_quant_table(0, qual)
        assert t.min() >= 1 and t.max() <= 255
        if q_prev is not None:
            assert int(t.sum()) <= q_prev
        q_prev = int(t.sum())
    with pytest.raises(ValueError):
        jc.scaled_quant_table(0, 0)


def test_spark_wrapper_schema_and_values(spark, sf_dir):
    from aistore_spark.operators import multimodal

    ids = spark.createDataFrame([(3,), (10,), (24,)], "doc_id bigint")
    out = {
        r.doc_id: r
        for r in multimodal.decode_jpeg_meta(
            multimodal.synth_jpeg_frame(ids)
        ).collect()
    }
    for d in (3, 10, 24):
        m = _analytic_means(d)
        assert (out[d].mean_y, out[d].mean_cb, out[d].mean_cr) == tuple(m)
        assert out[d].n_blocks == (2 + d % 5) * (1 + d % 4)
