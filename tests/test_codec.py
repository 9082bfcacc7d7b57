"""Delta wire codec tests: byte-format parity with the reference
(run.py:316-333) and native/python agreement."""

import gzip
import io

import numpy as np
import pytest

from ams_tpu.stream.codec import (
    STATS_MAGIC,
    apply_delta,
    decode_delta,
    delta_order,
    encode_delta,
    pack_payload,
    payload_bits,
)
from ams_tpu.models.var_order import (
    SAVEABLE_ORDER,
    STATS_ORDER,
    TRAINABLE_ORDER,
)


def _reference_payload(masks, values):
    """Reimplementation of the reference's exact write loop for oracle use."""
    buf = io.BytesIO()
    for m in masks:
        buf.write(np.packbits(m.flatten()).tobytes())
    for m, v in zip(masks, values):
        buf.write(v[m].astype(np.float16).tobytes())
    return buf.getvalue()


def test_pack_payload_matches_reference_bytes():
    rng = np.random.RandomState(0)
    masks = [rng.rand(5, 7) > 0.5, rng.rand(13) > 0.2, rng.rand(3, 2, 4) > 0.9]
    values = [rng.randn(*m.shape).astype(np.float32) for m in masks]
    assert pack_payload(masks, values) == _reference_payload(masks, values)


def test_roundtrip_small():
    rng = np.random.RandomState(1)
    names = TRAINABLE_ORDER[:5]
    params = {n: rng.randn(4, 3).astype(np.float32) for n in names}
    masks = {n: rng.rand(4, 3) > 0.5 for n in names}
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        use_native=False)
    shapes = {n: (4, 3) for n in names}
    dmasks, dvalues = decode_delta(blob, shapes, strategy="coord_desc_auto")
    for n in names:
        np.testing.assert_array_equal(dmasks[n], masks[n])
        np.testing.assert_array_equal(
            dvalues[n][masks[n]], params[n][masks[n]].astype(np.float16))
    updated = apply_delta(params, dmasks, dvalues)
    for n in names:
        got = updated[n][masks[n]]
        want = params[n][masks[n]].astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(got, want)


def test_decode_corrupt_payloads_fail_loudly():
    """The edge consumes network-delivered blobs: a garbage stream, a
    truncated payload, or extra bytes must all raise — never decode into
    silently-wrong masks/values.  (The wire carries no checksum — that is
    the reference format — so structural checks are the whole defense.)"""
    rng = np.random.RandomState(2)
    names = TRAINABLE_ORDER[:3]
    params = {n: rng.randn(4, 3).astype(np.float32) for n in names}
    masks = {n: rng.rand(4, 3) > 0.5 for n in names}
    shapes = {n: (4, 3) for n in names}
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        use_native=False)

    with pytest.raises(Exception):  # gzip.BadGzipFile (an OSError)
        decode_delta(b"not a gzip stream", shapes,
                     strategy="coord_desc_auto")

    raw = gzip.decompress(blob)
    truncated = gzip.compress(raw[:-3])
    with pytest.raises(ValueError):  # frombuffer: buffer too small
        decode_delta(truncated, shapes, strategy="coord_desc_auto")

    padded = gzip.compress(raw + b"\x00\x01")
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_delta(padded, shapes, strategy="coord_desc_auto")


def test_delta_order():
    assert delta_order("full_model") == list(SAVEABLE_ORDER)
    assert delta_order("coord_desc_auto") == list(TRAINABLE_ORDER)
    assert "MobilenetV2/Conv/BatchNorm/moving_mean" in SAVEABLE_ORDER
    assert "MobilenetV2/Conv/BatchNorm/moving_mean" not in TRAINABLE_ORDER
    assert len(TRAINABLE_ORDER) == 164 and len(SAVEABLE_ORDER) == 272


def test_native_matches_python():
    native = pytest.importorskip("ams_tpu.native.codec")
    rng = np.random.RandomState(2)
    masks = [rng.rand(64, 3) > 0.4, rng.rand(1000) > 0.8]
    values = [(rng.randn(*m.shape) * 10).astype(np.float32) for m in masks]
    raw = pack_payload(masks, values)
    blob_native = native.encode_delta_native(masks, values)
    # decompressed payloads must be byte-identical
    assert gzip.decompress(blob_native) == raw
    # and the native gzip9 of the same raw payload decompresses identically
    assert gzip.decompress(native.gzip9(raw)) == raw


def test_native_fp16_edge_cases():
    native = pytest.importorskip("ams_tpu.native.codec")
    vals = np.array([0.0, -0.0, 1.0, -1.0, 65504.0, 65520.0, 1e-8, -1e-8,
                     np.inf, -np.inf, np.nan, 3.14159, 6.1e-5, 5.9e-8],
                    dtype=np.float32)
    masks = [np.ones(vals.shape, bool)]
    blob = native.encode_delta_native(masks, [vals])
    raw = gzip.decompress(blob)
    nbytes = (vals.size + 7) // 8
    got = np.frombuffer(raw, np.float16, offset=nbytes)
    want = vals.astype(np.float16)
    np.testing.assert_array_equal(got.tobytes(), want.tobytes())


def test_payload_bits():
    assert payload_bits(b"abcd") == 32


def test_int8_wire_roundtrip():
    """Opt-in int8 wire: per-var symmetric quantization, error bounded by
    half a quantization step, payload ~half the fp16 wire's."""
    rng = np.random.RandomState(7)
    shapes = {n: (32, 7) for n in TRAINABLE_ORDER[:5]}
    params = {n: (rng.randn(*s) * 0.05).astype(np.float32)
              for n, s in shapes.items()}
    masks = {n: rng.rand(*s) > 0.5 for n, s in shapes.items()}
    # uncompressible values make the size ratio meaningful
    blob8 = encode_delta(params, masks, strategy="coord_desc_auto",
                         wire_dtype="int8")
    blob16 = encode_delta(params, masks, strategy="coord_desc_auto")
    m8, v8 = decode_delta(blob8, shapes, strategy="coord_desc_auto",
                          wire_dtype="int8")
    for n in shapes:
        np.testing.assert_array_equal(m8[n], masks[n])
        picked = params[n][masks[n]]
        scale = np.abs(picked).max() / 127.0
        err = np.abs(v8[n][masks[n]] - picked)
        assert err.max() <= scale / 2 + 1e-7, n
    # values section halves; bitmask section is shared, so expect a
    # meaningful (not exactly 2x) shrink on these dense random values
    assert len(blob8) < 0.75 * len(blob16), (len(blob8), len(blob16))
    # applying overlays only the masked entries
    out = apply_delta(params, m8, v8)
    for n in shapes:
        inv = ~masks[n]
        np.testing.assert_array_equal(out[n][inv], params[n][inv])


def test_int8d_wire_roundtrip_and_precision():
    """int8d (delta-vs-initial): quantizes value-minus-base, so the
    reconstruction error is bounded by half of max|MOVEMENT|/127 — far
    finer than int8's max|WEIGHT|/127 when the round moves params a
    little (the production regime).  Same payload size as int8."""
    rng = np.random.RandomState(11)
    shapes = {n: (32, 7) for n in TRAINABLE_ORDER[:5]}
    base = {n: rng.randn(*s).astype(np.float32)
            for n, s in shapes.items()}
    # small movements on top of O(1) weights: int8 steps ~1e-2, int8d ~1e-4
    params = {n: base[n] + (rng.randn(*s) * 0.01).astype(np.float32)
              for n, s in shapes.items()}
    masks = {n: rng.rand(*s) > 0.5 for n, s in shapes.items()}
    blob_d = encode_delta(params, masks, strategy="coord_desc_auto",
                          wire_dtype="int8d", base=base)
    blob_8 = encode_delta(params, masks, strategy="coord_desc_auto",
                          wire_dtype="int8")
    md, vd = decode_delta(blob_d, shapes, strategy="coord_desc_auto",
                          wire_dtype="int8d", base=base)
    m8, v8 = decode_delta(blob_8, shapes, strategy="coord_desc_auto",
                          wire_dtype="int8")
    worst_d = worst_8 = 0.0
    for n in shapes:
        np.testing.assert_array_equal(md[n], masks[n])
        picked = params[n][masks[n]]
        step_d = np.abs(picked - base[n][masks[n]]).max() / 127.0
        err_d = np.abs(vd[n][masks[n]] - picked)
        assert err_d.max() <= step_d / 2 + 1e-7, n
        worst_d = max(worst_d, float(err_d.max()))
        worst_8 = max(worst_8, float(np.abs(v8[n][masks[n]] - picked)
                                     .max()))
    # the whole point: at least 10x finer reconstruction on this regime
    assert worst_d < worst_8 / 10, (worst_d, worst_8)
    # same wire layout, so ~same size (values section byte-identical size)
    assert abs(len(blob_d) - len(blob_8)) < 0.2 * len(blob_8)
    # applying overlays re-absolutized values onto the client's base
    out = apply_delta(base, md, vd)
    for n in shapes:
        inv = ~masks[n]
        np.testing.assert_array_equal(out[n][inv], base[n][inv])
        assert np.abs(out[n][masks[n]]
                      - params[n][masks[n]]).max() < 1e-3


def test_int8d_heterogeneous_shapes():
    """Regression: decode_delta's base-shape check compared against a
    variable left over from the mask loop (the LAST var's shape), so any
    realistic parameter dict — where shapes differ across vars — raised a
    spurious shape error on the int8d wire (found by
    tools/probe_int8_delta.py on the real student)."""
    rng = np.random.RandomState(5)
    shapes = dict(zip(TRAINABLE_ORDER[:4],
                      [(3, 3, 2, 8), (8,), (1, 1, 8, 4), (4,)]))
    base = {n: rng.randn(*s).astype(np.float32) for n, s in shapes.items()}
    params = {n: base[n] + (rng.randn(*s) * 0.01).astype(np.float32)
              for n, s in shapes.items()}
    masks = {n: rng.rand(*s) > 0.3 for n, s in shapes.items()}
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        wire_dtype="int8d", base=base)
    md, vd = decode_delta(blob, shapes, strategy="coord_desc_auto",
                          wire_dtype="int8d", base=base)
    out = apply_delta(base, md, vd)
    for n in shapes:
        np.testing.assert_array_equal(md[n], masks[n])
        assert np.abs(out[n][masks[n]]
                      - params[n][masks[n]]).max() < 1e-3, n


def test_int8d_requires_base():
    shapes = {TRAINABLE_ORDER[0]: (4, 4)}
    params = {TRAINABLE_ORDER[0]: np.ones((4, 4), np.float32)}
    masks = {TRAINABLE_ORDER[0]: np.ones((4, 4), bool)}
    with pytest.raises(ValueError, match="base"):
        encode_delta(params, masks, strategy="coord_desc_auto",
                     wire_dtype="int8d")
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        wire_dtype="int8d", base=params)
    with pytest.raises(ValueError, match="base"):
        decode_delta(blob, shapes, strategy="coord_desc_auto",
                     wire_dtype="int8d")
    # base shape mismatch fails loudly on both ends
    bad = {TRAINABLE_ORDER[0]: np.ones((4, 3), np.float32)}
    with pytest.raises(ValueError, match="shape"):
        encode_delta(params, masks, strategy="coord_desc_auto",
                     wire_dtype="int8d", base=bad)
    # decoding against wrong shapes fails loudly too — the wire-integrity
    # check ("trailing bytes") may fire before the base-shape check
    # depending on how the mis-sized masks slice the stream
    with pytest.raises(ValueError):
        decode_delta(blob, {TRAINABLE_ORDER[0]: (4, 3)},
                     strategy="coord_desc_auto", wire_dtype="int8d",
                     base=bad)


def test_int8_wire_empty_and_zero_scale():
    shapes = {TRAINABLE_ORDER[0]: (4, 4), TRAINABLE_ORDER[1]: (3,)}
    params = {n: np.zeros(s, np.float32) for n, s in shapes.items()}
    masks = {TRAINABLE_ORDER[0]: np.zeros((4, 4), bool),   # empty mask
             TRAINABLE_ORDER[1]: np.ones((3,), bool)}      # all-zero values
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        wire_dtype="int8")
    m, v = decode_delta(blob, shapes, strategy="coord_desc_auto",
                        wire_dtype="int8")
    assert not m[TRAINABLE_ORDER[0]].any()
    np.testing.assert_array_equal(v[TRAINABLE_ORDER[1]], np.zeros(3))


def _stats_fixture(n_train=3, n_stats=4, seed=5):
    rng = np.random.RandomState(seed)
    shapes = {n: (6, 2) for n in TRAINABLE_ORDER[:n_train]}
    shapes.update({n: (8,) for n in STATS_ORDER[:n_stats]})
    params = {n: rng.randn(*shapes[n]).astype(np.float32)
              for n in TRAINABLE_ORDER[:n_train]}
    masks = {n: rng.rand(*params[n].shape) > 0.5 for n in params}
    stats = {n: (1 + rng.rand(*shapes[n])).astype(np.float32)
             for n in STATS_ORDER[:n_stats]}
    return shapes, params, masks, stats


def test_stats_annex_roundtrip():
    """Wire extension: coord payloads carry the BN moving statistics as a
    dense fp16 annex; decode returns them all-ones-masked so apply_delta
    overlays them like any other section (the reference wire omits them,
    leaving a real delta consumer with stale normalizers)."""
    shapes, params, masks, stats = _stats_fixture()
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        stats=stats)
    dmasks, dvalues = decode_delta(blob, shapes, strategy="coord_desc_auto")
    for n in stats:
        assert dmasks[n].all() and dmasks[n].shape == stats[n].shape
        np.testing.assert_array_equal(dvalues[n],
                                      stats[n].astype(np.float16))
    # trainable sections are untouched by the annex
    for n in params:
        np.testing.assert_array_equal(dmasks[n], masks[n])
    # apply overlays the stats ABSOLUTELY (they are values, not deltas)
    client = {n: np.zeros(s, np.float32) for n, s in shapes.items()}
    out = apply_delta(client, dmasks, dvalues)
    for n in stats:
        np.testing.assert_array_equal(
            out[n], stats[n].astype(np.float16).astype(np.float32))


def test_stats_annex_absent_keeps_reference_bytes():
    """stats=None (and any pre-annex payload) stays byte-identical to the
    reference wire: no magic, no stats keys in the decode."""
    shapes, params, masks, stats = _stats_fixture()
    plain = encode_delta(params, masks, strategy="coord_desc_auto",
                         use_native=False)
    raw = gzip.decompress(plain)
    assert STATS_MAGIC not in raw[-16:]
    train_shapes = {n: shapes[n] for n in params}
    dmasks, _ = decode_delta(plain, train_shapes,
                             strategy="coord_desc_auto")
    assert set(dmasks) == set(params)


def test_stats_annex_rejects_full_model():
    shapes, params, masks, stats = _stats_fixture()
    full = {n: np.zeros(shapes.get(n, (2,)), np.float32)
            for n in list(params) + list(stats)}
    with pytest.raises(ValueError, match="full_model"):
        encode_delta(full, None, strategy="full_model", stats=stats)


def test_stats_annex_count_mismatch_fails_loudly():
    """Encoder shipping fewer stats vars than the decoder expects must
    raise (both ends derive the inventory from var_order; silent
    mis-slicing would corrupt every downstream var)."""
    shapes, params, masks, stats = _stats_fixture(n_stats=4)
    partial = {n: stats[n] for n in list(stats)[:2]}
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        stats=partial)
    with pytest.raises(ValueError, match="stats annex var count"):
        decode_delta(blob, shapes, strategy="coord_desc_auto")


def test_stats_annex_native_python_agree():
    """The annex rides inside the same gzip stream — the native encoder
    path must produce the identical decompressed payload."""
    pytest.importorskip("ams_tpu.native.codec")
    shapes, params, masks, stats = _stats_fixture(seed=9)
    py = encode_delta(params, masks, strategy="coord_desc_auto",
                      stats=stats, use_native=False)
    nat = encode_delta(params, masks, strategy="coord_desc_auto",
                       stats=stats, use_native=True)
    assert gzip.decompress(py) == gzip.decompress(nat)


def test_fp16_wire_single_rounding_for_f64_params():
    """fp16 encoding must cast straight from the source dtype: routing f64
    through an f32 intermediate double-rounds and can flip the wire bits
    (the reference casts directly, run.py:330)."""
    # values chosen near f16 rounding boundaries where f64->f32 moves the
    # input across the tie point; plus a random f64 sweep
    rng = np.random.RandomState(11)
    vals = np.concatenate([
        np.float64([1.0009765625 + 2 ** -13 + 2 ** -30]),  # f16 tie + eps
        rng.randn(4093) * rng.choice([1e-3, 1.0, 1e3], 4093)]).astype(
            np.float64)
    name = TRAINABLE_ORDER[0]
    mask = np.ones(vals.shape, bool)
    raw = pack_payload([mask], [vals])
    nbits = (vals.size + 7) // 8
    wire = np.frombuffer(raw, np.float16, offset=nbits)
    np.testing.assert_array_equal(wire, vals.astype(np.float16))


def test_stats_annex_inventory_crc_catches_equal_count_mismatch():
    """A count-only integrity check silently assigns one statistic's bytes
    to a DIFFERENT var when the inventories differ but the counts agree;
    the annex now carries a CRC of the name list and must refuse."""
    shapes, params, masks, stats = _stats_fixture(n_stats=2)
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        stats=stats, use_native=False)
    # decoder believes in a DIFFERENT 2-var stats inventory (same count,
    # same total byte size: swap one 8-elem var for another)
    bad_shapes = {n: shapes[n] for n in params}
    bad_shapes[STATS_ORDER[0]] = (8,)
    bad_shapes[STATS_ORDER[2]] = (8,)  # encoder shipped STATS_ORDER[1]
    with pytest.raises(ValueError, match="CRC"):
        decode_delta(blob, bad_shapes, strategy="coord_desc_auto")


def test_stats_annex_rejects_nonfinite_and_overflow():
    """The annex is a wire extension (no reference-parity constraint): a
    NaN/inf or fp16-overflowing moving statistic must raise at encode,
    not ship bytes that silently corrupt the client's normalizers."""
    shapes, params, masks, stats = _stats_fixture()
    for poison in (np.nan, np.inf, 1e5):  # 1e5 > fp16 max 65504
        bad = dict(stats)
        first = next(iter(bad))
        bad[first] = bad[first].copy()
        bad[first][0] = poison
        with pytest.raises(ValueError, match="stats annex"):
            encode_delta(params, masks, strategy="coord_desc_auto",
                         stats=bad)


def test_stats_annex_truncated_header_raises_valueerror():
    """A blob whose decompressed stream ends right after STATS_MAGIC must
    raise ValueError (the decoder's corruption contract), not IndexError."""
    shapes, params, masks, stats = _stats_fixture()
    plain = encode_delta(params, masks, strategy="coord_desc_auto",
                         use_native=False)
    raw = gzip.decompress(plain) + STATS_MAGIC  # magic, then nothing
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(raw)
    with pytest.raises(ValueError, match="truncated stats annex"):
        decode_delta(buf.getvalue(), shapes, strategy="coord_desc_auto")


def test_pack_payload_mask_shape_mismatch_raises():
    """Shape agreement is a wire-integrity check (ValueError), not a debug
    assert: under python -O a stale mask would mis-slice every subsequent
    var on the client."""
    with pytest.raises(ValueError, match="mask shape"):
        pack_payload([np.ones((2, 3), bool)], [np.zeros((3, 2), np.float32)])


def test_stats_annex_v1_payloads_still_decode():
    """Persisted artifacts from before the CRC header (annex v1: magic +
    version byte 1 + u32 count, no CRC) must keep decoding — the annex
    version is not negotiated anywhere, so a hard v1 reject would break
    every on-disk coord payload written by earlier rounds."""
    shapes, params, masks, stats = _stats_fixture()
    plain = encode_delta(params, masks, strategy="coord_desc_auto",
                         use_native=False)
    raw = gzip.decompress(plain)
    names = [n for n in STATS_ORDER if n in stats]
    v1 = io.BytesIO()
    v1.write(raw)
    v1.write(STATS_MAGIC)
    v1.write(np.uint8(1).tobytes())
    v1.write(np.uint32(len(names)).tobytes())
    for n in names:
        v1.write(np.asarray(stats[n]).astype(np.float16).tobytes())
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(v1.getvalue())
    dmasks, dvalues = decode_delta(buf.getvalue(), shapes,
                                   strategy="coord_desc_auto")
    for n in names:
        assert dmasks[n].all()
        np.testing.assert_array_equal(dvalues[n],
                                      stats[n].astype(np.float16))


def test_stats_annex_f64_stats_round_once():
    """Same single-cast rule as pack_payload: f64 moving statistics round
    f64->f16 directly — an f32 intermediate would double-round values near
    fp16 rounding boundaries."""
    shapes, params, masks, stats = _stats_fixture(n_stats=1)
    first = next(iter(stats))
    # 1 + 2^-11 + 2^-24: rounds differently via f32 (ties-to-even twice)
    poison = np.float64(1.0) + np.float64(2.0) ** -11 + np.float64(2.0) ** -24
    stats[first] = np.full(shapes[first], poison, np.float64)
    blob = encode_delta(params, masks, strategy="coord_desc_auto",
                        stats=stats, use_native=False)
    _, dvalues = decode_delta(blob, shapes, strategy="coord_desc_auto")
    want = stats[first].astype(np.float16)          # single rounding
    doubled = stats[first].astype(np.float32).astype(np.float16)
    assert not np.array_equal(want, doubled), "probe value must discriminate"
    np.testing.assert_array_equal(dvalues[first], want)


def test_native_fallback_warns_once_per_process(monkeypatch):
    """Losing the native encoder is correctness-preserving but costs real
    encode throughput — the fallback must warn (once), never be silent."""
    import sys
    import warnings

    import ams_tpu.stream.codec as C

    import ams_tpu.native

    monkeypatch.setattr(C, "_warned_native_fallback", False)
    # None in sys.modules makes the from-import raise ImportError — but
    # only after removing the already-bound package attribute, which
    # `from ams_tpu.native import codec` would otherwise resolve first
    monkeypatch.delattr(ams_tpu.native, "codec", raising=False)
    monkeypatch.setitem(sys.modules, "ams_tpu.native.codec", None)
    params = {n: np.zeros((4, 4), np.float32)
              for n in TRAINABLE_ORDER[:2]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        encode_delta(params, None, strategy="coord_desc_auto")
        encode_delta(params, None, strategy="coord_desc_auto")
    msgs = [x for x in w if "native delta codec" in str(x.message)]
    assert len(msgs) == 1


def test_any_single_byte_flip_raises_never_corrupts_silently():
    """Wire-integrity property: flipping ANY byte of a payload must raise
    at decode (gzip CRC + section bookkeeping), never hand back silently
    corrupt parameters.  Exhaustive over every byte position of a small
    coord payload with a stats annex.  Bytes 4-9 of the gzip header
    (MTIME/XFL/OS) are excluded: they are container metadata outside both
    the deflate stream and the CRC, so flips there change no decoded
    data."""
    shapes, params, masks, stats = _stats_fixture(n_train=2, n_stats=2)
    blob = bytearray(encode_delta(params, masks, strategy="coord_desc_auto",
                                  stats=stats, use_native=False))
    import zlib
    bad_kinds = (ValueError, OSError, zlib.error, EOFError)
    silent = []
    for pos in [p for p in range(len(blob)) if not 4 <= p <= 9]:
        flipped = bytearray(blob)
        flipped[pos] ^= 0xFF
        try:
            decode_delta(bytes(flipped), shapes, strategy="coord_desc_auto")
        except bad_kinds:
            continue
        except Exception as e:  # noqa: BLE001 - classify unexpected types
            silent.append((pos, "unexpected %r" % e))
            continue
        silent.append((pos, "decoded cleanly"))
    assert not silent, silent[:10]


def test_native_single_pass_f64_single_rounding():
    """The native single-pass encoder must honor the same one-rounding-step
    rule as the oracle for f64 params (its C ABI is f32, so non-f32 inputs
    pre-round to f16 and widen losslessly — NOT a f64->f32->f16 chain)."""
    native = pytest.importorskip("ams_tpu.native.codec")
    rng = np.random.RandomState(13)
    vals = np.concatenate([
        np.float64([1.0009765625 + 2 ** -13 + 2 ** -30]),  # f16 tie + eps
        rng.randn(511) * rng.choice([1e-3, 1.0, 1e3], 511)]).astype(
            np.float64)
    mask = np.ones(vals.shape, bool)
    blob = native.encode_delta_native([mask], [vals])
    raw = gzip.decompress(blob)
    assert raw == pack_payload([mask], [vals])


def test_encode_delta_native_python_agree_after_decompress():
    """Full public-path agreement: encode_delta with and without the native
    codec yields identical decompressed payloads (masked coord payload,
    f16 wire), so the single-pass C++ path is byte-gated by the oracle."""
    shapes = {TRAINABLE_ORDER[0]: (4, 5), TRAINABLE_ORDER[1]: (7,)}
    rng = np.random.RandomState(3)
    params = {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}
    masks = {k: rng.rand(*s) < 0.4 for k, s in shapes.items()}
    py = encode_delta(params, masks, strategy="coord_desc_auto",
                      use_native=False)
    nat = encode_delta(params, masks, strategy="coord_desc_auto",
                       use_native=True)
    assert gzip.decompress(py) == gzip.decompress(nat)
