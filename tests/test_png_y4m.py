"""Pure-stdlib PNG / Y4M codec kernels (kernel/png.py, kernel/y4m.py)
and the real-decode media stages built on them."""

import struct
import zlib

import numpy as np
import pytest

from dots_ocr_ray.kernel.png import (
    PngError,
    _SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    gray_from_pixels,
    gray_thumb,
)
from dots_ocr_ray.kernel.y4m import Y4mError, encode_y4m, iter_y4m_luma


# --- PNG ---------------------------------------------------------------------


@pytest.mark.parametrize("filter_mode", [0, 1, 2, 3, 4, "rotate"])
def test_png_gray_roundtrip_every_filter(filter_mode):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (23, 31), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_mode=filter_mode))
    assert out.shape == (23, 31, 1)
    assert (out[..., 0] == img).all()


def test_png_rgb_roundtrip():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (17, 9, 3), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_mode="rotate"))
    assert out.shape == (17, 9, 3)
    assert (out == img).all()


def test_png_single_pixel_and_single_row():
    assert decode_png(encode_png(np.array([[200]], dtype=np.uint8)))[0, 0, 0] == 200
    row = np.arange(16, dtype=np.uint8).reshape(1, 16)
    assert (decode_png(encode_png(row, filter_mode=4))[..., 0] == row).all()


def test_png_palette_subbyte_depth():
    """Hand-built 4-bit palette image: PLTE lookup + bit unpacking."""
    plte = np.array([[i * 16, i * 8, i * 4] for i in range(16)], dtype=np.uint8)
    w, h = 5, 3
    idx = np.arange(1, 16, dtype=np.uint8).reshape(h, w)
    rows = bytearray()
    for r in range(h):
        rows.append(0)
        cur = idx[r]
        for k in range(0, w, 2):
            rows.append((cur[k] << 4) | (cur[k + 1] if k + 1 < w else 0))
    ihdr = struct.pack(">IIBBBBB", w, h, 4, 3, 0, 0, 0)
    png = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (h, w, 3)
    assert (out == plte[idx]).all()


def test_png_1bit_gray_scales_to_255():
    w, h = 10, 2
    bits = bytearray()
    for r in range(h):
        bits.append(0)
        bits.extend(b"\xaa\x80")  # 1010101010 per row, padded
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)
    png = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(bits)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)[..., 0]
    assert out.shape == (h, w)
    assert list(out[0]) == [255, 0] * 5


def test_png_malformed_inputs_raise_pngerror_never_crash():
    good = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    cases = [
        b"",
        b"nope",
        _SIGNATURE,
        _SIGNATURE + b"\x00" * 16,
        good[:-6],  # truncated IEND
        good[: len(good) // 2],  # truncated IDAT
        bytes(bad_crc),
    ]
    for payload in cases:
        with pytest.raises(PngError):
            decode_png(payload)


def _make_interlaced(img):
    """Hand-built Adam7 stream: filter-0 scanlines per spec pass."""
    from dots_ocr_ray.kernel.png import _ADAM7

    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    arr = img.reshape(h, w, channels)
    lines = bytearray()
    for x0, xs, y0, ys in _ADAM7:
        sub = arr[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in range(sub.shape[0]):
            lines.append(0)
            lines.extend(sub[r].tobytes())
    ct = 0 if channels == 1 else (2 if channels == 3 else 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 1)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(13, 17), (8, 8), (1, 1), (2, 3), (9, 5, 3)])
def test_png_adam7_interlace_decodes(shape):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    out = decode_png(_make_interlaced(img))
    assert (out == img.reshape(out.shape)).all()


def test_png_interlace_truncated_and_subbyte_rejected():
    rng = np.random.RandomState(2)
    png = _make_interlaced(rng.randint(0, 256, (13, 17), dtype=np.uint8))
    with pytest.raises(PngError):
        decode_png(png[:-8])
    # sub-byte interlaced stays out of scope (explicit error)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 1, 0, 0, 0, 1)
    bad = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x01"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(bad)


def test_gray_from_pixels_luma():
    px = np.array([[[200, 100, 50]]], dtype=np.uint8)
    assert gray_from_pixels(px)[0, 0] == (299 * 200 + 587 * 100 + 114 * 50) // 1000
    ga = np.array([[[77, 255]]], dtype=np.uint8)  # gray+alpha keeps gray
    assert gray_from_pixels(ga)[0, 0] == 77


def test_gray_thumb_integer_exact():
    # constant image → constant thumb; 16x16 block pattern → exact means
    assert (gray_thumb(np.full((50, 70), 77, dtype=np.uint8)) == 77).all()
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8] = 100
    t = gray_thumb(img, 2)
    assert t.tolist() == [[100, 0], [0, 0]]
    # smaller than the thumb grid still produces 8x8 without crashing
    assert gray_thumb(np.array([[5]], dtype=np.uint8)).shape == (8, 8)


# --- Y4M ---------------------------------------------------------------------


def test_y4m_roundtrip_exact_luma():
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (4, 6, 10), dtype=np.uint8)
    payload = encode_y4m(frames)
    got = list(iter_y4m_luma(payload))
    assert [f for f, _ in got] == [0, 1, 2, 3]
    for f, luma in got:
        assert luma.shape == (6, 10)
        assert (luma == frames[f]).all()


@pytest.mark.parametrize("cs", ["420", "422", "444", "mono"])
def test_y4m_colorspaces(cs):
    frames = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    got = list(iter_y4m_luma(encode_y4m(frames, colorspace=cs)))
    assert len(got) == 2 and (got[1][1] == frames[1]).all()


def test_y4m_malformed_raises():
    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    good = encode_y4m(frames)
    for payload in [b"", b"JUNK", good[:-3], good.replace(b"FRAME", b"FRAMX", 1)]:
        with pytest.raises(Y4mError):
            list(iter_y4m_luma(payload))
    with pytest.raises(Y4mError):
        list(iter_y4m_luma(b"YUV4MPEG2 W4 H4 Ib\n"))  # interlaced


# --- real-decode media stages ------------------------------------------------


def test_text_png_payload_roundtrip_bytes():
    from dots_ocr_ray.fixtures import text_png_payload
    from dots_ocr_ray.stages.media import png_text_roundtrip

    for text in ["hello world", "", "x" * 200, "日本語テキスト", "a\nb\tc"]:
        data = text.encode("utf-8")
        assert png_text_roundtrip(text_png_payload(text), len(data)) == data


def test_phash64_png_real_pixels():
    from dots_ocr_ray.kernel.png import encode_png
    from dots_ocr_ray.stages.media import phash64_png

    rng = np.random.RandomState(5)
    base = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    near = base.copy()
    near[3, 4] = (int(near[3, 4]) + 6) % 256  # one-pixel edit
    far = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    ham = lambda x, y: bin(x ^ y).count("1")
    h0 = phash64_png(encode_png(base))
    assert ham(h0, phash64_png(encode_png(near))) <= 2
    assert ham(h0, phash64_png(encode_png(far, filter_mode="rotate"))) > 8
    # non-PNG bytes: ValueError once a codec handles them, the marked
    # NotImplementedError on the codec-free tier
    with pytest.raises((ValueError, NotImplementedError)):
        phash64_png(b"not a png")


def test_frame_sample_actor_real_tier(ray_session):
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.fixtures import video_y4m_payload
    from dots_ocr_ray.stages.media import FrameSampleActor

    rows = [
        {"media_id": 8, "kind": "video", "payload": video_y4m_payload(8), "meta": "{}"},
        {"media_id": 99, "kind": "video", "payload": b"not a video", "meta": "{}"},
    ]
    out = (
        ray.data.from_items(rows)
        .map_batches(
            FrameSampleActor,
            fn_constructor_kwargs={"every_nth": 2, "fake_decode": False},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
    )
    # doc 8: 1 + (8//6) % 5 = 2 frames → sampled frame 0 only
    good = out[out.media_id == 8]
    assert list(good.frame_idx) == [0]
    # exact integer mean luma of the arithmetic pixel rule
    y, x = np.mgrid[0:8, 0:16]
    expect = int(((31 * 8 + 13 * y + 7 * x) % 256).sum()) // 128
    assert int(good.mean_luma.iloc[0]) == expect
    # corrupt payload routes to the error row, never raises
    bad = out[out.media_id == 99]
    assert list(bad.frame_idx) == [-1] and list(bad.mean_luma) == [-1]


def test_media_feature_actor_roundtrip_mode(ray_session):
    import hashlib
    import json

    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.fixtures import text_png_payload
    from dots_ocr_ray.stages.media import MediaFeatureActor

    texts = ["alpha beta", "", "γδ unicode"]
    rows = [
        {
            "media_id": i,
            "kind": "image",
            "payload": text_png_payload(t),
            "meta": json.dumps({"len": len(t.encode("utf-8"))}),
        }
        for i, t in enumerate(texts)
    ]
    rows.append({"media_id": 9, "kind": "image", "payload": b"junk", "meta": "{}"})
    out = (
        ray.data.from_items(rows)
        .map_batches(
            MediaFeatureActor,
            fn_constructor_kwargs={"roundtrip": True},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        data = t.encode("utf-8")
        assert out.loc[i, "n_bytes"] == len(data)
        assert out.loc[i, "digest"] == hashlib.md5(data).hexdigest()
    assert out.loc[3, "n_bytes"] == -1 and out.loc[3, "digest"] == ""


# --- property fuzz -----------------------------------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    channels=st.sampled_from([1, 3]),
    filter_mode=st.sampled_from([0, 1, 2, 3, 4, "rotate"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_fuzz(h, w, channels, filter_mode, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img, filter_mode=filter_mode))
    assert out.shape == (h, w, channels)
    assert (out.reshape(shape) == img).all()


@settings(max_examples=30, deadline=None)
@given(data=st.binary(max_size=300))
def test_png_decode_never_crashes_on_garbage(data):
    for payload in (data, _SIGNATURE + data):
        try:
            decode_png(payload)
        except PngError:
            pass  # the only allowed failure mode


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 5),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    cs=st.sampled_from(["420", "422", "444", "mono"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_fuzz(n, h, w, cs, seed):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, (n, h, w), dtype=np.uint8)
    got = list(iter_y4m_luma(encode_y4m(frames, colorspace=cs)))
    assert len(got) == n
    for f, luma in got:
        assert (luma == frames[f]).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_reading_order_is_always_a_permutation(n, seed):
    from dots_ocr_ray.kernel.geometry import reading_order

    rng = np.random.RandomState(seed)
    boxes = []
    for _ in range(n):
        x1 = int(rng.randint(0, 900))
        y1 = int(rng.randint(0, 900))
        boxes.append([x1, y1, x1 + int(rng.randint(1, 100)), y1 + int(rng.randint(1, 100))])
    order = reading_order(boxes, 1000, 1000)
    assert sorted(order) == list(range(n))
    # determinism
    assert reading_order(boxes, 1000, 1000) == order


def test_png_16bit_takes_high_byte():
    w, h = 3, 2
    samples = np.array(
        [[0x1234, 0x00FF, 0xFF00], [0x8001, 0x7FFF, 0x0000]], dtype=">u2"
    )
    rows = bytearray()
    for r in range(h):
        rows.append(0)
        rows.extend(samples[r].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    png = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)[..., 0]
    assert out.tolist() == [[0x12, 0x00, 0xFF], [0x80, 0x7F, 0x00]]
