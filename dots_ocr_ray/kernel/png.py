"""Pure-stdlib PNG codec (zlib + struct + numpy) — the no-PIL tier of
the image-decode seam.

The reference decodes page images with PIL
(/root/reference/dots_ocr/utils/image_utils.py:146-208); this sandbox
ships no codec, so the real-decode tier is built from the PUBLIC PNG
specification (RFC 2083 / ISO 15948): chunk framing with CRC-32,
zlib-inflated scanlines, and the five per-scanline filter
reconstructions (None/Sub/Up/Average/Paeth).  Everything here is
deterministic and shared by the Ray stages AND the sequential golden
oracles, so real pixel decode sits under the driver's hash gate.

Scope (honest limits, all raise ``ValueError`` — callers route to the
rejected/fake path, never crash a stage):

* bit depths 1/2/4/8 (16-bit takes the high byte — PIL-equivalent)
* color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA); tRNS transparency is ignored (decode returns the opaque
  channels)
* Adam7 interlace for byte-aligned depths (8/16-bit); sub-byte
  interlace rejected (rare in the wild)

The encoder writes 8-bit gray or RGB, one IDAT, with a per-scanline
filter choice that can be pinned or rotated — rotating exercises every
reconstruction branch of the decoder in roundtrip tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or out-of-scope PNG payload."""


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, *, filter_mode: int | str = 0, level: int = 6) -> bytes:
    """Serialize an 8-bit image as a real PNG byte stream.

    ``img``: (h, w) gray or (h, w, 3) RGB uint8 array.
    ``filter_mode``: a fixed filter type 0-4 for every scanline,
    ``"rotate"`` for ``row % 5`` (the roundtrip covers every decoder
    filter branch), or ``"cover"`` — rotate on the first five
    scanlines then Up for the rest: still exercises all five
    reconstruction branches per image, but the sequential
    Average/Paeth paths (a Python walk per pixel position) stay O(1)
    rows so large page images encode/decode at vector speed.
    Deterministic for fixed inputs (zlib is stdlib and its output is
    stable for a fixed level/strategy).
    """
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise PngError(f"encode_png wants (h,w) or (h,w,3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise PngError("empty image")
    bpp = channels
    raw = arr.reshape(h, w * channels).astype(np.int16)  # headroom for diffs
    lines = bytearray()
    prev = np.zeros(w * channels, dtype=np.int16)
    for r in range(h):
        row = raw[r]
        if filter_mode == "rotate":
            ft = r % 5
        elif filter_mode == "cover":
            ft = r % 5 if r < 5 else 2
        else:
            ft = int(filter_mode)
        left = np.zeros_like(row)
        left[bpp:] = row[:-bpp]
        prev_left = np.zeros_like(prev)
        prev_left[bpp:] = prev[:-bpp]
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            enc = row - left
        elif ft == 2:  # Up
            enc = row - prev
        elif ft == 3:  # Average
            enc = row - (left + prev) // 2
        elif ft == 4:  # Paeth
            enc = row - _paeth_predict(left, prev, prev_left)
        else:
            raise PngError(f"bad filter {ft}")
        lines.append(ft)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(lines), level)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth_predict(left: np.ndarray, up: np.ndarray, up_left: np.ndarray) -> np.ndarray:
    p = left + up - up_left
    pa_ = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - up_left)
    out = np.where((pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, up, up_left))
    return out


def _parse_chunks(payload: bytes):
    if payload[:8] != _SIGNATURE:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        # CRC is verified when present; a truncated trailer is an error
        crc_at = pos + 8 + length
        if crc_at + 4 > n:
            raise PngError("truncated CRC")
        (crc,) = struct.unpack_from(">I", payload, crc_at)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise PngError(f"bad CRC in {tag!r}")
        yield tag, data
        pos = crc_at + 4
        if tag == b"IEND":
            return
    raise PngError("missing IEND")


def _unfilter(lines: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct scanlines in place-order; ``lines`` is (h, stride)
    uint8 of filtered bytes, ``filters`` the per-row filter types.
    Vectorized per row (Sub via modular cumsum over bpp lanes, Up as
    one add); Average/Paeth walk pixels with numpy ops across the bpp
    lanes (bounded by image width, not corpus size)."""
    h, stride = lines.shape
    if stride % bpp:
        raise PngError("scanline not a multiple of bpp")
    lanes = stride // bpp
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = int(filters[r])
        row = lines[r]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:  # Sub: prefix sum mod 256 along each lane
            rec = np.cumsum(row.reshape(lanes, bpp), axis=0, dtype=np.uint8).reshape(stride)
        elif ft == 2:  # Up
            rec = row + prev  # uint8 wraps mod 256
        elif ft == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint16)
            rw = row.reshape(lanes, bpp).astype(np.uint16)
            pv = prev.reshape(lanes, bpp).astype(np.uint16)
            for p in range(lanes):
                cur = (rw[p] + ((left + pv[p]) >> 1)) & 0xFF
                rec[p * bpp : (p + 1) * bpp] = cur.astype(np.uint8)
                left = cur
        elif ft == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.int16)
            up_left = np.zeros(bpp, dtype=np.int16)
            rw = row.reshape(lanes, bpp).astype(np.int16)
            pv = prev.reshape(lanes, bpp).astype(np.int16)
            for p in range(lanes):
                pred = _paeth_predict(left, pv[p], up_left)
                cur = (rw[p] + pred) & 0xFF
                rec[p * bpp : (p + 1) * bpp] = cur.astype(np.uint8)
                up_left = pv[p]
                left = cur
        else:
            raise PngError(f"bad filter byte {ft}")
        recon[r] = rec
        prev = rec
    return recon


_ADAM7 = (
    # (x_start, x_step, y_start, y_step) per pass, PNG spec order
    (0, 8, 0, 8),
    (4, 8, 0, 8),
    (0, 4, 4, 8),
    (2, 4, 0, 4),
    (0, 2, 2, 4),
    (1, 2, 0, 2),
    (0, 1, 1, 2),
)


def _deinterlace_adam7(raw: bytes, w: int, h: int, bit_depth: int, channels: int) -> np.ndarray:
    """Adam7 reconstruction for byte-aligned samples (bit depth 8/16):
    each of the 7 passes is an independently-filtered sub-image; its
    reconstructed pixels scatter onto the (x_start + i·x_step,
    y_start + j·y_step) grid.  Returns (h, full_stride) uint8 like the
    non-interlaced path."""
    sample_bytes = bit_depth // 8
    px_bytes = sample_bytes * channels
    out = np.zeros((h, w * px_bytes), dtype=np.uint8)
    pos = 0
    for x0, xs, y0, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * px_bytes
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise PngError("IDAT length mismatch (interlaced)")
        mat = np.frombuffer(raw, dtype=np.uint8, count=need, offset=pos).reshape(ph, stride + 1)
        pos += need
        recon = _unfilter(np.ascontiguousarray(mat[:, 1:]), mat[:, 0], px_bytes)
        cells = recon.reshape(ph, pw, px_bytes)
        rows = y0 + ys * np.arange(ph)
        cols = x0 + xs * np.arange(pw)
        view = out.reshape(h, w, px_bytes)
        view[np.ix_(rows, cols)] = cells
    if pos != len(raw):
        raise PngError("IDAT length mismatch (interlaced)")
    return out


def _unpack_bits(row_bytes: np.ndarray, bit_depth: int, n_values: int) -> np.ndarray:
    """Expand sub-byte samples (bit depth 1/2/4) to one uint8 sample
    per value, left-to-right MSB-first per the spec."""
    bits = np.unpackbits(row_bytes, axis=-1)
    per = bit_depth
    n_slots = bits.shape[-1] // per
    vals = np.zeros(bits.shape[:-1] + (n_slots,), dtype=np.uint8)
    for b in range(per):
        vals = (vals << 1) | bits[..., b::per][..., :n_slots]
    return vals[..., :n_values]


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG byte stream to an (h, w, channels) uint8 array.

    Raises :class:`PngError` (a ``ValueError``) for non-PNG bytes,
    corrupt streams, or out-of-scope features (Adam7 interlace).
    Sub-byte depths are scaled to 8-bit (max-value scaling, matching
    PIL's convert); 16-bit takes the high byte.
    """
    ihdr = None
    plte = None
    idat = []
    for tag, data in _parse_chunks(bytes(payload)):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, bit_depth, color_type, compression, filter_method, interlace = ihdr
    if compression != 0 or filter_method != 0:
        raise PngError("unknown compression/filter method")
    if interlace not in (0, 1):
        raise PngError(f"bad interlace method {interlace}")
    if interlace == 1 and bit_depth not in (8, 16):
        # Adam7 with sub-byte packing re-packs bits per pass; out of
        # scope (rare in the wild) — 8/16-bit interlaced is handled
        raise PngError("Adam7 interlace supported for bit depth 8/16 only")
    if color_type not in _CHANNELS:
        raise PngError(f"bad color type {color_type}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise PngError(f"bad bit depth {bit_depth}")
    if w < 1 or h < 1 or w > 1 << 24 or h > 1 << 24:
        raise PngError("bad dimensions")
    channels = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise PngError(f"bad IDAT stream: {exc}") from None
    bits_per_px = bit_depth * channels
    bpp = max(1, (bits_per_px + 7) // 8)
    if interlace == 1:
        recon = _deinterlace_adam7(raw, w, h, bit_depth, channels)
        stride = w * channels * (bit_depth // 8)
    else:
        stride = (w * bits_per_px + 7) // 8
        if len(raw) != h * (stride + 1):
            raise PngError("IDAT length mismatch")
        mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        filters, lines = mat[:, 0], np.ascontiguousarray(mat[:, 1:])
        recon = _unfilter(lines, filters, bpp)

    if bit_depth == 8:
        px = recon.reshape(h, stride)[:, : w * channels].reshape(h, w, channels)
    elif bit_depth == 16:
        px = recon.reshape(h, -1)[:, : 2 * w * channels].reshape(h, w, channels, 2)[..., 0]
    else:  # 1/2/4-bit gray or palette indices
        vals = _unpack_bits(recon, bit_depth, w)  # (h, w) one sample per px
        if color_type == 3:
            px = vals.reshape(h, w, 1)
        else:  # scale to 8-bit: v * 255 // (2^d - 1)
            scale = 255 // ((1 << bit_depth) - 1)
            px = (vals * scale).astype(np.uint8).reshape(h, w, 1)
    if color_type == 3:
        if plte is None:
            raise PngError("palette image without PLTE")
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise PngError("palette index out of range")
        px = plte[idx]
    return np.ascontiguousarray(px)


def gray_from_pixels(px: np.ndarray) -> np.ndarray:
    """Integer ITU-R 601 luma for (h, w, c) uint8 → (h, w) uint8.
    c=1 gray, c=2 gray+alpha (alpha dropped), c=3 RGB, c=4 RGBA."""
    c = px.shape[2]
    if c in (1, 2):
        return px[..., 0]
    r = px[..., 0].astype(np.int64)
    g = px[..., 1].astype(np.int64)
    b = px[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def gray_thumb(gray: np.ndarray, thumb: int = 8) -> np.ndarray:
    """Integer-exact area-mean downsample of an (h, w) uint8 image to
    thumb×thumb int64 — the deterministic thumbnail contract shared by
    the Ray stages and the sequential goldens (floor boundaries
    ``(i·n)//thumb``, floor mean per cell; cells smaller than the
    image dimension collapse to single rows/cols)."""
    gray = np.asarray(gray, dtype=np.int64)
    h, w = gray.shape
    if h == 0 or w == 0:
        return np.zeros((thumb, thumb), dtype=np.int64)
    rb = (np.arange(thumb + 1, dtype=np.int64) * h) // thumb
    cb = (np.arange(thumb + 1, dtype=np.int64) * w) // thumb
    # 2-D prefix sums make each cell sum O(1)
    integral = np.zeros((h + 1, w + 1), dtype=np.int64)
    integral[1:, 1:] = gray.cumsum(0).cumsum(1)
    out = np.zeros((thumb, thumb), dtype=np.int64)
    for i in range(thumb):
        r0, r1 = rb[i], max(rb[i + 1], rb[i] + 1)
        r1 = min(r1, h)
        r0 = min(r0, h - 1)
        for j in range(thumb):
            c0, c1 = cb[j], max(cb[j + 1], cb[j] + 1)
            c1 = min(c1, w)
            c0 = min(c0, w - 1)
            area = (r1 - r0) * (c1 - c0)
            s = (
                integral[r1, c1]
                - integral[r0, c1]
                - integral[r1, c0]
                + integral[r0, c0]
            )
            out[i, j] = s // max(area, 1)
    return out
