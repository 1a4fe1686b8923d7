"""Pure-stdlib Y4M (YUV4MPEG2) video codec — the real tier of the
video frame-grab seam.

Y4M is the simplest published raw-video container (mjpegtools): an
ASCII header line, then per frame an ASCII ``FRAME`` marker followed
by raw planar YCbCr samples.  No entropy coding, so a full-fidelity
frame grab needs nothing beyond byte slicing — which makes it the one
video format this codec-free sandbox can decode for REAL.  The
reference's video path would use a real codec library; rows in other
containers still take the marked seam (`stages/media.py`).

Supported colorspaces: C420 / C420jpeg / C420mpeg2 / C420paldv
(chroma at quarter size), C422 (half width), C444 (full), Cmono
(luma only).  Interlaced content is out of scope (``Ip`` only).
Malformed payloads raise :class:`Y4mError` (a ``ValueError``).
"""

from __future__ import annotations

import numpy as np


class Y4mError(ValueError):
    """Malformed or out-of-scope Y4M payload."""


_MAGIC = b"YUV4MPEG2"


def _chroma_size(cs: str, w: int, h: int) -> int:
    if cs.startswith("420"):
        return ((w + 1) // 2) * ((h + 1) // 2)
    if cs.startswith("422"):
        return ((w + 1) // 2) * h
    if cs.startswith("444"):
        return w * h
    if cs == "mono":
        return 0
    raise Y4mError(f"unsupported colorspace C{cs}")


def parse_y4m_header(payload: bytes) -> tuple[int, int, str, int]:
    """Return (width, height, colorspace, header_end_offset)."""
    if not payload.startswith(_MAGIC):
        raise Y4mError("not a Y4M stream (bad magic)")
    nl = payload.find(b"\n", 0, 512)
    if nl < 0:
        raise Y4mError("unterminated Y4M header")
    w = h = 0
    cs = "420"
    for tok in payload[len(_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        try:
            if key == b"W":
                w = int(val)
            elif key == b"H":
                h = int(val)
            elif key == b"C":
                cs = val.decode("ascii", "replace")
            elif key == b"I" and val not in (b"p", b"?"):
                raise Y4mError("interlaced Y4M not supported")
        except ValueError as exc:
            raise Y4mError(f"bad Y4M header token {tok!r}: {exc}") from None
    if w < 1 or h < 1 or w > 1 << 16 or h > 1 << 16:
        raise Y4mError(f"bad Y4M dimensions {w}x{h}")
    return w, h, cs, nl + 1


def iter_y4m_luma(payload: bytes):
    """Yield (frame_index, (h, w) uint8 luma plane) for every frame —
    a zero-copy slice per frame (``np.frombuffer``), chroma skipped
    by offset arithmetic.  Raises :class:`Y4mError` on truncation or
    a missing FRAME marker (a short final frame is an error, not a
    silent drop)."""
    w, h, cs, pos = parse_y4m_header(bytes(payload))
    y_size = w * h
    frame_size = y_size + 2 * _chroma_size(cs, w, h)
    buf = bytes(payload)
    n = len(buf)
    idx = 0
    while pos < n:
        if not buf.startswith(b"FRAME", pos):
            raise Y4mError(f"missing FRAME marker at offset {pos}")
        nl = buf.find(b"\n", pos, pos + 256)
        if nl < 0:
            raise Y4mError("unterminated FRAME header")
        data_at = nl + 1
        if data_at + frame_size > n:
            raise Y4mError(f"truncated frame {idx}")
        luma = np.frombuffer(buf, dtype=np.uint8, count=y_size, offset=data_at).reshape(h, w)
        yield idx, luma
        pos = data_at + frame_size
        idx += 1


def encode_y4m(frames: np.ndarray, *, colorspace: str = "420") -> bytes:
    """Serialize (n, h, w) uint8 luma frames as a real Y4M stream
    (chroma planes neutral 128) — the deterministic fixture writer
    shared with the sequential goldens."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3 or frames.shape[0] < 1:
        raise Y4mError(f"encode_y4m wants (n,h,w) uint8, got {frames.shape}")
    n, h, w = frames.shape
    chroma = bytes([128]) * _chroma_size(colorspace, w, h)
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{colorspace}\n".encode("ascii"))
    for f in range(n):
        out += b"FRAME\n"
        out += frames[f].tobytes()
        out += chroma
        out += chroma
    return bytes(out)
