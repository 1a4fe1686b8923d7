"""Multimodal column plumbing (image/audio/video as opaque binary).

The reference's picture path crops page images and calls a second VLM
to describe them (A2, app/utils/executor/ocr_task.py:150-203).  This
container has no image/audio codecs, so the DECODE step is stubbed —
either a clearly-marked ``NotImplementedError`` (real codec path) or a
deterministic fake — while all the Ray-side plumbing (schema, actor
pool, batch sizing for fat binary rows, output layout) is real and
tested.

Schema convention: media rows are
``(media_id:int64, kind:string, payload:binary, meta:string)`` and
feature rows add ``(n_bytes:int64, digest:string, feat:list<float>)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.string()),
    ]
)


try:  # optional dependency: the real codec when the host has one
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # this container ships no codec — fake path stays
    _PILImage = None


def have_codec() -> bool:
    """True when a real image codec (PIL) is importable."""
    return _PILImage is not None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_gray_image(payload: bytes) -> np.ndarray:
    """REAL pixel decode to an (h, w) uint8 grayscale array.

    PNG payloads take the pure-stdlib tier (`kernel/png.py`: chunk
    parse + zlib inflate + per-scanline filter reconstruction +
    integer luma) — deterministic, dependency-free, shared verbatim
    with the sequential golden oracles, so real decode sits under the
    driver's hash gate in THIS sandbox.  Non-PNG formats fall back to
    PIL when importable and raise the marked ``NotImplementedError``
    otherwise (the remaining honest seam: JPEG/WebP need a real codec
    library).  Corrupt PNG bytes raise ``ValueError`` — stages route
    them to rejected/fake, never crash."""
    if bytes(payload[:8]) == _PNG_SIG:
        from dots_ocr_ray.kernel.png import decode_png, gray_from_pixels

        return gray_from_pixels(decode_png(payload))
    if _PILImage is None:
        raise NotImplementedError(
            "non-PNG payload and no image codec in this environment — "
            "use MediaFeatureActor(fake_decode=True) or PNG payloads"
        )
    import io

    img = _PILImage.open(io.BytesIO(payload))
    return np.asarray(img.convert("L"), dtype=np.uint8)


def decode_image_real(payload: bytes, *, thumb: int = 8) -> np.ndarray:
    """Real decode → deterministic ``thumb×thumb`` grayscale thumbnail
    as a flat int64 array (the contract :func:`chunk_image` fakes).
    The downsample is the integer-exact area mean
    (`kernel/png.py:gray_thumb`) on every tier, so the value is
    platform- and codec-independent for PNG inputs."""
    from dots_ocr_ray.kernel.png import gray_thumb

    return gray_thumb(decode_gray_image(payload), thumb).ravel()


class MediaFeatureActor:
    """Actor-pool stage: decode → feature-extract per media row.

    Use SMALL batch_size with this stage: payload rows are MBs, and
    batch_size × concurrency × row_bytes must fit the worker heap
    (SURVEY.md §4 'wide binary rows').

    ``fake_decode`` derives a deterministic 16-dim feature vector from
    the payload bytes (blake2b-seeded), standing in for a real
    embedding model with identical plumbing.

    ``roundtrip=True`` (implies real decode) treats each payload as a
    PNG carrying a byte string as gray pixels
    (`fixtures.text_png_payload`): the stage REALLY decodes (zlib
    inflate + filter reconstruction), recovers the original bytes via
    the ``meta`` JSON's ``len``, and reports their md5 + length — so
    an ANSI-SQL oracle (``md5(text)``) certifies genuine pixel decode
    row by row.  Corrupt payloads route to ``n_bytes=-1``/empty
    digest, never raise.
    """

    def __init__(self, fake_decode: bool = True, feat_dim: int = 16, roundtrip: bool = False):
        self.fake_decode = fake_decode and not roundtrip
        self.feat_dim = feat_dim
        self.roundtrip = roundtrip

    def _features(self, payload: bytes) -> np.ndarray:
        if not self.fake_decode:
            # real codec path (PIL): grayscale thumbnail pixels,
            # tiled/truncated to feat_dim, normalized to [-1, 1]
            px = decode_image_real(payload)
            reps = -(-self.feat_dim // len(px))
            v = np.tile(px, reps)[: self.feat_dim].astype(np.float32)
            return (v - 127.5) / 127.5
        # blake2b caps digest_size at 64: wider feature dims chain
        # counter-salted blocks instead of crashing the stage
        blocks = []
        remaining = self.feat_dim
        i = 0
        while remaining > 0:
            size = min(remaining, 64)
            blocks.append(
                hashlib.blake2b(
                    payload, digest_size=size, salt=i.to_bytes(8, "little")
                ).digest()
            )
            remaining -= size
            i += 1
        digest = b"".join(blocks)
        return (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.roundtrip:
            return self._roundtrip_batch(batch, payloads)
        feats = [self._features(p or b"") for p in payloads]
        out = pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array([len(p or b"") for p in payloads], type=pa.int64()),
                "digest": pa.array(
                    [hashlib.md5(p or b"").hexdigest() for p in payloads], type=pa.string()
                ),
                "feat": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )
        return out

    def _roundtrip_batch(self, batch: pa.Table, payloads: list) -> pa.Table:
        import json

        n_bytes, digests, feats = [], [], []
        for payload, meta in zip(payloads, batch.column("meta").to_pylist()):
            try:
                from dots_ocr_ray.kernel.png import gray_thumb

                want = int(json.loads(meta or "{}").get("len", 0))
                gray = decode_gray_image(payload or b"")  # ONE real decode per row
                data = gray.reshape(-1)[:want].tobytes()
                n_bytes.append(len(data))
                digests.append(hashlib.md5(data).hexdigest())
                px = gray_thumb(gray, 8).ravel()
                reps = -(-self.feat_dim // len(px))
                v = np.tile(px, reps)[: self.feat_dim].astype(np.float32)
                feats.append((v - 127.5) / 127.5)
            except (ValueError, KeyError, TypeError, NotImplementedError):
                # corrupt PNG (ValueError) or a non-PNG payload on the
                # codec-free tier (NotImplementedError): error row out
                n_bytes.append(-1)
                digests.append("")
                feats.append(np.zeros(self.feat_dim, dtype=np.float32))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "digest": pa.array(digests, type=pa.string()),
                "feat": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )


class MediaResizeActor:
    """Image-resize plumbing: the TARGET geometry is computed by the
    real kernel (`kernel/geometry.py:smart_resize` — the reference's
    M1 pixel-budget rule, factor-28 rounding, aspect-ratio reject);
    only the pixel resample itself is the stubbed codec seam.

    Input rows carry source dims in ``meta`` JSON (``{"w":..,"h":..}``);
    output adds (src_w, src_h, dst_w, dst_h, resize_status) and keeps
    the payload column for the downstream stage.  Oversized/degenerate
    geometry is routed to status="rejected", never raised."""

    def __init__(self, fake_decode: bool = True):
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        from dots_ocr_ray.kernel.geometry import smart_resize

        src_w, src_h, dst_w, dst_h, status = [], [], [], [], []
        for payload, meta in zip(
            batch.column("payload").to_pylist(), batch.column("meta").to_pylist()
        ):
            try:
                m = json.loads(meta or "{}")
                if not isinstance(m, dict):  # meta='null' / list / str
                    m = {}
                w, h = int(m.get("w", 0)), int(m.get("h", 0))
            except (ValueError, TypeError):
                w = h = 0
            src_w.append(w)
            src_h.append(h)
            if w <= 0 or h <= 0:
                dst_w.append(0)
                dst_h.append(0)
                status.append("rejected")
                continue
            try:
                rh, rw = smart_resize(h, w)
                if not self.fake_decode:
                    # real path: decode-validate the payload (PIL);
                    # corrupt bytes route to rejected, never raise
                    decode_image_real(payload or b"")
                dst_w.append(rw)
                dst_h.append(rh)
                status.append("resized")
            except (ValueError, OSError):
                dst_w.append(0)
                dst_h.append(0)
                status.append("rejected")
        return (
            batch.append_column("src_w", pa.array(src_w, type=pa.int32()))
            .append_column("src_h", pa.array(src_h, type=pa.int32()))
            .append_column("dst_w", pa.array(dst_w, type=pa.int32()))
            .append_column("dst_h", pa.array(dst_h, type=pa.int32()))
            .append_column("resize_status", pa.array(status, type=pa.string()))
        )


class FrameSampleActor:
    """Video frame-sampling stage (flat_map shape: 1 row → n rows).

    Real tier (``fake_decode=False``): payloads are Y4M streams and
    every ``every_nth``-th frame is genuinely grabbed — header parse,
    chroma-offset arithmetic, zero-copy luma slice
    (`kernel/y4m.py:iter_y4m_luma`); the row gains the frame's exact
    integer mean luma and 8×8-thumbnail digest, and corrupt payloads
    route to a ``frame_idx=-1`` error row rather than raising.  The
    fake tier keeps the original 1-frame-per-4KiB plumbing stand-in
    for non-Y4M containers (the remaining marked seam: real codecs
    aren't in this sandbox)."""

    def __init__(self, every_nth: int = 10, fake_decode: bool = True):
        self.every_nth = every_nth
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idx, frame_digest, mean_luma = [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            payload = payload or b""
            if not self.fake_decode:
                from dots_ocr_ray.kernel.png import gray_thumb
                from dots_ocr_ray.kernel.y4m import Y4mError, iter_y4m_luma

                try:
                    for f, luma in iter_y4m_luma(payload):
                        if f % self.every_nth:
                            continue
                        media_ids.append(mid)
                        frame_idx.append(f)
                        mean_luma.append(int(luma.sum()) // luma.size)
                        frame_digest.append(
                            hashlib.blake2b(
                                gray_thumb(luma, 8).astype(np.int64).tobytes(),
                                digest_size=8,
                            ).hexdigest()
                        )
                except Y4mError:
                    media_ids.append(mid)
                    frame_idx.append(-1)
                    mean_luma.append(-1)
                    frame_digest.append("")
                continue
            # fake: pretend 1 frame per 4 KiB of payload
            n_frames = max(1, len(payload) // 4096)
            for f in range(0, n_frames, self.every_nth):
                media_ids.append(mid)
                frame_idx.append(f)
                mean_luma.append(-1)
                frame_digest.append(
                    hashlib.blake2b(payload + f.to_bytes(4, "big"), digest_size=8).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(media_ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "mean_luma": pa.array(mean_luma, type=pa.int64()),
                "frame_digest": pa.array(frame_digest, type=pa.string()),
            }
        )


def chunk_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoded 8×8 grayscale thumbnail:
    the payload split into 64 contiguous chunks (integer boundaries
    floor(i·n/64)), pixel = scaled mean byte value of the chunk.
    Unlike a cryptographic digest this PRESERVES LOCALITY — a small
    edit moves one pixel slightly, a small length change shifts chunk
    boundaries by a tiny fraction of chunk width — exactly the
    property perceptual hashing needs.  Swap in a real
    decode+downsample at the marked codec seam.  Integer-exact."""
    if not payload:
        return np.zeros(64, dtype=np.int64)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    n = len(arr)
    bounds = (np.arange(65, dtype=np.int64) * n) // 64
    starts = bounds[:-1].copy()
    # reduceat needs strictly valid starts; duplicate boundaries (n<64)
    # produce zero-width chunks we then zero out explicitly
    widths = np.diff(bounds)
    sums = np.add.reduceat(arr, np.minimum(starts, n - 1))
    sums[widths == 0] = 0
    return np.where(widths > 0, (256 * sums) // np.maximum(widths, 1), 0)


def phash64(payload: bytes) -> int:
    """Average-hash perceptual fingerprint: bit i of the 64-bit hash
    is 1 iff pixel i of the (stand-in) 8×8 image is strictly above
    the image mean (integer-exact comparison 64·pixel > Σpixels).
    Near-duplicate payloads differ in few bits, so Hamming-radius
    clustering finds them.  Pure kernel shared by the Ray stage and
    the sequential golden."""
    img = chunk_image(payload)
    bits = (64 * img > img.sum()).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def phash64_pixels(thumb_flat: np.ndarray) -> int:
    """Average hash over an already-decoded flat 8×8 thumbnail (the
    same bit rule as :func:`phash64`, real-pixel tier)."""
    img = np.asarray(thumb_flat, dtype=np.int64).ravel()[:64]
    bits = (64 * img > img.sum()).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def phash64_png(payload: bytes) -> int:
    """Perceptual hash over REAL decoded pixels: stdlib PNG decode →
    integer luma → integer-exact 8×8 area-mean thumbnail → average
    hash.  Pure kernel shared by the Ray stage and the sequential
    golden; raises ``ValueError`` for non-PNG bytes."""
    return phash64_pixels(decode_image_real(payload, thumb=8))


def caption_image_real(payload: bytes) -> str:
    """Deterministic caption from REAL decoded pixels — the
    describe-pool (A2) stand-in whose every field is verifiable:
    ``[image WxH mean M]`` with M the exact integer mean gray value.
    A real captioning model drops in at this seam; corrupt payloads
    caption as ``[image invalid]``, never raise."""
    try:
        gray = decode_gray_image(payload)
    except (ValueError, NotImplementedError):
        return "[image invalid]"
    h, w = gray.shape
    m = int(gray.astype(np.int64).sum()) // max(1, gray.size)
    return f"[image {w}x{h} mean {m}]"


def png_text_roundtrip(payload: bytes, n_bytes: int) -> bytes:
    """Recover the original byte string carried as PNG gray pixels
    (row-major, zero-padded): REAL decode, then trim to ``n_bytes``.
    The inverse of `fixtures.text_png_payload` — used by the
    media-features query so its md5-digest SQL oracle certifies a
    genuine zlib-inflate + filter-reconstruction pass per row."""
    gray = decode_gray_image(payload)
    return gray.reshape(-1)[: int(n_bytes)].tobytes()
