"""Multimodal column stages: decode / resize / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

Images/audio/video travel as opaque ``binary`` columns with typed
metadata (w, h, fmt, ...). The engine's own raw/q6 image codec is real
(images.codec); external codecs (JPEG/PNG, audio, video) are STUBS in
this environment — the container has no PIL/ffmpeg (SURVEY.md §0) —
but the Ray-side plumbing (schemas, actor signatures, batch layout,
backpressure-friendly batch sizes) is real and tested. A stub either
raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake payload (test mode), clearly marked.

These are CALLABLE-CLASS stages on purpose: a real decoder loads
codec tables / models once per actor in ``__init__`` and streams
batches through ``__call__``.

All hot paths are whole-batch vectorized: variable-size payloads are
gathered zero-copy from the Arrow binary buffers into one padded
``(n, maxlen)`` uint8 matrix, and decode / luma / phash / resize run
as single numpy passes over the block with per-image index arithmetic.
Bit-exactness vs the scalar ``images.codec`` kernels holds because
every summation is an exact integer in float64 (pixels are uint8, so
all partial sums are < 2^53) and the integral-image / median / bit-
pack operation order is preserved; pinned by
tests/test_media_vectorized.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..images.codec import decode, phash64

__all__ = [
    "ImageDecodeActor",
    "ImageResizeActor",
    "AudioFeatureActor",
    "VideoFrameSampleActor",
    "decode_and_featurize",
    "resize_images",
]

_SUPPORTED_FMTS = {"raw", "q6"}


def _binary_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow binary column → (data uint8, offsets int64 (n+1,)), zero-copy.

    Offsets are rebased so data[off[i]:off[i+1]] is row i's payload and
    rows tile contiguously (Arrow guarantees off[i+1] == off[i] + len_i).
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off = np.frombuffer(bufs[1], np.int64)
    else:
        off = np.frombuffer(bufs[1], np.int32).astype(np.int64)
    off = off[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, off


def _gather_padded(data: np.ndarray, starts: np.ndarray, maxlen: int) -> np.ndarray:
    """(n,) row starts → (n, maxlen) uint8 gather (tail bytes are junk
    the caller masks; indices are clamped so padding never reads OOB)."""
    idx = starts[:, None] + np.arange(maxlen, dtype=np.int64)[None, :]
    np.minimum(idx, max(len(data) - 1, 0), out=idx)
    if len(data) == 0:
        return np.zeros((len(starts), maxlen), np.uint8)
    return data[idx]


def _decode_block(
    px: np.ndarray, is_q6: np.ndarray, valid: np.ndarray
) -> np.ndarray:
    """In-place q6 dequantize ((v << 2) | 2, uint8 wrap — identical to
    images.codec.decode) and zero the padding tail."""
    if is_q6.any():
        q = px[is_q6]
        px[is_q6] = (q << 2) | 2
    px[~valid] = 0
    return px


def _featurize_supported(
    data: np.ndarray, off: np.ndarray, w: np.ndarray, h: np.ndarray, is_q6: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(phash int64, mean_luma f64) for a block of raw/q6 payloads,
    bit-identical to decode() + phash64() + pixels.mean() per row.

    No padded decode matrix is built. Luma sums come straight off the
    raw bytes (one reduceat; q6 decode is affine: Σdec = 4·Σraw+2·n_px,
    exact in int64). The phash grayscale numerator is the per-pixel
    channel sum on the flat stride-3 buffer ((4·t+6)/3 for q6 ≡
    ((4a+2)+(4b+2)+(4c+2))/3 — same exact integer numerator), scattered
    once into a dense (n, maxh×maxw) grid via per-distinct-width index
    patterns. The y-integral is a sequential in-place row loop
    (commutative adds == np.cumsum(axis=0) bitwise); the x-cumsum runs
    only on the 8 boundary rows each image actually reads.

    Caller guarantees: every row raw|q6, len == w·h·3 > 0, and row
    starts 3-aligned (true whenever the buffer tiles image rows).
    """
    n = len(w)
    need = w * h * 3
    npix = need // 3
    base = int(off[0])
    if base % 3:
        data = np.ascontiguousarray(data[base : off[-1]])
        off = off - base
        base = 0
    seg = data[base : off[-1]].astype(np.int64)
    sums = np.add.reduceat(seg, off[:-1] - base)
    dec_sums = np.where(is_q6, 4 * sums + 2 * need, sums)
    means = dec_sums / need  # scalar px.mean() == exact int sum / n_px

    flat = data[base : off[-1]]
    triple = flat[0::3].astype(np.uint16)
    triple += flat[1::3]
    triple += flat[2::3]
    tp = np.concatenate([triple, np.zeros(int(npix.max()), np.uint16)])
    pstart = (off[:-1] - base) // 3

    # padding waste tracks the LOCAL max: sort rows by pixel count and
    # run the grid pipeline on chunks of similar-size images
    order = np.argsort(npix, kind="stable")
    phashes = np.empty(n, np.int64)
    for lo in range(0, n, _PHASH_CHUNK):
        sel = order[lo : lo + _PHASH_CHUNK]
        phashes[sel] = _phash_chunk(
            tp, pstart[sel], w[sel], h[sel], npix[sel], is_q6[sel]
        )
    return phashes, means


_PHASH_CHUNK = 128


def _phash_chunk(
    tp: np.ndarray,
    pstart: np.ndarray,
    w: np.ndarray,
    h: np.ndarray,
    npix: np.ndarray,
    is_q6: np.ndarray,
) -> np.ndarray:
    """Batched phash64 for one similar-size chunk; see _featurize_supported."""
    n = len(w)
    maxpix = int(npix.max())
    maxw = int(w.max())
    maxh = int(h.max())
    idx = pstart[:, None] + np.arange(maxpix, dtype=np.int64)[None, :]
    gray = tp[idx].astype(np.float64)
    if is_q6.any():
        sel = is_q6[:, None]
        np.multiply(gray, 4.0, out=gray, where=sel)
        np.add(gray, 6.0, out=gray, where=sel)
    gray /= 3.0

    # scatter into the dense grid; one index pattern per distinct width
    distinct_w, inv = np.unique(w, return_inverse=True)
    ar = np.arange(maxpix, dtype=np.int64)
    pats = np.empty((len(distinct_w), maxpix), np.int64)
    for j, wv in enumerate(distinct_w):
        yj = ar // wv
        pats[j] = yj * maxw + (ar - yj * wv)
    pos = pats[inv]
    spill = maxh * maxw
    np.copyto(pos, spill, where=ar[None, :] >= npix[:, None])
    grid = np.zeros((n, spill + 1))
    np.put_along_axis(grid, pos, gray, axis=1)

    g3 = grid[:, :spill].reshape(n, maxh, maxw)
    for yy in range(1, maxh):  # y-integral, scalar cumsum(0) bitwise
        g3[:, yy, :] += g3[:, yy - 1, :]
    ys = (np.arange(9, dtype=np.int64)[None, :] * h[:, None]) // 8
    xs = (np.arange(9, dtype=np.int64)[None, :] * w[:, None]) // 8
    yb = ys[:, 1:] - 1
    xb = xs[:, 1:] - 1
    rows = np.arange(n)[:, None]
    B = g3[rows, np.maximum(yb, 0), :]  # (n, 8, maxw) boundary rows
    Cx = B.cumsum(axis=2)  # scalar cumsum(1) per boundary row
    S = np.zeros((n, 9, 9))
    S[:, 1:, 1:] = Cx[
        np.arange(n)[:, None, None],
        np.arange(8)[None, :, None],
        np.maximum(xb, 0)[:, None, :],
    ]
    # a boundary at 0 (h<8 or w<8) means ii row/col 0, which is 0
    if (yb < 0).any() or (xb < 0).any():
        S[:, 1:, 1:] *= (yb >= 0)[:, :, None]
        S[:, 1:, 1:] *= (xb >= 0)[:, None, :]
    area = np.maximum(
        (ys[:, 1:] - ys[:, :-1])[:, :, None] * (xs[:, 1:] - xs[:, :-1])[:, None, :], 1
    )
    # scalar: (ii[y1,x1] - ii[y0,x1] - ii[y1,x0] + ii[y0,x0]) / area
    blocks = (S[:, 1:, 1:] - S[:, :-1, 1:] - S[:, 1:, :-1] + S[:, :-1, :-1]) / area
    fb = blocks.reshape(n, 64)
    med = np.median(fb, axis=1)
    bits = (fb > med[:, None]).astype(np.uint64)
    ph = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return ph.view(np.int64)


def _resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[yi][:, xi]


class ImageDecodeActor:
    """bytes → decoded stats + phash (decode tables built per actor).

    The supported-format path decodes and featurizes the WHOLE batch in
    one vectorized pass (padded gather + batched phash); only the
    env-blocked external-codec stub falls back to per-row handling.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict

    def _decode(self, payload, w, h, fmt):
        if fmt in _SUPPORTED_FMTS:
            return decode(payload, w, h, fmt)
        # external codec (jpeg/png/...) — STUB: not available in-sandbox
        if self.strict:
            raise NotImplementedError(
                f"fmt={fmt!r} needs an external codec (PIL) not present here"
            )
        rng = (len(payload) * 2654435761) & 0xFF
        return np.full((h, w, 3), rng, np.uint8)  # deterministic fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        fmts = np.asarray(batch["fmt"].to_pylist())
        data, off = _binary_parts(batch["bytes"])
        lens = off[1:] - off[:-1]

        sup = np.isin(fmts, list(_SUPPORTED_FMTS))
        need = w * h * 3
        if sup.all() and len(batch) and (need > 0).all():
            if (lens != need).any():
                k = int(np.flatnonzero(lens != need)[0])
                raise ValueError(f"payload size {lens[k]} != {w[k]}x{h[k]}x3")
            phashes, means = _featurize_supported(data, off, w, h, fmts == "q6")
        else:
            # stub / degenerate path: per-row, test-only
            phashes = np.zeros(n, np.int64)
            means = np.zeros(n, np.float64)
            for k in range(n):
                payload = data[off[k] : off[k + 1]].tobytes()
                dec = self._decode(payload, int(w[k]), int(h[k]), str(fmts[k]))
                phashes[k] = np.uint64(phash64(dec)).astype(np.int64)
                means[k] = float(dec.mean())

        cols = {
            "image_id": batch["image_id"],
            "phash_recomputed": pa.array(phashes, type=pa.int64()),
            "mean_luma": pa.array(means, type=pa.float64()),
        }
        # metadata passthrough: downstream invariant checks (stored
        # phash equality, mean→sum reconstruction) need these without
        # a join back to the table
        for name in ("phash", "w", "h", "fmt"):
            if name in batch.column_names:
                cols[name] = batch[name]
        return pa.table(cols)


class ImageResizeActor:
    """bytes → resized re-encoded bytes (thumbnailing stage), one
    vectorized nearest-neighbor gather per batch."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        fmts = np.asarray(batch["fmt"].to_pylist())
        bad = ~np.isin(fmts, list(_SUPPORTED_FMTS))
        if bad.any():
            raise ValueError(f"unknown fmt {fmts[bad.argmax()]!r}")
        data, off = _binary_parts(batch["bytes"])
        lens = off[1:] - off[:-1]
        need = w * h * 3
        if (lens != need).any():
            k = int(np.flatnonzero(lens != need)[0])
            raise ValueError(f"payload size {lens[k]} != {w[k]}x{h[k]}x3")
        maxlen = int(need.max()) if n else 0
        px = _gather_padded(data, off[:-1], maxlen)
        valid = np.arange(maxlen, dtype=np.int64)[None, :] < need[:, None]
        _decode_block(px, fmts == "q6", valid)

        ow, oh = self.out_w, self.out_h
        # scalar: yi = (arange(out_h) * h // out_h).clip(0, h - 1)
        yi = np.minimum((np.arange(oh, dtype=np.int64)[None, :] * h[:, None]) // oh, (h - 1)[:, None])
        xi = np.minimum((np.arange(ow, dtype=np.int64)[None, :] * w[:, None]) // ow, (w - 1)[:, None])
        idx = (yi[:, :, None] * w[:, None, None] + xi[:, None, :]) * 3
        idx3 = (idx[:, :, :, None] + np.arange(3, dtype=np.int64)).reshape(n, -1)
        out = np.take_along_axis(px, idx3, axis=1)  # (n, oh*ow*3) uint8

        stride = oh * ow * 3
        if n * stride > np.iinfo(np.int32).max:
            raise ValueError(
                f"resized payload block is {n * stride} bytes — past the "
                "int32 binary-offset limit; lower batch_size for this stage"
            )
        offsets = (np.arange(n + 1, dtype=np.int32) * stride)
        payload_col = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(np.ascontiguousarray(out).tobytes())],
        )
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": payload_col,
                "w": pa.array(np.full(n, ow, np.int32)),
                "h": pa.array(np.full(n, oh, np.int32)),
                "fmt": pa.array(["raw"] * n),
            }
        )


class AudioFeatureActor:
    """STUB audio feature extraction (no audio codec in-sandbox).

    Real deployment: load the decoder in ``__init__``, emit e.g.
    log-mel frames per batch. Here: deterministic per-payload energy
    proxy (np.array_split chunk means) so the pipeline shape is
    testable end-to-end — computed for the whole batch with one
    np.add.reduceat over the concatenated payload buffer (chunk sums
    are exact integers, so this matches the per-row chunk.mean()
    bit-for-bit)."""

    def __init__(self, n_features: int = 8):
        self.n_features = n_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        k = self.n_features
        data, off = _binary_parts(batch["bytes"])
        lens = off[1:] - off[:-1]
        feats = np.full((n, k), np.nan)
        ne = np.flatnonzero(lens > 0)
        if len(ne):
            eff = lens[ne]
            # np.array_split sizes: (l % k) chunks of l//k+1, then l//k
            sizes = (eff // k)[:, None] + (
                np.arange(k, dtype=np.int64)[None, :] < (eff % k)[:, None]
            )
            local = np.zeros((len(ne), k), np.int64)
            local[:, 1:] = sizes.cumsum(axis=1)[:, :-1]
            bounds = off[:-1][ne][:, None] + local - off[0]
            seg = data[off[0] : off[-1]].astype(np.float64)
            # a trailing zero-size chunk's bound can equal len(seg);
            # clamp for reduceat — its output is overwritten with nan
            np.minimum(bounds, max(len(seg) - 1, 0), out=bounds)
            sums = np.add.reduceat(seg, bounds.ravel()).reshape(len(ne), k)
            means = np.where(sizes > 0, sums / np.maximum(sizes, 1), np.nan)
            feats[ne] = means
        # empty payload: scalar path substituted zeros(1) → first chunk
        # mean 0.0, remaining k-1 chunks empty → nan
        feats[np.flatnonzero(lens == 0), 0] = 0.0
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * k, type=pa.int32())
        col = pa.ListArray.from_arrays(offsets, pa.array(feats.ravel(), type=pa.float64()))
        return pa.table({"image_id": batch["image_id"], "features": col})


class VideoFrameSampleActor:
    """STUB video frame sampling: treats the payload as concatenated
    raw frames and emits every ``stride``-th full frame's bytes. A real
    implementation swaps the slicer for a demuxer; the explode-to-rows
    layout (one row per sampled frame) is the part that matters.

    Vectorized: one gather builds every sampled frame of the batch from
    the concatenated payload buffer — no per-row Python."""

    def __init__(self, frame_bytes: int = 768, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb, st = self.frame_bytes, self.stride
        data, off = _binary_parts(batch["bytes"])
        lens = off[1:] - off[:-1]
        n_frames = np.maximum(lens // fb, 0)
        n_sampled = -(-n_frames // st)  # ceil: frames 0, st, 2·st, …
        total = int(n_sampled.sum())
        if total * fb > np.iinfo(np.int32).max:
            raise ValueError(
                f"sampled frames block is {total * fb} bytes — past the "
                "int32 binary-offset limit; lower batch_size for this stage"
            )
        row = np.repeat(np.arange(len(lens), dtype=np.int64), n_sampled)
        starts = np.concatenate([[0], np.cumsum(n_sampled)[:-1]]).astype(np.int64)
        frame_no = (
            (np.arange(total, dtype=np.int64) - np.repeat(starts, n_sampled)) * st
        )
        seg = data[off[0] : off[-1]]
        base = (off[:-1] - off[0])[row] + frame_no * fb
        mat = seg[base[:, None] + np.arange(fb, dtype=np.int64)[None, :]]
        frame_col = pa.Array.from_buffers(
            pa.binary(),
            total,
            [
                None,
                pa.py_buffer(
                    (np.arange(total + 1, dtype=np.int64) * fb)
                    .astype(np.int32)
                    .tobytes()
                ),
                pa.py_buffer(np.ascontiguousarray(mat).tobytes()),
            ],
        )
        return pa.table(
            {
                "image_id": batch["image_id"].take(pa.array(row)).cast(pa.string()),
                "frame_no": pa.array(frame_no.astype(np.int32), type=pa.int32()),
                "frame": frame_col,
            }
        )


class ImagePatchActor:
    """ViT-style patch extraction: decode → split each image into a
    valid grid of ``patch``×``patch``×3 patches → one output row per
    patch with a position-weighted checksum of the patch bytes (any
    wrong pixel, offset or decode path shifts the sum; the payload
    itself stays off the wire). Vectorized per (w, h) group — one
    stride-trick reshape + one int64 matvec per distinct dimension in
    the batch, no per-image Python."""

    def __init__(self, patch: int = 8):
        self.patch = patch

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.patch
        n = len(batch)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        fmts = np.asarray(batch["fmt"].to_pylist())
        bad = ~np.isin(fmts, list(_SUPPORTED_FMTS))
        if bad.any():
            raise ValueError(f"unknown fmt {fmts[bad.argmax()]!r}")
        data, off = _binary_parts(batch["bytes"])
        lens = off[1:] - off[:-1]
        need = w * h * 3
        if (lens != need).any():
            k = int(np.flatnonzero(lens != need)[0])
            raise ValueError(f"payload size {lens[k]} != {w[k]}x{h[k]}x3")
        maxlen = int(need.max()) if n else 0
        px = _gather_padded(data, off[:-1], maxlen)
        valid = np.arange(maxlen, dtype=np.int64)[None, :] < need[:, None]
        _decode_block(px, fmts == "q6", valid)

        weights = np.arange(1, p * p * 3 + 1, dtype=np.int64)
        rows_out: list[np.ndarray] = []
        py_out: list[np.ndarray] = []
        px_out: list[np.ndarray] = []
        ck_out: list[np.ndarray] = []
        dims = np.unique(np.stack([w, h], axis=1), axis=0) if n else np.zeros((0, 2), np.int64)
        for w0, h0 in dims:
            gy, gx = int(h0) // p, int(w0) // p
            if gy == 0 or gx == 0:
                continue
            idx = np.flatnonzero((w == w0) & (h == h0))
            m = px[idx, : int(w0) * int(h0) * 3].reshape(len(idx), int(h0), int(w0), 3)
            m = (
                m[:, : gy * p, : gx * p, :]
                .reshape(len(idx), gy, p, gx, p, 3)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(len(idx), gy, gx, p * p * 3)
            )
            cks = m.astype(np.int64) @ weights  # (k, gy, gx)
            rows_out.append(np.repeat(idx, gy * gx))
            py_out.append(np.tile(np.repeat(np.arange(gy, dtype=np.int64), gx), len(idx)))
            px_out.append(np.tile(np.tile(np.arange(gx, dtype=np.int64), gy), len(idx)))
            ck_out.append(cks.reshape(-1))
        if rows_out:
            rows = np.concatenate(rows_out)
            pys = np.concatenate(py_out)
            pxs = np.concatenate(px_out)
            cks = np.concatenate(ck_out)
        else:
            rows = np.zeros(0, np.int64)
            pys = pxs = cks = np.zeros(0, np.int64)
        return pa.table(
            {
                "image_id": batch["image_id"].take(pa.array(rows)).cast(pa.string()),
                "py": pa.array(pys),
                "px": pa.array(pxs),
                "cksum": pa.array(cks),
            }
        )


class ImagePyramidActor:
    """Mean-pool tile pyramid (the raster analogue of the vector tile
    pyramid): per image and level L, pool the decoded pixels over
    2^L × 2^L blocks with an exact integer sum // area, and emit one
    row per (image, level) carrying the pooled grid's position-weighted
    checksum. Vectorized per (w, h) group — one reshape-sum and one
    int64 matvec per (dim-group, level), no per-image Python."""

    def __init__(self, levels: tuple = (1, 2)):
        self.levels = tuple(levels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        fmts = np.asarray(batch["fmt"].to_pylist())
        bad = ~np.isin(fmts, list(_SUPPORTED_FMTS))
        if bad.any():
            raise ValueError(f"unknown fmt {fmts[bad.argmax()]!r}")
        data, off = _binary_parts(batch["bytes"])
        lens = off[1:] - off[:-1]
        need = w * h * 3
        if (lens != need).any():
            k = int(np.flatnonzero(lens != need)[0])
            raise ValueError(f"payload size {lens[k]} != {w[k]}x{h[k]}x3")
        maxlen = int(need.max()) if n else 0
        px = _gather_padded(data, off[:-1], maxlen)
        valid = np.arange(maxlen, dtype=np.int64)[None, :] < need[:, None]
        _decode_block(px, fmts == "q6", valid)

        rows_out: list[np.ndarray] = []
        lv_out: list[np.ndarray] = []
        gy_out: list[np.ndarray] = []
        gx_out: list[np.ndarray] = []
        ck_out: list[np.ndarray] = []
        dims = np.unique(np.stack([w, h], axis=1), axis=0) if n else np.zeros((0, 2), np.int64)
        for w0, h0 in dims:
            idx = np.flatnonzero((w == w0) & (h == h0))
            m = px[idx, : int(w0) * int(h0) * 3].reshape(len(idx), int(h0), int(w0), 3)
            for lv in self.levels:
                s = 1 << lv
                gy, gx = int(h0) // s, int(w0) // s
                if gy == 0 or gx == 0:
                    continue
                pooled = (
                    m[:, : gy * s, : gx * s, :]
                    .reshape(len(idx), gy, s, gx, s, 3)
                    .astype(np.int64)
                    .sum(axis=(2, 4))
                    // (s * s)
                )  # (k, gy, gx, 3)
                weights = np.arange(1, gy * gx * 3 + 1, dtype=np.int64)
                cks = pooled.reshape(len(idx), -1) @ weights
                rows_out.append(idx)
                lv_out.append(np.full(len(idx), lv, np.int64))
                gy_out.append(np.full(len(idx), gy, np.int64))
                gx_out.append(np.full(len(idx), gx, np.int64))
                ck_out.append(cks)
        if rows_out:
            rows = np.concatenate(rows_out)
            lvs = np.concatenate(lv_out)
            gys = np.concatenate(gy_out)
            gxs = np.concatenate(gx_out)
            cks = np.concatenate(ck_out)
        else:
            rows = np.zeros(0, np.int64)
            lvs = gys = gxs = cks = np.zeros(0, np.int64)
        return pa.table(
            {
                "image_id": batch["image_id"].take(pa.array(rows)).cast(pa.string()),
                "level": pa.array(lvs),
                "gy": pa.array(gys),
                "gx": pa.array(gxs),
                "cksum": pa.array(cks),
            }
        )


def decode_and_featurize(images, *, concurrency=(1, 4), batch_size: int = 1024):
    """Actor-pool decode stage; small batches — rows carry pixel bytes."""
    return images.map_batches(
        ImageDecodeActor,
        fn_constructor_kwargs={"strict": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(images, *, out_w=16, out_h=16, concurrency=(1, 4), batch_size=1024):
    return images.map_batches(
        ImageResizeActor,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
