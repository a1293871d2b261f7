"""Mask RLE / IoU library — ctypes bindings to the native ``libmaskops.so``
with pure-numpy fallbacks.

Replaces ``pycocotools._mask`` (Cython/C: RLE encode/decode/area/IoU, bbox
IoU with iscrowd semantics) used by the reference's COCO evaluation
(``object/coco_eval.py:10-12``, ``object/coco_utils.py:9``).

RLE convention matches COCO: column-major scan, counts alternate 0-runs and
1-runs starting with zeros.  Build the native library with ``make -C csrc``.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(root, "csrc", "libmaskops.so"),
                 os.path.join(root, "libmaskops.so")):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.rle_encode.restype = ctypes.c_int
            lib.rle_area.restype = ctypes.c_uint64
            _LIB = lib
            return lib
    return None


def native_available() -> bool:
    return _load_lib() is not None


# --------------------------------------------------------------------------
# RLE encode / decode / area
# --------------------------------------------------------------------------

def encode(mask: np.ndarray) -> dict:
    """Binary (H, W) mask → COCO-style uncompressed RLE dict."""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).ravel(order="F")
    lib = _load_lib()
    if lib is not None:
        cap = len(flat) + 2
        counts = np.zeros(cap, np.uint32)
        n = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
        assert n > 0
        return {"size": [h, w], "counts": counts[:n].tolist()}
    # numpy fallback
    diffs = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    edges = np.concatenate([[0], diffs, [len(flat)]])
    runs = np.diff(edges).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return {"size": [h, w], "counts": runs}


def col_runs_geometry(S: int, *, scale: float, pad: Sequence[int],
                      orig_size: Sequence[int]):
    """Per-IMAGE crop/nearest-resize geometry for :func:`rle_from_col_runs`
    — hoist out of the per-mask loop (an image's masks share it).
    Returns ``(xs, rinv, h, w)`` or the string ``"degenerate"``."""
    h, w = int(orig_size[0]), int(orig_size[1])
    nh = int(round(h * float(scale)))
    nw = int(round(w * float(scale)))
    px, py = int(pad[0]), int(pad[1])
    if nh <= 0 or nw <= 0:
        return "degenerate"
    xs = (px + np.clip(np.floor((np.arange(w) + 0.5) * nw / w), 0,
                       nw - 1).astype(np.int64)).astype(np.int32)
    L = py + np.clip(np.floor((np.arange(h) + 0.5) * nh / h), 0,
                     nh - 1).astype(np.int64)
    rinv = np.searchsorted(L, np.arange(S + 1),
                           side="left").astype(np.int32)
    return xs, rinv, h, w


def rle_from_packed_cols(packed: np.ndarray, S: int, *,
                         orig_size: Sequence[int],
                         scale: float = None, pad: Sequence[int] = None,
                         geom=None) -> dict:
    """Original-resolution COCO RLE straight from a COLUMN-MAJOR
    bit-packed letterbox mask ((S, ceil(S/8)) uint8, MSB-first —
    ``pack_mask_bits`` over the transposed mask).  The C side extracts
    per-column flips with uniform-byte skipping and stitches in the
    run-length domain — bit-exact vs
    ``rle_encode(_unletterbox_masks(mask))`` (pinned by
    tests/test_segmentation.py), no per-pixel host work, no flip cap.
    Keeps the 8-bits-per-pixel D2H (the tunneled transfer made wider
    runs arrays a net loss — PERF.md eval ledger)."""
    packed = np.ascontiguousarray(packed, np.uint8)
    rowbytes = packed.shape[-1]
    if geom is None:
        geom = col_runs_geometry(S, scale=scale, pad=pad,
                                 orig_size=orig_size)
    if geom == "degenerate":
        h, w = int(orig_size[0]), int(orig_size[1])
        return {"size": [h, w], "counts": [h * w]}
    xs, rinv, h, w = geom
    lib = _load_lib()
    if lib is not None:
        cap = h * w + 2
        out = np.zeros(cap, np.uint32)
        n = lib.rle_from_packed_cols(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            S, rowbytes,
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rinv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
        assert n > 0, "RLE capacity exceeded"
        return {"size": [h, w], "counts": out[:n].tolist()}
    # numpy fallback: unpack the columns, derive flips, reuse the runs
    # stitcher (correctness path only — the native lib is the fast path)
    bits = np.unpackbits(packed, axis=-1)[:, :S]          # (S_cols, S_rows)
    prev = np.concatenate([np.zeros((bits.shape[0], 1), bits.dtype),
                           bits[:, :-1]], axis=1)
    t = bits != prev
    counts = t.sum(axis=1).astype(np.int32)
    R = max(1, int(counts.max()))
    runs = np.full((bits.shape[0], R), S, np.int32)
    for c in np.nonzero(counts)[0]:
        f = np.flatnonzero(t[c])
        runs[c, :len(f)] = f
    return rle_from_col_runs(runs, counts, orig_size=orig_size, geom=geom)


def rle_from_col_runs(runs: np.ndarray, counts: np.ndarray, *,
                      scale: float = None, pad: Sequence[int] = None,
                      orig_size: Sequence[int] = None,
                      geom=None) -> Optional[dict]:
    """Original-resolution COCO RLE straight from per-COLUMN flip rows of a
    letterbox-resolution mask (``segmentation.mask_col_runs`` output) —
    crop + nearest resize + encode all in the run-length domain, O(w·flips)
    instead of the O(w·h) pixel chain (unpackbits → gather → rle_encode).

    ``runs``: (S, R) ascending letterbox flip rows per column (padding
    entries ≥ S beyond the true count); ``counts``: (S,) true flip counts.
    Exactly reproduces ``rle_encode(_unletterbox_masks(mask, ...))`` —
    pinned by ``tests/test_segmentation.py``.  Returns None when a used
    column's flip count exceeds R (device truncation: caller must fall
    back to the pixel path)."""
    runs = np.ascontiguousarray(runs, np.int32)
    counts = np.ascontiguousarray(counts, np.int32)
    S, R = runs.shape
    if geom is None:
        geom = col_runs_geometry(S, scale=scale, pad=pad,
                                 orig_size=orig_size)
    if geom == "degenerate":
        h, w = int(orig_size[0]), int(orig_size[1])
        return {"size": [h, w], "counts": [h * w]}
    xs, rinv, h, w = geom
    lib = _load_lib()
    if lib is not None:
        cap = w * (R + 1) + 2
        out = np.zeros(cap, np.uint32)
        n = lib.rle_from_col_runs(
            runs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            S, R,
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rinv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
        if n == -2:
            return None
        assert n > 0, "RLE capacity exceeded"
        return {"size": [h, w], "counts": out[:n].tolist()}
    # numpy fallback: same walk in python (cols × ≤R flips — small)
    out_counts: List[int] = []
    run = 0
    cur = 0
    for c in range(w):
        sc = int(xs[c])
        cnt = int(counts[sc])
        if cnt > R:
            return None
        buf: List[int] = []
        for i in range(cnt):
            f = int(runs[sc, i])
            r = 0 if f <= 0 else (h if f > S else int(rinv[f]))
            if buf and buf[-1] == r:
                buf.pop()
            else:
                buf.append(r)
        # column pixel value in [buf[j-1], buf[j]) is j's parity; a run
        # boundary also falls at the column border when the previous
        # column ended on the other value
        pos, v = 0, 0
        for r in buf + [h]:
            r = min(r, h)
            seg = r - pos
            if seg > 0:
                if v != cur:
                    out_counts.append(run)
                    run = 0
                    cur = v
                run += seg
            pos = r
            v ^= 1
            if r >= h:
                break
    out_counts.append(run)
    return {"size": [h, w], "counts": out_counts}


def decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.uint32)
    lib = _load_lib()
    if lib is not None:
        out = np.zeros(h * w, np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.reshape(w, h).T  # column-major -> (H, W)
    vals = np.zeros(int(counts.sum()), np.uint8)
    pos, v = 0, 0
    for c in counts:
        vals[pos:pos + int(c)] = v
        pos += int(c)
        v = 1 - v
    return vals[:h * w].reshape(w, h).T


def area(rle: dict) -> int:
    counts = np.asarray(rle["counts"], np.uint32)
    lib = _load_lib()
    if lib is not None:
        return int(lib.rle_area(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts)))
    return int(counts[1::2].sum())


def merge(rles: Sequence[dict]) -> dict:
    """Union-merge RLEs (for multi-polygon objects)."""
    if len(rles) == 1:
        return rles[0]
    m = decode(rles[0])
    for r in rles[1:]:
        m |= decode(r)
    return encode(m)


# --------------------------------------------------------------------------
# IoU (pycocotools semantics: iscrowd gt → intersection / dt area)
# --------------------------------------------------------------------------

def iou(dt, gt, iscrowd: Sequence[int]) -> np.ndarray:
    """IoU matrix (n_dt, n_gt).  dt/gt are either xywh box arrays or lists
    of RLE dicts — mirrors ``pycocotools.mask.iou``."""
    iscrowd = np.asarray(iscrowd, np.uint8)
    if isinstance(dt, np.ndarray) or (len(dt) and not isinstance(dt[0], dict)):
        return _bbox_iou(np.asarray(dt, np.float64),
                         np.asarray(gt, np.float64), iscrowd)
    return _rle_iou(list(dt), list(gt), iscrowd)


def _bbox_iou(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    n_dt, n_gt = len(dt), len(gt)
    if n_dt == 0 or n_gt == 0:
        return np.zeros((n_dt, n_gt))
    lib = _load_lib()
    if lib is not None:
        out = np.zeros((n_dt, n_gt), np.float64)
        dtc = np.ascontiguousarray(dt, np.float64)
        gtc = np.ascontiguousarray(gt, np.float64)
        ic = np.ascontiguousarray(iscrowd, np.uint8) if len(iscrowd) else \
            np.zeros(n_gt, np.uint8)
        lib.bbox_iou(dtc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_dt,
                     gtc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_gt,
                     ic.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    # numpy fallback
    dx0, dy0 = dt[:, 0:1], dt[:, 1:2]
    dx1, dy1 = dx0 + dt[:, 2:3], dy0 + dt[:, 3:4]
    gx0, gy0 = gt[None, :, 0], gt[None, :, 1]
    gx1, gy1 = gx0 + gt[None, :, 2], gy0 + gt[None, :, 3]
    iw = np.maximum(np.minimum(dx1, gx1) - np.maximum(dx0, gx0), 0)
    ih = np.maximum(np.minimum(dy1, gy1) - np.maximum(dy0, gy0), 0)
    inter = iw * ih
    da = (dt[:, 2] * dt[:, 3])[:, None]
    ga = (gt[:, 2] * gt[:, 3])[None, :]
    crowd = np.asarray(iscrowd, bool)[None, :] if len(iscrowd) else \
        np.zeros((1, len(gt)), bool)
    denom = np.where(crowd, da, da + ga - inter)
    return np.where(denom > 0, inter / np.maximum(denom, 1e-12), 0.0)


def _rle_iou(dt: List[dict], gt: List[dict], iscrowd: np.ndarray) -> np.ndarray:
    n_dt, n_gt = len(dt), len(gt)
    if n_dt == 0 or n_gt == 0:
        return np.zeros((n_dt, n_gt))
    lib = _load_lib()
    if lib is not None:
        def pack(rles):
            lens = np.array([len(r["counts"]) for r in rles], np.int32)
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
            counts = np.concatenate(
                [np.asarray(r["counts"], np.uint32) for r in rles])
            return counts, offs, lens
        dc, do, dl = pack(dt)
        gc, go, gl = pack(gt)
        ic = np.ascontiguousarray(iscrowd, np.uint8) if len(iscrowd) else \
            np.zeros(n_gt, np.uint8)
        out = np.zeros((n_dt, n_gt), np.float64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rle_iou(dc.ctypes.data_as(u32p), do.ctypes.data_as(i32p),
                    dl.ctypes.data_as(i32p), n_dt,
                    gc.ctypes.data_as(u32p), go.ctypes.data_as(i32p),
                    gl.ctypes.data_as(i32p), n_gt,
                    ic.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    out = np.zeros((n_dt, n_gt))
    for i, d in enumerate(dt):
        md = decode(d).astype(bool)
        ad = md.sum()
        for j, g in enumerate(gt):
            mg = decode(g).astype(bool)
            inter = np.logical_and(md, mg).sum()
            denom = ad if (len(iscrowd) and iscrowd[j]) else \
                ad + mg.sum() - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


# --------------------------------------------------------------------------
# polygon -> RLE (frPoly equivalent, PIL rasterization)
# --------------------------------------------------------------------------

def poly_to_rle(polygons: Sequence[Sequence[float]], h: int, w: int) -> dict:
    """Rasterize COCO polygon segmentation to an RLE mask."""
    from PIL import Image, ImageDraw
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return encode(np.asarray(img, np.uint8))
