"""Local Binary Pattern texture transforms.

Capability parity with the reference's ``TRANS`` LBP stack
(``utils_datasets.py:1073-1267``): per-method LBP maps normalized to uint8
(methods default / ror / uniform / nri_uniform with the reference's value
ranges), channel-stack merging where channels may also be the gray image
('l') or raw color channels ('r'/'g'/'b'), and ``fit_to``/``pad_to``
letterboxing.

Compute path: the native ``csrc/maskops.cpp`` ``local_binary_pattern``
(replacing scikit-image's C implementation, which this environment lacks),
with a pure-numpy fallback.  Host-side preprocessing — LBP feeds channel
construction once at dataset build time (tire dataset), not the hot loop.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

LBP_METHODS = ["default", "ror", "uniform", "nri_uniform"]
_METHOD_IDS = {"default": 0, "ror": 1, "uniform": 2, "var": 3,
               "nri_uniform": 4}


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 luma (cv2.COLOR_RGB2GRAY / PIL 'L' weights), float."""
    if img.ndim == 2:
        return img.astype(np.float64)
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.float64)


def rgb_to_gray_uint8(img: np.ndarray) -> np.ndarray:
    """PIL ``convert('L')`` bit-exact: integer luma with PIL's fixed-point
    coefficients and rounding (``(19595 R + 38470 G + 7471 B + 0x8000) >>
    16``).  The reference quantizes to a uint8 'L' image before LBP
    (``utils_datasets.py:1105-1111``), so LBP parity needs the same ties."""
    if img.ndim == 2:
        return np.clip(np.round(img), 0, 255).astype(np.uint8)
    r, g, b = (img[..., i].astype(np.int64) for i in range(3))
    return ((19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16).astype(np.uint8)


def local_binary_pattern(img: np.ndarray, n_points: int, radius: float,
                         method: str = "default") -> np.ndarray:
    """LBP map (H, W) float64."""
    img = np.ascontiguousarray(img, np.float64)
    h, w = img.shape
    from vit_torch_tpu.detection._mask import _load_lib
    lib = _load_lib()
    if lib is not None:
        out = np.zeros((h, w), np.float64)
        lib.local_binary_pattern(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), h, w,
            n_points, ctypes.c_double(radius), _METHOD_IDS[method],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    return _lbp_numpy(img, n_points, radius, method)


def _lbp_numpy(img: np.ndarray, P: int, R: float, method: str) -> np.ndarray:
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    codes = np.zeros((h, w), np.uint64)
    vals = np.zeros((P, h, w), np.float64)
    for p in range(P):
        # skimage ring convention: sample p at (row - R sin θ, col + R cos θ),
        # i.e. p=0 due east, traversing counter-clockwise in image coords
        angle = 2 * np.pi * p / P
        sy, sx = -R * np.sin(angle), R * np.cos(angle)
        yy, xx = ys + sy, xs + sx
        y0, x0 = np.floor(yy).astype(int), np.floor(xx).astype(int)
        fy, fx = yy - y0, xx - x0
        c = lambda a, lo, hi: np.clip(a, lo, hi)
        at = lambda yi, xi: img[c(yi, 0, h - 1), c(xi, 0, w - 1)]
        v = ((1 - fy) * (1 - fx) * at(y0, x0) + (1 - fy) * fx * at(y0, x0 + 1)
             + fy * (1 - fx) * at(y0 + 1, x0) + fy * fx * at(y0 + 1, x0 + 1))
        vals[p] = v
        # tolerance matches the native kernel (flat regions read >= center)
        codes |= ((v >= img - 1e-4).astype(np.uint64) << np.uint64(p))
    bits = ((codes[None] >> np.arange(P, dtype=np.uint64)[:, None, None])
            & np.uint64(1)).astype(np.int64)
    transitions = (bits != np.roll(bits, -1, axis=0)).sum(0)
    ones = bits.sum(0)
    if method == "default":
        return codes.astype(np.float64)
    if method == "ror":
        best = codes.copy()
        mask = np.uint64((1 << P) - 1)
        for s in range(1, P):
            rot = ((codes >> np.uint64(s)) | (codes << np.uint64(P - s))) & mask
            best = np.minimum(best, rot)
        return best.astype(np.float64)
    if method == "uniform":
        return np.where(transitions <= 2, ones, P + 1).astype(np.float64)
    if method == "var":
        return vals.var(axis=0)
    if method == "nri_uniform":
        prev = np.roll(bits, 1, axis=0)
        first_rise = np.argmax((bits == 1) & (prev == 0), axis=0)
        label = 1 + (ones - 1) * P + first_rise
        label = np.where(ones == 0, 0, label)
        label = np.where(ones == P, P * (P - 1) + 1, label)
        label = np.where(transitions > 2, P * (P - 1) + 2, label)
        return label.astype(np.float64)
    raise ValueError(method)


def _method_range(method: str, n_points: int) -> List[float]:
    """Reference normalization ranges (``utils_datasets.py:1120-1133``)."""
    if method in ("default", "ror"):
        return [0, 2 ** n_points - 1]
    if method == "uniform":
        return [0, n_points + 1]
    if method == "nri_uniform":
        return [0, (n_points + 1) * n_points]
    return [0, 255]


def get_lbp_full(img: np.ndarray, radius: int = 1, point_mult: int = 8,
                 methods: Optional[Sequence[str]] = None,
                 ) -> Dict[str, np.ndarray]:
    """Per-method LBP maps normalized to uint8 (reference ``get_lbp_full``,
    ``utils_datasets.py:1112-1146``).  RGB input is quantized to a PIL-exact
    uint8 'L' image first, matching the reference's ``convert('L')`` ties."""
    gray = rgb_to_gray_uint8(np.asarray(img)).astype(np.float64)
    if methods is None:
        methods = list(LBP_METHODS)
    if isinstance(methods, str):
        methods = [methods]
    n_points = min(point_mult * radius, 24)
    out = {}
    for method in methods:
        if method not in LBP_METHODS:
            continue
        lo, hi = _method_range(method, n_points)
        m = local_binary_pattern(gray, n_points, radius, method)
        m = (m - lo) / (hi - lo) * 255
        out[method] = np.clip(m, 0, 255).astype(np.uint8)
    return out


def get_lbp_merge(img: np.ndarray, radius: int = 1, point_mult: int = 8,
                  methods: Sequence[str] = ("l", "default", "uniform"),
                  ) -> np.ndarray:
    """Channel-stack of LBP maps / gray / raw color channels (reference
    ``get_lbp_merge``, ``utils_datasets.py:1148-1180``): N-channel uint8
    image whose channel count equals ``len(methods)``."""
    img = np.asarray(img)
    valid = set(LBP_METHODS) | {"l", "r", "g", "b"}
    assert all(m in valid for m in methods), methods
    lbp_maps = get_lbp_full(img, radius, point_mult,
                            [m for m in methods if m in LBP_METHODS])
    channels = []
    for m in methods:
        if m == "l":
            channels.append(rgb_to_gray_uint8(img))
        elif m in ("r", "g", "b"):
            channels.append(img[..., "rgb".index(m)])
        else:
            channels.append(lbp_maps[m])
    return np.stack(channels, axis=-1)
