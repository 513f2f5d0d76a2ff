"""ctypes bindings for the C++ host ops (with numpy fallbacks).

``build()`` compiles ``cpp/unmore_native.cpp`` with the in-image g++;
``load()`` returns the library handle or None. Every public function
falls back to the pure-Python implementation in
:mod:`unmore_tpu.utils.rle` / scipy when the library is unavailable, so
the framework works in any environment; the native path is the fast one
for bulk RLE/IoU/EDT/CC work (the reference gets the same speedups from
pycocotools' C codec and detectron2's C++ COCOeval — SURVEY.md §2.2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libunmore_native.so")
_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _CPP_DIR], check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rle_from_mask.restype = ctypes.c_int64
    lib.rle_from_mask.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.rle_to_mask.restype = None
    lib.rle_to_mask.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p]
    lib.rle_encode_counts.restype = ctypes.c_int64
    lib.rle_encode_counts.argtypes = [i64p, ctypes.c_int64, ctypes.c_char_p]
    lib.rle_decode_counts.restype = ctypes.c_int64
    lib.rle_decode_counts.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p]
    lib.rle_area.restype = ctypes.c_int64
    lib.rle_area.argtypes = [i64p, ctypes.c_int64]
    lib.rle_iou_pair.restype = ctypes.c_double
    lib.rle_iou_pair.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int]
    lib.edt_l2.restype = None
    lib.edt_l2.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.connected_components.restype = ctypes.c_int32
    lib.connected_components.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i32p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.coco_match.restype = None
    lib.coco_match.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, i32p, i32p, f64p, ctypes.c_int64,
        i64p, f64p,
    ]
    lib.paste_support_stats.restype = None
    lib.paste_support_stats.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, i64p,
    ]
    lib.paste_support_rle.restype = ctypes.c_int64
    lib.paste_support_rle.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64,
        f32p, ctypes.c_int64, ctypes.c_int64, i64p,
    ]
    _lib = lib
    return _lib


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return load() is not None


def encode(mask: np.ndarray) -> dict:
    lib = load()
    if lib is None:
        from unmore_tpu.utils import rle

        return rle.encode(mask)
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    runs = np.empty(h * w + 1, np.int64)
    m = lib.rle_from_mask(_u8p(mask), h, w, _i64p(runs))
    buf = ctypes.create_string_buffer(int(m) * 7 + 1)
    n = lib.rle_encode_counts(_i64p(runs), m, buf)
    return {"size": [int(h), int(w)], "counts": buf.raw[:n].decode("ascii")}


def decode(rle_obj: dict) -> np.ndarray:
    lib = load()
    if lib is None:
        from unmore_tpu.utils import rle

        return rle.decode(rle_obj)
    h, w = rle_obj["size"]
    counts = rle_obj["counts"]
    if isinstance(counts, (list, tuple, np.ndarray)):
        runs = np.ascontiguousarray(counts, np.int64)
        m = len(runs)
    else:
        if isinstance(counts, bytes):
            counts = counts.decode("ascii")
        s = counts.encode("ascii")
        runs = np.empty(len(s) + 1, np.int64)
        m = lib.rle_decode_counts(s, len(s), _i64p(runs))
    mask = np.empty((h, w), np.uint8)
    lib.rle_to_mask(_i64p(runs), m, h, w, _u8p(mask))
    return mask


def mask_iou(rles_a: list[dict], rles_b: list[dict], iscrowd=None) -> np.ndarray:
    lib = load()
    if lib is None:
        from unmore_tpu.utils import rle

        return rle.iou(rles_a, rles_b, iscrowd=iscrowd)

    def runs_of(r):
        counts = r["counts"]
        if isinstance(counts, (list, tuple, np.ndarray)):
            return np.ascontiguousarray(counts, np.int64)
        s = counts.encode("ascii") if isinstance(counts, str) else counts
        runs = np.empty(len(s) + 1, np.int64)
        m = lib.rle_decode_counts(s, len(s), _i64p(runs))
        return runs[:m].copy()

    ra = [runs_of(r) for r in rles_a]
    rb = [runs_of(r) for r in rles_b]
    out = np.zeros((len(ra), len(rb)), np.float64)
    for j, b in enumerate(rb):
        crowd = int(iscrowd[j]) if iscrowd is not None else 0
        for i, a in enumerate(ra):
            out[i, j] = lib.rle_iou_pair(_i64p(a), len(a), _i64p(b), len(b), crowd)
    return out


def edt_l2(mask: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance of FG pixels to the nearest BG pixel."""
    lib = load()
    mask = np.ascontiguousarray(mask, np.uint8)
    if lib is None:
        from scipy import ndimage

        return ndimage.distance_transform_edt(mask).astype(np.float32)
    h, w = mask.shape
    out = np.empty((h, w), np.float32)
    lib.edt_l2(_u8p(mask), h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def coco_match(ious: np.ndarray, gt_ig: np.ndarray, iscrowd: np.ndarray,
               thrs: np.ndarray):
    """Greedy COCO matching over T thresholds; None when lib unavailable.

    ious [D, G] float64; gt_ig/iscrowd [G] int32; thrs [T] float64.
    Returns (dtm [T, D] int64 {0,1}, dt_ignore [T, D] float64).
    """
    lib = load()
    if lib is None:
        return None
    D, G = ious.shape
    T = len(thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gt_ig = np.ascontiguousarray(gt_ig, np.int32)
    iscrowd = np.ascontiguousarray(iscrowd, np.int32)
    thrs = np.ascontiguousarray(thrs, np.float64)
    dtm = np.zeros((T, D), np.int64)
    dt_ignore = np.zeros((T, D), np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.coco_match(
        ious.ctypes.data_as(f64p), D, G,
        gt_ig.ctypes.data_as(i32p), iscrowd.ctypes.data_as(i32p),
        thrs.ctypes.data_as(f64p), T,
        _i64p(dtm), dt_ignore.ctypes.data_as(f64p),
    )
    return dtm, dt_ignore


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def paste_stats(masks: np.ndarray, boxes: np.ndarray, h: int, w: int):
    """Tight boxes + areas of crop-space masks pasted into an (h, w)
    canvas (the object-scoring paste-back, reference
    ``object_scoring.py:195-235``), without materializing canvases.

    masks: [N, s, s] uint8; boxes: [N, 4] float xyxy (paste locations).
    Returns (tight [N, 4] float32 xyxy with the xmax+1 convention,
    areas [N] int64). Empty pastes give an all-zero tight box + area 0.
    Bit-identical to pasting with
    :func:`unmore_tpu.ops.image.paste_mask_into_canvas` and reducing.
    """
    masks = np.ascontiguousarray(masks, np.uint8)
    boxes = np.ascontiguousarray(boxes, np.float32)
    n = len(masks)
    tight = np.zeros((n, 4), np.float32)
    areas = np.zeros((n,), np.int64)
    if n == 0:
        return tight, areas
    lib = load()
    if lib is None:
        from unmore_tpu.ops.image import paste_mask_into_canvas

        for b in range(n):
            sup = paste_mask_into_canvas(masks[b].astype(np.float32), boxes[b], (h, w)) > 0
            ys, xs = np.nonzero(sup)
            areas[b] = len(ys)
            if len(ys):
                tight[b] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        return tight, areas
    lib.paste_support_stats(
        _u8p(masks), n, masks.shape[1], masks.shape[2],
        _f32p(boxes), h, w, _f32p(tight), _i64p(areas),
    )
    return tight, areas


def paste_rle(mask: np.ndarray, box: np.ndarray, h: int, w: int) -> dict:
    """COCO RLE of a crop-space mask pasted into an (h, w) canvas at
    ``box`` — runs are emitted straight from the paste geometry (no
    canvas decode/encode round-trip)."""
    mask = np.ascontiguousarray(mask, np.uint8)
    lib = load()
    if lib is None:
        from unmore_tpu.ops.image import paste_mask_into_canvas

        sup = paste_mask_into_canvas(mask.astype(np.float32), box, (h, w)) > 0
        return encode(sup.astype(np.uint8))
    box_f = np.ascontiguousarray(np.asarray(box, np.float32)[:4])
    runs = np.empty(h * w + 1, np.int64)
    m = lib.paste_support_rle(
        _u8p(mask), mask.shape[0], mask.shape[1], _f32p(box_f), h, w, _i64p(runs)
    )
    buf = ctypes.create_string_buffer(int(m) * 7 + 1)
    s = lib.rle_encode_counts(_i64p(runs), m, buf)
    return {"size": [int(h), int(w)], "counts": buf.raw[:s].decode("ascii")}


def connected_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """8-connected labels (0 bg, 1..n scan order) + count."""
    lib = load()
    mask = np.ascontiguousarray(mask, np.uint8)
    if lib is None:
        from scipy import ndimage

        labels, n = ndimage.label(mask, structure=np.ones((3, 3), int))
        return labels.astype(np.int32), int(n)
    h, w = mask.shape
    labels = np.empty((h, w), np.int32)
    n = lib.connected_components(_u8p(mask), h, w, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels, int(n)
