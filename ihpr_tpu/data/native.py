"""ctypes bindings for the native host-warp library (native/warp.cc).

Auto-builds the .so on first use if the toolchain is available; callers
fall back to the pure-numpy/cv2 path when it is not (``available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_ROOT, "native", "libihprwarp.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_ROOT, "native", "warp.cc")
    stale = (
        not os.path.exists(_SO)
        or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO)
        )
    )
    if stale:
        # (Re)build — a stale .so would silently shadow newer warp.cc.
        build = os.path.join(_ROOT, "native", "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True, capture_output=True)
            except subprocess.CalledProcessError as e:
                # NEVER swallow a failed rebuild silently: loading the old
                # .so here would mean every test/bench exercises stale code
                # while warp.cc says otherwise.
                import warnings

                stderr = (e.stderr or b"").decode(errors="replace")[-2000:]
                if os.path.exists(_SO):
                    warnings.warn(
                        "native/warp.cc changed but the rebuild FAILED; "
                        "loading the STALE libihprwarp.so. Compiler said:\n"
                        + stderr
                    )
                else:
                    warnings.warn(
                        "native warp library build failed; falling back to "
                        "the cv2/pure-JAX path. Compiler said:\n" + stderr
                    )
                    return None
            except Exception as e:  # toolchain missing entirely
                if not os.path.exists(_SO):
                    import warnings

                    warnings.warn(f"native warp build unavailable: {e!r}")
                    return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.warp_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),  # srcs
        ctypes.POINTER(ctypes.c_int32),  # dims
        ctypes.c_int,  # ch
        ctypes.POINTER(ctypes.c_float),  # invs
        ctypes.POINTER(ctypes.c_int32),  # flips
        ctypes.POINTER(ctypes.c_uint8),  # dst
        ctypes.c_int,  # batch
        ctypes.c_int,  # oh
        ctypes.c_int,  # ow
    ]
    lib.warp_batch_u8.restype = None
    lib.omp_max_threads.restype = ctypes.c_int
    lib.has_jpeg.restype = ctypes.c_int
    if lib.has_jpeg():
        lib.decode_and_warp_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # jpegs
            ctypes.POINTER(ctypes.c_int64),  # lens
            ctypes.POINTER(ctypes.c_float),  # invs
            ctypes.POINTER(ctypes.c_int32),  # flips
            ctypes.POINTER(ctypes.c_uint8),  # dst
            ctypes.POINTER(ctypes.c_int32),  # ok
            ctypes.c_int,  # batch
            ctypes.c_int,  # oh
            ctypes.c_int,  # ow
        ]
        lib.decode_and_warp_batch.restype = None
    _LIB = lib
    return lib


def has_jpeg() -> bool:
    lib = _load()
    return bool(lib and lib.has_jpeg())


def decode_and_warp_batch(
    jpeg_blobs,
    inv_mats: np.ndarray,
    flips: np.ndarray,
    out_h: int,
    out_w: int,
):
    """Fused JPEG decode + warp (libjpeg + OpenMP): B jpeg byte strings ->
    ((B, out_h, out_w, 3) uint8 RGB patches, (B,) ok flags). Only the
    source window the warp can sample is inverse-DCTed (bit-exact ROI
    decode). Full-resolution images never enter Python.

    Caveats vs the cv2 fallback path: (1) EXIF orientation tags are
    ignored (cv2.imread auto-rotates; H36M/MPII/COCO distributions ship
    orientation-free JPEGs — strip EXIF or pre-rotate if serving
    hand-shot data through this path); (2) CMYK JPEGs fail decode
    (ok=0) and the loader falls back to cv2 for that image."""
    lib = _load()
    assert lib is not None and lib.has_jpeg()
    batch = len(jpeg_blobs)
    bufs = [np.frombuffer(b, np.uint8) for b in jpeg_blobs]
    ptrs = (ctypes.c_void_p * batch)(
        *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs]
    )
    lens = np.asarray([len(b) for b in bufs], np.int64)
    invs = np.ascontiguousarray(inv_mats, np.float32).reshape(batch, 6)
    fl = np.asarray(flips, np.int32)
    out = np.empty((batch, out_h, out_w, 3), np.uint8)
    ok = np.empty(batch, np.int32)
    lib.decode_and_warp_batch(
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        invs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        batch,
        out_h,
        out_w,
    )
    return out, ok.astype(bool)


def available() -> bool:
    return _load() is not None


def warp_batch(
    images: Sequence[np.ndarray],
    inv_mats: np.ndarray,
    flips: np.ndarray,
    out_h: int,
    out_w: int,
) -> np.ndarray:
    """Warp B variable-size uint8 HWC images -> (B, out_h, out_w, C) uint8.

    inv_mats: (B, 2, 3) DESTINATION->SOURCE affines; flips: (B,) bool —
    mirrors source x before sampling (applied to the pre-flip matrix,
    matching the reference's flip-then-warp order).
    """
    lib = _load()
    assert lib is not None, "native warp library unavailable"
    batch = len(images)
    ch = images[0].shape[2]
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    srcs = (ctypes.c_void_p * batch)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in imgs]
    )
    dims = np.asarray([[im.shape[0], im.shape[1]] for im in imgs], np.int32)
    invs = np.ascontiguousarray(inv_mats, np.float32).reshape(batch, 6)
    fl = np.asarray(flips, np.int32)
    out = np.empty((batch, out_h, out_w, ch), np.uint8)
    lib.warp_batch_u8(
        srcs,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ch,
        invs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        batch,
        out_h,
        out_w,
    )
    return out
