"""Native (libjpeg) JPEG decode for the training data loader.

Builds ``jpeg_decode.c`` with gcc on first use (same pattern as the native
tokenizer, ``tokenizer/native/build.py``) and binds via ctypes. The fast path
decodes at a DCT-domain scale (1/1..1/8) chosen so the shortest edge stays at or
above the transform's target size — MIMIC-CXR sources are ~2500×3000 px headed
for 384 px, so the common case is a 1/4-scale decode (~16× less IDCT + resize
input). Any failure (odd colour space, truncated file, missing toolchain) falls
back to PIL; the eval path always uses PIL (output-parity requirement).

Tolerance vs PIL is asserted in tests/test_image_transforms.py: at denom=1 the
decode is byte-identical (both are libjpeg with JDCT_ISLOW); at denom>1 the
downstream resize sees a DCT-scaled image, bounded-error by construction.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SO_PATH = os.path.join(HERE, "_jpeg_native.so")
_LIB = None
_FAILED = False
_LOCK = threading.Lock()  # first use happens on concurrent loader-pool threads


def build(force: bool = False) -> str:
    src = os.path.join(HERE, "jpeg_decode.c")
    if os.path.exists(SO_PATH) and not force:
        if os.path.getmtime(SO_PATH) >= os.path.getmtime(src):
            return SO_PATH
    # compile to a private temp file and move into place atomically so
    # concurrent builders (loader threads, parallel processes) never load a
    # partially written library
    tmp = f"{SO_PATH}.tmp.{os.getpid()}.{threading.get_ident()}"
    cmd = ["gcc", "-O2", "-shared", "-fPIC", src, "-o", tmp, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, SO_PATH)
    finally:
        if os.path.exists(tmp):  # failed compile/replace: don't leak tmp files
            os.unlink(tmp)
    return SO_PATH


def _lib():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        return _lib_locked()


def _lib_locked():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    try:
        lib = ctypes.CDLL(build())
        lib.jpeg_dims.restype = ctypes.c_int
        lib.jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.jpeg_decode_rgb.restype = ctypes.c_int
        lib.jpeg_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int, ctypes.c_char_p,
        ]
        lib.jpeg_decode_resized.restype = ctypes.c_int
        lib.jpeg_decode_resized.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        _LIB = lib
    except Exception:  # noqa: BLE001 - toolchain/libjpeg missing → PIL fallback
        _FAILED = True
    return _LIB


def available() -> bool:
    return _lib() is not None


def decode_jpeg(data: bytes, scale_denom: int = 1) -> Optional[np.ndarray]:
    """Decode JPEG bytes → RGB uint8 [H, W, 3] at 1/scale_denom, or None on
    failure (caller falls back to PIL)."""
    lib = _lib()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_dims(data, len(data), scale_denom, ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_rgb(
        data, len(data), scale_denom, out.ctypes.data_as(ctypes.c_char_p)
    )
    if rc:
        return None
    return out


def pick_scale_denom(data: bytes, target_shortest: int) -> int:
    """Largest denom in {1,2,4,8} keeping the decoded shortest edge ≥ target."""
    lib = _lib()
    if lib is None:
        return 1
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_dims(data, len(data), 1, ctypes.byref(w), ctypes.byref(h)):
        return 1
    shortest = min(w.value, h.value)
    denom = 1
    for d in (2, 4, 8):
        if shortest // d >= target_shortest:
            denom = d
    return denom


def load_jpeg_scaled(path: str, target_shortest: int) -> Optional[np.ndarray]:
    """Read + decode a JPEG at the largest DCT scale that keeps the shortest
    edge ≥ ``target_shortest``. None on any failure."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_jpeg(data, pick_scale_denom(data, target_shortest))


# thread-local scratch for the fused decode+resize (loader pools call this
# concurrently; the buffer is sized to the largest image seen per thread)
import threading as _threading

_SCRATCH = _threading.local()


def decode_jpeg_resized(
    data: bytes, target_shortest: int, gray: bool = True, fast_dct: bool = True,
) -> Optional[np.ndarray]:
    """Fused throughput-loader step: DCT-scaled decode (+optional grayscale /
    JDCT_IFAST) and bilinear resize to torchvision's shortest-edge rule, all in
    one C call (``jpeg_decode_resized``). Returns uint8 [H, W] (gray) or
    [H, W, 3], shortest edge == ``target_shortest``; None on any failure
    (caller falls back to the PIL path). NOT bit-identical to the PIL-exact
    eval loader — serving/training throughput path only (the golden-CSV parity
    path keeps PIL; see DEVNOTES 'input pipeline')."""
    lib = _lib()
    if lib is None:
        return None
    denom = pick_scale_denom(data, target_shortest)
    w, h = ctypes.c_int(), ctypes.c_int()
    # output dims follow torchvision's rule on the ORIGINAL dims (shortest edge
    # -> size, long edge int-TRUNCATED) — the DCT-scaled decode dims round up
    # per-MCU and would give an off-by-one long edge
    if lib.jpeg_dims(data, len(data), 1, ctypes.byref(w), ctypes.byref(h)):
        return None
    fh, fw = h.value, w.value
    if min(fh, fw) < target_shortest:
        # tiny source: needs upscaling; the PIL path owns that case
        return None
    if fw <= fh:
        ow, oh = target_shortest, int(target_shortest * fh / fw)
    else:
        ow, oh = int(target_shortest * fw / fh), target_shortest
    if lib.jpeg_dims(data, len(data), denom, ctypes.byref(w), ctypes.byref(h)):
        return None
    ih, iw = h.value, w.value
    comps = 1 if gray else 3
    need = ih * iw * comps + 64 + 8 * ow + (0 if gray else (ih * iw + oh * ow))
    work = getattr(_SCRATCH, "buf", None)
    if work is None or work.size < need:
        work = np.empty(max(need, 1 << 20), np.uint8)
        _SCRATCH.buf = work
    out = np.empty((oh, ow) if gray else (oh, ow, 3), np.uint8)
    rc = lib.jpeg_decode_resized(
        data, len(data), denom, 1 if gray else 0, 1 if fast_dct else 0,
        oh, ow, out.ctypes.data_as(ctypes.c_char_p),
        work.ctypes.data_as(ctypes.c_char_p),
    )
    if rc == 3 and gray:  # colour source: retry as RGB
        return decode_jpeg_resized(data, target_shortest, gray=False, fast_dct=fast_dct)
    if rc:
        return None
    return out


def load_jpeg_resized(path: str, target_shortest: int, gray: bool = True,
                      fast_dct: bool = True) -> Optional[np.ndarray]:
    """Read + fused decode/resize (``decode_jpeg_resized``); None on failure."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_jpeg_resized(data, target_shortest, gray=gray, fast_dct=fast_dct)
