"""Native host-side runtime components (C++ via ctypes).

``seg_prep``: threaded segmentation batch preparation (scale + pad/crop +
label remap + mask) — the native equivalent of the cv2-backed host work the
reference does per sample in __getitem__. Auto-builds with g++ on first
import; ``load_seg_prep()`` returns None when no compiler is available and
callers fall back to the numpy path.
"""

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "seg_prep.cpp")
_LIB = os.path.join(_DIR, "libseg_prep.so")

_lib = None
_tried = False


def build_seg_prep(force=False):
    """Compile the shared library. Returns the path or None."""
    if os.path.exists(_LIB) and not force and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"iic_tpu.native: build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return None


def load_seg_prep():
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build_seg_prep()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.seg_prepare_batch.restype = ctypes.c_int
    lib.seg_prepare_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),   # imgs
        ctypes.POINTER(ctypes.c_void_p),   # labels (may be null)
        ctypes.POINTER(ctypes.c_int32),    # heights
        ctypes.POINTER(ctypes.c_int32),    # widths
        ctypes.c_int,                      # channels
        ctypes.c_int,                      # batch
        ctypes.POINTER(ctypes.c_float),    # scales
        ctypes.POINTER(ctypes.c_int32),    # h_cs
        ctypes.POINTER(ctypes.c_int32),    # w_cs
        ctypes.c_int,                      # input_sz
        ctypes.POINTER(ctypes.c_int32),    # label_table
        ctypes.c_int,                      # table_len
        ctypes.POINTER(ctypes.c_uint8),    # imgs_out
        ctypes.POINTER(ctypes.c_uint8),    # masks_out
        ctypes.c_int,                      # num_threads
    ]
    _lib = lib
    return _lib
