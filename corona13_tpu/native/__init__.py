"""Native (C++) runtime components, loaded via ctypes.

The reference's performance-critical host-side code is C (parallel SAH
BVH build, mmapped geometry loading); here the equivalents are C++
compiled on first use with the system toolchain.  Every native component
has a pure numpy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_LIB = os.path.join(_DIR, 'libcorona13.so')
_lib = None
_tried = False


def _compile() -> bool:
    src = os.path.join(_DIR, 'bvh_build.cc')
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC',
             '-o', _LIB, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The compiled native library, or None (fallback to numpy paths)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) <
            os.path.getmtime(os.path.join(_DIR, 'bvh_build.cc'))):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.bvh_finish.restype = None
    lib.bvh_finish.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib
