"""Native library loader: builds native/*.cpp into one shared object on
first use and binds the exported kernels via ctypes."""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Optional

__all__ = ["load_native", "native_dir"]

_LIB: Optional[ctypes.CDLL] = None


def native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    nd = native_dir()
    so = os.path.join(nd, "libt2ms_native.so")
    sources = sorted(glob.glob(os.path.join(nd, "*.cpp")))
    if not sources:
        return None
    rebuild = (not os.path.exists(so)
               or any(os.path.getmtime(s) > os.path.getmtime(so)
                      for s in sources))
    if rebuild:
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so]
                           + sources, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native build failed ({e}); falling back to numpy paths")
            return None
    lib = ctypes.CDLL(so)

    lib.t2ms_dtw_ndim.restype = ctypes.c_double
    lib.t2ms_dtw_ndim.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.t2ms_dtw_batch.restype = None
    lib.t2ms_dtw_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.t2ms_parse_float_lists.restype = ctypes.c_long
    lib.t2ms_parse_float_lists.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double)]
    lib.t2ms_parse_float_lists_ragged.restype = ctypes.c_long
    lib.t2ms_parse_float_lists_ragged.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long)]
    _LIB = lib
    return lib
