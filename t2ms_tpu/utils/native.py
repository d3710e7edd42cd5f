"""Native library loader: builds native/*.cpp into one shared object on
first use and binds the exported kernels via ctypes."""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import subprocess
from typing import Optional

__all__ = ["load_native", "native_dir"]

# None = not attempted yet; False = attempted and failed (cached so a
# missing g++ doesn't re-spawn a compile per CSV parse); CDLL = loaded
_LIB = None


def native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _sources_hash(sources) -> str:
    h = hashlib.sha256()
    for s in sources:
        with open(s, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB or None          # False = cached build failure
    nd = native_dir()
    so = os.path.join(nd, "libt2ms_native.so")
    hash_file = so + ".srchash"
    sources = sorted(glob.glob(os.path.join(nd, "*.cpp")))
    if not sources:
        return None
    # content-hash staleness guard (VERDICT r2 #9): mtimes are unreliable
    # after a git checkout (everything gets checkout time), so a stale
    # prebuilt .so could silently shadow edited sources
    want_hash = _sources_hash(sources)
    have_hash = ""
    if os.path.exists(hash_file):
        with open(hash_file) as f:
            have_hash = f.read().strip()
    if not os.path.exists(so) or have_hash != want_hash:
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so]
                           + sources, check=True, capture_output=True)
            with open(hash_file, "w") as f:
                f.write(want_hash)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native build failed ({e}); falling back to numpy paths")
            _LIB = False             # don't retry the build every call
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
