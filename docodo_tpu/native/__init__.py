"""Native host library loader.

Compiles docodo_native.cpp to a shared object on first use (g++ -O3,
cached next to the source) and exposes it via ctypes. Everything has a
pure-NumPy fallback, so `available()` gating is advisory — importers use
the native path when present and silently fall back otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "docodo_native.cpp")
_SO = os.path.join(_DIR, "libdocodo_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    # unique temp per process: concurrent first-use compiles must not
    # interleave into one output file before the atomic replace
    tmp = f"{_SO}.{os.getpid()}.tmp"
    try:
        res = subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", _SRC, "-o", tmp],
            capture_output=True, text=True, timeout=300,
        )
        if res.returncode != 0:
            return False
        os.replace(tmp, _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    lib.docodo_interner_new.restype = c.c_void_p
    lib.docodo_interner_free.argtypes = [c.c_void_p]
    lib.docodo_interner_count.restype = c.c_int64
    lib.docodo_interner_count.argtypes = [c.c_void_p]
    lib.docodo_interner_get.restype = c.c_int32
    lib.docodo_interner_get.argtypes = [
        c.c_void_p, c.c_int64, c.c_void_p, c.c_int32]
    lib.docodo_interner_arena_size.restype = c.c_int64
    lib.docodo_interner_arena_size.argtypes = [c.c_void_p]
    lib.docodo_interner_export.argtypes = [c.c_void_p, c.c_void_p, c.c_void_p]
    lib.docodo_tokenize_intern.restype = c.c_int64
    lib.docodo_tokenize_intern.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p,
        c.c_int32, c.c_int32, c.c_void_p, c.c_void_p, c.c_int64]
    lib.docodo_tokenize_intern_packed.restype = c.c_int64
    lib.docodo_tokenize_intern_packed.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p,
        c.c_int32, c.c_int32, c.c_void_p, c.c_int64]
    lib.docodo_tokenize.restype = c.c_int64
    lib.docodo_tokenize.argtypes = [
        c.c_void_p, c.c_int64, c.c_void_p, c.c_int32, c.c_int32,
        c.c_void_p, c.c_void_p, c.c_int64]
    lib.docodo_varint_encode.restype = c.c_int64
    lib.docodo_varint_encode.argtypes = [c.c_void_p, c.c_int64, c.c_void_p]
    lib.docodo_varint_decode.restype = c.c_int64
    lib.docodo_varint_decode.argtypes = [c.c_void_p, c.c_int64, c.c_void_p]
    lib.docodo_varint_encode_blocks.restype = c.c_int64
    lib.docodo_varint_encode_blocks.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p
    ]
    lib.docodo_stem_en.restype = c.c_int64
    lib.docodo_stem_en.argtypes = [c.c_char_p, c.c_int64, c.c_char_p]
    lib.docodo_stem_en_bulk.restype = c.c_int64
    lib.docodo_stem_en_bulk.argtypes = [
        c.c_char_p, c.c_void_p, c.c_int64, c.c_char_p, c.c_void_p]
    lib.docodo_stem_ru_bulk.restype = c.c_int64
    lib.docodo_stem_ru_bulk.argtypes = [
        c.c_char_p, c.c_void_p, c.c_int64, c.c_char_p, c.c_void_p]
    lib.docodo_parse_records.restype = c.c_int64
    lib.docodo_parse_records.argtypes = [
        c.c_char_p, c.c_int64, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p]
    lib.docodo_interner_export_range.restype = c.c_int64
    lib.docodo_interner_export_range.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_void_p, c.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DOCODO_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _compile():
                return None
        try:
            _lib = _bind(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None
