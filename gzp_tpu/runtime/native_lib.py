"""Loader for the C++ native host runtime (builds on first use).

ctypes releases the GIL during calls, so the parallel block decompressor
fans ``gzptpu_inflate`` out over a Python thread pool exactly the way the
reference fans libdeflate calls out over worker threads
(reference src/par/decompress.rs:161-187).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from gzp_tpu.errors import DecompressError

_SRC = Path(__file__).parent / "native" / "gzptpu_native.cpp"
_BUILD_DIR = Path(__file__).parent / "_build"

_ERROR_NAMES = {
    -2: "bad block type",
    -3: "bad huffman code",
    -4: "output overflow",
    -5: "bad stored block",
    -6: "distance out of range",
    -7: "truncated input",
    -8: "bad dynamic header",
}


def _build_library() -> Path:
    _BUILD_DIR.mkdir(exist_ok=True)
    so_path = _BUILD_DIR / "libgzptpu_native.so"
    src_mtime = _SRC.stat().st_mtime
    if so_path.exists() and so_path.stat().st_mtime >= src_mtime:
        return so_path
    tmp = so_path.with_suffix(".so.tmp")
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(tmp),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)
    return so_path


class NativeCodec:
    """ctypes facade over the native library."""

    def __init__(self) -> None:
        lib = ctypes.CDLL(str(_build_library()))
        lib.gzptpu_inflate.restype = ctypes.c_int
        lib.gzptpu_inflate.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.gzptpu_snappy_decompress.restype = ctypes.c_int
        lib.gzptpu_snappy_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        for name in ("gzptpu_crc32", "gzptpu_crc32c", "gzptpu_adler32"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_uint32
            fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
        self._lib = lib

    def inflate(self, data: bytes, out_size: int) -> bytes:
        """Inflate a raw deflate stream into exactly ``out_size`` bytes
        (sizes come from block footers — reference decode_block,
        src/deflate.rs:384-404)."""
        out = np.empty(out_size, dtype=np.uint8)
        written = ctypes.c_size_t(0)
        rc = self._lib.gzptpu_inflate(
            data,
            len(data),
            out.ctypes.data_as(ctypes.c_void_p),
            out_size,
            ctypes.byref(written),
            None,
        )
        if rc != 0:
            raise DecompressError(
                f"inflate failed: {_ERROR_NAMES.get(rc, rc)}"
            )
        if written.value != out_size:
            raise DecompressError(
                f"inflate produced {written.value} bytes, expected {out_size}"
            )
        return out.tobytes()

    def inflate_into(self, data: bytes, out: memoryview) -> tuple[int, int]:
        """Inflate into a caller buffer; returns (bytes_written,
        input_bytes_consumed)."""
        buf = np.frombuffer(out, dtype=np.uint8)
        written = ctypes.c_size_t(0)
        consumed = ctypes.c_size_t(0)
        rc = self._lib.gzptpu_inflate(
            data,
            len(data),
            buf.ctypes.data_as(ctypes.c_void_p),
            len(buf),
            ctypes.byref(written),
            ctypes.byref(consumed),
        )
        if rc != 0:
            raise DecompressError(f"inflate failed: {_ERROR_NAMES.get(rc, rc)}")
        return written.value, consumed.value

    def snappy_decompress(self, data: bytes, max_out: int) -> bytes:
        """Decompress one raw snappy block (<= ``max_out`` plain bytes).

        The production path behind the frame decoder — the reference gets
        this from the snap crate (reference examples/snap_decode.rs)."""
        out = np.empty(max_out, dtype=np.uint8)
        written = ctypes.c_size_t(0)
        rc = self._lib.gzptpu_snappy_decompress(
            data,
            len(data),
            out.ctypes.data_as(ctypes.c_void_p),
            max_out,
            ctypes.byref(written),
        )
        if rc != 0:
            raise DecompressError(
                f"snappy decompress failed: {_ERROR_NAMES.get(rc, rc)}"
            )
        return out[: written.value].tobytes()

    def crc32(self, data: bytes, value: int = 0) -> int:
        return self._lib.gzptpu_crc32(data, len(data), value)

    def crc32_view(self, view: memoryview, value: int = 0) -> int:
        """CRC32 over a writable buffer view without copying (the
        read-all fast path checksums slices of one preallocated
        output buffer)."""
        n = len(view)
        arr = (ctypes.c_char * n).from_buffer(view)
        return self._lib.gzptpu_crc32(arr, n, value)

    def crc32c(self, data: bytes, value: int = 0) -> int:
        return self._lib.gzptpu_crc32c(data, len(data), value)

    def adler32(self, data: bytes, value: int = 1) -> int:
        return self._lib.gzptpu_adler32(data, len(data), value)


_native: NativeCodec | None = None
_native_lock = threading.Lock()


def get_native() -> NativeCodec:
    global _native
    if _native is None:
        with _native_lock:
            if _native is None:
                _native = NativeCodec()
    return _native
