"""General-purpose byte-stream codecs: None / LZ4 / Zstd / Snappy.

The reference delegates to the lz4/zstd/snap C libraries
(src/compression/basic.rs:87-152): LZ4 is *block* format (not frame), Zstd is
standard frames at default level, Snappy is the raw (non-framed) format.  We
bind the same system C libraries directly via ctypes so compressed bytes are
interchangeable with the reference, and all (de)compression runs natively.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

from ..constants import Compression
from ..errors import OutOfSpecError, StrawboatError


def _load(*names: str) -> Optional[ctypes.CDLL]:
    for name in names:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    found = ctypes.util.find_library(names[0])
    if found:
        try:
            return ctypes.CDLL(found)
        except OSError:
            return None
    return None


_lz4 = _load("liblz4.so.1", "liblz4.so")
_zstd = _load("libzstd.so.1", "libzstd.so")
_snappy = _load("libsnappy.so.1", "libsnappy.so")

if _lz4 is not None:
    _lz4.LZ4_compressBound.restype = ctypes.c_int
    _lz4.LZ4_compressBound.argtypes = [ctypes.c_int]
    _lz4.LZ4_compress_default.restype = ctypes.c_int
    _lz4.LZ4_compress_default.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lz4.LZ4_decompress_safe.restype = ctypes.c_int
    _lz4.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
    ]

if _zstd is not None:
    _zstd.ZSTD_compressBound.restype = ctypes.c_size_t
    _zstd.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    _zstd.ZSTD_compress.restype = ctypes.c_size_t
    _zstd.ZSTD_compress.argtypes = [
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
    ]
    _zstd.ZSTD_decompress.restype = ctypes.c_size_t
    _zstd.ZSTD_decompress.argtypes = [
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    _zstd.ZSTD_isError.restype = ctypes.c_uint
    _zstd.ZSTD_isError.argtypes = [ctypes.c_size_t]

if _snappy is not None:
    _snappy.snappy_max_compressed_length.restype = ctypes.c_size_t
    _snappy.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
    _snappy.snappy_compress.restype = ctypes.c_int
    _snappy.snappy_compress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    _snappy.snappy_uncompress.restype = ctypes.c_int
    _snappy.snappy_uncompress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t),
    ]


def compress_lz4(data: bytes) -> bytes:
    """LZ4 block-format compression (reference basic.rs:110-123)."""
    if _lz4 is None:
        raise StrawboatError("liblz4 not available")
    bound = _lz4.LZ4_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = _lz4.LZ4_compress_default(data, out, len(data), bound)
    if n <= 0:
        raise OutOfSpecError("LZ4 compression failed")
    return out.raw[:n]


def decompress_lz4(data: bytes, uncompressed_size: int) -> bytes:
    """LZ4 block-format decompression (reference basic.rs:87-91)."""
    if _lz4 is None:
        raise StrawboatError("liblz4 not available")
    out = ctypes.create_string_buffer(uncompressed_size) if uncompressed_size else b""
    if uncompressed_size == 0:
        return b""
    n = _lz4.LZ4_decompress_safe(data, out, len(data), uncompressed_size)
    if n < 0 or n != uncompressed_size:
        raise OutOfSpecError(f"LZ4 decompression failed (rc={n})")
    return out.raw[:n]


def compress_zstd(data: bytes, level: int = 0) -> bytes:
    """Zstd frame compression at default level (reference basic.rs:125-138)."""
    if _zstd is None:
        raise StrawboatError("libzstd not available")
    bound = _zstd.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = _zstd.ZSTD_compress(out, bound, data, len(data), level)
    if _zstd.ZSTD_isError(n):
        raise OutOfSpecError("Zstd compression failed")
    return out.raw[:n]


def decompress_zstd(data: bytes, uncompressed_size: int) -> bytes:
    """Zstd frame decompression (reference basic.rs:93-97)."""
    if _zstd is None:
        raise StrawboatError("libzstd not available")
    if uncompressed_size == 0:
        return b""
    out = ctypes.create_string_buffer(uncompressed_size)
    n = _zstd.ZSTD_decompress(out, uncompressed_size, data, len(data))
    if _zstd.ZSTD_isError(n) or n != uncompressed_size:
        raise OutOfSpecError("Zstd decompression failed")
    return out.raw[:n]


def compress_snappy(data: bytes) -> bytes:
    """Raw snappy compression (reference basic.rs:140-152)."""
    if _snappy is None:
        raise StrawboatError("libsnappy not available")
    bound = _snappy.snappy_max_compressed_length(len(data))
    out = ctypes.create_string_buffer(bound)
    out_len = ctypes.c_size_t(bound)
    rc = _snappy.snappy_compress(data, len(data), out, ctypes.byref(out_len))
    if rc != 0:
        raise OutOfSpecError(f"Snappy compression failed (rc={rc})")
    return out.raw[: out_len.value]


def decompress_snappy(data: bytes, uncompressed_size: int) -> bytes:
    """Raw snappy decompression (reference basic.rs:99-108)."""
    if _snappy is None:
        raise StrawboatError("libsnappy not available")
    if uncompressed_size == 0:
        return b""
    out = ctypes.create_string_buffer(uncompressed_size)
    out_len = ctypes.c_size_t(uncompressed_size)
    rc = _snappy.snappy_uncompress(data, len(data), out, ctypes.byref(out_len))
    if rc != 0 or out_len.value != uncompressed_size:
        raise OutOfSpecError(f"Snappy decompression failed (rc={rc})")
    return out.raw[: out_len.value]


def compress(codec: Compression, data: bytes) -> bytes:
    """CommonCompression::compress (reference basic.rs:74-86)."""
    if codec == Compression.NONE:
        return bytes(data)
    if codec == Compression.LZ4:
        return compress_lz4(data)
    if codec == Compression.ZSTD:
        return compress_zstd(data)
    if codec == Compression.SNAPPY:
        return compress_snappy(data)
    raise OutOfSpecError(f"codec {codec} is not a common compression")


def decompress(codec: Compression, data: bytes, uncompressed_size: int) -> bytes:
    """CommonCompression::decompress (reference basic.rs:62-73)."""
    if codec == Compression.NONE:
        if len(data) != uncompressed_size:
            raise OutOfSpecError("size mismatch for uncompressed page")
        return bytes(data)
    if codec == Compression.LZ4:
        return decompress_lz4(data, uncompressed_size)
    if codec == Compression.ZSTD:
        return decompress_zstd(data, uncompressed_size)
    if codec == Compression.SNAPPY:
        return decompress_snappy(data, uncompressed_size)
    raise OutOfSpecError(f"codec {codec} is not a common compression")
