"""Page codecs: registry, framing, and write options.

Every compressed leaf page body starts with the 9-byte "compress header"
``[codec u8][compressed_size u32 LE][uncompressed_size u32 LE]``
(reference src/read/read_basic.rs:181-189; written at
src/compression/integer/mod.rs:49-63).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field as dc_field
from typing import List, Optional, Tuple

from ..constants import Compression
from ..errors import OutOfSpecError

HEADER_SIZE = 9
_HDR = struct.Struct("<BII")


@dataclass
class WriteOptions:
    """Reference ``WriteOptions`` (src/write/common.rs:37-45).

    ``sample_seed`` is an extension: the reference samples with ``thread_rng``
    (nondeterministic files); setting a seed makes codec selection — and hence
    file bytes — reproducible.
    """

    default_compression: Compression = Compression.NONE
    default_compress_ratio: Optional[float] = None
    max_page_size: Optional[int] = None
    forbidden_compressions: List[Compression] = dc_field(default_factory=list)
    sample_seed: Optional[int] = None
    # extension: emit a per-page min/max/null zone-map sidecar for pruning
    zone_maps: bool = False

    def forbid(self, codec: Compression) -> "WriteOptions":
        return WriteOptions(
            self.default_compression,
            self.default_compress_ratio,
            self.max_page_size,
            list(self.forbidden_compressions) + [codec],
            self.sample_seed,
            self.zone_maps,
        )


def write_header(codec: Compression, compressed_size: int, uncompressed_size: int) -> bytes:
    return _HDR.pack(int(codec), compressed_size, uncompressed_size)


def read_header(buf, pos: int) -> Tuple[Compression, int, int, int]:
    """Returns (codec, compressed_size, uncompressed_size, new_pos)."""
    if pos + HEADER_SIZE > len(buf):
        raise OutOfSpecError("page truncated before compress header")
    codec, csize, usize = _HDR.unpack_from(buf, pos)
    return Compression.from_codec(codec), csize, usize, pos + HEADER_SIZE


from . import common  # noqa: E402,F401
from .integer import compress_integer, decompress_integer  # noqa: E402,F401
from .double import compress_double, decompress_double  # noqa: E402,F401
from .binary import compress_binary, decompress_binary  # noqa: E402,F401
from .boolean import compress_boolean, decompress_boolean  # noqa: E402,F401
