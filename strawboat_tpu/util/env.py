"""Codec-forcing environment flags (test seams).

Mirrors reference src/util/env.rs:20-83 — the same ``STRAWBOAT_*`` variables
force a codec in every ``choose_compressor``, which is how CI exercises the
rarely-chosen codecs end-to-end (.github/workflows/rust.yml:21-25).
"""

from __future__ import annotations

import os

DICT_ENV = "STRAWBOAT_DICT_COMPRESSION"
RLE_ENV = "STRAWBOAT_RLE_COMPRESSION"
FREQ_ENV = "STRAWBOAT_FREQ_COMPRESSION"
BITPACK_ENV = "STRAWBOAT_BITPACK_COMPRESSION"
PATAS_ENV = "STRAWBOAT_PATAS_COMPRESSION"

_ALL = (DICT_ENV, RLE_ENV, FREQ_ENV, BITPACK_ENV, PATAS_ENV)


def check_env(name: str) -> bool:
    return os.environ.get(name) == "1"


def check_dict_env() -> bool:
    return check_env(DICT_ENV)


def check_rle_env() -> bool:
    return check_env(RLE_ENV)


def check_freq_env() -> bool:
    return check_env(FREQ_ENV)


def check_bitpack_env() -> bool:
    return check_env(BITPACK_ENV)


def check_patas_env() -> bool:
    return check_env(PATAS_ENV)


def remove_all_env() -> None:
    for name in _ALL:
        os.environ.pop(name, None)
