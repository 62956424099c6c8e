"""Compressed-in-HBM resident tables: tiled-order queries == natural truth.

Runs the pallas kernels in interpret mode (conftest forces CPU); the
real-chip rates are measured by bench resident_scan_bandwidth_tiled.
"""

from unittest import mock

import numpy as np
import pyarrow as pa
import pytest

from strawboat_tpu.api import write_file
from strawboat_tpu.codecs import WriteOptions
from strawboat_tpu.constants import Compression
from strawboat_tpu.errors import NotYetImplementedError


@pytest.fixture()
def interp_pallas():
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        import importlib

        from strawboat_tpu.kernels import bitunpack_pallas as m

        importlib.reload(m)
        yield
    import importlib

    from strawboat_tpu.kernels import bitunpack_pallas as m

    importlib.reload(m)


def _write(tmp_path, n=2048, seed=0):
    rng = np.random.default_rng(seed)
    sd = rng.integers(0, 2557, n).astype(np.int32)
    qty = rng.integers(1, 51, n).astype(np.int32)
    disc = rng.integers(0, 11, n).astype(np.int32)
    ep = rng.integers(0, 60000, n).astype(np.int32)
    grp = rng.integers(0, 6, n).astype(np.int32)
    fields = [
        pa.field(nm, pa.int32(), nullable=False)
        for nm in ("sd", "qty", "disc", "ep", "grp")
    ]
    t = pa.table(
        dict(zip(["sd", "qty", "disc", "ep", "grp"], map(pa.array, (sd, qty, disc, ep, grp)))),
        schema=pa.schema(fields),
    )
    p = str(tmp_path / "res.str")
    write_file(
        p,
        t,
        options=WriteOptions(
            default_compression=Compression.LZ4,
            default_compress_ratio=1.0,
            max_page_size=512,
        ),
    )
    return p, dict(sd=sd, qty=qty, disc=disc, ep=ep, grp=grp)


def test_resident_filter_sum_q6_shape(tmp_path, interp_pallas):
    from strawboat_tpu.exec.resident import load_resident

    p, cols = _write(tmp_path)
    rt = load_resident(p, tile=512)
    assert rt.num_rows == 2048
    got = int(
        rt.filter_sum(
            {"sd": (731, 1096), "disc": (5, 8), "qty": (None, 24)},
            value="ep",
            product_with="disc",
        )
    )
    m = (
        (cols["sd"] >= 731)
        & (cols["sd"] < 1096)
        & (cols["disc"] >= 5)
        & (cols["disc"] < 8)
        & (cols["qty"] < 24)
    )
    exp = int((cols["ep"][m].astype(np.int64) * cols["disc"][m]).sum())
    assert got == exp


def test_resident_group_sum(tmp_path, interp_pallas):
    from strawboat_tpu.exec.resident import load_resident

    p, cols = _write(tmp_path, seed=1)
    rt = load_resident(p, tile=512)
    (sums,), cnt = rt.group_sum("grp", ["ep"], num_groups=6)
    sums = np.asarray(sums)
    cnt = np.asarray(cnt)
    for g in range(6):
        sel = cols["grp"] == g
        assert sums[g] == int(cols["ep"][sel].astype(np.int64).sum())
        assert cnt[g] == int(sel.sum())


def test_resident_rejects_unsupported_layouts(tmp_path, interp_pallas):
    from strawboat_tpu.exec.resident import load_resident

    # a wide int64 column picks LZ4, not bitpacking -> must raise, not lie
    t = pa.table(
        {"w": pa.array(np.random.default_rng(0).integers(0, 1 << 60, 512))},
        schema=pa.schema([pa.field("w", pa.int64(), nullable=False)]),
    )
    p = str(tmp_path / "wide.str")
    write_file(
        p,
        t,
        options=WriteOptions(
            default_compression=Compression.LZ4,
            default_compress_ratio=None,
            max_page_size=512,
        ),
    )
    with pytest.raises(NotYetImplementedError):
        load_resident(p)


def test_resident_partial_tail_page(tmp_path, interp_pallas):
    """Row count not a multiple of the page/tile grid: padding masked out."""
    from strawboat_tpu.exec.resident import load_resident

    n = 2048 - 333
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1000, n).astype(np.int32)
    t = pa.table(
        {"v": pa.array(v)},
        schema=pa.schema([pa.field("v", pa.int32(), nullable=False)]),
    )
    p = str(tmp_path / "tail.str")
    write_file(
        p,
        t,
        options=WriteOptions(
            default_compression=Compression.LZ4,
            default_compress_ratio=1.0,
            max_page_size=512,
        ),
    )
    rt = load_resident(p, tile=512)
    assert rt.num_rows == n
    got = int(rt.filter_sum({}, value="v"))
    assert got == int(v.astype(np.int64).sum())


def test_resident_rejects_values_wider_than_i31(tmp_path, interp_pallas):
    """u32 values >= 2^31 would wrap negative as int32 — must raise."""
    from strawboat_tpu.exec.resident import load_resident

    v = np.full(256, (1 << 31) + 5, dtype=np.int64)
    t = pa.table(
        {"v": pa.array(v)},
        schema=pa.schema([pa.field("v", pa.int64(), nullable=False)]),
    )
    p = str(tmp_path / "wide31.str")
    write_file(
        p,
        t,
        options=WriteOptions(
            default_compression=Compression.LZ4,
            default_compress_ratio=None,
            max_page_size=256,
        ),
    )
    with pytest.raises(NotYetImplementedError):
        load_resident(p)
