"""Pallas fills merge kernel (interpret mode) vs the XLA scatter+ffill
expansion: identical (tile_id, src) streams on randomized rect tables,
including zero-span runs, M-overflow drops, and empty inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht3dgs.raster.pallas_binfill import (L_SLOTS, build_colsT, fills_pallas)
from ht3dgs.raster.tiled import _seg_ffill


def _xla_fills(order, packed_d, span, offs, M, bits, ntx, T, N):
    """The tiled.py XLA fallback, extracted verbatim for the comparison."""
    total = offs[-1] + span[-1]
    pb = max(int(N).bit_length(), 1)
    has = (span > 0) & (offs < M)
    tgt = jnp.where(has, offs, M - 1)
    src = jnp.clip(_seg_ffill(
        jnp.zeros((M,), jnp.int32).at[tgt].max(
            jnp.where(has, order + 1, 0)), pb) - 1, 0, N - 1)
    pay_ff = _seg_ffill(
        jnp.zeros((M,), jnp.int32).at[tgt].max(jnp.where(has, packed_d, 0)),
        3 * bits)
    m = jnp.arange(M, dtype=jnp.int32)
    chg = src != jnp.concatenate([jnp.full((1,), -1, jnp.int32), src[:-1]])
    pos_ff = jax.lax.cummax(jnp.where(chg, m + 1, 0))
    local = m - (pos_ff - 1)
    mask = (1 << bits) - 1
    sx = jnp.maximum(pay_ff & mask, 1)
    q = jnp.floor((local.astype(jnp.float32) + 0.5)
                  / sx.astype(jnp.float32)).astype(jnp.int32)
    rem = local - q * sx
    tx = (pay_ff >> (2 * bits)) + rem
    ty = ((pay_ff >> bits) & mask) + q
    tile_id = jnp.where(m < total, ty * ntx + tx, T)
    return tile_id, src, total


def _pallas_fills(order, packed_d, span, offs, M, bits, ntx, T, N):
    total = offs[-1] + span[-1]
    mask = (1 << bits) - 1
    colsT = build_colsT(packed_d >> (2 * bits), (packed_d >> bits) & mask,
                        jnp.maximum(packed_d & mask, 1), offs, order)
    tile_raw, src = fills_pallas(colsT, M, ntx, interpret=True)
    m = jnp.arange(M, dtype=jnp.int32)
    return jnp.where(m < total, tile_raw, T), jnp.clip(src, 0, N - 1), total


def _rect_table(n, ntx, nty, rng, zero_frac=0.2, max_span=5):
    """Random depth-sorted rect table with zero-span rows ALREADY pushed to
    the end (the dkey=+inf sort in tiled.py guarantees this layout)."""
    n_zero = int(n * zero_frac)
    n_live = n - n_zero
    x0 = rng.integers(0, ntx - max_span, n).astype(np.int32)
    y0 = rng.integers(0, nty - max_span, n).astype(np.int32)
    sx = rng.integers(1, max_span + 1, n).astype(np.int32)
    sy = rng.integers(1, max_span + 1, n).astype(np.int32)
    span = (sx * sy).astype(np.int32)
    span[n_live:] = 0
    sx[n_live:] = np.maximum(sx[n_live:], 1)
    bits = max(int(ntx).bit_length(), int(nty).bit_length())
    packed = (((x0 << bits) | y0) << bits) | sx
    packed[n_live:] = 0
    order = rng.permutation(n).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(span)[:-1]]).astype(np.int32)
    return (jnp.asarray(order), jnp.asarray(packed), jnp.asarray(span),
            jnp.asarray(offs), bits)


@pytest.mark.parametrize("seed,n,dup", [(0, 2048, 4), (1, 4096, 2),
                                        (2, 512, 8)])
def test_fills_parity(seed, n, dup):
    rng = np.random.default_rng(seed)
    ntx, nty = 24, 17
    T = ntx * nty
    M = ((n * dup) // L_SLOTS) * L_SLOTS
    order, packed, span, offs, bits = _rect_table(n, ntx, nty, rng)
    t_ref, s_ref, total = jax.jit(
        lambda *a: _xla_fills(*a, M, bits, ntx, T, n))(
            order, packed, span, offs)
    t_pal, s_pal, _ = jax.jit(
        lambda *a: _pallas_fills(*a, M, bits, ntx, T, n))(
            order, packed, span, offs)
    live = np.arange(M) < int(total)
    np.testing.assert_array_equal(np.asarray(t_pal), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(s_pal)[live],
                                  np.asarray(s_ref)[live])


def test_fills_empty():
    n = 256
    ntx, nty = 8, 8
    bits = 4
    order = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.zeros((n,), jnp.int32)
    span = jnp.zeros((n,), jnp.int32)
    offs = jnp.zeros((n,), jnp.int32)
    t_pal, s_pal, total = _pallas_fills(order, packed, span, offs,
                                        L_SLOTS, bits, ntx, ntx * nty, n)
    assert int(total) == 0
    np.testing.assert_array_equal(np.asarray(t_pal),
                                  np.full(L_SLOTS, ntx * nty))


def test_fills_heavy_overflow():
    """total >> M: drops are exactly the tail of the slot stream."""
    rng = np.random.default_rng(7)
    n = 4096
    ntx, nty = 24, 17
    T = ntx * nty
    order, packed, span, offs, bits = _rect_table(n, ntx, nty, rng,
                                                  zero_frac=0.0,
                                                  max_span=12)
    M = L_SLOTS * 4   # far below total
    t_ref, s_ref, total = jax.jit(
        lambda *a: _xla_fills(*a, M, bits, ntx, T, n))(
            order, packed, span, offs)
    assert int(total) > M
    t_pal, s_pal, _ = jax.jit(
        lambda *a: _pallas_fills(*a, M, bits, ntx, T, n))(
            order, packed, span, offs)
    np.testing.assert_array_equal(np.asarray(t_pal), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(s_pal), np.asarray(s_ref))
