"""Pallas TPU kernel for the sliding-window-min block scans.

The two-pass block method needs, per w-sized block of key positions, an
inclusive prefix min and suffix min. Doing the log2(w) shift+combine
steps at the XLA level streams ~0.5 GB of HBM traffic per 1M-kmer chunk
(every step round-trips three [nb, w] arrays); this kernel keeps all
log-steps in VMEM and touches HBM once in, once out.

Layout: keys arrive as lane-padded blocks [nb, wp] (wp = w rounded up
to 128); the grid walks row tiles of 8 blocks. In-kernel lane shifts
are pltpu.roll + an iota mask (roll is circular; shifted-in lanes are
reset to the +inf sentinel). Outputs are the per-block prefix and
suffix minima of (key_hi, key_lo, pos); the cheap cross-block window
combine stays in XLA (winmin.sliding_argmin_val).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UMAX32 = np.uint32(0xFFFFFFFF)
PMAX32 = np.int32(0x7FFFFFFF)
ROW_TILE = 8


def _combine(a, b):
    a_hi, a_lo, a_pos = a
    b_hi, b_lo, b_pos = b
    a_less = (a_hi < b_hi) | (
        (a_hi == b_hi) & ((a_lo < b_lo) | ((a_lo == b_lo) & (a_pos < b_pos)))
    )
    return (
        jnp.where(a_less, a_hi, b_hi),
        jnp.where(a_less, a_lo, b_lo),
        jnp.where(a_less, a_pos, b_pos),
    )


def _scan_kernel(w: int, wp: int):
    def kernel(hi_ref, lo_ref, pos_ref, phi_ref, plo_ref, ppos_ref, shi_ref, slo_ref, spos_ref):
        hi = hi_ref[:]
        lo = lo_ref[:]
        pos = pos_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, hi.shape, dimension=1)

        # prefix min: combine with values shifted right by s
        p = (hi, lo, pos)
        s = 1
        while s < w:
            sh = tuple(pltpu.roll(x, s, 1) for x in p)
            edge = lane < s
            sh = (
                jnp.where(edge, UMAX32, sh[0]),
                jnp.where(edge, UMAX32, sh[1]),
                jnp.where(edge, PMAX32, sh[2]),
            )
            p = _combine(p, sh)
            s <<= 1
        phi_ref[:], plo_ref[:], ppos_ref[:] = p

        # suffix min: combine with values shifted left by s
        q = (hi, lo, pos)
        s = 1
        while s < w:
            sh = tuple(pltpu.roll(x, wp - s, 1) for x in q)
            edge = lane >= wp - s
            sh = (
                jnp.where(edge, UMAX32, sh[0]),
                jnp.where(edge, UMAX32, sh[1]),
                jnp.where(edge, PMAX32, sh[2]),
            )
            q = _combine(q, sh)
            s <<= 1
        shi_ref[:], slo_ref[:], spos_ref[:] = q

    return kernel


@functools.lru_cache(maxsize=None)
def _scan_call(nb: int, w: int, wp: int, interpret: bool):
    spec = pl.BlockSpec((ROW_TILE, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nb, wp), jnp.uint32)] * 2 + [
        jax.ShapeDtypeStruct((nb, wp), jnp.int32)
    ]
    out_shape = out_shape + out_shape  # prefix triple + suffix triple

    call = pl.pallas_call(
        _scan_kernel(w, wp),
        grid=(nb // ROW_TILE,),
        in_specs=[spec, spec, spec],
        out_specs=[spec] * 6,
        out_shape=out_shape,
        interpret=interpret,
    )
    return jax.jit(call)


def block_scans_pallas(key_hi, key_lo, pos, w: int, interpret: bool = False):
    """Per-block prefix/suffix minima via the Pallas kernel.

    Args:
      key_hi/key_lo/pos: [nb, wp] lane-padded blocks (pad = sentinel).
      w: window size (scan covers the first w lanes exactly; sentinel
        padding is neutral for min).

    Returns (pref_triple, suff_triple) of [nb, wp] arrays.
    """
    nb, wp = key_hi.shape
    pad_rows = (-nb) % ROW_TILE
    if pad_rows:
        key_hi = jnp.pad(key_hi, ((0, pad_rows), (0, 0)), constant_values=UMAX32)
        key_lo = jnp.pad(key_lo, ((0, pad_rows), (0, 0)), constant_values=UMAX32)
        pos = jnp.pad(pos, ((0, pad_rows), (0, 0)), constant_values=PMAX32)
    res = _scan_call(nb + pad_rows, w, wp, interpret)(key_hi, key_lo, pos)
    if pad_rows:
        res = tuple(x[:nb] for x in res)
    return tuple(res[:3]), tuple(res[3:])
