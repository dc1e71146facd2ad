"""Pallas TPU kernel for ntHash k-mer hashing + minimizer keys.

Computes, for every k-mer start position, the canonical and printed
ntHash values plus validity, entirely in VMEM: the k-step
XOR-of-rotated-seed-tables runs as k lane-rolls over a row-tiled code
layout with a (k-1)-lane halo per row, so no shifted HBM slices are
materialized (the XLA formulation of the same loop streams ~400 MB/seg).

Layout: codes are reshaped to [rows, ROW_W] with a HALO-lane overlap
appended per row (built with two cheap shifts at the XLA level); the
kernel emits [rows, ROW_W] outputs for key_hi/key_lo (sentinel at
invalid positions) and canonical hi/lo.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import nthash, u64

ROW_W = 1024
HALO = 128  # must be >= k - 1 and a multiple of 128
ROW_TILE = 8
UMAX32 = np.uint32(0xFFFFFFFF)


def _hash_kernel(k: int, want_canon: bool):
    tf_hi, tf_lo, tr_hi, tr_lo = nthash._hash_tables_u32(k)
    mult = nthash.mix_multiplier(k)

    def kernel(codes_ref, *out_refs):
        c = codes_ref[:].astype(jnp.int32)  # [R, ROW_W + HALO]
        shape = c.shape
        fh = jnp.zeros(shape, jnp.uint32)
        fl = jnp.zeros(shape, jnp.uint32)
        rh = jnp.zeros(shape, jnp.uint32)
        rl = jnp.zeros(shape, jnp.uint32)
        bad = jnp.zeros(shape, jnp.bool_)
        wtot = shape[1]
        for j in range(k):
            # lane rotate left by j (garbage wraps into halo lanes only)
            cj = pltpu.roll(c, wtot - j, 1) if j else c
            fh = fh ^ nthash._lut5(cj, tf_hi[j])
            fl = fl ^ nthash._lut5(cj, tf_lo[j])
            rh = rh ^ nthash._lut5(cj, tr_hi[j])
            rl = rl ^ nthash._lut5(cj, tr_lo[j])
            bad = bad | (cj >= 4)
        canon = u64.add((fh, fl), (rh, rl))
        t = u64.mul_const(canon, mult)
        out = u64.xor(t, u64.shr(t, nthash.MULTISHIFT))
        valid = ~bad
        key_hi = jnp.where(valid, out[0], UMAX32)
        key_lo = jnp.where(valid, out[1], UMAX32)
        out_refs[0][:] = key_hi[:, :ROW_W]
        out_refs[1][:] = key_lo[:, :ROW_W]
        if want_canon:
            out_refs[2][:] = jnp.where(valid, canon[0], UMAX32)[:, :ROW_W]
            out_refs[3][:] = jnp.where(valid, canon[1], UMAX32)[:, :ROW_W]

    return kernel


@functools.lru_cache(maxsize=None)
def _hash_call(rows: int, k: int, want_canon: bool, interpret: bool):
    in_spec = pl.BlockSpec(
        (ROW_TILE, ROW_W + HALO), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((ROW_TILE, ROW_W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_out = 4 if want_canon else 2
    return pl.pallas_call(
        _hash_kernel(k, want_canon),
        grid=(rows // ROW_TILE,),
        in_specs=[in_spec],
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows, ROW_W), jnp.uint32)] * n_out,
        interpret=interpret,
    )


def hash_keys(codes, k: int, n_kmers: int, want_canon: bool = False, interpret: bool = False):
    """Hash every k-mer of a flat code array via the Pallas kernel.

    Args:
      codes: uint8 [>= n_kmers + k - 1] flat codes.
      n_kmers: number of k-mer positions to produce.

    Returns (key_hi, key_lo[, canon_hi, canon_lo]) as flat [n_kmers]
    uint32 arrays; keys carry the +inf sentinel at invalid positions
    (canon too, but canon sentinels are never probed because validity is
    folded into the keys).
    """
    assert k - 1 <= HALO
    rows = -(-n_kmers // ROW_W)
    rows_p = rows + ((-rows) % ROW_TILE)
    need = rows_p * ROW_W + HALO
    pad = need - codes.shape[0]
    if pad > 0:
        codes = jnp.concatenate([codes, jnp.full(pad, 4, jnp.uint8)])
    a = codes[: rows_p * ROW_W].reshape(rows_p, ROW_W)
    # halo: next row's first HALO lanes (last row: the tail padding)
    tail = jax.lax.dynamic_slice(codes, (rows_p * ROW_W,), (HALO,))
    b = jnp.concatenate([a[1:, :HALO], tail.reshape(1, HALO)], axis=0)
    tiled = jnp.concatenate([a, b], axis=1)  # [rows_p, ROW_W + HALO]
    outs = _hash_call(rows_p, k, want_canon, interpret)(tiled)
    return tuple(o.reshape(-1)[:n_kmers] for o in outs)
