"""Stage-2 bisection: the real bf_place kernel at small shapes, with
pieces stripped. python tpu_mosaic_probe2.py <stage>:

  5: full real kernel geometry (expect crash)
  6: without the flag output
  7: without the second (mask) DMA — masks faked from kw scratch
  8: only unit 0 computed (other units copy words through)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ntsynt_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntsynt_tpu.ops.bf_place import (
    STEP_WORDS, STEP_ROWS, T_UNITS, UNIT_ROWS, UNIT_WORDS,
    _byte_bf16, _onehot_bf16, _r0, _geom,
)

STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 5
BITS = 26
N = 8192

N_WORDS, N_STEPS, KROWS, TKROWS, PADDED_ROWS, SLACK = _geom(BITS, N)
LOG2NS = N_STEPS.bit_length() - 1
WITH_FLAG = STAGE != 6
WITH_KM_DMA = STAGE != 7
UNITS = 1 if STAGE in (8,9,10,11,12,13,14) else T_UNITS
BODY = STAGE if STAGE >= 9 else 0
if STAGE == 12:
    TKROWS = 4
if STAGE in (13, 14, 15):
    KROWS = 16
    MAX_R0 = None  # recomputed below
if STAGE == 14:
    TKROWS = 4
PADDED_ROWS = max(PADDED_ROWS, -(-N // 128) + KROWS)
MAX_R0 = PADDED_ROWS - KROWS
print(f"geom: steps={N_STEPS} krows={KROWS} tkrows={TKROWS} padded={PADDED_ROWS}")


def kernel(nv_ref, words_ref, kw_hbm, km_hbm, *refs):
    if WITH_FLAG:
        out_ref, flag_ref, kw_s, km_s, sems = refs
    else:
        out_ref, kw_s, km_s, sems = refs
    i = pl.program_id(0)
    r0 = _r0(i, nv_ref[0], N_STEPS, LOG2NS, SLACK, MAX_R0)
    cp_w = pltpu.make_async_copy(kw_hbm.at[pl.ds(r0, KROWS)], kw_s, sems.at[0])
    cp_w.start()
    if WITH_KM_DMA:
        cp_m = pltpu.make_async_copy(km_hbm.at[pl.ds(r0, KROWS)], km_s, sems.at[1])
        cp_m.start()
        cp_m.wait()
    cp_w.wait()

    kw = kw_s[:]
    step_base = i * STEP_WORDS
    cb = [
        jnp.sum((kw < (step_base + j * UNIT_WORDS)).astype(jnp.int32))
        for j in range(T_UNITS + 1)
    ]
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (UNIT_ROWS, 128), 0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    over = jnp.int32(0)
    limit = (TKROWS - 1) * 128
    for j in range(T_UNITS):
        rows = slice(j * UNIT_ROWS, (j + 1) * UNIT_ROWS)
        if j >= UNITS:
            out_ref[rows, :] = words_ref[rows, :]
            continue
        over = jnp.maximum(over, ((cb[j + 1] - cb[j]) > limit).astype(jnp.int32))
        lr = jnp.minimum(cb[j] >> 7, KROWS - TKROWS)
        kw_u = kw_s[pl.ds(lr, TKROWS), :]
        km_u = km_s[pl.ds(lr, TKROWS), :] if WITH_KM_DMA else kw_u.astype(jnp.uint32)
        if BODY == 9:
            pad_r = jnp.pad(kw_u, ((0, UNIT_ROWS - TKROWS), (0, 0)))
            out_ref[rows, :] = words_ref[rows, :] | pad_r.astype(jnp.uint32)
            continue
        rel = kw_u - (step_base + j * UNIT_WORDS)
        hi = rel >> 7
        lane = rel & 127
        if BODY == 10:
            hi_r = jnp.broadcast_to(hi[0:1, :], (UNIT_ROWS, 128))
            oh_r = _onehot_bf16(hi_r == hi_iota)
            out_ref[rows, :] = words_ref[rows, :] | oh_r.astype(jnp.float32).astype(jnp.int32).astype(jnp.uint32)
            continue
        if BODY == 11:
            hi_r = jnp.broadcast_to(hi[0:1, :], (UNIT_ROWS, 128))
            oh_r = _onehot_bf16(hi_r == hi_iota)
            m_r = km_u[0:1, :]
            a_r = oh_r * jnp.broadcast_to(_byte_bf16(m_r, 0), (UNIT_ROWS, 128))
            lane_r = jnp.broadcast_to(lane[0:1, :], (128, 128))
            b_r = _onehot_bf16(lane_r == sub_iota)
            c = jax.lax.dot_general(a_r, b_r, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            out_ref[rows, :] = words_ref[rows, :] | c.astype(jnp.int32).astype(jnp.uint32)
            continue
        acc = jnp.zeros((4 * UNIT_ROWS, 128), jnp.float32)
        for r in range(TKROWS):
            hi_r = jnp.broadcast_to(hi[r : r + 1, :], (UNIT_ROWS, 128))
            oh_r = _onehot_bf16(hi_r == hi_iota)
            m_r = km_u[r : r + 1, :]
            a_r = jnp.concatenate(
                [
                    oh_r * jnp.broadcast_to(_byte_bf16(m_r, p), (UNIT_ROWS, 128))
                    for p in range(4)
                ],
                axis=0,
            )
            lane_r = jnp.broadcast_to(lane[r : r + 1, :], (128, 128))
            b_r = _onehot_bf16(lane_r == sub_iota)
            acc = acc + jax.lax.dot_general(
                a_r, b_r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        contrib = jnp.zeros((UNIT_ROWS, 128), jnp.int32)
        for p in range(4):
            part = acc[p * UNIT_ROWS : (p + 1) * UNIT_ROWS, :].astype(jnp.int32)
            contrib = contrib | (part << (8 * p))
        placed = jax.lax.bitcast_convert_type(contrib, jnp.uint32)
        out_ref[rows, :] = words_ref[rows, :] | placed
    if WITH_FLAG:
        flag_ref[...] = over * jnp.ones((1, 1, 128), jnp.int32)


def main():
    print("backend:", jax.default_backend(), "stage:", STAGE, flush=True)
    block = pl.BlockSpec((STEP_ROWS, 128), lambda i, nv: (i, 0))
    out_specs = [block]
    out_shape = [jax.ShapeDtypeStruct((N_WORDS // 128, 128), jnp.uint32)]
    if WITH_FLAG:
        out_specs.append(pl.BlockSpec((1, 1, 128), lambda i, nv: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((N_STEPS, 1, 128), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_STEPS,),
        in_specs=[
            block,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((KROWS, 128), jnp.int32),
            pltpu.VMEM((KROWS, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape)

    @jax.jit
    def run(salt):
        x = (
            jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(0x85EBCA6B)
            + salt.astype(jnp.uint32)
        )
        x = x ^ (x >> 13)
        word = jax.lax.sort((x & jnp.uint32(N_WORDS - 1)).astype(jnp.int32))
        mask = jnp.uint32(1) << (x & jnp.uint32(31))
        pad = PADDED_ROWS * 128 - N
        kw2 = jnp.concatenate([word, jnp.full(pad, N_WORDS, jnp.int32)]).reshape(
            PADDED_ROWS, 128
        )
        km2 = jnp.concatenate([mask, jnp.zeros(pad, jnp.uint32)]).reshape(
            PADDED_ROWS, 128
        )
        words = jnp.zeros((N_WORDS // 128, 128), jnp.uint32)
        out = call(jnp.full(1, N, jnp.int32), words, kw2, km2)
        o = out[0] if WITH_FLAG else out
        if isinstance(o, (list, tuple)):
            o = o[0]
        return jnp.sum((o != 0).astype(jnp.int32))

    t0 = time.perf_counter()
    v = jax.device_get(run(jnp.int32(1)))
    print(f"stage {STAGE} OK: nonzero={v} [{time.perf_counter()-t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
