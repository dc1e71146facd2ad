"""Sorted-run Bloom-filter bit placement (Pallas TPU kernel).

The last scatter on the hot path: ops/bloom.insert_words sorts a
segment's bit indices, ORs duplicate-word masks (log-step segmented
OR), and then SCATTERS one mask per distinct word into the filter.
XLA-TPU scatters serialize at a measured 154-160 M elem/s regardless
of sortedness hints (CLAUDE.md / BENCH.md), which makes the scatter
~60% of every Bloom insert and `make_common_bf` the single largest
pipeline stage at gigabase scale (51 s of the 110 s round-3 driver
wall). The reference's equivalent is the OpenMP insert loop in
/root/reference/src/ntsynt_make_common_bf.cpp:140-160.

This kernel replaces the scatter (and the zeros-scratch + dense-OR
epilogue) with a single streaming pass over the filter:

  * the filter is viewed as (rows, 128) words; a grid step owns
    STEP_ROWS rows (8 matmul units of 64 rows = 8192 words each) and
    streams them through VMEM once (in + out),
  * the step's slice of the SORTED key stream is DMA'd from HBM at a
    fixed-stride window position computed from the real-key count
    alone (sorted uniform hash positions deviate from uniform stride
    by a binomial ~sqrt(n)/2 keys; the window carries 6-sigma slack),
  * each unit locates its contiguous keys inside the window with an
    exact in-kernel count (sum of compares — VPU work, no gather),
    takes a dynamic sublane sub-window, and places its masks with
    one-hot MXU matmuls over 4 byte planes: C[(p,h), l] =
    sum_c onehot(hi_c==h) * byte_p(mask_c) * onehot(lane_c==l).
    After the caller's dedup every (h, l) word receives at most one
    contribution, so f32 byte sums are EXACT bit ORs,
  * the unit's words block is OR'd and written back; no gather or
    scatter instruction appears anywhere.

Correctness is unconditional: window-coverage violations (detected
elementwise on the XLA side with the same integer window formula) and
in-kernel per-unit count overflows (flag output) both fall back to the
plain scatter formulation for that segment via lax.cond, so filters
are bit-identical to ops/bloom.insert_words in every case.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNIT_ROWS = 64                      # words-rows per matmul unit
UNIT_WORDS = UNIT_ROWS * 128        # 8192 words
T_UNITS = 8                         # units per grid step
STEP_ROWS = UNIT_ROWS * T_UNITS     # 512 rows
STEP_WORDS = STEP_ROWS * 128        # 65536 words
MAX_MEAN_STEP = 8192                # density cap: keys/step must keep the
                                    # key window inside a sane VMEM budget


def mode():
    """None (scatter path), "tpu" (compiled kernel) or "interpret"
    (tests). Defaults ON for the TPU backend; NTSYNT_BF_PLACE=0
    disables, =tpu/=1 forces the compiled path (skips the backend
    probe), =interpret forces the interpreter (CPU differentials).
    NTSYNT_NO_PALLAS wins over every NTSYNT_BF_PLACE value so it fully
    disables Pallas code paths (matches bf_sweep.mode semantics)."""
    if os.environ.get("NTSYNT_NO_PALLAS"):
        return None
    env = os.environ.get("NTSYNT_BF_PLACE", "")
    if env in ("0", "off"):
        return None
    if env == "interpret":
        return "interpret"
    if env in ("tpu", "1"):
        return "tpu"
    try:
        return "tpu" if jax.default_backend() == "tpu" else None
    except Exception:  # pragma: no cover - backend probing
        return None


def resolve(bits_log2: int, n: int):
    """Mode threaded through callers' jit caches: None | "tpu" |
    "interpret" for a segment of ``n`` keys into a 2^bits_log2-bit
    filter (combines the env/backend gate with the geometry support
    check)."""
    m = mode()
    if m is None or not supported(bits_log2, n):
        return None
    return m


def supported(bits_log2: int, n: int) -> bool:
    """Filter sizes the placement kernel covers: at least one grid step
    (2^26 bits), i32 word addressing with scratch-insert semantics
    (<= 2^34, the pipeline cap), and a key density whose per-step
    window fits VMEM."""
    if not 26 <= bits_log2 <= 34:
        return False
    n_steps = ((1 << bits_log2) // 32) // STEP_WORDS
    return n_steps >= 1 and n / n_steps <= MAX_MEAN_STEP


def _geom(bits_log2: int, n: int):
    n_words = (1 << bits_log2) // 32
    n_steps = n_words // STEP_WORDS
    # fixed-stride window: starts SLACK rows below the ideal uniform
    # position and covers mean keys/step plus slack on BOTH sides
    # (slack = 6 sigma of the binomial deviation of sorted-uniform key
    # positions; sigma <= sqrt(n)/2 keys), plus rounding slop
    slack = int(math.ceil(6.0 * math.sqrt(max(n, 1)) / 2.0 / 128.0)) + 1
    krows = int(math.ceil(n / n_steps / 128.0)) + 2 * slack + 2
    # the key-window VMEM scratch must be sublane-tile aligned: a
    # non-multiple-of-8 row count faults the DMA on hardware (bisected
    # on the chip — scratch/tpu_mosaic_probe2.py stages 5 vs 13)
    krows = -(-krows // 8) * 8
    mean_unit = n / (n_words // UNIT_WORDS)
    tkrows = int(
        math.ceil((mean_unit + 6.0 * math.sqrt(max(mean_unit, 1.0)) + 128.0) / 128.0)
    ) + 1
    tkrows = max(2, min(tkrows, krows))
    rows_n = -(-n // 128)
    padded_rows = rows_n + krows
    return n_words, n_steps, krows, tkrows, padded_rows, slack


def _r0(step, nv, n_steps, log2ns, slack, max_r0):
    """Window row start for a step: an overflow-safe monotone integer
    approximation of step * (nv/128) / n_steps minus the one-sided
    slack. MUST be computed with these exact operations on both the XLA
    (coverage check) and Mosaic (DMA offset) sides."""
    rt = nv >> 7
    q = rt >> log2ns
    rr = rt & (n_steps - 1)
    r0 = step * q + ((step * rr) >> log2ns) - slack
    return jnp.clip(r0, 0, max_r0)


def _onehot_bf16(cond):
    # i1 -> i32 -> f32 -> bf16: the direct where(cond, bf16) select
    # trips a Mosaic i1 relayout on broadcast compares (see
    # ops/bf_sweep.py, measured round 2)
    return cond.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _byte_bf16(x, p):
    # byte p of a u32 row as bf16 (<= 255, exactly representable)
    return (
        ((x >> (8 * p)) & jnp.uint32(255))
        .astype(jnp.int32)
        .astype(jnp.float32)
        .astype(jnp.bfloat16)
    )


def _rm_shift_right(x, s: int, fill, tkrows: int):
    """Row-major shift toward higher positions by s (a power of two <
    128 or a multiple of 128) over a (tkrows, 128) window: out[p] =
    x[p - s], with `fill` beyond the window head."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tkrows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tkrows, 128), 1)
    if s % 128 == 0:
        m = s // 128
        if m >= tkrows:
            return jnp.full((tkrows, 128), fill, x.dtype)
        return jnp.where(row >= m, pltpu.roll(x, m, 0), fill)
    lane_rolled = pltpu.roll(x, s, 1)
    up_rolled = pltpu.roll(pltpu.roll(x, 1, 0), s, 1)
    v = jnp.where(lane >= s, lane_rolled, up_rolled)
    return jnp.where((row == 0) & (lane < s), fill, v)


def _window_dedup(kw_u, km_u, tkrows: int):
    """In-window segmented OR + run-last dedup over the row-major
    sorted (word, mask) window: each distinct word's LAST entry ends up
    carrying the OR of the run's masks, every other entry 0 — exactly
    the caller-side dedup the one-hot byte sums require. Runs never
    cross unit boundaries (the word determines the unit) and the
    per-unit count guard bounds every placed run inside the window, so
    log2(window) doubling steps always cover the full run."""
    mv = km_u
    s = 1
    while s < tkrows * 128:
        pw = _rm_shift_right(kw_u, s, jnp.int32(-1), tkrows)
        pm = _rm_shift_right(mv, s, jnp.uint32(0), tkrows)
        mv = mv | jnp.where(kw_u == pw, pm, jnp.uint32(0))
        s <<= 1
    row = jax.lax.broadcasted_iota(jnp.int32, (tkrows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tkrows, 128), 1)
    nxt = jnp.where(
        lane < 127,
        pltpu.roll(kw_u, 127, 1),
        pltpu.roll(pltpu.roll(kw_u, tkrows - 1, 0), 127, 1),
    )
    nxt = jnp.where((row == tkrows - 1) & (lane == 127), jnp.int32(-2), nxt)
    return jnp.where(kw_u != nxt, mv, jnp.uint32(0))


def _place_kernel(n_steps: int, log2ns: int, krows: int, tkrows: int,
                  slack: int, max_r0: int):
    limit = (tkrows - 1) * 128

    def kernel(nv_ref, words_ref, kw_hbm, km_hbm, out_ref, flag_ref, kw_s, km_s, sems):
        i = pl.program_id(0)
        r0 = _r0(i, nv_ref[0], n_steps, log2ns, slack, max_r0)
        cp_w = pltpu.make_async_copy(kw_hbm.at[pl.ds(r0, krows)], kw_s, sems.at[0])
        cp_m = pltpu.make_async_copy(km_hbm.at[pl.ds(r0, krows)], km_s, sems.at[1])
        cp_w.start()
        cp_m.start()
        cp_w.wait()
        cp_m.wait()

        kw = kw_s[:]  # (krows, 128) i32 sorted word indices
        step_base = i * STEP_WORDS
        # exact counts of window keys below each unit boundary (the
        # window is a slice of the globally sorted stream, so unit j's
        # keys occupy window positions [cb[j], cb[j+1]))
        cb = [
            jnp.sum((kw < (step_base + j * UNIT_WORDS)).astype(jnp.int32))
            for j in range(T_UNITS + 1)
        ]
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (UNIT_ROWS, 128), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        over = jnp.int32(0)
        for j in range(T_UNITS):
            over = jnp.maximum(over, ((cb[j + 1] - cb[j]) > limit).astype(jnp.int32))
            lr = jnp.minimum(cb[j] >> 7, krows - tkrows)
            kw_u = kw_s[pl.ds(lr, tkrows), :]
            km_u = _window_dedup(kw_u, km_s[pl.ds(lr, tkrows), :], tkrows)
            rel = kw_u - (step_base + j * UNIT_WORDS)
            hi = rel >> 7       # arithmetic: out-of-unit keys match no row
            lane = rel & 127
            acc = jnp.zeros((4 * UNIT_ROWS, 128), jnp.float32)
            for r in range(tkrows):
                hi_r = jnp.broadcast_to(hi[r : r + 1, :], (UNIT_ROWS, 128))
                oh_r = _onehot_bf16(hi_r == hi_iota)  # [64, 128] keys on lanes
                m_r = km_u[r : r + 1, :]
                a_r = jnp.concatenate(
                    [
                        oh_r * jnp.broadcast_to(_byte_bf16(m_r, p), (UNIT_ROWS, 128))
                        for p in range(4)
                    ],
                    axis=0,
                )  # [256, 128]
                lane_r = jnp.broadcast_to(lane[r : r + 1, :], (128, 128))
                b_r = _onehot_bf16(lane_r == sub_iota)  # [l', c] = lane_c == l'
                # contract the key (lane) dim of both operands:
                # C[(p,h), l'] = sum_c a[(p,h), c] * b[l', c]
                acc = acc + jax.lax.dot_general(
                    a_r,
                    b_r,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            contrib = jnp.zeros((UNIT_ROWS, 128), jnp.int32)
            for p in range(4):
                part = acc[p * UNIT_ROWS : (p + 1) * UNIT_ROWS, :].astype(jnp.int32)
                contrib = contrib | (part << (8 * p))
            placed = jax.lax.bitcast_convert_type(contrib, jnp.uint32)
            rows = slice(j * UNIT_ROWS, (j + 1) * UNIT_ROWS)
            out_ref[rows, :] = words_ref[rows, :] | placed
        flag_ref[...] = over * jnp.ones((1, 1, 128), jnp.int32)

    return kernel


@functools.lru_cache(maxsize=None)
def _place_call(n_rows: int, padded_rows: int, n_steps: int, log2ns: int,
                krows: int, tkrows: int, slack: int, interpret: bool):
    max_r0 = padded_rows - krows
    block = pl.BlockSpec((STEP_ROWS, 128), lambda i, nv: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            block,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # 3D flag output [n_steps, 1, 128]: block (1, 1, 128) satisfies
        # the last-two-dims tiling rule (middle dim equals the array dim)
        out_specs=[block, pl.BlockSpec((1, 1, 128), lambda i, nv: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((krows, 128), jnp.int32),
            pltpu.VMEM((krows, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _place_kernel(n_steps, log2ns, krows, tkrows, slack, max_r0),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )


def place_sorted(words, word_s, mask_raw, n_valid, bits_log2: int,
                 interpret: bool = False):
    """OR a sorted (word, mask) run list into the filter words.

    Args:
      words: flat uint32 filter word array.
      word_s: (n,) int32 word indices, ascending (sentinels = n_words
        sorted to the tail; duplicate-word entries allowed).
      mask_raw: (n,) uint32 per-entry single-bit masks, RAW (no caller
        dedup needed: the kernel ORs each word run in-window and places
        only the run-last entry, so the one-hot byte sums stay exact).
      n_valid: traced i32 count of non-sentinel entries (the window
        stride model; duplicates count — they occupy positions in the
        sorted stream).

    Falls back to a scatter formulation (with its own segmented-OR
    dedup; bit-identical) when the fixed-stride windows cannot cover
    the key distribution.
    """
    n = word_s.shape[0]
    n_words, n_steps, krows, tkrows, padded_rows, slack = _geom(bits_log2, n)
    log2ns = n_steps.bit_length() - 1
    max_r0 = padded_rows - krows

    nv = n_valid.astype(jnp.int32)
    # elementwise window-coverage check (mirror of the kernel's _r0);
    # with raw masks EVERY non-sentinel entry must be covered (a missed
    # duplicate would drop its bit from the in-window run OR)
    rowj = jnp.arange(n, dtype=jnp.int32) >> 7
    u = word_s >> np.int32(16)  # STEP_WORDS = 2^16
    r0u = _r0(u, nv, n_steps, log2ns, slack, max_r0)
    covered = (rowj >= r0u) & (rowj < r0u + krows)
    ov1 = jnp.any(~covered & (word_s < jnp.int32(n_words)))

    def scatter_branch(w):
        mask = mask_raw
        shift = 1
        while shift < n:
            pw = jnp.concatenate([jnp.full(shift, -1, jnp.int32), word_s[:-shift]])
            pm = jnp.concatenate([jnp.zeros(shift, jnp.uint32), mask[:-shift]])
            mask = mask | jnp.where(word_s == pw, pm, jnp.uint32(0))
            shift <<= 1
        nxt = jnp.concatenate([word_s[1:], jnp.full(1, -2, jnp.int32)])
        keep = (word_s != nxt) & (word_s < jnp.int32(n_words))
        idx = jnp.where(keep, word_s, jnp.int32(n_words))
        z = jnp.zeros(n_words + 1, jnp.uint32)
        z = z.at[idx].set(jnp.where(keep, mask, jnp.uint32(0)), mode="drop")
        return w | z[:-1]

    def place_branch(w):
        pad = padded_rows * 128 - n
        kw2 = jnp.concatenate(
            [word_s, jnp.full(pad, n_words, jnp.int32)]
        ).reshape(padded_rows, 128)
        km2 = jnp.concatenate([mask_raw, jnp.zeros(pad, jnp.uint32)]).reshape(
            padded_rows, 128
        )
        call = _place_call(
            n_words // 128, padded_rows, n_steps, log2ns, krows, tkrows, slack,
            interpret,
        )
        placed, flags = call(nv[None], w.reshape(n_words // 128, 128), kw2, km2)
        return jax.lax.cond(
            jnp.any(flags != 0),
            scatter_branch,
            lambda _w: placed.reshape(n_words),
            w,
        )

    return jax.lax.cond(ov1, scatter_branch, place_branch, words)
