"""Binned Bloom-filter sweep kernel (Pallas TPU).

The plain XLA formulations of BF insert/probe bottom out in serialized
gathers (~50 M elem/s) and scatters (~80 M elem/s) on TPU (see
CLAUDE.md / BENCH.md measurements); they were the largest single cost
of the pipeline's make_common_bf stage (reference equivalent:
/root/reference/src/ntsynt_make_common_bf.cpp:121-160). This module
replaces one segment's insert (and the cascade's probe+insert) with:

  1. sort the segment's bit indices (u32; filters <= 2^32 bits),
  2. dedupe (first-of-run) so every surviving insert sets a DISTINCT
     bit — which makes one-hot matmul SUMS exact bit ORs,
  3. bin by filter *cell* (32768 words = 2^20 bits): a sorted array's
     cell ranges are contiguous, so each cell's inserts live in a small
     window of 2048-insert chunks,
  4. a Pallas sweep over cells: for each cell, stream its insert chunks
     and build the cell's 256x128 word block with one-hot MXU matmuls
     over byte planes (bf16 inputs are exact for one-hot {0,1} and byte
     payloads <= 255; f32 accumulation keeps per-word byte sums exact).
     The cascade probe is fused: the same one-hots read the previous
     level's cell block, and absent inserts get their mask zeroed.

No gather/scatter appears anywhere: the filter streams through VMEM
once per segment (in + out), and every insert costs a few hundred
kFLOP of MXU work instead of a serialized memory transaction.

MEASURED OUTCOME (v5e, 2^32-bit filter, 2^21-insert segments): the
sweep ties the plain sort+scatter path (~40-50 ms/segment either way;
the full warm 2 x 100 Mbp cascade is ~3.8 s in both modes). The VPU
cost of building the one-hot operands is proportional to the MXU
matmul itself, and ~3/4 of grid passes process chunk slots belonging
to other cells (2M inserts over 4096 cells = 0.25 chunks/cell). It is
therefore DISABLED by default (see mode()) and kept as a correct,
tested alternative formulation.

Correctness is unconditional: when any cell's insert count exceeds the
static pass budget (impossible for uniform ntHash values at the tested
segment sizes, but not *provably* bounded), the caller's lax.cond
falls back to the plain scatter path (ops/bloom.insert_words).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bloom

CELL_WORDS = 1 << 15  # words per cell (2^20 bits); HI = 256 sublane rows
CHUNK = 2048  # inserts per kernel pass
SENTINEL = np.uint32(0xFFFFFFFF)


def supported(bits_log2: int) -> bool:
    """The binned sweep covers filters whose bit index fits in u32."""
    return bits_log2 <= 32


def _geometry(bits_log2: int):
    n_words = (1 << bits_log2) // 32
    cell_words = min(CELL_WORDS, n_words)
    n_cells = n_words // cell_words
    hi_rows = cell_words // 128
    return n_words, cell_words, n_cells, hi_rows


def _sweep_kernel(hi_rows: int, probe: bool):
    """Grid (n_cells, max_passes). Chunk operands arrive in two layouts:
    HIW [16,128] row-major (for the insert one-hot A) and HIT/LOT/MT
    [128,16] transposed (for the probe one-hot and per-insert columns).
    The global-hi comparison doubles as the cell-membership gate:
    inserts of other cells match no hi row and contribute nothing.

    The whole 2048-insert chunk is assembled into ONE
    [hi_rows, 2048] @ [2048, 512] MXU matmul per pass (the 512 lanes are
    the cell's 128 lo-words x 4 byte planes); the per-r-group 16-matmul
    formulation measured 49 ms/segment at 2^32 bits — dominated by VPU
    one-hot construction and per-matmul overhead, not MXU FLOPs."""

    def kernel(chunk_first_ref, passes_ref, *refs):
        def onehot_bf16(cond):
            # i1 -> int32 -> f32 -> bf16: the direct jnp.where(cond, bf16)
            # select trips a Mosaic i1 relayout ((8,128) -> (16,128)
            # tiling) on broadcast compares; the cast chain lowers fine
            return cond.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

        def bytes_bf16(x, j):
            # byte j of a u32 tile as bf16 (<=255, exactly representable;
            # Mosaic has no direct uint32 -> bfloat16 cast)
            return (
                ((x >> (8 * j)) & jnp.uint32(255))
                .astype(jnp.int32)
                .astype(jnp.float32)
                .astype(jnp.bfloat16)
            )

        if probe:
            words_in_ref, prev_ref, hiw_ref, hit_ref, lot_ref, mt_ref = refs[:6]
            out_ref = refs[6]
        else:
            words_in_ref, hiw_ref, hit_ref, lot_ref, mt_ref = refs[:5]
            out_ref = refs[5]
        i = pl.program_id(0)
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _init():
            out_ref[...] = words_in_ref[...]

        @pl.when(p < passes_ref[i])
        def _pass():
            ehi = hiw_ref[0, :, :].astype(jnp.int32)  # [16, 128] global hi index
            lot = lot_ref[0, :, :].astype(jnp.int32)  # [128, 16]
            mt = mt_ref[0, :, :]  # [128, 16] u32 insert masks (0 = dropped)
            hi_base = i * hi_rows
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (hi_rows, 128), 0) + hi_base
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            # A [hi_rows, 2048]: lane r*128+c one-hot over the cell's hi rows
            a_mm = jnp.concatenate(
                [onehot_bf16(ehi[r : r + 1, :] == hi_iota) for r in range(16)],
                axis=1,
            )
            if probe:
                hit = hit_ref[0, :, :].astype(jnp.int32)  # [128, 16]
                hi_iota_t = (
                    jax.lax.broadcasted_iota(jnp.int32, (128, hi_rows), 1) + hi_base
                )
                a_pro = jnp.concatenate(
                    [onehot_bf16(hit[:, r : r + 1] == hi_iota_t) for r in range(16)],
                    axis=0,
                )  # [2048, hi_rows]
                prev = prev_ref[0, :, :]  # [hi_rows, 128] u32
                prev_planes = jnp.concatenate(
                    [bytes_bf16(prev, j) for j in range(4)], axis=1
                )  # [hi_rows, 512]
                u = jax.lax.dot_general(
                    a_pro,
                    prev_planes,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [2048, 512]: insert i's prev byte rows across lo-words
            # B [2048, 512] assembled from per-r-group [128, 512] blocks
            # (full-width, offset-0 — Mosaic cannot concat lane-offset
            # [128,1] column slices, so per-insert scalars stay in r-space)
            b_blocks = []
            for r in range(16):
                blo_r = onehot_bf16(lot[:, r : r + 1] == lo_iota)  # [128, 128]
                m_r = mt[:, r : r + 1]  # [128, 1] u32
                if probe:
                    u_r = u[r * 128 : (r + 1) * 128, :]  # [128, 512] f32
                    blo_rf = blo_r.astype(jnp.float32)
                    probed = jnp.zeros((128, 1), jnp.int32)
                    for j in range(4):
                        pj = jnp.sum(
                            u_r[:, j * 128 : (j + 1) * 128] * blo_rf,
                            axis=1,
                            keepdims=True,
                        )
                        probed = probed | (pj.astype(jnp.int32) << (8 * j))
                    present = (
                        jax.lax.bitcast_convert_type(probed, jnp.uint32) & m_r
                    ) != 0
                    m_eff = jnp.where(present, m_r, jnp.uint32(0))
                else:
                    m_eff = m_r
                b_blocks.append(
                    jnp.concatenate(
                        [blo_r * bytes_bf16(m_eff, j) for j in range(4)], axis=1
                    )
                )
            b_mm = jnp.concatenate(b_blocks, axis=0)  # [2048, 512]
            c_mm = jax.lax.dot_general(
                a_mm,
                b_mm,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [hi_rows, 512] exact byte sums (deduped bits)
            contrib = jnp.zeros((hi_rows, 128), jnp.int32)
            for j in range(4):
                contrib = contrib | (
                    c_mm[:, j * 128 : (j + 1) * 128].astype(jnp.int32) << (8 * j)
                )
            out_ref[0, :, :] = out_ref[0, :, :] | jax.lax.bitcast_convert_type(
                contrib, jnp.uint32
            )

    return kernel


@functools.lru_cache(maxsize=None)
def _sweep_call(
    n_cells: int, hi_rows: int, n_chunks: int, max_passes: int, probe: bool, interpret: bool
):
    def cell_idx(i, p, cf, ps):
        return (i, 0, 0)

    def chunk_idx(i, p, cf, ps):
        # revisit the last live chunk on predicated-off passes (no DMA)
        last = jnp.maximum(ps[i] - 1, 0)
        c = cf[i] + jnp.minimum(p, last)
        return (jnp.minimum(c, n_chunks - 1), 0, 0)

    cell_spec = pl.BlockSpec((1, hi_rows, 128), cell_idx)
    row_spec = pl.BlockSpec((1, 16, 128), chunk_idx)
    tsp_spec = pl.BlockSpec((1, 128, 16), chunk_idx)
    in_specs = [cell_spec] + ([cell_spec] if probe else []) + [
        row_spec,
        tsp_spec,
        tsp_spec,
        tsp_spec,
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_cells, max_passes),
        in_specs=in_specs,
        out_specs=cell_spec,
    )
    return pl.pallas_call(
        _sweep_kernel(hi_rows, probe),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_cells, hi_rows, 128), jnp.uint32),
        interpret=interpret,
    )


def mode() -> str | None:
    """How to run the sweep: None (default: the plain scatter path),
    "tpu" (compiled Pallas), or "interpret" (Pallas interpreter; tests).

    Default is OFF: measured on a v5e at 2^32 bits, the sweep kernel's
    per-segment device time (~40-50 ms for 2^21 inserts) EQUALS the
    plain sort+scatter path's — the one-hot construction VPU work and
    the 4x cell/chunk boundary waste eat the MXU advantage — while its
    extra Pallas program doubles the stage's compile time. Kept as an
    env-gated alternative (NTSYNT_BF_SWEEP=tpu|interpret) and as the
    scaffolding for future binned-placement experiments."""
    import os

    if os.environ.get("NTSYNT_NO_PALLAS"):
        return None
    env = os.environ.get("NTSYNT_BF_SWEEP")
    if env == "interpret":
        return "interpret"
    if env in ("tpu", "1"):
        return "tpu"
    return None


def _prep(bit: jnp.ndarray, valid: jnp.ndarray, bits_log2: int):
    """Sort + dedupe + bin one segment's bit indices.

    Returns (layout arrays for the kernel, chunk_first, passes,
    overflow flag). Invalid entries sort into a sentinel tail and the
    first-of-run + index < n_valid rule keeps exactly one insert per
    distinct REAL bit (a genuine bit == 0xFFFFFFFF survives iff at
    least one valid entry carries it)."""
    n = bit.shape[0]
    _, _, n_cells, _ = _geometry(bits_log2)
    key = jax.lax.sort(jnp.where(valid, bit, SENTINEL))
    n_valid = jnp.sum(valid, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones(1, dtype=bool), key[1:] != key[:-1]]
    )
    keep = first & (jnp.arange(n, dtype=jnp.int32) < n_valid)
    mask = jnp.where(keep, jnp.uint32(1) << (key & jnp.uint32(31)), jnp.uint32(0))

    n_pad = -(-n // CHUNK) * CHUNK
    if n_pad != n:
        key = jnp.concatenate([key, jnp.full(n_pad - n, SENTINEL, jnp.uint32)])
        mask = jnp.concatenate([mask, jnp.zeros(n_pad - n, jnp.uint32)])
    n_chunks = n_pad // CHUNK

    ehi = key >> jnp.uint32(12)  # global hi row index (cell*hi_rows + hi)
    lo = (key >> jnp.uint32(5)) & jnp.uint32(127)
    hiw = ehi.reshape(n_chunks, 16, 128)
    hit = jnp.transpose(hiw, (0, 2, 1))
    lot = jnp.transpose(lo.reshape(n_chunks, 16, 128), (0, 2, 1))
    mt = jnp.transpose(mask.reshape(n_chunks, 16, 128), (0, 2, 1))

    if n_cells > 1:
        bounds = (jnp.arange(1, n_cells, dtype=jnp.uint32)) << jnp.uint32(20)
        ss = jnp.searchsorted(key, bounds).astype(jnp.int32)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ss])
        ends = jnp.concatenate([ss, jnp.full(1, n_pad, jnp.int32)])
    else:
        starts = jnp.zeros(1, jnp.int32)
        ends = jnp.full(1, n_pad, jnp.int32)
    chunk_first = starts // CHUNK
    passes = -((-ends) // CHUNK) - chunk_first
    max_passes = max(4, -(-2 * n_pad // (n_cells * CHUNK)))
    overflow = jnp.any(passes > max_passes)
    return (hiw, hit, lot, mt), chunk_first, passes, n_chunks, max_passes, overflow


def _bit_u32(canon_hi, canon_lo, bits_log2: int):
    if bits_log2 == 32:
        return canon_lo
    if bits_log2 < 32:
        return canon_lo & jnp.uint32((1 << bits_log2) - 1)
    raise ValueError("binned sweep requires bits_log2 <= 32")


def insert_segment(words, canon_hi, canon_lo, valid, bits_log2: int,
                   interpret: bool = False):
    """Insert one segment's hashes: binned sweep with scatter fallback.

    Traceable (usable inside fori_loop bodies); same contract as
    bloom.insert_words."""
    n_words, cell_words, n_cells, hi_rows = _geometry(bits_log2)
    (hiw, hit, lot, mt), cf, ps, n_chunks, maxp, overflow = _prep(
        _bit_u32(canon_hi, canon_lo, bits_log2), valid, bits_log2
    )

    def sweep(w):
        call = _sweep_call(n_cells, hi_rows, n_chunks, maxp, False, interpret)
        out = call(cf, ps, w.reshape(n_cells, hi_rows, 128), hiw, hit, lot, mt)
        return out.reshape(n_words)

    def fallback(w):
        return bloom.insert_words(w, canon_hi, canon_lo, valid, bits_log2)

    return jax.lax.cond(overflow, fallback, sweep, words)


def cascade_segment(prev_words, new_words, canon_hi, canon_lo, valid,
                    bits_log2: int, interpret: bool = False):
    """Fused probe(prev) + insert(new) for one cascade level segment
    (src/ntsynt_make_common_bf.cpp:140-160 semantics: insert a k-mer
    into the next level only if the previous level contains it)."""
    n_words, cell_words, n_cells, hi_rows = _geometry(bits_log2)
    (hiw, hit, lot, mt), cf, ps, n_chunks, maxp, overflow = _prep(
        _bit_u32(canon_hi, canon_lo, bits_log2), valid, bits_log2
    )

    def sweep(args):
        prev, new = args
        call = _sweep_call(n_cells, hi_rows, n_chunks, maxp, True, interpret)
        out = call(
            cf,
            ps,
            new.reshape(n_cells, hi_rows, 128),
            prev.reshape(n_cells, hi_rows, 128),
            hiw,
            hit,
            lot,
            mt,
        )
        return out.reshape(n_words)

    def fallback(args):
        prev, new = args
        present = bloom.bf_probe(prev, canon_hi, canon_lo, bits_log2)
        return bloom.insert_words(new, canon_hi, canon_lo, valid & present, bits_log2)

    return jax.lax.cond(overflow, fallback, sweep, (prev_words, new_words))
