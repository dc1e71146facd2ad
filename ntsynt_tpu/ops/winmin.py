"""Sliding-window minimum (minimizer selection) on device.

Replaces btllib indexlr's sequential monotone-queue scan
(/root/repo/SURVEY.md §2.2 item 2) with a data-parallel two-pass block
scan — the classic O(1)-per-window formulation:

  * split the key array into blocks of size w,
  * compute within-block prefix minima (left->right) and suffix minima
    (right->left) with log2(w) associative-scan steps,
  * window [j, j+w) minimum = min(suffix[j], prefix[j+w-1]).

Keys are 64-bit hashes as (hi, lo) uint32 pairs; the position is carried
through the scan so the *leftmost* argmin of every window comes out
directly (ties on hash resolve to the smaller position, which matches a
<-comparison monotone queue).

Everything here is jit-safe with static w.
"""

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar (not jnp): creating a device array at import time would
# initialize the XLA backend, which must not happen before
# jax.distributed.initialize in multi-host runs (parallel/multihost.py)
UMAX = np.uint32(0xFFFFFFFF)


def _use_pallas() -> bool:
    """Route the block scans through the Pallas TPU kernel on TPU."""
    import os

    if os.environ.get("NTSYNT_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _combine(a, b):
    """Lexicographic min over (hi, lo, pos) triples."""
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


def _shift_right(x, s: int, fill):
    """Shift a [nb, m] array right along the last axis by s, filling with
    `fill` (cheap lane shift on TPU, unlike strided gathers)."""
    return jnp.concatenate([jnp.full((x.shape[0], s), fill, x.dtype), x[:, :-s]], axis=1)


def _shift_left(x, s: int, fill):
    return jnp.concatenate([x[:, s:], jnp.full((x.shape[0], s), fill, x.dtype)], axis=1)


def _scan_min(blocks, w: int, reverse: bool):
    """Inclusive prefix (or suffix) min along the last axis via log2(w)
    shift+combine steps. associative_scan's Brent-Kung odd/even slicing
    forces strided lane relayouts on TPU; plain shifted combines lower
    to cheap lane rotations. Shifts only need to cover the first w lanes
    exactly; +inf padding in extra lanes is harmless for min."""
    hi, lo, pos = blocks
    shift = _shift_left if reverse else _shift_right
    s = 1
    while s < w:
        prev = (
            shift(hi, s, np.uint32(0xFFFFFFFF)),
            shift(lo, s, np.uint32(0xFFFFFFFF)),
            shift(pos, s, np.int32(0x7FFFFFFF)),
        )
        hi, lo, pos = _combine((hi, lo, pos), prev)
        s <<= 1
    return hi, lo, pos


def sliding_block_argmin(key_hi, key_lo, w: int):
    """Leftmost argmin + min value of every length-w window, in BLOCK
    layout — the TPU-native form of the two-pass method.

    Positions are grouped into nb = ceil(n/w) blocks of w, lane-padded
    to wp = roundup(w, 128). Window j = b*w + c combines

        win[j] = min( suffix[b, c], prefix-at-(j+w-1) )

    where the prefix term is pref[b, w-1] for c == 0 and pref[b+1, c-1]
    otherwise — i.e. one row shift + one single-lane shift in block
    space, instead of the flat formulation's (w-1)-lane relayout of
    every array (the dominant cost at the XLA level).

    Returns (arg, min_hi, min_lo), each [nb, wp] — entries with c >= w
    or b*w + c >= n-w+1 are garbage; callers mask them (hosts usually
    flatten with numpy).
    """
    n = key_hi.shape[0]
    assert n >= w >= 1
    if w == 1:
        pos = jnp.arange(n, dtype=jnp.int32).reshape(1, n)
        return pos, key_hi.reshape(1, n), key_lo.reshape(1, n)
    nb = -(-n // w)
    wp = -(-w // 128) * 128
    tailpad = nb * w - n

    def to_blocks(x, fill):
        if tailpad:
            x = jnp.pad(x, (0, tailpad), constant_values=fill)
        b = x.reshape(nb, w)
        if wp != w:
            b = jnp.pad(b, ((0, 0), (0, wp - w)), constant_values=fill)
        return b

    blocks_hi = to_blocks(key_hi, np.uint32(0xFFFFFFFF))
    blocks_lo = to_blocks(key_lo, np.uint32(0xFFFFFFFF))
    # position index within blocks: pos[b, c] = b*w + c (c < w)
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, wp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, wp), 1)
    pos = jnp.where(lane < w, row * w + lane, jnp.int32(0x7FFFFFFF))

    blocks = (blocks_hi, blocks_lo, pos)
    if _use_pallas():
        from . import winmin_pallas

        pref, suff = winmin_pallas.block_scans_pallas(*blocks, w)
    else:
        pref = _scan_min(blocks, w, reverse=False)
        # suffix scan must not pull +inf-padded lanes INTO the block:
        # the pad is +inf so min() ignores it — safe for reverse too.
        suff = _scan_min(blocks, w, reverse=True)

    # prefix term: P2[b, c] = pref[b+1, c-1] (c>=1) | pref[b, w-1] (c==0)
    def p2(x, fill):
        down = jnp.concatenate([x[1:], jnp.full((1, wp), fill, x.dtype)], axis=0)
        shifted = jnp.concatenate([jnp.full((nb, 1), fill, x.dtype), down[:, :-1]], axis=1)
        col = x[:, w - 1 : w]  # [nb, 1]
        return jnp.where(lane == 0, col, shifted)

    p2_triple = (
        p2(pref[0], np.uint32(0xFFFFFFFF)),
        p2(pref[1], np.uint32(0xFFFFFFFF)),
        p2(pref[2], np.int32(0x7FFFFFFF)),
    )
    min_hi, min_lo, arg = _combine(suff, p2_triple)
    return arg, min_hi, min_lo


def _blocked_scans(key_hi, key_lo, n: int, w: int):
    """Flat-output wrapper over sliding_block_argmin (test/compat path:
    includes the unaligned flatten, so prefer the block API on TPU)."""
    nw = n - w + 1
    arg, min_hi, min_lo = sliding_block_argmin(key_hi[:n], key_lo[:n], w)
    nb, wp = arg.shape
    if wp != w:
        arg, min_hi, min_lo = arg[:, :w], min_hi[:, :w], min_lo[:, :w]
    return (
        min_hi.reshape(-1)[:nw],
        min_lo.reshape(-1)[:nw],
        arg.reshape(-1)[:nw],
    )


def sliding_argmin(key_hi, key_lo, w: int):
    """Leftmost argmin of every length-w window.

    Two-pass block method: split positions into blocks of w, compute
    within-block prefix and suffix minima, and combine
    window[j] = min(suffix[j], prefix[j+w-1]).

    Args:
      key_hi/key_lo: uint32 [n] hash halves. Invalid positions should be
        pre-set to 0xFFFFFFFF/0xFFFFFFFF by the caller.
      w: static window size (>=1).

    Returns:
      argmin: int32 [n-w+1] position of each window's minimum
        (values in [0, n)). Requires n >= w.
    """
    n = key_hi.shape[0]
    assert n - w + 1 >= 1, "need at least one full window"
    if w == 1:
        return jnp.arange(n, dtype=jnp.int32)
    _, _, arg = _blocked_scans(key_hi, key_lo, n, w)
    return arg


def sliding_argmin_val(key_hi, key_lo, w: int):
    """Like sliding_argmin but also returns each window's min value
    (min_hi, min_lo) so callers can test window validity by comparing
    against the +inf sentinel instead of gathering valid[arg] — large
    random gathers serialize on TPU."""
    n = key_hi.shape[0]
    assert n - w + 1 >= 1, "need at least one full window"
    if w == 1:
        return jnp.arange(n, dtype=jnp.int32), key_hi, key_lo
    min_hi, min_lo, arg = _blocked_scans(key_hi, key_lo, n, w)
    return arg, min_hi, min_lo


def select_minimizers(key_hi, key_lo, valid, w: int):
    """Boolean mask of minimizer positions.

    A k-mer position is a minimizer iff it is the (leftmost) argmin of at
    least one length-w window and is itself valid. If there are fewer
    than w k-mers, the whole array is treated as one window (a contig
    shorter than w+k-1 still yields its best k-mer, so short contigs are
    not silently dropped).

    Returns bool [n].
    """
    n = key_hi.shape[0]
    key_hi = jnp.where(valid, key_hi, UMAX)
    key_lo = jnp.where(valid, key_lo, UMAX)
    w_eff = min(w, n)
    arg = sliding_argmin(key_hi, key_lo, w_eff)
    sel = jnp.zeros(n, dtype=bool).at[arg].set(True)
    return sel & valid
