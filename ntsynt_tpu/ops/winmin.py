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

UMAX = jnp.uint32(0xFFFFFFFF)


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


def sliding_argmin(key_hi, key_lo, w: int):
    """Leftmost argmin of every length-w window.

    Args:
      key_hi/key_lo: uint32 [n] hash halves. Invalid positions should be
        pre-set to 0xFFFFFFFF/0xFFFFFFFF by the caller.
      w: static window size (>=1).

    Returns:
      argmin: int32 [n-w+1] position of each window's minimum
        (values in [0, n)). Requires n >= w.
    """
    n = key_hi.shape[0]
    nw = n - w + 1
    assert nw >= 1, "need at least one full window"
    pos = jnp.arange(n, dtype=jnp.int32)
    if w == 1:
        return pos

    # Pad to a multiple of w with +inf keys.
    nb = -(-n // w)
    pad = nb * w - n
    key_hi = jnp.pad(key_hi, (0, pad), constant_values=np.uint32(0xFFFFFFFF))
    key_lo = jnp.pad(key_lo, (0, pad), constant_values=np.uint32(0xFFFFFFFF))
    pos = jnp.pad(pos, (0, pad), constant_values=jnp.int32(0x7FFFFFFF))

    blocks = (key_hi.reshape(nb, w), key_lo.reshape(nb, w), pos.reshape(nb, w))
    pref = jax.lax.associative_scan(_combine, blocks, axis=1)
    suff = jax.lax.associative_scan(_combine, blocks, axis=1, reverse=True)

    suff_flat = tuple(x.reshape(-1)[:nw] for x in suff)  # suffix min at j
    pref_flat = tuple(x.reshape(-1)[w - 1 : w - 1 + nw] for x in pref)  # prefix min at j+w-1
    _, _, arg = _combine(suff_flat, pref_flat)
    return arg


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
