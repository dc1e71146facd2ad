"""64-bit unsigned integer arithmetic as (hi, lo) uint32 pairs for TPU.

TPUs have no native 64-bit integer lanes, so every 64-bit hash value on
device is carried as two uint32 arrays (hi, lo). This module provides the
small algebra the sketching pipeline needs: xor, add-with-carry,
multiply-by-constant (via 16-bit limb products), shifts, and lexicographic
comparison. Host-side conversion helpers go through NumPy uint64.

All functions are shape-polymorphic and jit-safe.
"""

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def from_np64(x: np.ndarray):
    """Split a NumPy uint64 array into (hi, lo) uint32 device-ready arrays."""
    x = np.asarray(x, dtype=np.uint64)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return hi, lo


def to_np64(hi, lo) -> np.ndarray:
    """Combine (hi, lo) uint32 arrays back into a NumPy uint64 array."""
    hi = np.asarray(hi, dtype=np.uint64)
    lo = np.asarray(lo, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def add(a, b):
    """(hi,lo) + (hi,lo) mod 2^64."""
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    hi = a[0] + b[0] + carry
    return hi, lo


def shr(a, n: int):
    """Logical right shift by a static 0 <= n < 64."""
    hi, lo = a
    if n == 0:
        return hi, lo
    if n < 32:
        new_lo = (lo >> n) | (hi << (32 - n))
        new_hi = hi >> n
    elif n == 32:
        new_lo, new_hi = hi, jnp.zeros_like(hi)
    else:
        new_lo = hi >> (n - 32)
        new_hi = jnp.zeros_like(hi)
    return new_hi, new_lo


def lt(a, b):
    """a < b as unsigned 64-bit."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def select(pred, a, b):
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def _limbs16(c: int):
    """Split a Python int constant into four 16-bit limbs (low first)."""
    return [np.uint32((c >> (16 * i)) & 0xFFFF) for i in range(4)]


def mul_const(a, c: int):
    """(hi,lo) * c mod 2^64 for a static Python-int constant c.

    Uses 16-bit limbs so every partial product fits exactly in uint32
    (16x16->32), which the TPU VPU supports natively. The result's limbs
    are accumulated with explicit carry propagation.
    """
    hi, lo = a
    # 16-bit limbs of a (low to high)
    al = [lo & MASK16, lo >> 16, hi & MASK16, hi >> 16]
    cl = _limbs16(c)
    # acc[t] accumulates all contributions to 16-bit limb t WITHOUT masking:
    # at most 4 low-halves (<2^16) + 4 high-halves (<2^16) => < 2^19, so a
    # uint32 accumulator is exact. Carries are propagated once at the end.
    zero = jnp.zeros_like(lo)
    acc = [zero, zero, zero, zero]
    for i in range(4):
        for j in range(4 - i):
            p = al[i] * cl[j]  # < 2^32, exact in uint32
            t = i + j
            acc[t] = acc[t] + (p & MASK16)
            if t + 1 < 4:
                acc[t + 1] = acc[t + 1] + (p >> 16)
    out = []
    c_in = zero
    for t in range(4):
        s = acc[t] + c_in
        out.append(s & MASK16)
        c_in = s >> 16
    new_lo = out[0] | (out[1] << 16)
    new_hi = out[2] | (out[3] << 16)
    return new_hi, new_lo
