"""ntHash-compatible canonical k-mer hashing, vectorized for TPU.

The reference pipeline's sketches (`indexlr -k -w --long --seq --pos`,
/root/reference/bin/ntsynt_run_pipeline.smk:85) print one
``hash:pos:seq`` record per selected minimizer. The exact hash function
was reverse-engineered from the 295,028 (kmer, hash) pairs in
/root/reference/tests/expected_result/*.k{20,24}.w1000.tsv (all pairs
reproduce bit-exactly):

    f(s)   = XOR_{j<k} srol^(k-1-j)( SEED[s_j] )          # forward strand
    r(s)   = XOR_{j<k} srol^j( SEED[complement(s_j)] )    # reverse strand
    c(s)   = (f + r) mod 2^64                              # strand-neutral
    out(s) = t ^ (t >> 27),  t = c * ((1 ^ (k * MS)) mod 2^64)

where ``srol`` is the ntHash2 "split rotate" (independent left-rotations
of the low-33 and high-31 bit fields) and MS = 0x90b45d39fb6da1fa.
``out`` is what indexlr prints and orders minimizers by; the *unmixed*
canonical ``c`` is what btllib KmerBloomFilter hashes k-mers to with one
hash function (used for the common/repeat Bloom filters, see
/root/reference/src/ntsynt_make_common_bf.cpp:147-152).

Design note (TPU-first): instead of the reference's sequential rolling
recurrence (one dependent update per base), we evaluate the closed-form
XOR-of-rotated-seeds directly. Precomputing per-position tables
``TF[j][base] = srol^(k-1-j)(SEED[base])`` turns hashing into k
independent gather+XOR steps over the whole tile at once — embarrassingly
parallel, no loop-carried dependency, ideal for the VPU. Hash values ride
as (hi, lo) uint32 pairs (no 64-bit lanes on TPU).

Bases are coded A=0, C=1, G=2, T=3, N/other=4 (SEED[4]=0; validity of
k-mers containing non-ACGT is tracked separately).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import u64

# The four classic ntHash base seeds (A, C, G, T) plus 0 for N.
SEED_TAB = np.array(
    [0x3C8BFBB395C60474, 0x3193C18562A02B4C, 0x20323ED082572324, 0x295549F54BE24456, 0],
    dtype=np.uint64,
)
# complement code: A<->T, C<->G, N->N
COMP_CODE = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
MULTISEED = 0x90B45D39FB6DA1FA
MULTISHIFT = 27
_U64MASK = (1 << 64) - 1


def _srol1_np(x: np.ndarray) -> np.ndarray:
    """ntHash2 split-rotate: rotate bits[32:0] (33 wide) and bits[63:33]
    (31 wide) left by one, independently."""
    x = x.astype(np.uint64)
    m = ((x & np.uint64(0x8000000000000000)) >> np.uint64(30)) | (
        (x & np.uint64(0x100000000)) >> np.uint64(32)
    )
    return ((x << np.uint64(1)) & np.uint64(0xFFFFFFFDFFFFFFFF)) | m


@functools.lru_cache(maxsize=None)
def hash_tables(k: int):
    """Per-position seed tables for direct (non-rolling) hashing.

    Returns (TF, TR) as NumPy uint64 arrays of shape (k, 5):
      TF[j][b] = srol^(k-1-j)(SEED[b])
      TR[j][b] = srol^j(SEED[COMP[b]])
    """
    rots = np.empty((k, 5), dtype=np.uint64)
    rots[0] = SEED_TAB
    for i in range(1, k):
        rots[i] = _srol1_np(rots[i - 1])
    tf = rots[::-1].copy()
    tr = rots[:, COMP_CODE].copy()
    return tf, tr


def mix_multiplier(k: int) -> int:
    """The nte64(i=1) multiplier: (1 ^ (k * MULTISEED)) mod 2^64."""
    return (1 ^ ((k * MULTISEED) & _U64MASK)) & _U64MASK


# ---------------------------------------------------------------------------
# NumPy oracle (host / test reference)
# ---------------------------------------------------------------------------


def hash_sequence_np(codes: np.ndarray, k: int):
    """Hash every k-mer of a coded sequence on the host.

    Args:
      codes: uint8 array [L] of base codes (0..3 ACGT, 4=N/masked).
      k: k-mer size.

    Returns:
      (canon, out, valid): uint64 [L-k+1] canonical (pre-mix) hashes,
      uint64 [L-k+1] printed/ordering hashes, and bool [L-k+1] validity
      (False where the k-mer contains any non-ACGT code).
    """
    codes = np.asarray(codes, dtype=np.uint8)
    n = len(codes) - k + 1
    if n <= 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy(), np.zeros(0, dtype=bool)
    tf, tr = hash_tables(k)
    f = np.zeros(n, dtype=np.uint64)
    r = np.zeros(n, dtype=np.uint64)
    bad = np.zeros(n, dtype=bool)
    for j in range(k):
        cj = codes[j : j + n]
        f ^= tf[j][cj]
        r ^= tr[j][cj]
        bad |= cj >= 4
    canon = f + r
    t = canon * np.uint64(mix_multiplier(k))
    out = t ^ (t >> np.uint64(MULTISHIFT))
    return canon, out, ~bad


def unmix_np(out: np.ndarray, k: int) -> np.ndarray:
    """Invert the nte64 mix: printed hash -> canonical (pre-mix) hash.

    ``out = t ^ (t >> 27)`` with ``t = canon * mult`` is invertible:
    the xorshift-right undoes in ceil(64/27)=3 substitution steps and
    the odd multiplier has a modular inverse mod 2^64. Lets the
    --filter Filter repeat-BF path probe directly from a sketch TSV's
    printed hashes (the BF key is the canonical hash; the reference
    re-hashes the TSV's seq strings instead, bin/ntsynt_synteny.py:605).
    """
    out = np.asarray(out, dtype=np.uint64)
    t = out.copy()
    for _ in range(2):
        t = out ^ (t >> np.uint64(MULTISHIFT))
    mult = mix_multiplier(k)
    inv = pow(mult, -1, 1 << 64)
    return (t * np.uint64(inv)).astype(np.uint64)


def hash_kmer_np(seq: str, k: int) -> int:
    """Hash one k-mer string; returns the printed (mixed) hash value."""
    lut = np.full(256, 4, dtype=np.uint8)
    for i, c in enumerate("ACGT"):
        lut[ord(c)] = i
        lut[ord(c.lower())] = i
    codes = lut[np.frombuffer(seq.encode(), dtype=np.uint8)]
    _, out, valid = hash_sequence_np(codes, k)
    if len(out) != 1 or not valid[0]:
        raise ValueError(f"not a valid {k}-mer: {seq!r}")
    return int(out[0])


# ---------------------------------------------------------------------------
# JAX implementation (device; uint32 pairs)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _hash_tables_u32(k: int):
    """(TF, TR) split into uint32 (hi, lo) halves, as NumPy constants.

    Kept as NumPy (not jnp) so cached values never capture a trace; they
    are embedded as per-trace constants by _lut5.
    """
    tf, tr = hash_tables(k)
    tf_hi, tf_lo = u64.from_np64(tf)
    tr_hi, tr_lo = u64.from_np64(tr)
    return tf_hi, tf_lo, tr_hi, tr_lo


def _lut5(c, v):
    """Map base codes 0..4 to the five scalar constants in v (numpy (5,)).

    A chain of four selects instead of a gather: TPU VPU-friendly (no
    dynamic addressing), and each value is a trace-local scalar constant.
    """
    r = jnp.where(c == 0, np.uint32(v[0]), np.uint32(v[4]))
    r = jnp.where(c == 1, np.uint32(v[1]), r)
    r = jnp.where(c == 2, np.uint32(v[2]), r)
    return jnp.where(c == 3, np.uint32(v[3]), r)


def hash_tile(codes, k: int):
    """Hash every k-mer of a coded tile on device.

    Args:
      codes: uint8/int32 array [T] of base codes (0..3 ACGT, 4=N/masked).
        The tile should include a (k-1)-base halo at the end; k-mers are
        produced for the first T-k+1 start positions.
      k: static k-mer size.

    Returns:
      dict with uint32 arrays of shape [T-k+1]:
        canon_hi/canon_lo: pre-mix canonical hash (Bloom-filter key)
        out_hi/out_lo:     printed/ordering hash (minimizer key)
        valid:             bool, False if k-mer spans a non-ACGT code
    """
    codes = codes.astype(jnp.int32)
    n = codes.shape[0] - k + 1
    tf_hi, tf_lo, tr_hi, tr_lo = _hash_tables_u32(k)
    f = (jnp.zeros(n, jnp.uint32), jnp.zeros(n, jnp.uint32))
    r = (jnp.zeros(n, jnp.uint32), jnp.zeros(n, jnp.uint32))
    bad = jnp.zeros(n, dtype=jnp.int32)
    for j in range(k):
        cj = jax_dynamic_slice(codes, j, n)
        f = (f[0] ^ _lut5(cj, tf_hi[j]), f[1] ^ _lut5(cj, tf_lo[j]))
        r = (r[0] ^ _lut5(cj, tr_hi[j]), r[1] ^ _lut5(cj, tr_lo[j]))
        bad = bad | (cj >= 4)
    canon = u64.add(f, r)
    t = u64.mul_const(canon, mix_multiplier(k))
    out = u64.xor(t, u64.shr(t, MULTISHIFT))
    return dict(
        canon_hi=canon[0],
        canon_lo=canon[1],
        out_hi=out[0],
        out_lo=out[1],
        valid=bad == 0,
    )


def jax_dynamic_slice(x, start: int, size: int):
    """Static slice helper (start/size are Python ints at trace time)."""
    return jax.lax.slice(x, (start,), (start + size,))
