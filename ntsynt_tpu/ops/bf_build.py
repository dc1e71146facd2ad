"""Whole-genome Bloom-filter construction on device.

TPU-native equivalents of the reference's two native BF builders:

  * build_common_bf — cascading common-k-mer filter
    (src/ntsynt_make_common_bf.cpp:105-165): BF_1 holds all k-mers of
    the lexicographically first genome; each subsequent genome inserts a
    k-mer into the next level only if the previous level contains it;
    the final level approximates the k-mer intersection of all genomes.
  * build_repeat_bf — k-mers with multiplicity >= 2 within any single
    genome (bin/ntsynt_make_repeat_bfs.py:56-67).

Both stream each genome's canonical k-mer hashes through fixed-shape
device chunks (one compiled executable per (k, chunk, size)); contigs
are separated by k-1 N codes so no k-mer spans a boundary. The repeat
builder detects within-chunk duplicates with a sort (the reference's
strictly sequential contains-then-insert order is only observable
through Bloom-filter false-positive patterns, which are not part of the
output contract).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bloom, nthash
from ..utils import log

DEFAULT_CHUNK = 1 << 22


def _kmer_stream(genome, k: int, chunk: int, codes: np.ndarray | None = None):
    """Yield fixed-size uint8 code tiles covering every k-mer once.

    Tiles are chunk + k - 1 long (halo); k-mers spanning contig ends are
    invalidated by k-1 N separators.
    """
    src = genome.codes if codes is None else codes
    parts = []
    sep = np.full(k - 1, 4, dtype=np.uint8)
    for i in range(genome.n_contigs):
        o, ln = int(genome.offsets[i]), int(genome.lengths[i])
        parts.append(src[o : o + ln])
        parts.append(sep)
    stream = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    n_kmers = max(len(stream) - k + 1, 0)
    tile_len = chunk + k - 1
    for s in range(0, n_kmers, chunk):
        tile = stream[s : s + tile_len]
        if len(tile) < tile_len:
            tile = np.concatenate([tile, np.full(tile_len - len(tile), 4, np.uint8)])
        yield jnp.asarray(tile)


@functools.lru_cache(maxsize=None)
def _hash_chunk_fn(k: int, chunk: int):
    @jax.jit
    def run(codes_tile):
        h = nthash.hash_tile(codes_tile, k)
        return h["canon_hi"], h["canon_lo"], h["valid"]

    return run


@functools.lru_cache(maxsize=None)
def _probe_fn(bits_log2: int):
    @jax.jit
    def run(words, hi, lo):
        return bloom.bf_probe(words, hi, lo, bits_log2)

    return run


@functools.lru_cache(maxsize=None)
def _first_occurrence_fn():
    @jax.jit
    def run(hi, lo):
        """True at the first occurrence of each distinct (hi, lo)."""
        n = hi.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        s_hi, s_lo, s_idx = jax.lax.sort((hi, lo, idx), num_keys=3)
        dup_prev = jnp.concatenate(
            [
                jnp.zeros(1, dtype=bool),
                (s_hi[1:] == s_hi[:-1]) & (s_lo[1:] == s_lo[:-1]),
            ]
        )
        first = jnp.zeros(n, dtype=bool).at[s_idx].set(~dup_prev)
        return first

    return run


def bf_size_bits(genomes, fpr: float, bf_bytes: int | None = None) -> int:
    """Reference sizing: from the first (sorted) genome's length
    (src/ntsynt_make_common_bf.cpp:109-117), rounded to pow2."""
    if bf_bytes is not None:
        return bloom.pow2_bits(bf_bytes * 8)
    first = sorted(genomes, key=lambda g: g.path)[0]
    return bloom.pow2_bits(bloom.reference_bf_bits(first.total_bases, fpr))


def build_common_bf(genomes, k: int, fpr: float = 0.025, bf_bytes=None, chunk: int = DEFAULT_CHUNK):
    """Cascading common-k-mer Bloom filter over all genomes.

    Genomes are processed in lexicographic path order for determinism
    (src/ntsynt_make_common_bf.cpp:105-107).
    """
    ordered = sorted(genomes, key=lambda g: g.path)
    num_bits = bf_size_bits(genomes, fpr, bf_bytes)
    hash_fn = _hash_chunk_fn(k, chunk)

    log(f"Building common Bloom filter ({num_bits // 8} bytes) over {len(ordered)} genomes")
    bf = bloom.DeviceBloomFilter(num_bits, k)
    for tile in _kmer_stream(ordered[0], k, chunk):
        hi, lo, valid = hash_fn(tile)
        bf.insert(hi, lo, valid)
    log(f"Level-1 BF occupancy/FPR: {bf.fpr():.4f}")

    probe = _probe_fn(bf.bits_log2)
    for genome in ordered[1:]:
        nxt = bloom.DeviceBloomFilter(num_bits, k)
        for tile in _kmer_stream(genome, k, chunk):
            hi, lo, valid = hash_fn(tile)
            present = probe(bf.words, hi, lo)
            nxt.insert(hi, lo, valid & present)
        bf = nxt
        log(f"Cascade BF occupancy/FPR after {genome.name}: {bf.fpr():.4f}")
    return bf


def build_repeat_bf(genomes, k: int, fpr: float = 0.01, bf_bytes=None, chunk: int = DEFAULT_CHUNK):
    """BF of k-mers with multiplicity >= 2 within any single genome
    (bin/ntsynt_make_repeat_bfs.py:56-67)."""
    num_bits = bf_size_bits(genomes, fpr, bf_bytes)
    hash_fn = _hash_chunk_fn(k, chunk)
    first_fn = _first_occurrence_fn()
    rep = bloom.DeviceBloomFilter(num_bits, k)
    probe = _probe_fn(num_bits.bit_length() - 1)
    for genome in genomes:
        seen = bloom.DeviceBloomFilter(num_bits, k)
        for tile in _kmer_stream(genome, k, chunk):
            hi, lo, valid = hash_fn(tile)
            already = probe(seen.words, hi, lo)
            first = first_fn(hi, lo)
            rep.insert(hi, lo, valid & (already | ~first))
            seen.insert(hi, lo, valid)
    log(f"Repeat BF occupancy/FPR: {rep.fpr():.4f}")
    return rep
