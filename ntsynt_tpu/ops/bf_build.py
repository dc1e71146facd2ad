"""Whole-genome Bloom-filter construction on device.

TPU-native equivalents of the reference's two native BF builders:

  * build_common_bf — cascading common-k-mer filter
    (src/ntsynt_make_common_bf.cpp:105-165): BF_1 holds all k-mers of
    the lexicographically first genome; each subsequent genome inserts a
    k-mer into the next level only if the previous level contains it;
    the final level approximates the k-mer intersection of all genomes.
  * build_repeat_bf — k-mers with multiplicity >= 2 within any single
    genome (bin/ntsynt_make_repeat_bfs.py:56-67).

Each genome/level is ONE device dispatch: the code stream lives in HBM
and a fori_loop walks fixed-shape segments (hash -> scatter-OR insert,
with the cascade's probe fused in). Occupancy/FPR reporting runs a
device-side popcount (downloading the bit array to count on the host
costs a 0.5 GB transfer per level). The repeat builder detects
within-segment duplicates with a sort (the reference's strictly
sequential contains-then-insert order is only observable through
false-positive patterns, which are not part of the output contract).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bf_sweep, bloom, nthash
from ..utils import log

# measured on the v5e (scratch insert, 2^34-bit filter): 2^21-k-mer
# segments run 73 M elem/s, 2^22 93 M/s (the full-filter dense OR
# amortizes over more keys); 2^23 keeps the u32 key sort in its fast
# regime (654 M elem/s) while halving the dense-OR count again
DEFAULT_CHUNK = 1 << 23


def _sweep_mode(bits_log2: int):
    """Binned Pallas sweep mode for this filter size (None = plain XLA
    scatter path; see ops/bf_sweep.py)."""
    return bf_sweep.mode() if bf_sweep.supported(bits_log2) else None


def _stream_buffer(genome, k: int, chunk: int, codes: np.ndarray | None = None):
    """Concatenate contigs with k-1 N separators; pad so every segment
    slice [i*chunk, i*chunk + chunk + k - 1) is in range. Returns
    (host buffer uint8, n_segments)."""
    src = genome.codes if codes is None else codes
    parts = []
    sep = np.full(k - 1, 4, dtype=np.uint8)
    for i in range(genome.n_contigs):
        o, ln = int(genome.offsets[i]), int(genome.lengths[i])
        parts.append(src[o : o + ln])
        parts.append(sep)
    stream = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    n_kmers = max(len(stream) - k + 1, 0)
    if n_kmers == 0:
        return None, 0
    n_segs = -(-n_kmers // chunk)
    need = n_segs * chunk + k - 1
    buf = np.full(need, 4, dtype=np.uint8)
    buf[: len(stream)] = stream
    return buf, n_segs


def _segment_hashes(codes_buf, i, k: int, chunk: int):
    # offset in uint32: whole-genome code buffers exceed 2^31 elements
    # at 3 Gbp and int32 offset math wraps; uint32 dynamic-slice starts
    # index correctly on TPU up to 2^32 (scratch/tpu_bigbuf_probe.py)
    off = jnp.asarray(i).astype(jnp.uint32) * jnp.uint32(chunk)
    tile = jax.lax.dynamic_slice(codes_buf, (off,), (chunk + k - 1,))
    h = nthash.hash_tile(tile, k)
    return h["canon_hi"], h["canon_lo"], h["valid"]


@functools.lru_cache(maxsize=None)
def _insert_stream_grouped_fn(k: int, chunk: int, bits_log2: int, place, group: int):
    """Pooled insert: each fori step hashes ``group`` consecutive
    segments and feeds ONE 8x-bigger insert_words call. The placement
    kernel (ops/bf_place) amortizes its filter-streaming DMA, grid
    overhead and per-unit window padding over the pooled keys; filters
    are bit-identical to per-segment inserts because an insert's effect
    is the pure OR-union of its valid keys' bits (segmentation cannot
    change the union). Segments past n_segs clamp their slice and mask
    all lanes invalid."""

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(codes_buf, n_segs, words):
        def body(g, words):
            his, los, vals = [], [], []
            for s in range(group):
                i = g * group + s
                ic = jnp.minimum(i, n_segs - 1)
                hi, lo, valid = _segment_hashes(codes_buf, ic, k, chunk)
                his.append(hi)
                los.append(lo)
                vals.append(valid & (i < n_segs))
            return bloom.insert_words(
                words,
                jnp.concatenate(his),
                jnp.concatenate(los),
                jnp.concatenate(vals),
                bits_log2,
                place=place or False,
            )

        return jax.lax.fori_loop(0, -(-n_segs // group), body, words)

    return run


def pick_group(bits_log2: int, chunk: int):
    """Pooled-segment count for the placement kernel: (group, mode).
    group == 1 / mode None means the per-segment scatter path.

    Pooling is capped at 2^26 keys: with the kernel's in-window dedup
    the pooled place rate RISES with size (measured v5e, 2^34 bits:
    151 M elem/s at 2^24, 177 at 2^25, 196 at 2^26 vs 100 scatter —
    scratch/tpu_place_micro.py) because the fixed per-unit window work
    amortizes over more keys, while the pair sort's decay (387 M
    elem/s at 2^23 -> 261 at 2^26) plus the density cap
    (bf_place.MAX_MEAN_STEP) bound the useful pool size."""
    from . import bf_place

    for g in (8, 4, 2, 1):
        if g * chunk > (1 << 26):
            continue
        m = bf_place.resolve(bits_log2, g * chunk)
        if m:
            return g, m
    return 1, None


@functools.lru_cache(maxsize=None)
def _insert_stream_fn(k: int, chunk: int, bits_log2: int, sweep=None, place=None):
    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(codes_buf, n_segs, words):
        def body(i, words):
            hi, lo, valid = _segment_hashes(codes_buf, i, k, chunk)
            if sweep is None:
                return bloom.insert_words(
                    words, hi, lo, valid, bits_log2, place=place or False
                )
            return bf_sweep.insert_segment(
                words, hi, lo, valid, bits_log2, interpret=(sweep == "interpret")
            )

        return jax.lax.fori_loop(0, n_segs, body, words)

    return run


# NOTE on cascade semantics: each level inserts the genome's own k-mer
# set, then ANDs with the previous level. For a 1-hash Bloom filter
# this is bit-for-bit equal to the reference's per-k-mer
# insert-if-present (src/ntsynt_make_common_bf.cpp:140-160): bit b is
# set in the next level iff some k-mer h of this genome has bit(h) == b
# and prev.contains(h) — and prev.contains(h) IS prev[b] when
# bit(h) == b. The dense AND streams both filters at HBM bandwidth
# (~ms) where the probe formulation paid one serialized gather per
# k-mer (~75 M elem/s — the dominant cascade cost before this).


def repeat_segment_update(rep, seen, hi, lo, valid, bits_log2: int, place=None):
    """One segment of the repeat-BF walk (traceable, shared by the
    single-chip _repeat_stream_fn and the mesh
    parallel/mesh._sharded_repeat_level_fn so the bit-exactness-critical
    duplicate-detection semantics live in exactly one place): a k-mer
    goes into ``rep`` iff the seen filter already holds it (earlier
    segment, or a bit collision — the documented FP-pattern deviation,
    PARITY #3) or it is not the first occurrence of its exact hash
    within this segment."""
    already = bloom.bf_probe(seen, hi, lo, bits_log2)
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
    rep = bloom.insert_words(
        rep, hi, lo, valid & (already | ~first), bits_log2, place=place
    )
    seen = bloom.insert_words(seen, hi, lo, valid, bits_log2, place=place)
    return rep, seen


@functools.lru_cache(maxsize=None)
def _repeat_stream_fn(k: int, chunk: int, bits_log2: int, place=None):
    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def run(codes_buf, n_segs, rep_words, seen_words):
        def body(i, carry):
            rep, seen = carry
            hi, lo, valid = _segment_hashes(codes_buf, i, k, chunk)
            return repeat_segment_update(
                rep, seen, hi, lo, valid, bits_log2, place=place or False
            )

        return jax.lax.fori_loop(0, n_segs, body, (rep_words, seen_words))

    return run


@functools.lru_cache(maxsize=None)
def _and_fn():
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(a, b):
        return a & b

    return run


def _walk_entry(payload, k: int, chunk: int, bits_log2: int, sweep, words, place=None,
                group: int = 1):
    """Insert one genome's k-mer stream into ``words``.

    payload is either (dev_buf, n_segs) — one fori dispatch over the
    whole stream — or ("chunked", iterator of (group_buf, n_segs)) from
    sketch.ChunkedSharedStream.bf_groups(): one dispatch per group, so
    group g+1's host pack + upload overlap group g's device inserts
    (H2D transfers overlap queued compute on the tunnel — measured,
    scratch/tpu_overlap_micro.py). Segment order is identical either
    way => bit-identical filters."""
    def get_fn():
        # an explicit sweep request (NTSYNT_BF_SWEEP=tpu|interpret)
        # takes precedence over bf_place pooling, so the env-gated
        # sweep kernel is never silently bypassed (ADVICE r4)
        if group > 1 and sweep is None:
            return _insert_stream_grouped_fn(k, chunk, bits_log2, place, group)
        return _insert_stream_fn(k, chunk, bits_log2, sweep, place)

    if isinstance(payload, tuple) and len(payload) == 2 and payload[0] == "chunked":
        fn = None
        for grp_buf, n_segs in payload[1]:
            if n_segs <= 0:
                continue
            if fn is None:
                fn = get_fn()
            words = fn(grp_buf, jnp.int32(n_segs), words)
        return words
    dev_buf, n_segs = payload
    if n_segs > 0:
        words = get_fn()(dev_buf, jnp.int32(n_segs), words)
    return words


@jax.jit
def _popcount_partials(words):
    """Per-group popcount partial sums (uint32-safe: each group of 4096
    words holds at most 2^17 bits, so no overflow; the final sum runs on
    the host in uint64 — jnp uint64 is unavailable without x64)."""
    x = words
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    per_word = (x * jnp.uint32(0x01010101)) >> 24
    return jnp.sum(per_word.reshape(-1, 4096), axis=1, dtype=jnp.uint32)


def device_fpr(bf) -> float:
    """Occupancy (= FPR for a 1-hash BF) without downloading the words."""
    partials = np.asarray(_popcount_partials(bf.words), dtype=np.uint64)
    return float(partials.sum()) / bf.num_bits


def bf_size_bits(genomes, fpr: float, bf_bytes: int | None = None) -> int:
    """Reference sizing: from the first (sorted) genome's length
    (src/ntsynt_make_common_bf.cpp:109-117), rounded to pow2.

    An EXPLICIT bf_bytes escapes the 2^34 auto-cap (up to the 2^36
    addressing ceiling): the cap is a speed default, and callers sizing
    by hand — quality studies, machines with more HBM — get what they
    ask for."""
    if bf_bytes is not None:
        return bloom.pow2_bits(bf_bytes * 8, max_log2=36)
    first = sorted(genomes, key=lambda g: g.path)[0]
    requested = bloom.reference_bf_bits(first.total_bases, fpr)
    bits = bloom.pow2_bits(requested)
    if bits < requested / 1.5:  # HBM cap engaged (not mere pow2 rounding)
        import math

        eff = 1.0 - math.exp(-first.total_bases / bits)
        log(
            f"Bloom filter capped at {bits // 8} bytes to fit device HBM; "
            f"effective FPR ~{eff:.3f} (requested {fpr})"
        )
    return bits


def stream_segments(n_kmers: int, chunk: int) -> int:
    """Number of fixed-shape BF segments covering ``n_kmers`` k-mers."""
    return -(-max(n_kmers, 0) // chunk)


def build_common_bf_from_device(entries, k: int, num_bits: int, chunk: int = DEFAULT_CHUNK,
                                release=None):
    """Cascading common-k-mer BF over pre-uploaded device code buffers.

    Args:
      entries: ordered [(name, get) ...] where get() -> (dev_buf uint8,
        n_segs int) or -> ("chunked", group iterator) from
        sketch.ChunkedSharedStream.bf_groups(), OR
        [(name, dev_buf, n_segs) ...] — already in the reference's
        deterministic lexicographic-path order
        (src/ntsynt_make_common_bf.cpp:105-107). The callable form lets
        the caller overlap each genome's host-side stream build/pack
        with the previous level's (async) device dispatch; the chunked
        form additionally interleaves one genome's own uploads with its
        own insert dispatches (hides the FIRST genome's upload, which
        nothing else can cover). Each buffer must hold at least
        ``n_segs * chunk + k - 1`` codes; k-mers containing non-ACGT
        codes (contig separators, padding) hash invalid and are
        skipped, so any stream layout with >= k-1 separator codes
        between contigs inserts exactly the genome's k-mer set.
      release: optional callable(name) invoked right after a genome's
        level has been dispatched — the caller drops its reference to
        that genome's code buffer so HBM frees as soon as the queued
        level executes (at 2^35-bit filters the two cascade levels
        alone are 8 GiB; keeping every gigabase code buffer resident
        alongside them exhausts a 16 GB chip).

    One dispatch per cascade level; occupancy logging is deferred to the
    end so no host sync lands between levels.
    """
    bits_log2 = num_bits.bit_length() - 1
    log(f"Building common Bloom filter ({num_bits // 8} bytes) over {len(entries)} genomes")

    def resolve(e):
        if len(e) == 2:
            name, get = e
            return name, get()
        return e[0], (e[1], e[2])

    sweep = _sweep_mode(bits_log2)
    group, place = pick_group(bits_log2, chunk)
    levels = []
    bf = bloom.DeviceBloomFilter(num_bits, k)
    name0, payload0 = resolve(entries[0])
    bf.words = _walk_entry(payload0, k, chunk, bits_log2, sweep, bf.words, place, group)
    del payload0
    if release is not None:
        release(name0)
    levels.append((name0, _popcount_partials(bf.words)))

    for e in entries[1:]:
        name, payload = resolve(e)
        nxt = bloom.DeviceBloomFilter(num_bits, k)
        nxt.words = _walk_entry(
            payload, k, chunk, bits_log2, sweep, nxt.words, place, group
        )
        nxt.words = _and_fn()(nxt.words, bf.words)
        del payload
        if release is not None:
            release(name)
        bf = nxt
        levels.append((name, _popcount_partials(bf.words)))

    for i, (name, partials) in enumerate(levels):
        occ = float(np.asarray(partials, dtype=np.uint64).sum()) / num_bits
        if i == 0:
            log(f"Level-1 BF occupancy/FPR: {occ:.4f}")
        else:
            log(f"Cascade BF occupancy/FPR after {name}: {occ:.4f}")
    return bf


def build_common_bf(genomes, k: int, fpr: float = 0.025, bf_bytes=None, chunk: int = DEFAULT_CHUNK):
    """Cascading common-k-mer Bloom filter over all genomes.

    Genomes are processed in lexicographic path order for determinism
    (src/ntsynt_make_common_bf.cpp:105-107). One dispatch per level.
    """
    ordered = sorted(genomes, key=lambda g: g.path)
    num_bits = bf_size_bits(genomes, fpr, bf_bytes)

    entries = []
    for genome in ordered:
        buf, n_segs = _stream_buffer(genome, k, chunk)
        dev = jnp.asarray(buf) if buf is not None else jnp.zeros(chunk + k - 1, jnp.uint8)
        entries.append((genome.name, dev, n_segs))
    return build_common_bf_from_device(entries, k, num_bits, chunk)


def build_repeat_bf(genomes, k: int, fpr: float = 0.01, bf_bytes=None, chunk: int = DEFAULT_CHUNK):
    """BF of k-mers with multiplicity >= 2 within any single genome
    (bin/ntsynt_make_repeat_bfs.py:56-67). One dispatch per genome."""
    from . import bf_place

    num_bits = bf_size_bits(genomes, fpr, bf_bytes)
    bits_log2 = num_bits.bit_length() - 1
    rep = bloom.DeviceBloomFilter(num_bits, k)
    fn = _repeat_stream_fn(k, chunk, bits_log2, bf_place.resolve(bits_log2, chunk))
    for genome in genomes:
        buf, n_segs = _stream_buffer(genome, k, chunk)
        if buf is None:
            continue
        seen = bloom.DeviceBloomFilter(num_bits, k)
        rep.words, _ = fn(jnp.asarray(buf), jnp.int32(n_segs), rep.words, seen.words)
    log(f"Repeat BF occupancy/FPR: {device_fpr(rep):.4f}")
    return rep
