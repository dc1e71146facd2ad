"""Bit-packed Bloom filters in device HBM.

TPU-native replacement for btllib's KmerBloomFilter and the cascading
common-k-mer builder (/root/reference/src/ntsynt_make_common_bf.cpp:121-160)
and the repeat-BF builder (/root/reference/bin/ntsynt_make_repeat_bfs.py:56-67).

Design:
  * one hash function (like the reference, HASH_FNS=1): the key is the
    *canonical* (pre-mix) ntHash value; the bit index is ``key mod m``.
  * ``m`` (number of bits) is rounded to the nearest power of two so the
    modulo is a bit-mask — exact 64-bit modulo by an arbitrary m is
    wasteful with uint32 pairs. The reference sizes m as
    ceil(-G/ln(1-fpr)) (src/ntsynt_make_common_bf.cpp:38); we round that
    to pow2, which shifts the effective FPR by at most sqrt(2)x. m can be
    up to 2^36 bits (8 GiB) with int32 word addressing.
  * storage is a bit-packed uint32 word array. Insertion has no native
    scatter-OR on XLA, so we sort bit positions by word index, combine
    each run's masks with a log-step segmented OR, and scatter one
    combined mask per unique word (gather-OR-set with unique indices —
    deterministic).

The same word-array layout is what the multi-chip path all-reduces with
a bitwise-OR butterfly (see parallel/mesh.py).
"""

import functools
import json
import math

import jax
import jax.numpy as jnp
import numpy as np


def reference_bf_bits(genome_size: int, fpr: float) -> int:
    """Bit count the reference would use: ceil(-G / ln(1-fpr))
    (src/ntsynt_make_common_bf.cpp:28-40, one hash function)."""
    return int(math.ceil(-genome_size / math.log(1.0 - fpr)))


def pow2_bits(requested_bits: int, max_log2: int = 34) -> int:
    """Round a bit count to the nearest power of two in [2^16, 2^max].

    The default cap (2^34 bits = 2 GiB of words) keeps every insert on
    the scratch formulation (measured 28.7 ms vs 58.4 ms per 2^21-k-mer
    segment for the in-place path a 2^35 filter forces — the in-place
    gather-merge pays a serialized per-element gather) AND keeps the
    cascade's peak footprint (prev + new + zeros scratch + code
    streams) inside a single chip's 16 GB HBM at 3 Gbp genome scale.
    Capping raises the effective FPR (~5.7% at 1 Gbp, ~16% at 3 Gbp
    vs the requested 2.5%), which the reference documents as its own
    memory/FPR trade (README.md:176 — higher --fpr lowers peak RAM);
    the block-level effect is measured (PARITY.md #1). Callers can
    override with bf_bytes / max_log2 up to 2^36."""
    requested_bits = max(requested_bits, 1 << 16)
    lg = math.log2(requested_bits)
    b = int(round(lg))
    b = min(max(b, 16), max_log2)
    return 1 << b


class DeviceBloomFilter:
    """A 1-hash bit-packed Bloom filter living on device."""

    def __init__(self, num_bits: int, k: int, words=None):
        assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
        assert 1 << 16 <= num_bits <= 1 << 36
        self.num_bits = num_bits
        self.k = k
        self.n_words = num_bits // 32
        if words is None:
            self.words = jnp.zeros(self.n_words, dtype=jnp.uint32)
        else:
            assert words.shape == (self.n_words,)
            self.words = words

    # -- geometry ----------------------------------------------------------
    @property
    def bits_log2(self) -> int:
        return self.num_bits.bit_length() - 1

    def popcount(self) -> int:
        """Number of set bits (for FPR reporting, cf. btllib get_fpr)."""
        w = np.asarray(self.words)
        return int(np.unpackbits(w.view(np.uint8)).sum())

    def fpr(self) -> float:
        """Occupancy = FPR for a 1-hash BF."""
        return self.popcount() / self.num_bits

    # -- device ops --------------------------------------------------------
    def insert(self, canon_hi, canon_lo, valid=None):
        """Insert a batch of canonical hashes (uint32 pair arrays)."""
        from . import bf_place

        if valid is None:
            valid = jnp.ones(canon_hi.shape, dtype=bool)
        place = bf_place.resolve(self.bits_log2, canon_hi.shape[0])
        self.words = _insert_kernel(self.bits_log2, place)(
            self.words, canon_hi, canon_lo, valid
        )

    def probe(self, canon_hi, canon_lo):
        """Membership test for a batch of canonical hashes -> bool array."""
        return bf_probe(self.words, canon_hi, canon_lo, self.bits_log2)

    # -- persistence -------------------------------------------------------
    def save(self, path: str, fmt: str = "native") -> str:
        """Save the filter.

        fmt="native": small JSON header + raw little-endian uint32 words
        (ntsynt_tpu's own container). fmt="btllib": the btllib
        KmerBloomFilter v6 container (src/ntsynt_make_common_bf.cpp:162-165
        emits this; bin/ntsynt_synteny.py:606 loads it) — lossless for
        these pow2 filters since h % 2^n == h & (2^n - 1), so a
        reference btllib build probes identically.
        """
        if fmt == "btllib":
            from ..io.btllib_bf import write_btllib_bf

            return write_btllib_bf(path, np.asarray(self.words), self.num_bits, self.k)
        header = dict(
            magic="ntsynt_tpu_bf1",
            num_bits=self.num_bits,
            k=self.k,
            hash_fns=1,
        )
        with open(path, "wb") as fout:
            hdr = json.dumps(header).encode() + b"\n"
            fout.write(len(hdr).to_bytes(8, "little"))
            fout.write(hdr)
            fout.write(np.asarray(self.words).astype("<u4").tobytes())
        return path

    @classmethod
    def load(cls, path: str) -> "DeviceBloomFilter":
        """Load a .bf saved by ntsynt_tpu OR by btllib/the reference.

        Delegates to load_bf (container sniffing); raises if the file is
        a non-pow2 btllib filter, which can only load as a
        HostModBloomFilter — use load_bf directly for those.
        """
        bf = load_bf(path)
        if not isinstance(bf, cls):
            raise ValueError(
                f"{path}: non-pow2 btllib filter ({bf.num_bits} bits) — "
                "device mask-modulo does not apply; use bloom.load_bf, "
                "which returns a HostModBloomFilter for it"
            )
        return bf

    @classmethod
    def _load_native(cls, path: str) -> "DeviceBloomFilter":
        with open(path, "rb") as fin:
            hlen = int.from_bytes(fin.read(8), "little")
            header = json.loads(fin.read(hlen).decode())
            assert header["magic"] == "ntsynt_tpu_bf1", "not an ntsynt_tpu Bloom filter"
            words = np.frombuffer(fin.read(), dtype="<u4").astype(np.uint32)
        bf = cls(header["num_bits"], header["k"], words=jnp.asarray(words))
        return bf


def load_bf(path: str):
    """Universal .bf loader: sniffs the container.

    btllib KmerBloomFilter v6 (reference-built or fmt="btllib" saves) ->
    DeviceBloomFilter when pow2-sized, HostModBloomFilter otherwise;
    ntsynt_tpu native container -> DeviceBloomFilter.
    """
    from ..io import btllib_bf

    if btllib_bf.sniff_btllib(path):
        return btllib_bf.load_btllib_bf(path)
    return DeviceBloomFilter._load_native(path)


def _bit_index(canon_hi, canon_lo, bits_log2: int):
    """(word_idx int32, bit_mask uint32) for bit position canon mod 2^bits_log2."""
    if bits_log2 <= 32:
        bit_lo = canon_lo & jnp.uint32((1 << bits_log2) - 1) if bits_log2 < 32 else canon_lo
        word = (bit_lo >> 5).astype(jnp.int32)
    else:
        hi_part = canon_hi & jnp.uint32((1 << (bits_log2 - 32)) - 1)
        word = ((hi_part << 27) | (canon_lo >> 5)).astype(jnp.int32)
    mask = jnp.uint32(1) << (canon_lo & jnp.uint32(31))
    return word, mask


def insert_words(words, canon_hi, canon_lo, valid, bits_log2: int, scratch: bool | None = None,
                 place=None):
    """Pure sorted-OR insert (jit-safe; also usable inside shard_map).

    Strategy (measured on hardware; XLA-TPU gathers run ~50 M elem/s and
    scatters ~80 M elem/s, both serialized):
      * sort a SINGLE u32 key (the bit index) instead of co-sorting
        (word, mask) pairs when the filter is <= 2^32 bits,
      * combine duplicate-word masks with a log-step segmented OR,
      * place the surviving run-end masks with the Pallas streaming
        kernel (ops/bf_place — no scatter instruction at all) when the
        filter geometry supports it, else
      * scatter each run's combined mask into a FRESH zero array and OR
        it into ``words`` densely — this deletes the per-element gather
        of the old gather-merge-scatter formulation (dense 512 MB OR is
        ~3x cheaper than a 4M-element gather).

    ``place`` threads the bf_place mode (None = resolve from env and
    backend at trace time; False disables; "tpu"/"interpret" force) —
    callers that lru-cache jitted wrappers must resolve it via
    bf_place.resolve and include it in their cache key.
    """
    n_words = (1 << bits_log2) // 32
    n = canon_lo.shape[0]
    if bits_log2 <= 32:
        sentinel = jnp.uint32(0xFFFFFFFF)
        if bits_log2 == 32:
            bit = canon_lo
            # a real insert may legitimately hit bit 2^32-1; only treat
            # the sentinel run as droppable when no valid entry does
            has_real_max = jnp.any(valid & (bit == sentinel))
        else:
            bit = canon_lo & jnp.uint32((1 << bits_log2) - 1)
            has_real_max = jnp.bool_(False)  # real bits < sentinel
        key = jax.lax.sort(jnp.where(valid, bit, sentinel))
        word = (key >> 5).astype(jnp.int32)
        mask = jnp.uint32(1) << (key & jnp.uint32(31))
        sent_run = (key == sentinel) & ~has_real_max
    elif bits_log2 <= 34:
        # compressed pair sort (round 5): the 33/34-bit bit index packs
        # into (u32 key = index >> s, u8 payload = index & (2^s - 1))
        # with s = bits_log2 - 32, and sorting by key32 alone sorts by
        # word (word = key32 >> (5 - s)) — the measured (u32, u8) sort
        # runs 304 M elem/s at 2^26 vs 261 for the (i32, u32) pair sort
        # it replaces (scratch/tpu_sort_micro.py). Invalid lanes take
        # key32 = 0xFFFFFFFF / pay = 255 and drop out as word = n_words.
        # Corner case: a REAL key in the top 2^s bit indices shares
        # key32 with the invalid sentinel, and the (unstable) sort may
        # interleave it into the invalid tail — ~1.6% of 2^26-key
        # pooled inserts hit this at 2^34 bits, and lax.cond routes
        # them through the legacy pair-sort formulation (bit-identical
        # either way).
        s = bits_log2 - 32
        hi_part = canon_hi & jnp.uint32((1 << s) - 1)
        key32 = (hi_part << (32 - s)) | (canon_lo >> s)
        pay = (canon_lo & jnp.uint32((1 << s) - 1)).astype(jnp.uint8)
        has_real_max = jnp.any(valid & (key32 == jnp.uint32(0xFFFFFFFF)))

        def _fast(operand):
            k32, p8, ok = operand
            k32 = jnp.where(ok, k32, jnp.uint32(0xFFFFFFFF))
            p8 = jnp.where(ok, p8, jnp.uint8(255))
            k_s, p_s = jax.lax.sort((k32, p8), num_keys=1)
            real = p_s < jnp.uint8(1 << s)
            w = jnp.where(
                real, (k_s >> (5 - s)).astype(jnp.int32), jnp.int32(n_words)
            )
            bitpos = ((k_s & jnp.uint32((1 << (5 - s)) - 1)) << s) | p_s.astype(
                jnp.uint32
            )
            m = jnp.where(real, jnp.uint32(1) << bitpos, jnp.uint32(0))
            return w, m

        def _legacy(operand):
            hi, lo, ok = operand
            w, m = _bit_index(hi, lo, bits_log2)
            w = jnp.where(ok, w, jnp.int32(n_words))
            m = jnp.where(ok, m, jnp.uint32(0))
            return jax.lax.sort((w, m), num_keys=1)

        word, mask = jax.lax.cond(
            has_real_max,
            lambda _: _legacy((canon_hi, canon_lo, valid)),
            lambda _: _fast((key32, pay, valid)),
            operand=None,
        )
        sent_run = word == jnp.int32(n_words)
    else:
        word, mask = _bit_index(canon_hi, canon_lo, bits_log2)
        word = jnp.where(valid, word, jnp.int32(n_words))
        mask = jnp.where(valid, mask, jnp.uint32(0))
        word, mask = jax.lax.sort((word, mask), num_keys=1)
        sent_run = word == jnp.int32(n_words)
    if place is None:
        from . import bf_place

        place = bf_place.resolve(bits_log2, n)
    if place:
        from . import bf_place

        if bf_place.supported(bits_log2, n):
            # raw sorted (word, mask): the kernel dedups runs in-window
            # (and its scatter fallback does its own segmented OR), so
            # the XLA-wide log-step OR below is skipped entirely
            word_p = jnp.where(sent_run, jnp.int32(n_words), word)
            n_valid = jnp.sum(valid, dtype=jnp.int32)
            return bf_place.place_sorted(
                words, word_p, mask, n_valid, bits_log2,
                interpret=(place == "interpret"),
            )
    # segmented OR within runs of equal word index (log-step doubling)
    shift = 1
    while shift < n:
        prev_w = jnp.concatenate([jnp.full(shift, -1, jnp.int32), word[:-shift]])
        prev_m = jnp.concatenate([jnp.zeros(shift, jnp.uint32), mask[:-shift]])
        mask = mask | jnp.where(word == prev_w, prev_m, jnp.uint32(0))
        shift <<= 1
    # last element of each run carries the full OR
    nxt = jnp.concatenate([word[1:], jnp.full(1, -2, jnp.int32)])
    run_end = word != nxt
    keep = run_end & ~sent_run
    scatter_idx = jnp.where(keep, word, jnp.int32(n_words))
    if scratch is None:
        scratch = bits_log2 < 35
    if not scratch:
        # huge filters (words >= 4 GiB): gather-merge-scatter directly on
        # ``words`` — slower (extra per-element gather) but allocates no
        # second word-array-sized buffer; the dump index n_words is out
        # of bounds, so dropped entries never read or write real words
        # (the pre-scatter gather clamps, and those lanes are dropped),
        # letting XLA alias the scatter output onto its input
        merged = words[jnp.minimum(scatter_idx, jnp.int32(n_words - 1))] | mask
        return words.at[scatter_idx].set(
            jnp.where(keep, merged, jnp.uint32(0)), mode="drop"
        )
    z = jnp.zeros(n_words + 1, jnp.uint32)
    z = z.at[scatter_idx].set(jnp.where(keep, mask, jnp.uint32(0)), mode="drop")
    return words | z[:-1]


@functools.lru_cache(maxsize=None)
def _insert_kernel(bits_log2: int, place=None):
    @jax.jit
    def insert(words, canon_hi, canon_lo, valid):
        return insert_words(
            words, canon_hi, canon_lo, valid, bits_log2, place=place or False
        )

    return insert


def bf_probe(words, canon_hi, canon_lo, bits_log2: int):
    """Gather-based membership test (jit-safe, usable inside other kernels)."""
    word, mask = _bit_index(canon_hi, canon_lo, bits_log2)
    return (words[word] & mask) != 0


class HostModBloomFilter:
    """Exact ``h % num_bits`` Bloom filter for ARBITRARY (non-pow2) bit
    counts — the shape reference-built btllib filters come in
    (src/ntsynt_make_common_bf.cpp sizes by -genome/ln(1-fpr), not
    pow2). Probes run on host (numpy uint64 modulo is exact); the
    device kernels' mask-modulo fast path requires pow2, so sketchers
    route streams through their host formulation when handed one of
    these (ops/sketch.sketch_genome).
    """

    def __init__(self, num_bits: int, k: int, bits: np.ndarray):
        self.num_bits = int(num_bits)
        self.k = k
        self.bits = bits  # packed uint8, btllib layout (bit i -> byte i//8, 1<<(i%8))

    @classmethod
    def from_bytes(cls, data: bytes, num_bits: int, k: int) -> "HostModBloomFilter":
        return cls(num_bits, k, np.frombuffer(data, dtype=np.uint8).copy())

    @property
    def bits_log2(self):
        raise ValueError(
            "HostModBloomFilter is not pow2-sized; device mask-modulo "
            "probing does not apply (probe on host via probe_np)"
        )

    def probe_np(self, canon: np.ndarray) -> np.ndarray:
        canon = np.asarray(canon, dtype=np.uint64)
        idx = canon % np.uint64(self.num_bits)
        byte = (idx >> np.uint64(3)).astype(np.int64)
        return (self.bits[byte] >> (idx & np.uint64(7)).astype(np.uint8)) & 1 != 0

    def insert_np(self, canon: np.ndarray):
        canon = np.asarray(canon, dtype=np.uint64)
        idx = canon % np.uint64(self.num_bits)
        byte = (idx >> np.uint64(3)).astype(np.int64)
        np.bitwise_or.at(self.bits, byte, (1 << (idx & np.uint64(7))).astype(np.uint8))

    def popcount(self) -> int:
        return int(np.unpackbits(self.bits).sum())

    def fpr(self) -> float:
        return self.popcount() / self.num_bits

    def save(self, path: str, fmt: str = "btllib") -> str:
        """btllib is the only container that preserves an arbitrary
        (non-pow2) modulus — h % num_bits must equal h % (bytes*8)."""
        from ..io.btllib_bf import write_btllib_bf_bytes

        if fmt != "btllib":
            raise ValueError("HostModBloomFilter only serializes as btllib")
        if self.num_bits % 8 != 0:
            raise ValueError(
                f"num_bits {self.num_bits} not a byte multiple: btllib "
                "probes h % (bytes*8), which would change membership"
            )
        return write_btllib_bf_bytes(
            path, self.bits[: self.num_bits // 8].tobytes(), self.k
        )


# ---------------------------------------------------------------------------
# NumPy mirror (host-side oracle for tests)
# ---------------------------------------------------------------------------


class NumpyBloomFilter:
    def __init__(self, num_bits: int, k: int):
        assert num_bits & (num_bits - 1) == 0
        self.num_bits = num_bits
        self.k = k
        self.bits = np.zeros(num_bits, dtype=bool)

    def insert(self, canon: np.ndarray, valid=None):
        canon = np.asarray(canon, dtype=np.uint64)
        if valid is not None:
            canon = canon[np.asarray(valid)]
        self.bits[(canon & np.uint64(self.num_bits - 1)).astype(np.int64)] = True

    def probe(self, canon: np.ndarray) -> np.ndarray:
        canon = np.asarray(canon, dtype=np.uint64)
        return self.bits[(canon & np.uint64(self.num_bits - 1)).astype(np.int64)]
