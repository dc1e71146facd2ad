"""Bloom-filter builders vs NumPy oracles."""

import numpy as np
import pytest

from ntsynt_tpu.io.fasta import PackedGenome
from ntsynt_tpu.ops import bf_build, nthash
from ntsynt_tpu.ops.bloom import NumpyBloomFilter
from ntsynt_tpu.ops.sketch import _probe_np


def _genome(codes, name):
    return PackedGenome(
        path=name,
        name=name,
        contig_names=["c1", "c2"],
        lengths=np.array([len(codes) // 2, len(codes) - len(codes) // 2]),
        offsets=np.array([0, len(codes) // 2]),
        codes=codes,
        raw=None,
        fai_offsets=np.zeros(2, np.int64),
        fai_linebases=np.ones(2, np.int64),
        fai_linewidth=np.ones(2, np.int64),
    )


@pytest.fixture(scope="module")
def genomes():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 20_000).astype(np.uint8)
    b = a.copy()
    b[::97] = (b[::97] + 1) % 4  # sparse SNPs
    c = a.copy()
    c[5_000:9_000] = rng.integers(0, 4, 4_000)  # diverged region
    return [_genome(a, "a.fa"), _genome(b, "b.fa"), _genome(c, "c.fa")]


def _contig_canon(g, k):
    out = []
    for i in range(g.n_contigs):
        canon, _, valid = nthash.hash_sequence_np(g.contig_codes(i), k)
        out.append(canon[valid])
    return np.concatenate(out)


def test_common_bf_cascade(genomes):
    k = 20
    bf = bf_build.build_common_bf(genomes, k, fpr=0.025, chunk=1 << 13)
    # oracle cascade with the same pow2 size
    nbits = bf.num_bits
    prev = NumpyBloomFilter(nbits, k)
    for g in sorted(genomes, key=lambda g: g.path):
        if prev.bits.any():
            nxt = NumpyBloomFilter(nbits, k)
            canon = _contig_canon(g, k)
            nxt.insert(canon[prev.probe(canon)])
            prev = nxt
        else:
            prev.insert(_contig_canon(g, k))
    got = _probe_np(bf, _contig_canon(genomes[0], k))
    want = prev.probe(_contig_canon(genomes[0], k))
    assert (got == want).all()
    # truly common kmers must all be present
    common = _contig_canon(genomes[0], k)
    for g in genomes[1:]:
        common = np.intersect1d(common, _contig_canon(g, k))
    assert _probe_np(bf, common).all()
    # FPR sane
    assert 0 < bf_build.device_fpr(bf) < 0.2


def test_repeat_bf(genomes):
    k = 20
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 6_000).astype(np.uint8)
    # engineered repeat: a 300bp block appearing twice
    codes[4_000:4_300] = codes[1_000:1_300]
    g = _genome(codes, "r.fa")
    bf = bf_build.build_repeat_bf([g], k, chunk=1 << 12)
    canon = []
    for i in range(g.n_contigs):
        c, _, v = nthash.hash_sequence_np(g.contig_codes(i), k)
        canon.append(c[v])
    canon = np.concatenate(canon)
    uniq, counts = np.unique(canon, return_counts=True)
    repeated = uniq[counts >= 2]
    once = uniq[counts == 1]
    assert len(repeated) >= 200
    # every multiplicity>=2 kmer must be in the repeat BF
    assert _probe_np(bf, repeated).all()
    # most singletons must be absent (allow BF fpr)
    assert _probe_np(bf, once).mean() < 0.1


def test_common_bf_from_shared_stream_bit_equal(genomes):
    """The pipeline's shared sketch-layout upload must produce a BF
    bit-identical to the dedicated k-1-separator layout (separator and
    padding k-mers hash invalid either way)."""
    from ntsynt_tpu.ops import sketch as sketch_ops

    k, w, chunk = 20, 11, 1 << 13
    direct = bf_build.build_common_bf(genomes, k, fpr=0.025, chunk=chunk)
    entries = []
    for g in sorted(genomes, key=lambda g: g.path):
        _, _, dev_buf, n_segs = sketch_ops.prepare_shared_stream(
            g, k, w, seg_windows=1 << 10, bf_chunk=chunk
        )
        entries.append((g.name, dev_buf, n_segs))
    shared = bf_build.build_common_bf_from_device(
        entries, k, direct.num_bits, chunk=chunk
    )
    assert (np.asarray(direct.words) == np.asarray(shared.words)).all()


def test_insert_words_edge_bits():
    """Direct insert_words edges: max bit index (sentinel collision at
    bits_log2=32... approximated here at small sizes), invalid routing,
    duplicate-word mask OR."""
    import jax.numpy as jnp

    from ntsynt_tpu.ops import bloom

    for bits_log2 in (16, 20):
        nbits = 1 << bits_log2
        rng = np.random.default_rng(bits_log2)
        canon = rng.integers(0, 2**64, 4096, dtype=np.uint64)
        # force some entries to the MAX bit index and some duplicates
        canon[:7] = (canon[:7] & ~np.uint64(nbits - 1)) | np.uint64(nbits - 1)
        canon[7:20] = canon[0]
        valid = rng.random(4096) < 0.8
        valid[:3] = True
        hi = jnp.asarray((canon >> np.uint64(32)).astype(np.uint32))
        lo = jnp.asarray((canon & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        got = bloom.insert_words(
            jnp.zeros(nbits // 32, jnp.uint32), hi, lo, jnp.asarray(valid), bits_log2
        )
        oracle = bloom.NumpyBloomFilter(nbits, 24)
        oracle.insert(canon, valid)
        got_bits = np.unpackbits(
            np.asarray(got).view(np.uint8), bitorder="little"
        ).astype(bool)
        assert (got_bits == oracle.bits).all()


def test_insert_words_compressed_pair_sort_33_34():
    """The >32-bit insert's compressed (key32, pay8) sort formulation
    (round 5) vs a sparse NumPy word oracle, at both supported shifts
    (bits_log2 33 and 34), including the has_real_max corner: real keys
    in the top 2^s bit indices share key32 with the invalid sentinel
    and must route through the legacy lax.cond branch bit-identically."""
    import jax.numpy as jnp

    from ntsynt_tpu.ops import bloom

    for bits_log2 in (33, 34):
        nbits = 1 << bits_log2
        n_words = nbits // 32
        rng = np.random.default_rng(40 + bits_log2)
        for force_max in (False, True):
            canon = rng.integers(0, 2**64, 1 << 14, dtype=np.uint64)
            canon[100:140] = canon[99]  # duplicate runs
            valid = rng.random(len(canon)) < 0.95
            if force_max:
                # bit indices in [nbits-2^s, nbits): key32 == 0xFFFFFFFF
                s = bits_log2 - 32
                canon[:5] = (canon[:5] & ~np.uint64(nbits - 1)) | (
                    np.uint64(nbits - (1 << s))
                    + rng.integers(0, 1 << s, 5).astype(np.uint64)
                )
                valid[:5] = True
            hi = jnp.asarray((canon >> np.uint64(32)).astype(np.uint32))
            lo = jnp.asarray((canon & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            got = np.asarray(
                bloom.insert_words(
                    jnp.zeros(n_words, jnp.uint32), hi, lo,
                    jnp.asarray(valid), bits_log2, place=False,
                )
            )
            want = np.zeros(n_words, np.uint32)
            idx = canon[valid] & np.uint64(nbits - 1)
            np.bitwise_or.at(
                want,
                (idx >> np.uint64(5)).astype(np.int64),
                np.uint32(1) << (idx & np.uint64(31)).astype(np.uint32),
            )
            assert (got == want).all(), (bits_log2, force_max)


def test_insert_words_scratchless_path_bit_equal():
    """The huge-filter in-place insert (no scratch array, used when
    words >= 4 GiB) must match the scatter-into-zeros path bit for bit."""
    import jax.numpy as jnp

    from ntsynt_tpu.ops import bloom

    rng = np.random.default_rng(5)
    bits_log2 = 18
    canon = rng.integers(0, 2**64, 8192, dtype=np.uint64)
    valid = rng.random(8192) < 0.9
    hi = jnp.asarray((canon >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((canon & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    base = jnp.zeros((1 << bits_log2) // 32, jnp.uint32).at[7].set(jnp.uint32(9))
    v = jnp.asarray(valid)
    a = bloom.insert_words(base, hi, lo, v, bits_log2, scratch=True)
    b = bloom.insert_words(base, hi, lo, v, bits_log2, scratch=False)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_pow2_bits_hbm_cap():
    from ntsynt_tpu.ops import bloom

    # default cap is 2^34 (scratch-insert regime, see bloom.pow2_bits)
    assert bloom.pow2_bits(int(1.19e11)) == 1 << 34  # 3 Gbp @ fpr .025
    assert bloom.pow2_bits(int(1.19e11), max_log2=35) == 1 << 35
    assert bloom.pow2_bits(int(3.95e9)) == 1 << 32
    assert bloom.pow2_bits(10) == 1 << 16


def test_common_bf_chunked_stream_bit_equal(genomes):
    """The chunk-pipelined upload walk (ChunkedSharedStream.bf_groups)
    must produce a BF bit-identical to the monolithic build, and its
    assembled device buffer must equal the stream codes."""
    import jax.numpy as jnp

    from ntsynt_tpu.ops import sketch as sketch_ops

    k, w, chunk = 20, 11, 1 << 13
    direct = bf_build.build_common_bf(genomes, k, fpr=0.025, chunk=chunk)
    streams = {}

    def entry(g):
        cs = sketch_ops.ChunkedSharedStream(
            g, k, w, seg_windows=1 << 10, bf_chunk=chunk, group_segs=2
        )
        streams[g.name] = cs
        return "chunked", cs.bf_groups()

    entries = [
        (g.name, lambda g=g: entry(g)) for g in sorted(genomes, key=lambda g: g.path)
    ]
    shared = bf_build.build_common_bf_from_device(
        entries, k, direct.num_bits, chunk=chunk
    )
    assert (np.asarray(direct.words) == np.asarray(shared.words)).all()
    for g in genomes:
        cs = streams[g.name]
        got = np.asarray(cs.dev_buf)
        want = cs.stream.codes
        assert (got[: len(want)] == want).all()
        assert (got[len(want):] == 4).all()  # padding stays separator
