"""Binned Pallas BF sweep (ops/bf_sweep) vs the NumPy oracle.

Runs the kernel in interpret mode on CPU; the same code path runs
compiled on TPU (gated by bf_sweep.mode())."""

import numpy as np
import jax.numpy as jnp
import pytest

from ntsynt_tpu.ops import bf_sweep, bloom


def _split(canon):
    hi = (canon >> np.uint64(32)).astype(np.uint32)
    lo = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _rand_canon(rng, n):
    return rng.integers(0, 1 << 64, n, dtype=np.uint64)


@pytest.mark.parametrize("bits_log2", [16, 21, 22])
def test_insert_matches_oracle(bits_log2):
    rng = np.random.default_rng(7)
    n = 5000
    canon = _rand_canon(rng, n)
    # force duplicates and an all-ones low word
    canon[100:200] = canon[0]
    canon[300] = np.uint64(0xFFFFFFFFFFFFFFFF)
    valid = rng.random(n) < 0.9
    hi, lo = _split(canon)
    num_bits = 1 << bits_log2
    words = jnp.zeros(num_bits // 32, jnp.uint32)
    out = bf_sweep.insert_segment(
        words, hi, lo, jnp.asarray(valid), bits_log2, interpret=True
    )
    ref = bloom.NumpyBloomFilter(num_bits, 24)
    ref.insert(canon, valid)
    got_bits = np.unpackbits(
        np.asarray(out).view(np.uint8), bitorder="little"
    ).astype(bool)
    np.testing.assert_array_equal(got_bits, ref.bits)


def test_insert_accumulates_over_existing():
    rng = np.random.default_rng(8)
    bits_log2 = 21
    num_bits = 1 << bits_log2
    a, b = _rand_canon(rng, 3000), _rand_canon(rng, 3000)
    ref = bloom.NumpyBloomFilter(num_bits, 24)
    ref.insert(a)
    ref.insert(b)
    words = jnp.zeros(num_bits // 32, jnp.uint32)
    for batch in (a, b):
        hi, lo = _split(batch)
        words = bf_sweep.insert_segment(
            words, hi, lo, jnp.ones(len(batch), bool), bits_log2, interpret=True
        )
    got = np.unpackbits(np.asarray(words).view(np.uint8), bitorder="little").astype(bool)
    np.testing.assert_array_equal(got, ref.bits)


@pytest.mark.parametrize("bits_log2", [16, 22])
def test_cascade_matches_oracle(bits_log2):
    rng = np.random.default_rng(9)
    num_bits = 1 << bits_log2
    base = _rand_canon(rng, 4000)
    # second genome: half shared k-mers, half new
    nxt = np.concatenate([base[:2000], _rand_canon(rng, 2000)])
    rng.shuffle(nxt)
    valid = rng.random(len(nxt)) < 0.95

    prev_ref = bloom.NumpyBloomFilter(num_bits, 24)
    prev_ref.insert(base)
    new_ref = bloom.NumpyBloomFilter(num_bits, 24)
    present = prev_ref.probe(nxt)
    new_ref.insert(nxt, valid & present)

    hi0, lo0 = _split(base)
    prev = bf_sweep.insert_segment(
        jnp.zeros(num_bits // 32, jnp.uint32),
        hi0,
        lo0,
        jnp.ones(len(base), bool),
        bits_log2,
        interpret=True,
    )
    hi, lo = _split(nxt)
    new = bf_sweep.cascade_segment(
        prev,
        jnp.zeros(num_bits // 32, jnp.uint32),
        hi,
        lo,
        jnp.asarray(valid),
        bits_log2,
        interpret=True,
    )
    got = np.unpackbits(np.asarray(new).view(np.uint8), bitorder="little").astype(bool)
    np.testing.assert_array_equal(got, new_ref.bits)


def test_overflow_falls_back_to_scatter():
    """All inserts landing in one cell exceeds the pass budget; the
    lax.cond fallback must still produce the oracle's bits."""
    rng = np.random.default_rng(10)
    bits_log2 = 22  # 4 cells
    num_bits = 1 << bits_log2
    n = 40000
    # confine bits to cell 0: low 20 bits only
    canon = rng.integers(0, 1 << 20, n, dtype=np.uint64)
    hi, lo = _split(canon)
    out = bf_sweep.insert_segment(
        jnp.zeros(num_bits // 32, jnp.uint32),
        hi,
        lo,
        jnp.ones(n, bool),
        bits_log2,
        interpret=True,
    )
    ref = bloom.NumpyBloomFilter(num_bits, 24)
    ref.insert(canon)
    got = np.unpackbits(np.asarray(out).view(np.uint8), bitorder="little").astype(bool)
    np.testing.assert_array_equal(got, ref.bits)


def test_build_common_bf_sweep_interpret(monkeypatch, tmp_path):
    """End-to-end build_common_bf with the sweep forced on (interpret):
    bit-identical to the plain XLA path."""
    monkeypatch.setenv("NTSYNT_BF_SWEEP", "interpret")
    from ntsynt_tpu.io.fasta import read_fasta
    from ntsynt_tpu.ops import bf_build

    rng = np.random.default_rng(11)
    dec = np.frombuffer(b"ACGT", np.uint8)
    paths = []
    for name in ("a.fa", "b.fa"):
        p = tmp_path / name
        seq = dec[rng.integers(0, 4, 30000)].tobytes().decode()
        p.write_text(f">c1\n{seq}\n")
        paths.append(str(p))
    genomes = [read_fasta(p) for p in paths]

    bf_build._insert_stream_fn.cache_clear()
    bf = bf_build.build_common_bf(genomes, k=24, fpr=0.025, chunk=1 << 14)
    monkeypatch.delenv("NTSYNT_BF_SWEEP")
    bf_build._insert_stream_fn.cache_clear()
    bf_plain = bf_build.build_common_bf(genomes, k=24, fpr=0.025, chunk=1 << 14)
    np.testing.assert_array_equal(np.asarray(bf.words), np.asarray(bf_plain.words))
    bf_build._insert_stream_fn.cache_clear()
