"""Sorted-run placement kernel (ops/bf_place) vs the NumPy oracle.

Runs the kernel in interpret mode on CPU; the same code path runs
compiled on TPU (gated by bf_place.mode()). The kernel replaces the
XLA scatter inside ops/bloom.insert_words for large filters, so every
test is a bit-identity differential against the scatter formulation
or the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from ntsynt_tpu.ops import bf_place, bloom

BITS = 26  # 2^26-bit filter: 2^21 words = 32 grid steps (small enough
# for the interpreter, large enough for real step geometry)


def _split(canon):
    hi = (canon >> np.uint64(32)).astype(np.uint32)
    lo = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _bits_of(words):
    return np.unpackbits(np.asarray(words).view(np.uint8), bitorder="little").astype(bool)


def _place(words, canon, valid):
    hi, lo = _split(canon)
    return bloom.insert_words(
        words, hi, lo, jnp.asarray(valid), BITS, place="interpret"
    )


def test_insert_matches_oracle():
    rng = np.random.default_rng(7)
    n = 5000
    canon = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    canon[100:200] = canon[0]  # duplicate-word runs
    canon[300] = np.uint64(0xFFFFFFFFFFFFFFFF)
    valid = rng.random(n) < 0.9
    out = _place(jnp.zeros((1 << BITS) // 32, jnp.uint32), canon, valid)
    ref = bloom.NumpyBloomFilter(1 << BITS, 24)
    ref.insert(canon, valid)
    np.testing.assert_array_equal(_bits_of(out), ref.bits)


def test_accumulates_over_existing():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 1 << 64, 3000, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, 3000, dtype=np.uint64)
    ref = bloom.NumpyBloomFilter(1 << BITS, 24)
    ref.insert(a)
    ref.insert(b)
    words = jnp.zeros((1 << BITS) // 32, jnp.uint32)
    for batch in (a, b):
        words = _place(words, batch, np.ones(len(batch), bool))
    np.testing.assert_array_equal(_bits_of(words), ref.bits)


def test_nonuniform_coverage_falls_back():
    """Keys confined to the first unit break the fixed-stride window
    model; the elementwise coverage check must route to the scatter
    path with identical bits."""
    rng = np.random.default_rng(10)
    n = 8192
    canon = rng.integers(0, 1 << 18, n, dtype=np.uint64)  # unit 0 only
    out = _place(jnp.zeros((1 << BITS) // 32, jnp.uint32), canon, np.ones(n, bool))
    ref = bloom.NumpyBloomFilter(1 << BITS, 24)
    ref.insert(canon)
    np.testing.assert_array_equal(_bits_of(out), ref.bits)


def test_unit_count_overflow_flag_falls_back():
    """A single crowded unit inside an otherwise-uniform stream: the
    step window still covers everything (no XLA-side overflow), but the
    unit's key count exceeds the sub-window budget — the in-kernel flag
    must trigger the fallback, still bit-identical."""
    rng = np.random.default_rng(11)
    n = 1 << 15
    canon = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    # 500 distinct bits inside unit 5 (bits [5*2^18, 5*2^18 + 2^16))
    cluster = np.uint64(5 << 18) + rng.choice(1 << 16, 500, replace=False).astype(
        np.uint64
    )
    canon[:500] = cluster  # bit index = canon mod 2^26 = the value itself
    out = _place(jnp.zeros((1 << BITS) // 32, jnp.uint32), canon, np.ones(n, bool))
    ref = bloom.NumpyBloomFilter(1 << BITS, 24)
    ref.insert(canon)
    np.testing.assert_array_equal(_bits_of(out), ref.bits)
    # geometry sanity: this cluster really exceeds the per-unit budget
    _, _, _, tkrows, _, _ = bf_place._geom(BITS, n)
    assert 500 > (tkrows - 1) * 128


def test_empty_and_all_invalid():
    words0 = jnp.zeros((1 << BITS) // 32, jnp.uint32)
    canon = np.zeros(256, dtype=np.uint64)
    out = _place(words0, canon, np.zeros(256, bool))
    assert not np.asarray(out).any()


def test_build_common_bf_place_interpret(monkeypatch, tmp_path):
    """End-to-end build_common_bf with the placement kernel forced on
    (interpret): bit-identical filters to the scatter path."""
    monkeypatch.setenv("NTSYNT_BF_PLACE", "interpret")
    from ntsynt_tpu.io.fasta import read_fasta
    from ntsynt_tpu.ops import bf_build

    rng = np.random.default_rng(12)
    dec = np.frombuffer(b"ACGT", np.uint8)
    paths = []
    for name in ("a.fa", "b.fa"):
        p = tmp_path / name
        seq = dec[rng.integers(0, 4, 30000)].tobytes().decode()
        p.write_text(f">c1\n{seq}\n")
        paths.append(str(p))
    genomes = [read_fasta(p) for p in paths]

    # bf_bytes forces a 2^26-bit filter (the place-supported regime)
    bf = bf_build.build_common_bf(
        genomes, k=24, bf_bytes=(1 << 23), chunk=1 << 14
    )
    monkeypatch.delenv("NTSYNT_BF_PLACE")
    bf_plain = bf_build.build_common_bf(
        genomes, k=24, bf_bytes=(1 << 23), chunk=1 << 14
    )
    np.testing.assert_array_equal(np.asarray(bf.words), np.asarray(bf_plain.words))


def test_build_repeat_bf_place_interpret(monkeypatch, tmp_path):
    monkeypatch.setenv("NTSYNT_BF_PLACE", "interpret")
    from ntsynt_tpu.io.fasta import read_fasta
    from ntsynt_tpu.ops import bf_build

    rng = np.random.default_rng(13)
    dec = np.frombuffer(b"ACGT", np.uint8)
    base = rng.integers(0, 4, 20000)
    seq = dec[np.concatenate([base, base[2000:6000]])].tobytes().decode()
    p = tmp_path / "r.fa"
    p.write_text(f">c1\n{seq}\n")
    genomes = [read_fasta(str(p))]

    rep = bf_build.build_repeat_bf(genomes, k=24, bf_bytes=(1 << 23), chunk=1 << 14)
    monkeypatch.delenv("NTSYNT_BF_PLACE")
    rep_plain = bf_build.build_repeat_bf(
        genomes, k=24, bf_bytes=(1 << 23), chunk=1 << 14
    )
    np.testing.assert_array_equal(np.asarray(rep.words), np.asarray(rep_plain.words))


def test_supported_geometry():
    assert bf_place.supported(26, 1 << 13)
    assert bf_place.supported(34, 1 << 23)
    assert not bf_place.supported(25, 1 << 13)  # below one grid step
    assert not bf_place.supported(35, 1 << 23)  # beyond i32/scratch regime
    assert not bf_place.supported(26, 1 << 20)  # density: window > VMEM budget
