"""ntHash bit-exactness against the reference's golden sketch TSVs.

The reference's expected-result sketches
(/root/reference/tests/expected_result/*.k{20,24}.w1000.tsv) embed
(k-mer, hash) pairs; every one of them must reproduce exactly through
both the NumPy oracle and the JAX uint32-pair implementation.
"""

import os

import numpy as np
import pytest

from ntsynt_tpu.ops import nthash, u64

GOLDEN_DIR = "/root/reference/tests/expected_result"
GOLDEN = [
    ("celegans-chrII-III.fa.k24.w1000.tsv", 24),
    ("celegans-chrII-III.fa.k20.w1000.tsv", 20),
    ("celegans-chrII-III.A.fa.k20.w1000.tsv", 20),
]

B2I = np.full(256, 4, dtype=np.uint8)
for i, c in enumerate(b"ACGT"):
    B2I[c] = i


def _load_pairs(fname, k, limit=None):
    hashes, seqs = [], []
    with open(os.path.join(GOLDEN_DIR, fname)) as fin:
        for line in fin:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            for rec in parts[1].split(" "):
                h, _, s = rec.split(":")
                hashes.append(int(h))
                seqs.append(s)
    if limit:
        hashes, seqs = hashes[:limit], seqs[:limit]
    codes = B2I[np.frombuffer("".join(seqs).encode(), np.uint8)].reshape(len(seqs), k)
    return np.array(hashes, dtype=np.uint64), codes


@pytest.mark.parametrize("fname,k", GOLDEN)
def test_numpy_oracle_matches_golden(fname, k):
    want, codes = _load_pairs(fname, k)
    tf, tr = nthash.hash_tables(k)
    f = np.zeros(len(want), np.uint64)
    r = np.zeros(len(want), np.uint64)
    for j in range(k):
        f ^= tf[j][codes[:, j]]
        r ^= tr[j][codes[:, j]]
    canon = f + r
    t = canon * np.uint64(nthash.mix_multiplier(k))
    got = t ^ (t >> np.uint64(nthash.MULTISHIFT))
    assert (got == want).all()


def test_hash_sequence_np_window():
    """hash_sequence_np over a concatenated sequence must equal per-kmer."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 300).astype(np.uint8)
    codes[50] = 4  # an N
    k = 24
    canon, out, valid = nthash.hash_sequence_np(codes, k)
    assert len(out) == 300 - k + 1
    # validity window: kmers overlapping position 50 invalid
    assert not valid[50 - k + 1 : 51].any()
    assert valid[51:60].all()
    # spot-check one kmer against the string API
    s = "".join("ACGT"[c] for c in codes[100 : 100 + k])
    assert nthash.hash_kmer_np(s, k) == int(out[100])


def test_jax_matches_numpy():
    import jax

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 5, 2000).astype(np.uint8)  # includes Ns
    k = 24
    canon, out, valid = nthash.hash_sequence_np(codes, k)
    h = jax.jit(lambda c: nthash.hash_tile(c, k))(codes)
    got_canon = u64.to_np64(h["canon_hi"], h["canon_lo"])
    got_out = u64.to_np64(h["out_hi"], h["out_lo"])
    assert (np.asarray(h["valid"]) == valid).all()
    assert (got_canon == canon).all()
    assert (got_out == out).all()


def test_jax_matches_golden_sample():
    import jax

    want, codes = _load_pairs(*GOLDEN[0][:2], limit=500)
    k = 24
    flat = codes.reshape(-1)
    h = jax.jit(lambda c: nthash.hash_tile(c, k))(flat)
    got = u64.to_np64(h["out_hi"], h["out_lo"])
    # kmers start every k positions in the flattened array
    idx = np.arange(len(want)) * k
    assert (got[idx] == want).all()


def test_mul_const_random():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 64, 1000, dtype=np.uint64)
    for c in [nthash.mix_multiplier(24), 0xFFFFFFFFFFFFFFFF, 3, 1 << 63]:
        want = x * np.uint64(c)
        hi, lo = u64.from_np64(x)
        fn = jax.jit(lambda h, l, c=c: u64.mul_const((h, l), c))
        got = u64.to_np64(*fn(jnp.asarray(hi), jnp.asarray(lo)))
        assert (got == want).all(), hex(c)


def test_unmix_inverts_printed_hash():
    """unmix_np recovers the canonical (pre-mix) hash from the printed
    hash — the key the --filter Filter repeat-BF probe needs
    (bin/ntsynt_synteny.py:604-607 re-hashes TSV seq strings instead)."""
    rng = np.random.default_rng(7)
    for k in (19, 24, 31):
        codes = rng.integers(0, 4, 20_000).astype(np.uint8)
        canon, out, ok = nthash.hash_sequence_np(codes, k)
        rec = nthash.unmix_np(out, k)
        assert np.array_equal(rec[ok], canon[ok])
