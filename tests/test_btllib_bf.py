"""btllib KmerBloomFilter (.bf) container interop (VERDICT #6).

The reference's common-BF artifact is a btllib KmerBloomFilter file
(src/ntsynt_make_common_bf.cpp:162-165), loaded back by
bin/ntsynt_synteny.py:606. These tests pin:
  * pow2 DeviceBloomFilter -> btllib container -> load_bf round-trip
    (bit-for-bit words, identical probes),
  * byte-layout equivalence of the export against an exact
    ``h % num_bits`` host-modulo probe (mask == mod for pow2 — the
    property that makes the export reference-loadable losslessly),
  * non-pow2 (reference-shaped) filters loading as HostModBloomFilter
    with exact modulo semantics and round-tripping,
  * the sketcher's host fallback when handed a HostModBloomFilter,
  * header-parse tolerance and the make-bf CLI emitting btllib.
"""

import numpy as np
import pytest

from ntsynt_tpu import make_bf
from ntsynt_tpu.io import btllib_bf
from ntsynt_tpu.io.fasta import PackedGenome
from ntsynt_tpu.ops import nthash, sketch
from ntsynt_tpu.ops.bloom import DeviceBloomFilter, HostModBloomFilter, load_bf


def _rand_canon(rng, n):
    return rng.integers(0, 1 << 64, n, dtype=np.uint64)


def _split(canon):
    import jax.numpy as jnp

    hi = (canon >> np.uint64(32)).astype(np.uint32)
    lo = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo)


def test_pow2_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    bf = DeviceBloomFilter(1 << 18, k=24)
    keys = _rand_canon(rng, 500)
    bf.insert(*_split(keys))
    path = str(tmp_path / "c.bf")
    bf.save(path, fmt="btllib")
    assert btllib_bf.sniff_btllib(path)

    bf2 = load_bf(path)
    assert isinstance(bf2, DeviceBloomFilter)
    assert (bf2.num_bits, bf2.k) == (bf.num_bits, bf.k)
    assert np.array_equal(np.asarray(bf2.words), np.asarray(bf.words))
    probes = _rand_canon(rng, 2000)
    assert np.array_equal(
        np.asarray(bf.probe(*_split(probes))), np.asarray(bf2.probe(*_split(probes)))
    )
    # DeviceBloomFilter.load sniffs btllib too
    bf3 = DeviceBloomFilter.load(path)
    assert np.array_equal(np.asarray(bf3.words), np.asarray(bf.words))


def test_pow2_export_equals_exact_modulo(tmp_path):
    """The exported byte array, probed as exact h % (bytes*8) —
    i.e. what btllib does — matches the device mask-modulo probes."""
    rng = np.random.default_rng(11)
    bf = DeviceBloomFilter(1 << 16, k=20)
    keys = _rand_canon(rng, 300)
    bf.insert(*_split(keys))
    path = str(tmp_path / "m.bf")
    bf.save(path, fmt="btllib")
    raw, meta = btllib_bf.read_btllib_bf(path)
    assert meta["signature"] == btllib_bf.KMER_SIGNATURE
    assert meta["hash_num"] == 1 and meta["k"] == 20
    host = HostModBloomFilter.from_bytes(raw, meta["bytes"] * 8, meta["k"])
    probes = np.concatenate([keys, _rand_canon(rng, 5000)])
    assert np.array_equal(
        host.probe_np(probes), np.asarray(bf.probe(*_split(probes)))
    )
    assert host.probe_np(keys).all()


def test_nonpow2_hostmod_roundtrip(tmp_path):
    rng = np.random.default_rng(13)
    num_bits = 8 * 1543  # byte multiple, not pow2 (reference-shaped)
    host = HostModBloomFilter(num_bits, 24, np.zeros(1543, np.uint8))
    keys = _rand_canon(rng, 200)
    host.insert_np(keys)
    assert host.probe_np(keys).all()
    path = str(tmp_path / "np2.bf")
    host.save(path)

    loaded = load_bf(path)
    assert isinstance(loaded, HostModBloomFilter)
    assert loaded.num_bits == num_bits and loaded.k == 24
    probes = np.concatenate([keys, _rand_canon(rng, 5000)])
    assert np.array_equal(loaded.probe_np(probes), host.probe_np(probes))
    # exact-modulo semantics: a key maps to bit h % num_bits
    h = keys[0]
    idx = int(h % np.uint64(num_bits))
    assert loaded.bits[idx // 8] & (1 << (idx % 8))
    # DeviceBloomFilter.load refuses with a pointer to load_bf
    with pytest.raises(ValueError, match="load_bf"):
        DeviceBloomFilter.load(path)


def test_header_tolerance(tmp_path):
    path = str(tmp_path / "odd.bf")
    raw = bytes(range(16))
    with open(path, "wb") as f:
        f.write(
            b"[BTLBloomFilter_v6]\nfuture_key = 3\nbytes = 16\n"
            b'hash_fn = "ntHash_v2"\nhash_num = 1\n[HeaderEnd]\n' + raw
        )
    data, meta = btllib_bf.read_btllib_bf(path)
    assert data == raw
    assert meta["signature"] == btllib_bf.PLAIN_SIGNATURE
    assert meta["k"] is None and meta["future_key"] == 3
    with open(path, "wb") as f:
        f.write(b"\x00" * 32)
    assert not btllib_bf.sniff_btllib(path)
    with pytest.raises(ValueError):
        btllib_bf.read_btllib_bf(path)


def _toy_genome(rng, n=6000):
    codes = rng.integers(0, 4, n).astype(np.uint8)
    lengths = np.array([n], np.int64)
    return PackedGenome(
        path="toy.fa",
        name="toy.fa",
        contig_names=["chr1"],
        lengths=lengths,
        offsets=np.array([0], np.int64),
        codes=codes,
        raw=np.frombuffer(b"ACGT", np.uint8)[codes].copy(),
        fai_offsets=np.zeros(1, np.int64),
        fai_linebases=lengths.copy(),
        fai_linewidth=lengths + 1,
    )


def test_sketch_hostmod_fallback(tmp_path):
    """sketch_genome with a HostModBloomFilter routes through the host
    formulation; an all-kmers filter reproduces the unfiltered sketch,
    and probes use exact h % num_bits."""
    rng = np.random.default_rng(17)
    g = _toy_genome(rng)
    k, w = 24, 40
    base = sketch.sketch_genome(g, k, w)

    canon, _, valid = nthash.hash_sequence_np(g.codes, k)
    full = HostModBloomFilter(8 * 99991, k, np.zeros(99991, np.uint8))
    full.insert_np(canon[valid])
    got = sketch.sketch_genome(g, k, w, common_bf=full)
    assert np.array_equal(got.positions, base.positions)
    assert np.array_equal(got.hashes, base.hashes)

    empty = HostModBloomFilter(8 * 99991, k, np.zeros(99991, np.uint8))
    none = sketch.sketch_genome(g, k, w, common_bf=empty)
    assert len(none.positions) == 0

    # repeat-filter side: dropping every k-mer also empties the sketch
    rep = sketch.sketch_genome(g, k, w, repeat_bf=full)
    assert len(rep.positions) == 0


def test_make_bf_cli_btllib(tmp_path, monkeypatch):
    rng = np.random.default_rng(19)
    codes = rng.integers(0, 4, 4000).astype(np.uint8)
    s = "".join(np.array(list("ACGT"))[codes])
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{s}\n")
    monkeypatch.chdir(tmp_path)
    assert make_bf.common_main(["--genome", str(fa), "-k", "24", "-p", "cb"]) == 0
    assert btllib_bf.sniff_btllib("cb.bf")
    bf = load_bf("cb.bf")
    assert isinstance(bf, DeviceBloomFilter) and bf.k == 24
    canon, _, valid = nthash.hash_sequence_np(codes, 24)
    probes = sketch._probe_np(bf, canon[valid])
    assert probes.all()
    # native format still available and sniffed apart
    assert make_bf.common_main(
        ["--genome", str(fa), "-k", "24", "-p", "cn", "--format", "native"]
    ) == 0
    assert not btllib_bf.sniff_btllib("cn.bf")
    bf2 = load_bf("cn.bf")
    assert np.array_equal(np.asarray(bf2.words), np.asarray(bf.words))
