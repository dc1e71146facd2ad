"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsynt_tpu.ops import nthash, sketch
from ntsynt_tpu.ops.bloom import NumpyBloomFilter
from ntsynt_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return pmesh.make_mesh(8)


def test_allreduce_or(mesh8):
    from jax.sharding import PartitionSpec as P

    x = np.zeros((8, 4), dtype=np.uint32)
    for i in range(8):
        x[i, i % 4] = 1 << i
    f = jax.jit(
        jax.shard_map(
            lambda v: pmesh.allreduce_or(v[0]),
            mesh=mesh8,
            in_specs=P(pmesh.AXIS),
            out_specs=P(),
            check_vma=False,
        )
    )
    out = np.asarray(f(x))
    want = np.bitwise_or.reduce(x, axis=0)
    assert (out == want).all()


def test_sharded_sketch_matches_host(mesh8):
    rng = np.random.default_rng(0)
    k, w, chunk = 24, 50, 1 << 10
    contig = rng.integers(0, 4, 8 * chunk + w + k).astype(np.uint8)
    # one stream, 8 tiles
    tiles = pmesh.make_tiles(contig, 8, chunk, k, w)
    bits_log2 = 16
    step = pmesh.sharded_sketch_step(mesh8, k, w, chunk, bits_log2)
    words = jnp.zeros((1 << bits_log2) // 32, jnp.uint32)
    args, win_valid, words = step(jnp.asarray(tiles), words)
    args, win_valid = np.asarray(args), np.asarray(win_valid)

    # selections must match the single-device oracle
    want = sketch.sketch_contig_np(contig, k, w)
    got = set()
    nwin_total = len(contig) - k + 1 - w + 1
    for t in range(8):
        for j in range(chunk):
            if t * chunk + j < nwin_total and win_valid[t, j]:
                got.add(t * chunk + int(args[t, j]))
    assert sorted(got) == want.tolist()

    # BF must contain exactly the valid kmers' canonical hashes (mod fpr)
    canon, _, valid = nthash.hash_sequence_np(contig, k)
    nbf = NumpyBloomFilter(1 << bits_log2, k)
    nbf.insert(canon[valid])
    wgot = np.asarray(words)
    probe_q = canon[valid][::97]
    hi = (probe_q >> np.uint64(32)).astype(np.uint32)
    lo = (probe_q & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    from ntsynt_tpu.ops.bloom import bf_probe

    dev_hits = np.asarray(bf_probe(jnp.asarray(wgot), jnp.asarray(hi), jnp.asarray(lo), bits_log2))
    assert dev_hits.all()  # every inserted kmer must be found


def test_multichip_cascade_probe(mesh8):
    rng = np.random.default_rng(3)
    k, chunk = 20, 1 << 10
    g1 = rng.integers(0, 4, 4 * chunk).astype(np.uint8)
    g2 = g1.copy()
    g2[::500] = (g2[::500] + 1) % 4  # sparse SNPs
    bits_log2 = 16

    # level 1: insert all of g1 via the sharded sketch step
    tiles1 = pmesh.make_tiles(g1, 8, chunk // 2, k, 1)
    step = pmesh.sharded_sketch_step(mesh8, k, 1, chunk // 2, bits_log2)
    words = jnp.zeros((1 << bits_log2) // 32, jnp.uint32)
    _, _, words = step(jnp.asarray(tiles1), words)

    # level 2: cascade with g2
    casc = pmesh.sharded_common_bf_probe_step(mesh8, k, chunk // 2, bits_log2)
    tiles2 = pmesh.make_tiles(g2, 8, chunk // 2, k, 1)
    words2 = casc(jnp.asarray(tiles2), words, jnp.zeros_like(words))

    # common kmers of both genomes must probe positive in level 2
    canon2, _, valid2 = nthash.hash_sequence_np(g2, k)
    canon1, _, valid1 = nthash.hash_sequence_np(g1, k)
    common = np.intersect1d(canon1[valid1], canon2[valid2])
    hi = (common >> np.uint64(32)).astype(np.uint32)
    lo = (common & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    from ntsynt_tpu.ops.bloom import bf_probe

    hits = np.asarray(bf_probe(words2, jnp.asarray(hi), jnp.asarray(lo), bits_log2))
    assert hits.all()


def test_sharded_sketch_genome_matches_single(mesh8):
    """Genome-level mesh sketching must equal the single-device path."""
    from ntsynt_tpu.parallel.mesh import sharded_sketch_genome
    from ntsynt_tpu.ops.sketch import sketch_genome
    import sys

    sys.path.insert(0, "tests")
    from test_sketch import _genome_from_contigs, _rand_contig

    rng = np.random.default_rng(11)
    k, w = 24, 60
    g = _genome_from_contigs(
        [_rand_contig(rng, 20_000, n_prob=0.001), _rand_contig(rng, 7_000)]
    )
    want = sketch_genome(g, k, w, chunk=1 << 12, engine="chunk")
    got = sharded_sketch_genome(g, k, w, mesh=mesh8, seg_max=1 << 10)
    assert (got.positions == want.positions).all()
    assert (got.contig_idx == want.contig_idx).all()
    assert (got.hashes == want.hashes).all()


def test_distributed_common_bf_bit_equal(mesh8):
    """Mesh BF cascade must be bit-identical to the single-device
    builder (insert sets commute under OR)."""
    import sys

    sys.path.insert(0, "tests")
    from test_bf_build import _genome

    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, 9_000).astype(np.uint8)
    b = a.copy()
    b[::211] = (b[::211] + 2) % 4
    genomes = [_genome(a, "a.fa"), _genome(b, "b.fa")]
    from ntsynt_tpu.ops import bf_build

    single = bf_build.build_common_bf(genomes, 20, fpr=0.025, chunk=1 << 12)
    dist = pmesh.distributed_common_bf(genomes, 20, fpr=0.025, mesh=mesh8, seg_max=1 << 9)
    assert (np.asarray(single.words) == np.asarray(dist.words)).all()


def test_mesh_pipeline_blocks_identical(mesh8, tmp_path):
    """Full pipeline with use_mesh=True must produce byte-identical
    final blocks to the single-device pipeline."""
    import sys

    sys.path.insert(0, "tests")
    from test_e2e import write_fasta, _cfg

    from ntsynt_tpu.core.pipeline import NtSyntTPU
    from dataclasses import replace

    rng = np.random.default_rng(21)
    base = rng.integers(0, 4, 60_000).astype(np.uint8)
    mut = base.copy()
    mut[20_000:30_000] = mut[20_000:30_000][::-1] ^ 3  # inversion
    snp = rng.random(len(mut)) < 0.001
    mut[snp] = (mut[snp] + rng.integers(1, 4, int(snp.sum()))) % 4
    fa = write_fasta(tmp_path / "mA.fa", [("chr1", base)])
    fb = write_fasta(tmp_path / "mB.fa", [("chr1", mut)])
    cfg = _cfg([str(fa), str(fb)], tmp_path, prefix="single")
    out1 = NtSyntTPU(cfg).run()
    cfg2 = replace(_cfg([str(fa), str(fb)], tmp_path, prefix="meshp"), use_mesh=True)
    out2 = NtSyntTPU(cfg2).run()
    b1 = [l.split("\t", 1)[1] for l in open(out1)]
    b2 = [l.split("\t", 1)[1] for l in open(out2)]
    assert b1 == b2


def test_distributed_common_bf_place_interpret(mesh8, monkeypatch):
    """Mesh BF cascade with the placement kernel forced on (interpret)
    inside shard_map: bit-identical to the scatter path. Covers the
    Pallas-kernel-inside-shard_map route that real TPU meshes take now
    that distributed_common_bf resolves the place mode (ADVICE r4);
    bf_bytes forces a 2^26-bit filter, the place-supported regime."""
    import sys

    sys.path.insert(0, "tests")
    from test_bf_build import _genome
    from ntsynt_tpu.ops import bf_place

    rng = np.random.default_rng(23)
    a = rng.integers(0, 4, 9_000).astype(np.uint8)
    b = a.copy()
    b[::173] = (b[::173] + 1) % 4
    genomes = [_genome(a, "a.fa"), _genome(b, "b.fa")]

    plain = pmesh.distributed_common_bf(
        genomes, 20, mesh=mesh8, seg_max=1 << 9, bf_bytes=1 << 23
    )
    monkeypatch.setenv("NTSYNT_BF_PLACE", "interpret")
    assert bf_place.resolve(26, 1 << 9) == "interpret"  # mode really on
    placed = pmesh.distributed_common_bf(
        genomes, 20, mesh=mesh8, seg_max=1 << 9, bf_bytes=1 << 23
    )
    assert (np.asarray(plain.words) == np.asarray(placed.words)).all()


def test_distributed_repeat_bf_place_interpret(mesh8, monkeypatch):
    """Mesh repeat-BF with the placement kernel forced on (interpret):
    bit-identical rep words to the scatter path (same seg_max, so the
    segment-boundary FP pattern coincides)."""
    import sys

    sys.path.insert(0, "tests")
    from test_bf_build import _genome

    rng = np.random.default_rng(29)
    a = rng.integers(0, 4, 12_000).astype(np.uint8)
    for src, dst in [(1_000, 9_500), (5_200, 200)]:
        a[dst : dst + 200] = a[src : src + 200]
    genomes = [_genome(a, "r.fa")]

    plain = pmesh.distributed_repeat_bf(
        genomes, 20, mesh=mesh8, seg_max=1 << 9, bf_bytes=1 << 23
    )
    monkeypatch.setenv("NTSYNT_BF_PLACE", "interpret")
    placed = pmesh.distributed_repeat_bf(
        genomes, 20, mesh=mesh8, seg_max=1 << 9, bf_bytes=1 << 23
    )
    assert (np.asarray(plain.words) == np.asarray(placed.words)).all()


def test_distributed_repeat_bf_matches_single(mesh8):
    """Mesh repeat-BF must flag exactly the single-device builder's
    repeat k-mers: slab-local duplicates via the per-slab walk,
    cross-slab duplicates via the (once, twice) seen-filter reduction.
    Segment sizes are matched (chunk == seg_max) so the two builds'
    bit-collision false-positive patterns coincide too — a same-bit
    different-hash pair is flagged iff it spans a segment boundary, an
    order-observable artifact outside the output contract (see
    ops/bf_build docstring)."""
    import sys

    sys.path.insert(0, "tests")
    from test_bf_build import _genome

    rng = np.random.default_rng(17)
    a = rng.integers(0, 4, 12_000).astype(np.uint8)
    # engineered repeats that span future slab boundaries: copy three
    # 200 bp windows to far-apart offsets
    for src, dst in [(1_000, 9_500), (3_100, 11_000), (5_200, 200)]:
        a[dst : dst + 200] = a[src : src + 200]
    genomes = [_genome(a, "r.fa")]
    from ntsynt_tpu.ops import bf_build

    single = bf_build.build_repeat_bf(genomes, 20, chunk=1 << 9)
    dist = pmesh.distributed_repeat_bf(genomes, 20, mesh=mesh8, seg_max=1 << 9)
    assert dist.num_bits == single.num_bits
    assert (np.asarray(single.words) == np.asarray(dist.words)).all()
