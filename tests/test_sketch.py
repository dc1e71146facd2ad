"""Sketching: device pipeline vs the NumPy sliding-window oracle."""

import numpy as np
import pytest

from ntsynt_tpu.io.fasta import PackedGenome
from ntsynt_tpu.ops import sketch, winmin
from ntsynt_tpu.ops.bloom import NumpyBloomFilter
import jax.numpy as jnp


def _genome_from_contigs(contigs, name="test.fa"):
    codes = np.concatenate(contigs) if contigs else np.zeros(0, np.uint8)
    lengths = np.array([len(c) for c in contigs], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    return PackedGenome(
        path=name,
        name=name,
        contig_names=[f"ctg{i}" for i in range(len(contigs))],
        lengths=lengths,
        offsets=offsets,
        codes=codes,
        raw=np.frombuffer(b"ACGTN", np.uint8)[np.minimum(codes, 4)].copy(),
        fai_offsets=np.zeros(len(contigs), np.int64),
        fai_linebases=lengths.copy(),
        fai_linewidth=lengths + 1,
    )


def _rand_contig(rng, n, n_prob=0.0):
    c = rng.integers(0, 4, n).astype(np.uint8)
    if n_prob:
        c[rng.random(n) < n_prob] = 4
    return c


def test_sliding_argmin_vs_numpy():
    import jax

    rng = np.random.default_rng(0)
    n, w = 5000, 37
    hi = rng.integers(0, 4, n).astype(np.uint32)  # small range forces ties
    lo = rng.integers(0, 8, n).astype(np.uint32)
    fn = jax.jit(lambda h, l: winmin.sliding_argmin(h, l, w))
    arg = np.asarray(fn(jnp.asarray(hi), jnp.asarray(lo)))
    keys = (hi.astype(np.uint64) << np.uint64(32)) | lo
    for j in range(0, n - w + 1, 13):
        want = j + int(np.argmin(keys[j : j + w]))  # np.argmin = leftmost
        assert arg[j] == want


@pytest.mark.parametrize("w", [5, 64, 250])
def test_sketch_matches_oracle_single_contig(w):
    rng = np.random.default_rng(42)
    k = 24
    contig = _rand_contig(rng, 30_000, n_prob=0.001)
    g = _genome_from_contigs([contig])
    s = sketch.sketch_genome(g, k, w, chunk=1 << 12)
    want = sketch.sketch_contig_np(contig, k, w)
    assert (s.positions == want).all()
    # hashes must agree with the oracle hash at those positions
    from ntsynt_tpu.ops import nthash

    _, out, _ = nthash.hash_sequence_np(contig, k)
    assert (s.hashes == out[want]).all()


def test_sketch_multi_contig_and_short():
    rng = np.random.default_rng(7)
    k, w = 20, 100
    contigs = [
        _rand_contig(rng, 5000),
        _rand_contig(rng, 60),  # short: one window over its k-mers
        _rand_contig(rng, 3000, n_prob=0.01),
    ]
    g = _genome_from_contigs(contigs)
    s = sketch.sketch_genome(g, k, w, chunk=1 << 11)
    for ci, contig in enumerate(contigs):
        got = s.positions[s.contig_idx == ci]
        want = sketch.sketch_contig_np(contig, k, w)
        assert (got == want).all(), f"contig {ci}"


def test_sketch_with_bloom_filters():
    rng = np.random.default_rng(3)
    k, w = 20, 50
    contig = _rand_contig(rng, 8000)
    g = _genome_from_contigs([contig])
    from ntsynt_tpu.ops import nthash
    from ntsynt_tpu.ops.bloom import DeviceBloomFilter

    canon, out, valid = nthash.hash_sequence_np(contig, k)
    # common BF containing every other kmer; repeat BF with a few kmers
    nbf = NumpyBloomFilter(1 << 16, k)
    nbf.insert(canon[::2])
    rbf_np = NumpyBloomFilter(1 << 16, k)
    rbf_np.insert(canon[100:120])

    dbf = DeviceBloomFilter(1 << 16, k)
    hi = (canon[::2] >> np.uint64(32)).astype(np.uint32)
    lo = (canon[::2] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    dbf.insert(jnp.asarray(hi), jnp.asarray(lo))
    drf = DeviceBloomFilter(1 << 16, k)
    hi = (canon[100:120] >> np.uint64(32)).astype(np.uint32)
    lo = (canon[100:120] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    drf.insert(jnp.asarray(hi), jnp.asarray(lo))

    s = sketch.sketch_genome(g, k, w, common_bf=dbf, repeat_bf=drf, chunk=1 << 10)
    want = sketch.sketch_contig_np(contig, k, w, common=nbf, repeat=rbf_np)
    assert (s.positions == want).all()


def test_empty_and_tiny_genome():
    g = _genome_from_contigs([np.array([0, 1, 2], np.uint8)])
    s = sketch.sketch_genome(g, 24, 100, chunk=1 << 10)
    assert s.n_minimizers == 0


def test_device_engine_matches_chunk():
    """The HBM-resident device pipeline (with interpreted Pallas
    compaction on CPU) must select the same minimizers as the chunked
    path / oracle."""
    import functools
    from ntsynt_tpu.ops import sketch_device, winmin

    rng = np.random.default_rng(21)
    k = 24
    contigs = [_rand_contig(rng, 9000, n_prob=0.002), _rand_contig(rng, 4000)]
    g = _genome_from_contigs(contigs)

    orig_scan = None
    try:
        # force pallas-interpret for both scan and compaction kernels
        winmin._use_pallas = lambda: True
        from ntsynt_tpu.ops import winmin_pallas

        orig_scan = winmin_pallas.block_scans_pallas
        winmin_pallas.block_scans_pallas = functools.partial(orig_scan, interpret=True)
        for w in (40, 150):
            ds = sketch_device.DeviceSketcher(k, w, seg_windows=1 << 11, interpret=True)
            stream = sketch.sketch._Stream(g, k, w) if False else None
            from ntsynt_tpu.ops.sketch import _Stream

            st = _Stream(g, k, w)
            sel, selh = ds.sketch_stream(st.codes, st.legit_windows())
            # hash lanes must carry the exact printed hash of each pick
            canon, outh, _ = sketch.nthash.hash_sequence_np(st.codes, k)
            assert (selh == outh[sel]).all(), w
            cidx, cpos = st.to_contig_pos(sel)
            for ci, contig in enumerate(contigs):
                got = cpos[cidx == ci]
                want = sketch.sketch_contig_np(contig, k, w)
                assert (got == want).all(), (w, ci)
    finally:
        winmin._use_pallas = lambda: False
        if orig_scan is not None:
            from ntsynt_tpu.ops import winmin_pallas

            winmin_pallas.block_scans_pallas = orig_scan


def test_device_engine_overflow_fallback():
    """Rows whose selection count exceeds the device capacity must be
    recomputed exactly on the host (dense-repeat stress: w>=128 cap=16)."""
    import functools
    from ntsynt_tpu.ops import sketch_device, winmin
    from ntsynt_tpu.ops.bloom import DeviceBloomFilter
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    k, w = 24, 150
    contig = _rand_contig(rng, 4000)
    g = _genome_from_contigs([contig])
    # a common-BF that keeps only ~2% of kmers makes window minima
    # change nearly every window in some rows -> overflow pressure
    from ntsynt_tpu.ops import nthash

    canon, _, valid = nthash.hash_sequence_np(contig, k)
    keep = canon[valid][::50]
    nbf_dev = DeviceBloomFilter(1 << 16, k)
    hi = (keep >> np.uint64(32)).astype(np.uint32)
    lo = (keep & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    nbf_dev.insert(jnp.asarray(hi), jnp.asarray(lo))
    from ntsynt_tpu.ops.bloom import NumpyBloomFilter

    nbf = NumpyBloomFilter(1 << 16, k)
    nbf.insert(keep)

    from ntsynt_tpu.ops import winmin_pallas

    orig_scan = winmin_pallas.block_scans_pallas
    try:
        winmin._use_pallas = lambda: True
        winmin_pallas.block_scans_pallas = functools.partial(orig_scan, interpret=True)
        ds = sketch_device.DeviceSketcher(
            k, w, seg_windows=1 << 11, common_bf=nbf_dev, interpret=True
        )
        from ntsynt_tpu.ops.sketch import _Stream

        st = _Stream(g, k, w)
        sel, selh = ds.sketch_stream(st.codes, st.legit_windows())
        canon, outh, _ = sketch.nthash.hash_sequence_np(st.codes, k)
        assert (selh == outh[sel]).all()
        cidx, cpos = st.to_contig_pos(sel)
        want = sketch.sketch_contig_np(contig, k, w, common=nbf)
        assert (cpos == want).all()
    finally:
        winmin._use_pallas = lambda: False
        winmin_pallas.block_scans_pallas = orig_scan


@pytest.mark.parametrize("w", [10, 100, 333])
def test_numpy_engine_matches_chunk(w):
    """The host engine (small-stream fast path used by refinement-round
    re-sketches on TPU) must select exactly the chunk engine's
    minimizers, including N runs, repeated sequence (hash ties), and
    multi-contig separators."""
    rng = np.random.default_rng(w)
    k = 24
    rep = rng.integers(0, 4, 400).astype(np.uint8)
    contigs = [
        np.concatenate([rep, _rand_contig(rng, 3_000, n_prob=0.01), rep, rep]),
        _rand_contig(rng, 2_000),
        _rand_contig(rng, w + k - 2),  # short contig (no full window)
        np.concatenate([rep, rep]),
    ]
    g = _genome_from_contigs(contigs)
    a = sketch.sketch_genome(g, k, w, engine="numpy")
    b = sketch.sketch_genome(g, k, w, engine="chunk")
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.contig_idx, b.contig_idx)
    np.testing.assert_array_equal(a.hashes, b.hashes)


def test_np_sliding_argmin_ties_and_blocks():
    """_np_sliding_argmin: exhaustive check vs np.argmin (leftmost) on a
    tie-heavy array across several window sizes incl. w > n/2."""
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 6, 500).astype(np.uint64)
    for w in (1, 2, 7, 64, 251, 499, 500):
        arg = sketch._np_sliding_argmin(keys, w)
        for j in range(len(keys) - w + 1):
            assert arg[j] == j + int(np.argmin(keys[j : j + w])), (w, j)


def test_numpy_engine_with_bfs_matches_chunk():
    """The numpy engine's fused code-stream probe (_probe_stream_np:
    device unpack -> ntHash -> BF probe -> packed bits) must reproduce
    the chunk engine's per-chunk device probes bit-for-bit, across N
    runs, contig separators, and pow2 padding."""
    from ntsynt_tpu.ops.bloom import DeviceBloomFilter
    from ntsynt_tpu.ops import nthash

    rng = np.random.default_rng(7)
    k, w = 24, 40
    contigs = [
        _rand_contig(rng, 3_000, n_prob=0.01),
        _rand_contig(rng, 1_500),
        _rand_contig(rng, w + k - 2),  # short contig
    ]
    g = _genome_from_contigs(contigs)
    canon, _, valid = nthash.hash_sequence_np(contigs[0], k)
    canon = canon[valid]
    dbf = DeviceBloomFilter(1 << 16, k)
    hi = (canon[::3] >> np.uint64(32)).astype(np.uint32)
    lo = (canon[::3] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    dbf.insert(jnp.asarray(hi), jnp.asarray(lo))
    drf = DeviceBloomFilter(1 << 16, k)
    hi = (canon[50:70] >> np.uint64(32)).astype(np.uint32)
    lo = (canon[50:70] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    drf.insert(jnp.asarray(hi), jnp.asarray(lo))

    for cbf, rbf in [(dbf, None), (None, drf), (dbf, drf)]:
        a = sketch.sketch_genome(g, k, w, engine="numpy", common_bf=cbf, repeat_bf=rbf)
        b = sketch.sketch_genome(g, k, w, engine="chunk", common_bf=cbf, repeat_bf=rbf)
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.contig_idx, b.contig_idx)
        np.testing.assert_array_equal(a.hashes, b.hashes)


def test_stream_slice_view_matches_codes():
    """_Stream.slice / _StreamCodesView == the materialized buffer."""
    from ntsynt_tpu.ops.sketch import _Stream

    rng = np.random.default_rng(5)
    contigs = [rng.integers(0, 5, n).astype(np.uint8) for n in (211, 0, 57, 403)]
    g = _genome_from_contigs(contigs)
    st = _Stream(g, k=8, w=16)
    full = st.codes
    view = st.codes_view()
    assert len(view) == st.total == len(full)
    cuts = [0, 1, 7, 210, 211, 212, 235, 236, 300, st.total - 1, st.total]
    for lo in cuts:
        for hi in cuts:
            assert np.array_equal(view[lo:hi], full[lo:hi]), (lo, hi)
    # out-of-range clamping mirrors ndarray slicing
    assert np.array_equal(view[st.total - 5 : st.total + 99], full[st.total - 5 :])
    assert view[3] == full[3]


def test_device_engine_iterative_solid_matches_oracle():
    """The iterative-exclusion solid path (probe only window winners,
    mask non-solid ones, re-min) at a realistic ~95%-keep filter must
    match the per-contig oracle and the probe-all formulation exactly,
    including with a repeat filter and multi-contig streams."""
    import functools
    import os
    from ntsynt_tpu.ops import sketch_device, winmin, nthash
    from ntsynt_tpu.ops.bloom import DeviceBloomFilter
    from ntsynt_tpu.ops.sketch import _Stream

    rng = np.random.default_rng(77)
    k, w = 24, 150
    contigs = [_rand_contig(rng, 12_000, n_prob=0.001), _rand_contig(rng, 5_000)]
    g = _genome_from_contigs(contigs)
    st = _Stream(g, k, w)

    # common BF keeping ~95% of k-mers (the 0.1%-SNP regime the
    # iterative loop is built for); repeat BF dropping a few
    canon, _, valid = nthash.hash_sequence_np(st.codes, k)
    uniq = np.unique(canon[valid])
    keep = uniq[rng.random(len(uniq)) > 0.05]
    rep = uniq[rng.random(len(uniq)) < 0.01]

    def dev_bf(keys, bits):
        bf = DeviceBloomFilter(bits, k)
        bf.insert(
            jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        )
        return bf

    cbf, rbf = dev_bf(keep, 1 << 22), dev_bf(rep, 1 << 22)
    nbf, nrf = NumpyBloomFilter(1 << 22, k), NumpyBloomFilter(1 << 22, k)
    nbf.insert(keep)
    nrf.insert(rep)

    from ntsynt_tpu.ops import winmin_pallas

    orig_scan = winmin_pallas.block_scans_pallas
    try:
        winmin._use_pallas = lambda: True
        winmin_pallas.block_scans_pallas = functools.partial(orig_scan, interpret=True)
        ds = sketch_device.DeviceSketcher(
            k, w, seg_windows=1 << 11, common_bf=cbf, repeat_bf=rbf, interpret=True
        )
        sel, selh = ds.sketch_stream(st.codes, st.legit_windows())
        cidx, cpos = st.to_contig_pos(sel)
        for ci, contig in enumerate(contigs):
            want = sketch.sketch_contig_np(contig, k, w, common=nbf, repeat=nrf)
            assert (cpos[cidx == ci] == want).all(), ci
        # probe-all formulation (env-gated) selects identically
        os.environ["NTSYNT_PROBE_ALL"] = "1"
        try:
            ds2 = sketch_device.DeviceSketcher(
                k, w, seg_windows=1 << 11, common_bf=cbf, repeat_bf=rbf,
                interpret=True,
            )
            sel2, selh2 = ds2.sketch_stream(st.codes, st.legit_windows())
        finally:
            del os.environ["NTSYNT_PROBE_ALL"]
        assert (sel2 == sel).all() and (selh2 == selh).all()
    finally:
        winmin._use_pallas = lambda: False
        winmin_pallas.block_scans_pallas = orig_scan
