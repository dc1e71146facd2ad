"""Small-unit coverage: u64 ops, interval index, timers, condensed edge cases."""

import numpy as np
import jax
import jax.numpy as jnp

from ntsynt_tpu.ops import u64
from ntsynt_tpu.core.refine import IntervalIndex
from ntsynt_tpu.utils import StageTimer


def test_u64_roundtrip_and_ops():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 64, 500, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, 500, dtype=np.uint64)
    ah, al = u64.from_np64(a)
    bh, bl = u64.from_np64(b)
    assert (u64.to_np64(ah, al) == a).all()
    A = (jnp.asarray(ah), jnp.asarray(al))
    B = (jnp.asarray(bh), jnp.asarray(bl))
    f = jax.jit(lambda x, y: (u64.add(x, y), u64.xor(x, y), u64.lt(x, y), u64.eq(x, x)))
    (s, x, lt, eq) = f(A, B)
    assert (u64.to_np64(*s) == a + b).all()
    assert (u64.to_np64(*x) == (a ^ b)).all()
    assert (np.asarray(lt) == (a < b)).all()
    assert np.asarray(eq).all()
    for n in (0, 1, 27, 31, 32, 33, 63):
        sh = jax.jit(lambda x, n=n: u64.shr(x, n))(A)
        assert (u64.to_np64(*sh) == (a >> np.uint64(n))).all(), n


def test_interval_index():
    iv = IntervalIndex([10, 50, 100], [20, 70, 200])
    assert iv.has_overlap(15, 16)
    assert iv.has_overlap(5, 11)
    assert not iv.has_overlap(20, 50)  # half-open: [10,20) and [50,70)
    assert iv.has_overlap(69, 300)
    assert not iv.has_overlap(0, 10)
    got = iv.has_overlap_vec(np.array([0, 15, 20, 199]), np.array([10, 16, 50, 205]))
    assert got.tolist() == [False, True, False, True]


def test_interval_index_nested():
    # overlapping/nested stored intervals must still answer correctly
    iv = IntervalIndex([0, 5, 8], [100, 7, 9])
    assert iv.has_overlap(50, 51)
    assert iv.has_overlap(99, 200)
    assert not iv.has_overlap(100, 200)


def test_stage_timer(tmp_path):
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    with t.stage("a"):
        pass
    with t.stage("outer"):
        with t.stage("inner"):  # nested: a lazy read under a BF stage
            pass
    assert set(t.stages) == {"a", "b", "outer", "inner"}
    assert t.nested_in == {"inner": "outer"}
    p = tmp_path / "t.tsv"
    t.write_tsv(str(p))
    lines = open(p).read().strip().split("\n")
    assert lines[0] == "stage\tseconds\tpeak_rss_mb\tpeak_hbm_live_mb\toverlapped_under"
    assert len(lines) == 5
    # "inner" closes (and records) before "outer" does
    assert [l.split("\t")[4] for l in lines[1:]] == ["-", "-", "outer", "-"]
    import json

    assert json.loads(t.as_json())["inner"]["under"] == "outer"
    assert "under" not in json.loads(t.as_json())["a"]
    assert t.total() >= 0
    # peak RSS is a real, nonzero measurement on Linux
    assert t.peak_rss["a"] > 0


def test_condensed_no_masks_is_identity_shape():
    from ntsynt_tpu.core.refine import condensed_genome
    from ntsynt_tpu.io.fasta import PackedGenome

    L = 5000
    codes = np.random.default_rng(0).integers(0, 4, L).astype(np.uint8)
    g = PackedGenome(
        path="x", name="x", contig_names=["c"], lengths=np.array([L]),
        offsets=np.array([0]), codes=codes, raw=None,
        fai_offsets=np.array([0]), fai_linebases=np.array([L]),
        fai_linewidth=np.array([L + 1]),
    )
    cond, ctg, off = condensed_genome(g, {}, 100, 24)
    assert cond.total_bases == L
    assert ctg.tolist() == [0] and off.tolist() == [0]
    assert (cond.codes == codes).all()


def test_condensed_fully_masked():
    from ntsynt_tpu.core.refine import condensed_genome
    from ntsynt_tpu.io.fasta import PackedGenome

    L = 5000
    codes = np.random.default_rng(0).integers(0, 4, L).astype(np.uint8)
    g = PackedGenome(
        path="x", name="x", contig_names=["c"], lengths=np.array([L]),
        offsets=np.array([0]), codes=codes, raw=None,
        fai_offsets=np.array([0]), fai_linebases=np.array([L]),
        fai_linewidth=np.array([L + 1]),
    )
    cond, ctg, off = condensed_genome(g, {0: [(0, L)]}, 100, 24)
    assert cond.total_bases == 0 or (cond.codes >= 4).all()
