"""Block machinery unit tests."""

import numpy as np

from ntsynt_tpu.core import blocks as blk


def _block(pos_rows, k=10, ctg=None, mx=None, ori=None):
    pos = np.asarray(pos_rows, dtype=np.int64)
    n_asm, L = pos.shape
    b = blk.Block(
        mx=np.asarray(mx if mx is not None else np.arange(1, L + 1), np.uint64),
        pos=pos,
        ctg=np.asarray(ctg if ctg is not None else [0] * n_asm, np.int32),
        k=k,
    )
    if ori:
        b.ori = list(ori)
    return b


def test_orientation_votes():
    b = _block([[10, 20, 30], [10, 20, 30]])
    b.determine_orientations(90)
    assert b.ori == ["+", "+"]
    b = _block([[30, 20, 10], [10, 20, 30]])
    b.determine_orientations(90)
    assert b.ori == ["-", "+"]
    # 2/3 increasing = 66% -> '?' at m=90
    b = _block([[10, 20, 15, 25], [1, 2, 3, 4]])
    b.determine_orientations(90)
    assert b.ori[0] == "?"
    b.determine_orientations(60)
    assert b.ori[0] == "+"


def test_start_end_semantics():
    # start=min(first,last), end=max+k (assembly_block.py:17-23)
    b = _block([[100, 50, 10]], k=24)
    assert b.starts()[0] == 10 and b.ends()[0] == 124


def test_indel_breaking():
    # assembly 0 has a 1000bp insertion between mx 2 and 3
    pos = [[0, 100, 200, 1300, 1400], [0, 100, 200, 300, 400]]
    b = _block(pos, mx=[11, 12, 13, 14, 15])
    out, removed = blk.check_for_indels([b], bp=500)
    assert len(out) == 2
    assert removed == [(13, 14)]
    assert out[0].mx.tolist() == [11, 12, 13]
    assert out[1].mx.tolist() == [14, 15]


def test_min_mx_filter():
    b1 = _block([[0, 10, 20, 30], [0, 10, 20, 30]], mx=[1, 2, 3, 4])
    b2 = _block([[0, 10], [0, 10]], mx=[8, 9])
    kept, removed = blk.filter_blocks_min_mx([b1, b2], 4)
    assert kept == [b1]
    assert sorted(removed) == [8, 9]


def test_merge_collinear():
    k = 10
    # two + blocks 100bp apart on both assemblies -> merge
    b1 = _block([[0, 100], [0, 100]], k=k, mx=[1, 2], ori="++")
    b2 = _block([[210, 300], [210, 300]], k=k, mx=[3, 4], ori="++")
    out = blk.merge_collinear_blocks([b1, b2], bp=500, k=k, collinear_merge=1000)
    assert len(out) == 1
    assert out[0].n_minimizers == 4
    assert out[0].starts()[0] == 0 and out[0].ends()[0] == 310

    # ori change -> no merge, reason recorded
    b3 = _block([[210, 300], [300, 210]], k=k, mx=[3, 4], ori=["+", "-"])
    out = blk.merge_collinear_blocks([b1, b3], bp=500, k=k, collinear_merge=1000)
    assert len(out) == 2 and out[1].broken_reason == "ori_change"

    # contig change dominates
    b4 = _block([[210, 300], [210, 300]], k=k, mx=[3, 4], ctg=[0, 1], ori="++")
    out = blk.merge_collinear_blocks([b1, b4], bp=500, k=k, collinear_merge=1000)
    assert out[1].broken_reason == "id_change"

    # too-far -> merge reason
    b5 = _block([[5000, 5100], [5000, 5100]], k=k, mx=[3, 4], ori="++")
    out = blk.merge_collinear_blocks([b1, b5], bp=500, k=k, collinear_merge=1000)
    assert out[1].broken_reason == "merge"

    # differential gap -> indel reason
    b6 = _block([[210, 300], [800, 890]], k=k, mx=[3, 4], ori="++")
    out = blk.merge_collinear_blocks([b1, b6], bp=500, k=k, collinear_merge=10000)
    assert out[1].broken_reason == "indel"


def test_negative_strand_gap():
    # two '-' blocks: gap measured start1 - end2 (ntsynt_synteny.py:428-432)
    k = 10
    b1 = _block([[1000, 900]], k=k, mx=[1, 2], ori="-")
    b2 = _block([[800, 700]], k=k, mx=[3, 4], ori="-")
    out = blk.merge_collinear_blocks([b1, b2], bp=500, k=k, collinear_merge=1000)
    assert len(out) == 1  # gap = 900 - 810 = 90 >= 0, within merge range


def test_block_rows_and_sorting():
    ctx = blk.BlockSet(
        ["b.fa", "a.fa"],
        [[f"ctg{i}" for i in range(3)], [f"ctg{i}" for i in range(3)]],
        k=10,
    )
    b1 = _block([[50, 150], [70, 170]], k=10, ori="++")
    b1_rows = ctx.block_rows(b1, 0)
    lines = b1_rows.strip().split("\n")
    # rows sorted by assembly key: a.fa first
    assert lines[0].startswith("0\ta.fa\tctg0\t70\t180\t+\t2")
    assert lines[1].startswith("0\tb.fa\tctg0\t50\t160\t+\t2")
    # sort: smaller contig name first, then start of smallest assembly
    b2 = _block([[10, 90], [5, 85]], k=10, ori="++")
    assert [b2, b1] == ctx.sorted_blocks([b1, b2])


def test_assembly_key_stripping():
    assert blk.strip_assembly_key("genome.fa.k24.w1000.tsv") == "genome.fa"
    assert blk.strip_assembly_key("genome.fa") == "genome.fa"


def test_batch_blocks_match_scalar_oracle():
    """blocks_from_paths_batch must reproduce the scalar per-path
    blocks_from_path (incl. direction normalization, the
    past_start_flag trim quirk, orientation votes and removals)."""
    rng = np.random.default_rng(5)
    n_asm, n_hashes = 3, 5000
    pool = np.unique(rng.integers(1, 2**63, n_hashes, dtype=np.uint64))
    sorted_pool = np.sort(pool)
    ctg = rng.integers(0, 3, (n_asm, len(pool))).astype(np.int32)
    pos = rng.integers(0, 10**7, (n_asm, len(pool))).astype(np.int64)
    # half the paths monotone (exercise '+'/'-'), half random ('?')
    paths, used = [], 0
    for i in range(60):
        ln = int(rng.integers(1, 40))
        p = pool[used : used + ln]
        used += ln
        if len(p) < 1:
            break
        if i % 2 == 0:
            loc = np.searchsorted(sorted_pool, p)
            mono = np.sort(pos[0, loc]) + np.arange(len(p))  # strictly inc
            pos[0, loc] = mono if i % 4 == 0 else mono[::-1]
            ctg[:, loc] = ctg[:, loc[0]][:, None]  # no contig change
        paths.append(p)

    def lookup(hs):
        loc = np.searchsorted(sorted_pool, hs)
        return ctg[:, loc], pos[:, loc]

    rep_a = 1
    got_blocks, got_removed = blk.blocks_from_paths_batch(paths, lookup, rep_a, 24, 90.0)

    exp_blocks, exp_removed = [], []
    for p in paths:
        if len(p) < 2:
            continue
        _, pp = lookup(np.asarray([p[0], p[-1]], np.uint64))
        p2 = p[::-1] if pp[rep_a, 0] > pp[rep_a, 1] else p
        b, removed = blk.blocks_from_path(p2, lookup, 24, 90.0)
        if b is not None:
            exp_blocks.append(b)
        else:
            exp_removed.append(removed)

    assert len(got_blocks) == len(exp_blocks)
    for g, e in zip(got_blocks, exp_blocks):
        assert (g.mx == e.mx).all()
        assert (g.pos == e.pos).all()
        assert (g.ctg == e.ctg).all()
        assert g.ori == e.ori
    exp_cat = np.concatenate(exp_removed) if exp_removed else np.zeros(0, np.uint64)
    assert (np.sort(got_removed) == np.sort(exp_cat)).all()
