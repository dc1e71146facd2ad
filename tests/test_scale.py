"""Stress test: graph + blocks machinery at mammalian scale.

6M nodes / 100k paths is the expected graph size for 3-genome
mammal-scale runs at w=1000 (bin/ntsynt_synteny.py:543-546 scale
claims, SURVEY.md §3.2). The whole graph-build -> linear-paths ->
blocks -> indel -> min-mx chain is a fixed number of vectorized passes
over ~18M-element arrays — single-digit seconds on ordinary hardware.

The asserted bound is the WARM-run wall: this dev VM page-faults fresh
memory at ~40 MB/s with multi-x run-to-run variance (see
ntsynt_tpu/utils/malloc_tune.py), so a cold run measures the
hypervisor's fault throttle, not the code. The stage runs twice in one
process; the second run re-uses the faulted heap and reflects the
algorithmic cost (on ordinary hosts cold == warm). Both walls are
printed.
"""

import time

import numpy as np

from ntsynt_tpu.core.assembly import AssemblyMinimizers, MxInfo, filter_common
from ntsynt_tpu.core.synteny import SyntenyDetector, SyntenyParams

P = 100_000  # paths (contigs)
L = 60  # minimizers per path -> 6M nodes


def _assembly(key: str, hashes: np.ndarray, descending: bool) -> AssemblyMinimizers:
    cidx = np.repeat(np.arange(P, dtype=np.int32), L)
    step = np.arange(L, dtype=np.int64) * 1000
    if descending:
        step = step[::-1]
    pos = (np.repeat(np.arange(P, dtype=np.int64), L) * 1_000_000) + np.tile(step, P)
    lists = [hashes[p * L : (p + 1) * L] for p in range(P)]
    return AssemblyMinimizers(
        key=key,
        contig_names=[f"c{p}" for p in range(P)],
        lists=lists,
        mx_info=MxInfo.from_arrays(hashes, cidx, pos),
    )


def _make_assemblies(hashes):
    return {
        "a.fa": _assembly("a.fa", hashes, descending=False),
        "b.fa": _assembly("b.fa", hashes, descending=False),
        "c.fa": _assembly("c.fa", hashes, descending=True),  # '-' strand
    }


def _run_stage(assemblies):
    det = SyntenyDetector(
        assemblies, SyntenyParams(k=24, w=1000, z=500, bp=5000, prefix="stress")
    )
    t0 = time.perf_counter()
    filter_common(det.assemblies)
    det.make_minimizer_graph()
    det.graph = det.graph.filter_global(det.params.n)
    paths = det.graph.linear_paths()
    blocks = det.paths_to_blocks(paths)
    blocks = det.indel_pass(blocks)
    blocks = det.min_mx_pass(blocks, 4)
    return det, paths, blocks, time.perf_counter() - t0


def test_graph_blocks_6m_nodes_100k_paths():
    # injective hash assignment, shuffled within each path
    hashes = np.arange(1, P * L + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    rng = np.random.default_rng(7)
    hashes = hashes[
        (rng.permutation(L)[None, :] + np.arange(P)[:, None] * L).reshape(-1)
    ]

    asms = _make_assemblies(hashes)
    det, paths, blocks, cold = _run_stage(asms)
    # filter_common is idempotent; re-running on the same assemblies
    # re-does all the work on an already-faulted heap. Two warm reruns,
    # min taken: single-run walls on this VM swing with hypervisor
    # fault-throttle state (ADVICE r2: an absolute single-warm bound
    # tripped under suite-order memory pressure).
    _, _, _, warm1 = _run_stage(asms)
    _, _, _, warm2 = _run_stage(asms)
    warm = min(warm1, warm2)

    assert det.graph.n_nodes == P * L
    assert len(paths) == P
    assert len(blocks) == P
    b = blocks[0]
    assert b.n_minimizers == L
    # FILES order is reverse-sorted keys: [c.fa, b.fa, a.fa]
    assert b.ori == ["-", "+", "+"]

    # environment-calibrated bound: time the dominant primitive mix
    # (one 18M-u64 stable argsort + permute-gather + cumsum) NOW, on
    # this machine, in its current throttle state; the stage is a fixed
    # number of such passes, so warm/cal is machine-independent
    # (measured ~5-7x on the dev VM quiet AND under load; the old
    # absolute bound conflated algorithmic cost with hypervisor state).
    cal_arr = np.random.default_rng(1).integers(
        0, 1 << 62, P * L * 3, dtype=np.int64
    ).astype(np.uint64)
    t0 = time.perf_counter()
    order = np.argsort(cal_arr, kind="stable")
    srt = cal_arr[order]
    np.cumsum(srt)
    cal = time.perf_counter() - t0
    del cal_arr, order, srt
    bound = max(15.0, 12.0 * cal)
    assert warm < bound, (
        f"graph+blocks stage took {warm:.1f}s best-of-2-warm at 6M nodes "
        f"(cold {cold:.1f}s; calibration {cal:.2f}s -> bound {bound:.1f}s)"
    )
    print(
        f"graph+blocks 6M nodes / 100k paths: cold {cold:.2f}s "
        f"warm {warm1:.2f}/{warm2:.2f}s (min {warm:.2f}s, "
        f"cal {cal:.2f}s, bound {bound:.1f}s)"
    )


def test_erosion_prefilter_million_flagged_pairs():
    """The last refinement round can flag millions of dropped edges;
    refine_graph_erosion must reduce them with vectorized degree masks
    (no Python loop over all pairs), walking only both-deg-1 survivors."""
    from ntsynt_tpu.graph.mxgraph import MinimizerGraph

    n = 2_000_000
    hashes = np.arange(1, n + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    # one long chain: interior nodes have degree 2 -> no pair survives
    eu = np.arange(n - 1, dtype=np.int32)
    ev = eu + 1
    g = MinimizerGraph(hashes, eu, ev, np.ones(n - 1, dtype=np.int32))

    class _Det:
        pass

    det = _Det()
    det.graph = g
    det.params = SyntenyParams(k=24, w=1000, prefix="stress-erosion")
    flagged = (hashes[eu], hashes[ev])  # every edge flagged (1M+ pairs)

    t0 = time.perf_counter()
    SyntenyDetector.refine_graph_erosion(det, flagged)
    w1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    SyntenyDetector.refine_graph_erosion(det, flagged)
    w2 = time.perf_counter() - t0
    warm = min(w1, w2)
    # vectorized pre-filter = a few passes over 2M-element arrays; the
    # old per-pair Python loop took >1 min at this scale. Generous
    # absolute bound (this VM fault-throttles; warm rerun pattern).
    assert warm < 10.0, f"erosion pre-filter took {warm:.1f}s for 2M flagged pairs"
    assert det.graph.n_edges == n - 1  # nothing eligible -> nothing removed
    print(f"erosion pre-filter 2M pairs: {w1:.2f}/{w2:.2f}s")
