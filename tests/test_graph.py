"""MinimizerGraph unit tests."""

import numpy as np

from ntsynt_tpu.graph import MinimizerGraph


def _mk(lists_per_asm, weights=None, **kw):
    adj = [(f"a{i}", [np.asarray(l, np.uint64) for l in ls]) for i, ls in enumerate(lists_per_asm)]
    weights = weights or {f"a{i}": 1 for i in range(len(lists_per_asm))}
    return MinimizerGraph.build(adj, weights, **kw)


def test_build_weights_and_filter():
    # two assemblies agree on chain 1-2-3-4; one has extra 4-9
    g = _mk([[[1, 2, 3, 4, 9]], [[1, 2, 3, 4]]])
    assert g.n_nodes == 5
    assert g.n_edges == 4
    w = {(int(g.node_hash[g.eu[i]]), int(g.node_hash[g.ev[i]])): int(g.weight[i]) for i in range(4)}
    assert w[(1, 2)] == 2 and w[(3, 4)] == 2 and w[(4, 9)] == 1
    f = g.filter_global(2)
    assert f.n_edges == 3
    f2, (pu, pv) = g.filter_global(2, flag=True)
    assert pu.tolist() == [4] and pv.tolist() == [9]


def test_reversed_adjacency_accumulates():
    # second assembly traverses the chain backwards: same undirected edges
    g = _mk([[[1, 2, 3]], [[3, 2, 1]]])
    assert g.n_edges == 2
    assert (g.weight == 2).all()


def test_linear_paths_and_direction_dedup():
    g = _mk([[[1, 2, 3, 4]], [[1, 2, 3, 4]]])
    paths = g.filter_global(2).linear_paths()
    assert len(paths) == 1
    p = paths[0].tolist()
    assert p == [1, 2, 3, 4] or p == [4, 3, 2, 1]


def test_two_components():
    g = _mk([[[1, 2, 3], [7, 8]], [[1, 2, 3], [7, 8]]])
    paths = g.filter_global(2).linear_paths()
    assert sorted(len(p) for p in paths) == [2, 3]


def test_cycle_dropped():
    g = _mk([[[1, 2, 3, 1]]])  # cycle (adjacency 1-2,2-3,3-1)
    assert g.linear_paths() == []


def test_branching_component_dropped():
    # node 2 has 3 neighbors at weight 1
    g = _mk([[[1, 2, 3], [4, 2]]])
    deg = g.degree()
    assert deg.max() == 3
    assert g.linear_paths() == []


def test_delete_nodes_and_edges():
    g = _mk([[[1, 2, 3, 4]]])
    g2 = g.delete_nodes_by_hash([3])
    assert g2.n_nodes == 3 and g2.n_edges == 1  # edges 2-3, 3-4 gone
    eid = g.edge_id(2, 3)
    g3 = g.delete_edges([eid])
    assert g3.n_edges == 2
    paths = sorted(p.tolist() for p in g3.linear_paths())
    assert len(paths) == 2


def test_simplify_bubble():
    # bubble: 0-1-2-3-4 anchor chain at weight 2 on the flanks, with the
    # middle having a parallel weak path 1-9-3 plus weak direct 1-3.
    adj = [
        ("a0", [np.asarray([0, 1, 2, 3, 4], np.uint64)]),
        ("a1", [np.asarray([0, 1, 9, 3, 4], np.uint64)]),
    ]
    g = MinimizerGraph.build(adj, {"a0": 1, "a1": 1})
    # nodes 1 and 3 have degree 3; edge 1-2..2-3 and 1-9..9-3 weight 1
    # the direct edge 1-3 doesn't exist, so simplification shouldn't fire
    g2 = g.simplify_bubbles(2)
    assert g2.n_nodes == g.n_nodes

    # now a real bubble: direct edge 1-3 (weight 1) + 2-step path via 2
    adj = [
        ("a0", [np.asarray([0, 1, 2, 3, 4], np.uint64)]),
        ("a1", [np.asarray([0, 1, 3, 4], np.uint64)]),
    ]
    g = MinimizerGraph.build(adj, {"a0": 1, "a1": 1})
    deg = g.degree()
    idx1 = g.node_index([1])[0]
    idx3 = g.node_index([3])[0]
    assert deg[idx1] == 3 and deg[idx3] == 3
    g2 = g.simplify_bubbles(2)
    # middle node 2 removed, edge 1-3 promoted to weight 2
    assert g2.node_index([2])[0] == -1
    e = g2.edge_id(1, 3)
    assert g2.weight[e] == 2
    # after promotion the whole graph is one full-weight chain
    paths = g2.filter_global(2).linear_paths()
    assert len(paths) == 1 and len(paths[0]) == 4


def test_black_list_suppresses_terminal_bridge():
    seed = _mk([[[1, 2, 3]], [[1, 2, 3]]])
    # refinement adds adjacency 3-50-7 (new mx 50) and direct 3-7
    adj = [("a0", [np.asarray([3, 7], np.uint64)]), ("a1", [np.asarray([3, 50, 7], np.uint64)])]
    g = MinimizerGraph.build(adj, {"a0": 1, "a1": 1}, seed=seed, black_list=np.asarray([3, 7], np.uint64))
    # 3-7 suppressed (both terminals), 3-50 and 50-7 added
    assert g.node_index([50])[0] >= 0
    try:
        g.edge_id(3, 7)
        assert False, "terminal-terminal edge should be suppressed"
    except KeyError:
        pass
    # seeded edges kept with weights
    assert g.edge_id(1, 2) >= 0


def test_native_walker_matches_numpy():
    """csrc/libgraphwalk.so must extract exactly the NumPy doubling
    formulation's chains (same order, same directions) across chain
    shapes: long chains, 2-node chains, branch-poisoned chains,
    cycles, isolated nodes."""
    import os

    from ntsynt_tpu.graph import mxgraph

    if mxgraph._walk_lib() is None:
        import pytest

        pytest.skip("native walker not built")

    rng = np.random.default_rng(5)
    # assorted adjacency lists: one long chain, several short ones, a
    # triple junction (weight-3 edges kept, so a branch survives the
    # filter when -n is lowered), and a pure cycle
    lists = [
        rng.permutation(np.arange(1, 2001, dtype=np.uint64)),  # 2000-chain
        np.array([9001, 9002], np.uint64),
        np.array([9003, 9004, 9005], np.uint64),
        np.array([7001, 7002, 7003, 7001], np.uint64),  # cycle
        np.array([8001, 8002, 8003], np.uint64),
        np.array([8004, 8002, 8005], np.uint64),  # 8002 becomes deg-4
    ]
    g = MinimizerGraph.build([("a", lists)], {"a": 1})
    native = g.linear_paths()
    os.environ["NTSYNT_NO_NATIVE_WALK"] = "1"
    mxgraph._walk_lib.cache_clear()
    try:
        ref = g.linear_paths()
    finally:
        del os.environ["NTSYNT_NO_NATIVE_WALK"]
        mxgraph._walk_lib.cache_clear()
    assert len(native) == len(ref)
    for a, b in zip(native, ref):
        assert (a == b).all()
