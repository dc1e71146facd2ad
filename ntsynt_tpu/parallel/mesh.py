"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference is a single-node multi-process pipeline (SURVEY.md §2.3);
its TPU-native analog shards genome tiles across chips and combines the
only global state — Bloom-filter bit arrays and minimizer selections —
with XLA collectives over ICI:

  * genome code tiles: sharded over the 'shard' mesh axis (the
    data-parallel analog of snakemake's per-genome fan-out),
  * Bloom-filter words: each device inserts its tiles' k-mer hashes into
    a local replica, then a bitwise-OR all-reduce (ppermute butterfly
    for power-of-two meshes, all-gather+OR otherwise) makes the filter
    globally consistent,
  * per-tile minimizer selections stay sharded; hosts gather them for
    the (tiny) graph stage.

Everything is expressed with shard_map over a 1-D mesh so the same code
runs on a real pod slice or on the 8-virtual-device CPU mesh used in
tests and the driver's dry run.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bloom, nthash, winmin

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    return jax.make_mesh((n,), (AXIS,), devices=devices[:n])


def allreduce_or(x, axis_name: str = AXIS):
    """Bitwise-OR all-reduce of a uint32 array across a mesh axis.

    XLA has no OR all-reduce primitive, so: ppermute butterfly in
    log2(D) steps when D is a power of two, else all_gather + OR.
    Call inside shard_map.
    """
    d = jax.lax.axis_size(axis_name)
    if d == 1:
        return x
    if d & (d - 1) == 0:
        step = 1
        while step < d:
            perm = [(i, i ^ step) for i in range(d)]
            x = x | jax.lax.ppermute(x, axis_name, perm)
            step <<= 1
        return x
    gathered = jax.lax.all_gather(x, axis_name)  # [D, ...]
    return jax.lax.reduce_or(gathered, axes=(0,)) if hasattr(jax.lax, "reduce_or") else (
        functools.reduce(jnp.bitwise_or, [gathered[i] for i in range(d)])
    )


@functools.lru_cache(maxsize=None)
def sharded_sketch_step(mesh, k: int, w: int, chunk: int, bits_log2: int):
    """Compile the multi-chip sketch+BF step.

    Per device: hash a batch of code tiles, select window minima, insert
    all canonical k-mer hashes into a local Bloom-filter replica; then
    OR all-reduce the filter across the mesh.

    Returns a jitted fn(tiles, words) where
      tiles: uint8 [D*B, chunk + w + k - 2] code tiles, sharded on dim 0
      words: uint32 [2^bits_log2 / 32] Bloom words, replicated
    ->
      argmins: int32 [D*B, chunk] per-window leftmost argmin
      win_valid: bool [D*B, chunk]
      words: uint32 OR-combined across all devices
    """

    def one_tile(tile):
        h = nthash.hash_tile(tile.astype(jnp.int32), k)
        valid = h["valid"]
        key_hi = jnp.where(valid, h["out_hi"], winmin.UMAX)
        key_lo = jnp.where(valid, h["out_lo"], winmin.UMAX)
        arg, min_hi, min_lo = winmin.sliding_argmin_val(key_hi, key_lo, w)
        win_valid = ~((min_hi == winmin.UMAX) & (min_lo == winmin.UMAX))
        return arg.astype(jnp.int32), win_valid, h["canon_hi"], h["canon_lo"], valid

    def local_step(tiles, words):
        args, win_valid, c_hi, c_lo, kvalid = jax.vmap(one_tile)(tiles)
        local = bloom.insert_words(
            jnp.zeros_like(words), c_hi.reshape(-1), c_lo.reshape(-1),
            kvalid.reshape(-1), bits_log2,
        )
        return args, win_valid, allreduce_or(words | local)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def sharded_insert_step(mesh, k: int, chunk: int, bits_log2: int):
    """Accumulating level-1 BF insert: every k-mer of the sharded tile
    batch is inserted into a local replica, OR-reduced over the mesh,
    and merged into the replicated accumulator."""

    def local_step(tiles, acc_words):
        def one(tile):
            h = nthash.hash_tile(tile.astype(jnp.int32), k)
            return h["canon_hi"], h["canon_lo"], h["valid"]

        c_hi, c_lo, v = jax.vmap(one)(tiles)
        local = bloom.insert_words(
            jnp.zeros_like(acc_words),
            c_hi.reshape(-1), c_lo.reshape(-1), v.reshape(-1), bits_log2,
        )
        return acc_words | allreduce_or(local)

    fn = jax.shard_map(
        local_step, mesh=mesh, in_specs=(P(AXIS), P()), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_common_bf_probe_step(mesh, k: int, chunk: int, bits_log2: int):
    """Compile the cascade step: probe the previous-level BF for every
    k-mer of sharded tiles, insert hits into a local replica, OR-reduce
    it over the mesh and merge into the accumulating next level (the
    multi-chip form of src/ntsynt_make_common_bf.cpp:140-160)."""

    def local_step(tiles, prev_words, acc_words):
        def one(tile):
            h = nthash.hash_tile(tile.astype(jnp.int32), k)
            present = bloom.bf_probe(prev_words, h["canon_hi"], h["canon_lo"], bits_log2)
            return h["canon_hi"], h["canon_lo"], h["valid"] & present

        c_hi, c_lo, keep = jax.vmap(one)(tiles)
        nxt = bloom.insert_words(
            jnp.zeros((1 << bits_log2) // 32, jnp.uint32),
            c_hi.reshape(-1), c_lo.reshape(-1), keep.reshape(-1), bits_log2,
        )
        return acc_words | allreduce_or(nxt)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_common_bf(genomes, k: int, fpr: float = 0.025, mesh=None,
                          chunk: int = 1 << 18, bf_bytes=None):
    """Multi-chip cascading common-k-mer Bloom filter: each genome's own
    filter is built data-parallel over the mesh (tiles sharded on dim 0,
    bitwise-OR all-reduce keeping the replica consistent) and then
    dense-ANDed with the previous level — bit-for-bit the reference's
    insert-if-present cascade for a 1-hash BF (see
    ops.bf_build._cascade_stream_fn) and bit-identical to
    ops.bf_build.build_common_bf. The AND replaces the per-k-mer probe
    of the previous level (serialized gathers) with one full-bandwidth
    elementwise pass, and makes the levels independent: on a real pod
    the genomes themselves can build concurrently."""
    from ..ops import bf_build

    mesh = mesh or make_mesh()
    d = int(mesh.devices.size)
    ordered = sorted(genomes, key=lambda g: g.path)
    num_bits = bf_build.bf_size_bits(ordered, fpr, bf_bytes)
    bits_log2 = num_bits.bit_length() - 1
    ins = sharded_insert_step(mesh, k, chunk, bits_log2)

    prev = None
    for g in ordered:
        buf, n_segs = bf_build._stream_buffer(g, k, chunk)
        acc = jnp.zeros(num_bits // 32, jnp.uint32)
        if buf is not None:
            span = chunk * d
            for ws in range(0, n_segs * chunk, span):
                tiles = jnp.asarray(make_tiles(buf[ws:], d, chunk, k, 1))
                acc = ins(tiles, acc)
        prev = acc if prev is None else prev & acc
    return bloom.DeviceBloomFilter(num_bits, k, words=prev)


@functools.lru_cache(maxsize=None)
def sharded_filtered_sketch_step(mesh, k: int, w: int, chunk: int,
                                 common_log2, repeat_log2):
    """Sharded window-argmin sketch step with the common-BF ('solid',
    indexlr -s) and repeat-BF (-r) filters fused into k-mer validity —
    BF word arrays are replicated, probes are device-local gathers."""

    def local_step(tiles, common_words, repeat_words):
        def one(tile):
            h = nthash.hash_tile(tile.astype(jnp.int32), k)
            valid = h["valid"]
            if common_log2 is not None:
                valid = valid & bloom.bf_probe(
                    common_words, h["canon_hi"], h["canon_lo"], common_log2
                )
            if repeat_log2 is not None:
                valid = valid & ~bloom.bf_probe(
                    repeat_words, h["canon_hi"], h["canon_lo"], repeat_log2
                )
            key_hi = jnp.where(valid, h["out_hi"], winmin.UMAX)
            key_lo = jnp.where(valid, h["out_lo"], winmin.UMAX)
            arg, min_hi, min_lo = winmin.sliding_argmin_val(key_hi, key_lo, w)
            win_valid = ~((min_hi == winmin.UMAX) & (min_lo == winmin.UMAX))
            return arg.astype(jnp.int32), win_valid

        return jax.vmap(one)(tiles)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_sketch_genome(genome, k: int, w: int, mesh=None, chunk: int = 1 << 18,
                          common_bf=None, repeat_bf=None):
    """Data-parallel minimizer sketch over a device mesh.

    The genome's code stream is tiled into window chunks; all devices
    process a batch of tiles per step (dim-0 sharding), and the host
    reduces per-window argmins to the selected minimizer set — the
    multi-chip analog of the per-genome snakemake fan-out (SURVEY.md
    §2.3). Results are identical to ops.sketch.sketch_genome, including
    fused common/repeat BF filtering (indexlr -s/-r semantics).
    """
    from ..ops import sketch as sketch_ops

    mesh = mesh or make_mesh()
    d = mesh.devices.size
    stream = sketch_ops._Stream(genome, k, w)
    legit = stream.legit_windows()
    nwin = len(legit)
    step = sharded_filtered_sketch_step(
        mesh, k, w, chunk,
        None if common_bf is None else common_bf.bits_log2,
        None if repeat_bf is None else repeat_bf.bits_log2,
    )
    cw = jnp.zeros(1, jnp.uint32) if common_bf is None else common_bf.words
    rw = jnp.zeros(1, jnp.uint32) if repeat_bf is None else repeat_bf.words

    selected = []
    tiles_per_call = d
    span = chunk * tiles_per_call
    for ws in range(0, nwin, span):
        tiles = make_tiles(stream.codes[ws:], tiles_per_call, chunk, k, w)
        args, win_valid = step(jnp.asarray(tiles), cw, rw)
        args = np.asarray(args)
        win_valid = np.asarray(win_valid)
        for t in range(tiles_per_call):
            base = ws + t * chunk
            if base >= nwin:
                break
            lg = legit[base : base + chunk]
            vv = win_valid[t, : len(lg)] & lg
            if vv.any():
                selected.append(np.unique(args[t, : len(lg)][vv]).astype(np.int64) + base)
    sel = np.unique(np.concatenate(selected)) if selected else np.zeros(0, np.int64)

    # short-contig fallback + position mapping via the host helpers
    cidx, cpos = stream.to_contig_pos(sel)
    extra_ci, extra_pos = [], []
    for i in stream.short_contigs():
        o, ln = int(genome.offsets[i]), int(genome.lengths[i])
        ccodes = genome.codes[o : o + ln]
        canon, out, valid = sketch_ops.nthash.hash_sequence_np(ccodes, k)
        if common_bf is not None and valid.any():
            valid = valid & sketch_ops._probe_np(common_bf, canon)
        if repeat_bf is not None and valid.any():
            valid = valid & ~sketch_ops._probe_np(repeat_bf, canon)
        if valid.any():
            keys = np.where(valid, out, np.uint64(0xFFFFFFFFFFFFFFFF))
            extra_ci.append(i)
            extra_pos.append(int(np.argmin(keys)))
    if extra_ci:
        cidx = np.concatenate([cidx, np.asarray(extra_ci, np.int32)])
        cpos = np.concatenate([cpos, np.asarray(extra_pos, np.int64)])
        order = np.lexsort((cpos, cidx))
        cidx, cpos = cidx[order], cpos[order]
    canon, hashes = sketch_ops._hash_at_positions(genome, k, cidx, cpos)
    return sketch_ops.GenomeSketch(
        name=genome.name,
        k=k,
        w=w,
        contig_names=list(genome.contig_names),
        contig_idx=cidx,
        positions=cpos,
        hashes=hashes,
        canon=canon,
    )


def make_tiles(stream_codes: np.ndarray, n_tiles: int, chunk: int, k: int, w: int):
    """Host-side: slice a genome code stream into [n_tiles, NC] tiles
    covering window ranges [t*chunk, (t+1)*chunk), halo included, padded
    with N codes."""
    nc = chunk + w - 1 + k - 1
    tiles = np.full((n_tiles, nc), 4, dtype=np.uint8)
    for t in range(n_tiles):
        seg = stream_codes[t * chunk : t * chunk + nc]
        tiles[t, : len(seg)] = seg
    return tiles
