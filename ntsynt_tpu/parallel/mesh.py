"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference is a single-node multi-process pipeline (SURVEY.md §2.3);
its TPU-native analog shards genome code streams across chips and
combines the only global state — Bloom-filter bit arrays and minimizer
selections — with XLA collectives over ICI:

  * genome code streams: cut into D contiguous *slabs* (one per device,
    halo of w+k-2 codes so windows never straddle a slab boundary),
    uploaded 2-bit-packed + N-bitmap and sharded over the 'shard' axis,
  * per-device compute: ONE dispatch per genome runs a fori_loop over
    the slab's fixed-shape segments inside shard_map — hashing
    (ops/nthash), window argmin (ops/winmin), Bloom-filter probes, and
    on-device output compaction (run-start flags -> cumsum slots ->
    scatter-with-drop), so only the selected minimizers come home,
  * Bloom-filter words: each device inserts its slab's k-mer hashes into
    a local replica, then a bitwise-OR all-reduce (ppermute butterfly
    for power-of-two meshes, all-gather+OR otherwise) makes the filter
    globally consistent — bit-identical to the single-device builder
    because insert sets commute under OR,
  * per-slab minimizer selections stay sharded; the host gathers the
    compacted outputs for the (tiny) graph stage.

This is the same device-resident formulation as the single-chip hot
path (ops/sketch_device.py) — HBM-resident codes, one dispatch per
genome, compact outputs — except the compaction is a plain XLA
cumsum+scatter instead of the Pallas one-hot kernel so the identical
program runs on a real pod slice and on the 8-virtual-device CPU mesh
used in tests and the driver's dry run (a 2^20-element scatter costs
~13 ms on a v5e, on par with the Pallas path's ~6 ms and far off the
critical path once sharded D ways).

Everything is expressed with shard_map over a 1-D mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bf_place, bloom, nthash, winmin

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


# ---------------------------------------------------------------------------
# packed slab uploads
# ---------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def _pack_rows(buf2d: np.ndarray):
    """Planar 2-bit pack + 1-bit N-bitmap of [D, L] code rows (L % 8 == 0).
    Same wire format as the single-chip path (ops/sketch.py
    _pack_stream_host/_pack_nbits_host), applied per row: the upload
    carries 0.375 B/code instead of 1 B/code."""
    d, ln = buf2d.shape
    v = (buf2d & 3).reshape(d, 4, ln // 4)
    packed2 = v[:, 0] | (v[:, 1] << 2) | (v[:, 2] << 4) | (v[:, 3] << 6)
    m = (buf2d == 4).astype(np.uint8).reshape(d, 8, ln // 8)
    isn = m[:, 0]
    for j in range(1, 8):
        isn = isn | (m[:, j] << j)
    return packed2, isn


def _unpack_row(packed2, isn):
    """Device-side planar unpack of one row -> uint8 codes (N == 4)."""
    p = packed2
    codes = jnp.concatenate([p & 3, (p >> 2) & 3, (p >> 4) & 3, (p >> 6) & 3])
    b = isn
    n = jnp.concatenate([(b >> j) & 1 for j in range(8)])
    return jnp.where(n != 0, jnp.uint8(4), codes.astype(jnp.uint8))


def _slab_rows(stream_slice, total: int, d: int, slab_kmers: int, halo: int,
               only_rows=None):
    """Host: cut a code stream into [D, slab_len] rows (slab_len padded
    to a multiple of 8 with N codes). stream_slice(lo, hi) -> uint8.
    only_rows: under multi-process execution each host materializes only
    its own devices' slabs (per-host genome partitioning — the rest stay
    padding and are never uploaded)."""
    slab_len = -(-(slab_kmers + halo) // 8) * 8
    rows = np.full((d, slab_len), 4, dtype=np.uint8)
    for i in range(d) if only_rows is None else sorted(only_rows):
        lo = i * slab_kmers
        hi = min(lo + slab_kmers + halo, total)
        if hi > lo:
            seg = stream_slice(lo, hi)
            rows[i, : len(seg)] = seg
    return rows


def _local_rows(mesh) -> list | None:
    """Mesh-order indices of this process's devices (None = all local:
    single-process execution)."""
    if jax.process_count() == 1:
        return None
    pid = jax.process_index()
    flat = list(np.asarray(mesh.devices).reshape(-1))
    return [i for i, dev in enumerate(flat) if dev.process_index == pid]


def _put_sharded(mesh, rows: np.ndarray):
    """Upload [D, L] host rows as a dim-0-sharded global array. Single
    process: plain upload (jit re-shards). Multi-process: each host
    contributes only its addressable shards
    (jax.make_array_from_callback), so slabs ride the local host->device
    path and cross-host traffic is limited to the collectives."""
    if jax.process_count() == 1:
        return jnp.asarray(rows)
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(AXIS))
    return jax.make_array_from_callback(rows.shape, sharding, lambda idx: rows[idx])


def _put_replicated(mesh, host_arr: np.ndarray):
    """Upload a host array fully replicated over the (possibly
    multi-process) mesh — every process must pass the same value."""
    if jax.process_count() == 1:
        return jnp.asarray(host_arr)
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(
        host_arr.shape, sharding, lambda idx: host_arr[idx]
    )


def _get_full(arr) -> np.ndarray:
    """Fetch a (possibly cross-process-sharded) array to every host:
    device_get when fully addressable, else an all-gather over the
    process set (DCN analog — jax.experimental.multihost_utils)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(jax.device_get(arr))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


# ---------------------------------------------------------------------------
# sharded whole-stream sketch (device-resident, compacted outputs)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sharded_stream_sketch_fn(mesh, k: int, w: int, seg: int, n_segs: int,
                              slab_len: int, seg_slots: int,
                              common_log2, repeat_log2):
    """One-dispatch-per-genome sharded sketcher.

    Per device: fori_loop over its slab's n_segs fixed-shape segments;
    each segment hashes, probes the (replicated) BF words, computes the
    block-layout window argmin, flags selection run starts (the argmin
    sequence is monotone in the window index, so each selected k-mer is
    exactly one run), and compacts flagged (position, window) pairs into
    seg_slots entries via an in-order cumsum + scatter-with-drop.
    Outputs come back sharded: vals/wins [D*n_segs, seg_slots] (slab-
    relative) + per-segment counts for overflow detection.
    """
    nk = seg + w - 1
    nc = nk + k - 1
    assert slab_len >= (n_segs - 1) * seg + nc

    def local(packed2_row, isn_row, common_words, repeat_words):
        slab = _unpack_row(packed2_row[0], isn_row[0])

        def body(i, acc):
            vals_acc, wins_acc, hi_acc, lo_acc, cnt_acc = acc
            codes = jax.lax.dynamic_slice(slab, (i * seg,), (nc,))
            h = nthash.hash_tile(codes, k)
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
            arg, min_hi, min_lo = winmin.sliding_block_argmin(key_hi, key_lo, w)
            nb, wp = arg.shape
            win_valid = ~((min_hi == winmin.UMAX) & (min_lo == winmin.UMAX))
            lane = jax.lax.broadcasted_iota(jnp.int32, (nb, wp), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (nb, wp), 0)
            j = row * w + lane
            live = (lane < w) & (j < seg) & win_valid
            # run starts: argmin differs from the previous flat window's
            prev = jnp.concatenate(
                [jnp.full((nb, 1), -1, arg.dtype), arg[:, :-1]], axis=1
            )
            row_up = jnp.concatenate(
                [jnp.full((1, wp), -1, arg.dtype), arg[:-1]], axis=0
            )
            prev = jnp.where(lane == 0, row_up[:, w - 1 : w], prev)
            flag = (live & (arg != prev)).astype(jnp.int32).reshape(-1)
            slot = jnp.cumsum(flag) - flag
            idx = jnp.where(flag > 0, slot, seg_slots)  # OOB -> drop
            base = i * seg
            sv = jnp.zeros(seg_slots, jnp.uint32).at[idx].set(
                (arg.reshape(-1) + base).astype(jnp.uint32), mode="drop"
            )
            sw = jnp.zeros(seg_slots, jnp.uint32).at[idx].set(
                (j.reshape(-1) + base).astype(jnp.uint32), mode="drop"
            )
            # hash lanes: the window min IS the selected k-mer's printed
            # hash — carried out so the host epilogue never re-hashes
            shi = jnp.zeros(seg_slots, jnp.uint32).at[idx].set(
                min_hi.reshape(-1), mode="drop"
            )
            slo = jnp.zeros(seg_slots, jnp.uint32).at[idx].set(
                min_lo.reshape(-1), mode="drop"
            )
            cnt = jnp.sum(flag).astype(jnp.int32)
            vals_acc = jax.lax.dynamic_update_slice(vals_acc, sv[None], (i, 0))
            wins_acc = jax.lax.dynamic_update_slice(wins_acc, sw[None], (i, 0))
            hi_acc = jax.lax.dynamic_update_slice(hi_acc, shi[None], (i, 0))
            lo_acc = jax.lax.dynamic_update_slice(lo_acc, slo[None], (i, 0))
            cnt_acc = jax.lax.dynamic_update_slice(cnt_acc, cnt[None, None], (i, 0))
            return vals_acc, wins_acc, hi_acc, lo_acc, cnt_acc

        init = (
            jnp.zeros((n_segs, seg_slots), jnp.uint32),
            jnp.zeros((n_segs, seg_slots), jnp.uint32),
            jnp.zeros((n_segs, seg_slots), jnp.uint32),
            jnp.zeros((n_segs, seg_slots), jnp.uint32),
            jnp.zeros((n_segs, 1), jnp.int32),
        )
        return jax.lax.fori_loop(0, n_segs, body, init)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


def _host_windows_recompute(stream, legit, lo: int, hi: int, k: int, w: int,
                            common_bf, repeat_bf):
    """Exact host recompute of windows [lo, hi) of a stream (overflow
    safety net; rare — dense repeat regions)."""
    from ..ops import sketch as sketch_ops

    nwin = len(legit)
    hi = min(hi, nwin)
    if hi <= lo:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    codes = stream.slice(lo, hi - 1 + w + k - 1)
    canon, outh, valid = nthash.hash_sequence_np(codes, k)
    if (common_bf is not None or repeat_bf is not None) and valid.any():
        valid = valid & sketch_ops._probe_stream_np(common_bf, repeat_bf, codes, k)
    keys = np.where(valid, outh, np.uint64(0xFFFFFFFFFFFFFFFF))
    arg = sketch_ops._np_sliding_argmin(keys, w)[: hi - lo]
    ok = legit[lo:hi] & valid[arg]
    if not ok.any():
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    from ..ops.sketch_device import _dedupe_pos_hash

    picks = arg[ok]
    return _dedupe_pos_hash(picks.astype(np.int64) + lo, outh[picks])


def sharded_sketch_genome(genome, k: int, w: int, mesh=None,
                          seg_max: int = 1 << 20, common_bf=None,
                          repeat_bf=None, codes: np.ndarray | None = None):
    """Data-parallel minimizer sketch over a device mesh.

    The genome's code stream is cut into D contiguous slabs (one per
    device) and sketched with the device-resident formulation: 2-bit
    packed sharded upload, ONE dispatch for the whole genome (fori_loop
    over each slab's segments inside shard_map), compacted selections
    back. Results are identical to ops.sketch.sketch_genome, including
    fused common/repeat BF filtering (indexlr -s/-r semantics) — slab
    boundaries only introduce duplicate run-start emissions, which the
    final np.unique removes. Refinement rounds pass the condensed
    genome (core/refine.condensed_genome) here when the pipeline runs
    with use_mesh, sharding the re-sketch too.
    """
    return sharded_sketch_collect(
        sharded_sketch_dispatch(
            genome, k, w, mesh=mesh, seg_max=seg_max,
            common_bf=common_bf, repeat_bf=repeat_bf, codes=codes,
        )
    )


def sharded_sketch_dispatch(genome, k: int, w: int, mesh=None,
                            seg_max: int = 1 << 20, common_bf=None,
                            repeat_bf=None, codes: np.ndarray | None = None):
    """Phase 1 of sharded_sketch_genome: pack + upload the slabs and
    issue the (async) sharded dispatch. Returns a handle for
    sharded_sketch_collect — the pipeline dispatches genome i+1 before
    collecting genome i so i's host epilogue overlaps i+1's device
    sweep (the same overlap the single-chip path runs)."""
    from ..ops import sketch as sketch_ops

    mesh = mesh or make_mesh()
    d = int(mesh.devices.size)
    stream = sketch_ops._Stream(genome, k, w, codes=codes)
    legit = stream.legit_windows()
    nwin = len(legit)

    out = seg = n_segs = S = seg_slots = None
    if nwin > 0:
        # slab sizing: one segment per device when the stream is small,
        # pow2-bucketed segment counts when large (compile-cache reuse)
        seg = min(seg_max, max(1024, _next_pow2(-(-nwin // d))))
        n_segs = _next_pow2(-(-nwin // (d * seg)))
        S = n_segs * seg  # windows per device
        halo = w + k - 2
        nc_last = seg + w - 1 + k - 1
        slab_len = -(-max((n_segs - 1) * seg + nc_last, S + halo) // 8) * 8
        seg_slots = min(_next_pow2(seg), max(256, _next_pow2(8 * seg // max(w, 1))))

        rows = _slab_rows(stream.slice, stream.total, d, S, slab_len - S,
                          only_rows=_local_rows(mesh))
        packed2, isn = _pack_rows(rows)
        fn = _sharded_stream_sketch_fn(
            mesh, k, w, seg, n_segs, slab_len, seg_slots,
            None if common_bf is None else common_bf.bits_log2,
            None if repeat_bf is None else repeat_bf.bits_log2,
        )
        dummy = np.zeros(1, np.uint32)
        cw = _put_replicated(mesh, dummy) if common_bf is None else common_bf.words
        rw = _put_replicated(mesh, dummy) if repeat_bf is None else repeat_bf.words
        out = fn(_put_sharded(mesh, packed2), _put_sharded(mesh, isn), cw, rw)
    return dict(
        genome=genome, k=k, w=w, codes=codes, stream=stream, legit=legit,
        common_bf=common_bf, repeat_bf=repeat_bf, out=out,
        seg=seg, n_segs=n_segs, S=S, seg_slots=seg_slots,
    )


def sharded_sketch_collect(handle):
    """Phase 2 of sharded_sketch_genome: block on the sharded result and
    run the host epilogue (overflow/first-window fix-ups, short-contig
    fallback, mix inversion)."""
    from ..ops import sketch as sketch_ops
    from ..ops.sketch_device import DeviceSketcher

    genome, k, w = handle["genome"], handle["k"], handle["w"]
    codes, stream, legit = handle["codes"], handle["stream"], handle["legit"]
    common_bf, repeat_bf = handle["common_bf"], handle["repeat_bf"]
    nwin = len(legit)

    sel = np.zeros(0, np.int64)
    if handle["out"] is not None:
        seg, n_segs, S, seg_slots = (
            handle["seg"], handle["n_segs"], handle["S"], handle["seg_slots"]
        )
        vals, wins, his, los, cnts = (_get_full(a) for a in handle["out"])
        cnts = cnts.reshape(-1)

        # vectorized gather of the compacted selections
        g = vals.shape[0]  # D * n_segs
        m = np.minimum(cnts, seg_slots)
        lane = np.arange(seg_slots)[None, :]
        base = (np.arange(g) // n_segs).astype(np.int64) * S
        jw = wins.astype(np.int64) + base[:, None]
        v = vals.astype(np.int64) + base[:, None]
        h64 = (his.astype(np.uint64) << np.uint64(32)) | los
        ok = (lane < m[:, None]) & (jw < nwin)
        ok[ok] = legit[jw[ok]]
        parts = [v[ok]]
        parts_h = [h64[ok]]
        for gi in np.where(cnts > seg_slots)[0]:  # overflow safety net
            lo = int(base[gi] + (gi % n_segs) * seg)
            op, oh = _host_windows_recompute(
                stream, legit, lo, lo + seg, k, w, common_bf, repeat_bf
            )
            parts.append(op)
            parts_h.append(oh)
        # runs that start in an illegit window (partial windows before a
        # contig's first full window) are flagged only at their illegit
        # start: recompute each contig's first legit window on the host
        # (same fix-up as the single-chip path, sketch_device.py)
        ds = DeviceSketcher(k, w, common_bf=common_bf, repeat_bf=repeat_bf)
        first_legit = np.where(legit & ~np.concatenate([[False], legit[:-1]]))[0]
        if len(first_legit):
            fp, fh = ds._first_window_argmins(stream.codes_view(), first_legit)
            parts.append(fp)
            parts_h.append(fh)
        from ..ops.sketch_device import _dedupe_pos_hash

        sel, selh = _dedupe_pos_hash(
            np.concatenate(parts), np.concatenate(parts_h)
        )
    else:
        selh = np.zeros(0, np.uint64)

    # short-contig fallback + position mapping (host helpers shared with
    # the single-chip path)
    cidx, cpos = stream.to_contig_pos(sel)
    extra_ci, extra_pos, extra_h = [], [], []
    src = genome.codes if codes is None else codes
    for i in stream.short_contigs():
        o, ln = int(genome.offsets[i]), int(genome.lengths[i])
        ccodes = src[o : o + ln]
        canon, out, valid = nthash.hash_sequence_np(ccodes, k)
        if common_bf is not None and valid.any():
            valid = valid & sketch_ops._probe_np(common_bf, canon)
        if repeat_bf is not None and valid.any():
            valid = valid & ~sketch_ops._probe_np(repeat_bf, canon)
        if valid.any():
            keys = np.where(valid, out, np.uint64(0xFFFFFFFFFFFFFFFF))
            a = int(np.argmin(keys))
            extra_ci.append(i)
            extra_pos.append(a)
            extra_h.append(out[a])
    if extra_ci:
        cidx = np.concatenate([cidx, np.asarray(extra_ci, np.int32)])
        cpos = np.concatenate([cpos, np.asarray(extra_pos, np.int64)])
        selh = np.concatenate([selh, np.asarray(extra_h, np.uint64)])
        order = np.lexsort((cpos, cidx))
        cidx, cpos, selh = cidx[order], cpos[order], selh[order]
    hashes = selh
    canon = nthash.unmix_np(hashes, k)
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


# ---------------------------------------------------------------------------
# sharded Bloom-filter cascade (one dispatch per genome per level)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sharded_bf_level_fn(mesh, k: int, seg: int, n_segs: int, slab_len: int,
                         bits_log2: int, cascade: bool, place=False):
    """Per device: insert its slab's k-mers into a local replica (fixed-
    shape segment fori_loop), OR all-reduce across the mesh; cascade
    levels then AND with the previous level (bit-for-bit the reference's
    insert-if-present for a 1-hash BF — see ops.bf_build
    _cascade_stream_fn's proof, src/ntsynt_make_common_bf.cpp:140-160)."""
    from ..ops import bf_build

    assert slab_len >= n_segs * seg + k - 1

    def local(packed2_row, isn_row, prev_words):
        slab = _unpack_row(packed2_row[0], isn_row[0])

        def body(i, words):
            hi, lo, valid = bf_build._segment_hashes(slab, i, k, seg)
            # place is resolved by the caller and part of this fn's
            # lru_cache key (insert_words' contract): `or False` keeps
            # trace-time auto-resolution from ever happening here
            return bloom.insert_words(words, hi, lo, valid, bits_log2,
                                      place=place or False)

        own = jax.lax.fori_loop(0, n_segs, body, jnp.zeros_like(prev_words))
        own = allreduce_or(own)
        return (own & prev_words) if cascade else own

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_common_bf(genomes, k: int, fpr: float = 0.025, mesh=None,
                          seg_max: int = 1 << 21, bf_bytes=None):
    """Multi-chip cascading common-k-mer Bloom filter: each genome's own
    filter is built data-parallel over the mesh (code slabs sharded on
    the 'shard' axis, 2-bit packed uploads, bitwise-OR all-reduce) and
    dense-ANDed with the previous level. ONE dispatch per genome per
    level; bit-identical to ops.bf_build.build_common_bf."""
    from ..ops import bf_build

    mesh = mesh or make_mesh()
    d = int(mesh.devices.size)
    ordered = sorted(genomes, key=lambda g: g.path)
    num_bits = bf_build.bf_size_bits(ordered, fpr, bf_bytes)
    bits_log2 = num_bits.bit_length() - 1

    prev = _put_replicated(mesh, np.zeros(num_bits // 32, np.uint32))
    for gi, g in enumerate(ordered):
        # genome k-mer stream via the LAZY _Stream slicer (w=1 gives
        # k+1 >= k-1 separator codes between contigs, so separator
        # k-mers hash invalid and the inserted k-mer set is exactly the
        # genome's) — the previous np.concatenate of every contig cost
        # a full-genome host copy per genome (~3 GB of fresh pages at
        # mammal scale on a host that faults at ~40 MB/s)
        from ..ops import sketch as sketch_ops

        stream = sketch_ops._Stream(g, k, 1)
        n_kmers = max(stream.total - k + 1, 0)
        if n_kmers == 0:
            if gi > 0:
                prev = jnp.zeros_like(prev)  # empty genome: empty intersection
            continue
        seg = min(seg_max, max(1024, _next_pow2(-(-n_kmers // d))))
        n_segs = _next_pow2(-(-n_kmers // (d * seg)))
        slab_kmers = n_segs * seg
        slab_len = -(-(slab_kmers + k - 1) // 8) * 8

        rows = _slab_rows(stream.slice, stream.total, d, slab_kmers,
                          slab_len - slab_kmers, only_rows=_local_rows(mesh))
        packed2, isn = _pack_rows(rows)
        # resolve the bf_place mode HERE (env + backend + geometry) so
        # it is part of the lru_cache key — resolving inside the cached
        # trace would go stale when NTSYNT_BF_PLACE changes (ADVICE r4)
        place = bf_place.resolve(bits_log2, seg)
        fn = _sharded_bf_level_fn(mesh, k, seg, n_segs, slab_len, bits_log2,
                                  cascade=(gi > 0), place=place)
        prev = fn(_put_sharded(mesh, packed2), _put_sharded(mesh, isn), prev)
    return bloom.DeviceBloomFilter(num_bits, k, words=prev)


def _allreduce_dup(once, axis_name: str = AXIS):
    """All-reduce of the (seen-once, seen-twice) bit-pair monoid over
    per-device seen filters (each device contributes (once_i, 0)):
    (o1, t1) + (o2, t2) = (o1|o2, t1|t2|(o1&o2)). After the reduction
    `twice` holds every bit set in >= 2 devices' filters — the
    cross-slab duplicate evidence the repeat-BF build needs. ppermute
    butterfly for power-of-two meshes (the monoid is associative +
    commutative); the non-pow2 fallback all_gathers `once` alone
    (gathering the pair would materialize 2*D full-filter copies —
    ~6 GB at D=6 with a 2^34-bit filter). Call inside shard_map."""
    d = jax.lax.axis_size(axis_name)
    twice = jnp.zeros_like(once)
    if d == 1:
        return once, twice
    if d & (d - 1) == 0:
        step = 1
        while step < d:
            perm = [(i, i ^ step) for i in range(d)]
            o2 = jax.lax.ppermute(once, axis_name, perm)
            t2 = jax.lax.ppermute(twice, axis_name, perm)
            twice = twice | t2 | (once & o2)
            once = once | o2
            step <<= 1
        return once, twice
    o_all = jax.lax.all_gather(once, axis_name)  # [D, W]
    o_acc = o_all[0]
    t_acc = twice
    for i in range(1, d):
        t_acc = t_acc | (o_acc & o_all[i])
        o_acc = o_acc | o_all[i]
    return o_acc, t_acc


@functools.lru_cache(maxsize=None)
def _sharded_repeat_level_fn(mesh, k: int, seg: int, n_segs: int, slab_len: int,
                             bits_log2: int, place=False):
    """One genome's repeat-BF contribution, data-parallel over the mesh.

    Per device: walk the slab's segments exactly like the single-chip
    builder (ops/bf_build._repeat_stream_fn — within-segment duplicate
    detection by sort, seen-filter probe for earlier occurrences), then
    combine across devices: a k-mer duplicated ACROSS slabs is invisible
    to any single device, so the (once, twice) monoid reduction over the
    per-device seen-filters recovers it (bit b duplicated across slabs
    iff b is set in >= 2 devices' seen words)."""

    def local(packed2_row, isn_row, rep_words):
        from ..ops import bf_build

        slab = _unpack_row(packed2_row[0], isn_row[0])
        nc = seg + k - 1
        n_words = (1 << bits_log2) // 32

        def body(i, carry):
            rep, seen = carry
            tile = jax.lax.dynamic_slice(slab, (i * seg,), (nc,))
            h = nthash.hash_tile(tile, k)
            # duplicate-detection semantics shared with the single-chip
            # builder (ops/bf_build.repeat_segment_update)
            return bf_build.repeat_segment_update(
                rep, seen, h["canon_hi"], h["canon_lo"], h["valid"], bits_log2,
                place=place or False,
            )

        rep0 = jnp.zeros(n_words, jnp.uint32)
        seen0 = jnp.zeros(n_words, jnp.uint32)
        rep, seen = jax.lax.fori_loop(0, n_segs, body, (rep0, seen0))
        _, twice = _allreduce_dup(seen)
        return rep_words | allreduce_or(rep) | twice

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_repeat_bf(genomes, k: int, fpr: float = 0.01, mesh=None,
                          seg_max: int = 1 << 21, bf_bytes=None):
    """Multi-chip repeat-k-mer Bloom filter (k-mers with multiplicity
    >= 2 within any single genome, bin/ntsynt_make_repeat_bfs.py:56-67):
    the mesh analog of ops.bf_build.build_repeat_bf. ONE dispatch per
    genome; slab-local duplicates are found like the single-chip walk
    and cross-slab duplicates through the (once, twice) seen-filter
    reduction."""
    from ..ops import bf_build, sketch as sketch_ops

    mesh = mesh or make_mesh()
    d = int(mesh.devices.size)
    num_bits = bf_build.bf_size_bits(genomes, fpr, bf_bytes)
    bits_log2 = num_bits.bit_length() - 1

    rep = _put_replicated(mesh, np.zeros(num_bits // 32, np.uint32))
    for g in genomes:
        stream = sketch_ops._Stream(g, k, 1)
        n_kmers = max(stream.total - k + 1, 0)
        if n_kmers == 0:
            continue
        seg = min(seg_max, max(1024, _next_pow2(-(-n_kmers // d))))
        n_segs = _next_pow2(-(-n_kmers // (d * seg)))
        slab_kmers = n_segs * seg
        slab_len = -(-(slab_kmers + k - 1) // 8) * 8
        rows = _slab_rows(stream.slice, stream.total, d, slab_kmers,
                          slab_len - slab_kmers, only_rows=_local_rows(mesh))
        packed2, isn = _pack_rows(rows)
        place = bf_place.resolve(bits_log2, seg)
        fn = _sharded_repeat_level_fn(mesh, k, seg, n_segs, slab_len, bits_log2,
                                      place=place)
        rep = fn(_put_sharded(mesh, packed2), _put_sharded(mesh, isn), rep)
    return bloom.DeviceBloomFilter(num_bits, k, words=rep)


# ---------------------------------------------------------------------------
# single-step building blocks (unit-tested primitives; the genome-level
# entry points above compose the same pieces into one-dispatch streams)
# ---------------------------------------------------------------------------


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
        # place=False pinned: this single-step building block's insert
        # size depends on the per-call batch (unknown at cache time), so
        # the mode can't go into the lru_cache key — keep the scatter
        # path instead of resolving at trace time (ADVICE r4)
        local = bloom.insert_words(
            jnp.zeros_like(words), c_hi.reshape(-1), c_lo.reshape(-1),
            kvalid.reshape(-1), bits_log2, place=False,
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
            place=False,  # see sharded_sketch_step: batch-dependent size
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
