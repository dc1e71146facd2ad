"""Device-resident genome sketching with on-device output compaction.

The chunked host-loop path (ops/sketch.py) downloads one argmin per
window — megabytes per chunk across an interconnect whose per-dispatch
and transfer overheads dwarf the actual VPU time. This module keeps the
whole code stream resident in HBM and makes each dispatch return only
the *selected minimizers*:

  1. codes stay in one device buffer; each dispatch dynamic-slices its
     segment (no per-chunk host->device copies),
  2. hashing + block-layout window argmin as usual (ops/nthash,
     ops/winmin),
  3. selection flags = run starts of the per-window argmin sequence
     (argmin is monotone in the window index, so each selected position
     is exactly one run), computed with block-space shifts,
  4. a Pallas kernel compacts each 8-row tile's flagged (position,
     window) pairs into CAP=128 slots using one-hot MXU matmuls —
     stream compaction without any gather/scatter (XLA TPU
     gathers/scatters serialize at ~60M elem/s),
  5. all segments run inside ONE jitted fori_loop dispatch and come
     back in one batched transfer (~0.1 byte/base); the host maps
     positions back through contig tables and exactly recomputes the
     rare tile whose selections overflow CAP (dense repeat regions).

For w < 17 a tile has at most 8*w <= CAP windows, so overflow is
impossible; larger w relies on the run-length structure (typical
selections per tile = 8w * 2/(w+1) ~ 16).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bloom, nthash, winmin

ROW_TILE = 8
SEG_WINDOWS_DEFAULT = 1 << 20  # keep in sync with sketch.DEFAULT_CHUNK

CAP = 128  # selection capacity per tile of ROW_TILE block rows


def _compact_kernel(w: int, wp: int):
    """Per grid cell: one tile of 8 block rows. The tile's flagged lanes
    (row-major order) compact into CAP slots via a tile-wide prefix sum
    + accumulated one-hot MXU matmuls [CAP, wp] @ [wp, 6] producing
    (position, window, hash-half) tuples. The window min hash (= the
    selected k-mer's printed ntHash, see ops/winmin) rides along as four
    16-bit halves — f32 carries <= 2^16 exactly — so the host epilogue
    never re-hashes selected k-mers (_hash_at_positions was ~1.5 s per
    100 Mbp genome of pure host time)."""

    def kernel(flag_ref, val_ref, hi_ref, lo_ref,
               vals_ref, wins_ref, hh_ref, hl_ref, lh_ref, ll_ref, cnt_ref):
        f = flag_ref[:]  # [8, wp] int32 0/1 (garbage lanes pre-zeroed)
        val = val_ref[:]  # [8, wp] int32 argmin positions
        mhi = hi_ref[:]  # [8, wp] uint32 window-min hash high half
        mlo = lo_ref[:]  # [8, wp] uint32 window-min hash low half
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, wp), 1)
        # within-row inclusive prefix sum (log2(wp) lane rolls)
        ps = f
        s = 1
        while s < wp:
            sh = pltpu.roll(ps, s, 1)
            ps = ps + jnp.where(lane < s, 0, sh)
            s <<= 1
        # row offsets: exclusive cumsum of row totals over sublanes
        totals = jnp.broadcast_to(ps[:, wp - 1 : wp], (ROW_TILE, wp))
        rowi = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, wp), 0)
        inc = totals
        s = 1
        while s < ROW_TILE:
            sh = pltpu.roll(inc, s, 0)
            inc = inc + jnp.where(rowi >= s, sh, 0)
            s <<= 1
        ro = inc - totals  # exclusive
        slot = ps - f + ro
        tile = pl.program_id(0)
        # tpu.iota is integer-only; cast afterwards
        cap_iota = jax.lax.broadcasted_iota(jnp.int32, (CAP, wp), 0).astype(jnp.float32)
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (CAP, wp), 1).astype(jnp.float32)
        # 16-bit halves as exact f32 payloads (via int32: u32->f32 is
        # not a single Mosaic cast)
        hi_hi = ((mhi >> 16) & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        hi_lo = (mhi & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        lo_hi = ((mlo >> 16) & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        lo_lo = (mlo & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        out = jnp.zeros((CAP, 6), jnp.float32)
        for r in range(ROW_TILE):
            slot_r = jnp.broadcast_to(slot[r : r + 1].astype(jnp.float32), (CAP, wp))
            f_r = jnp.broadcast_to(f[r : r + 1].astype(jnp.float32), (CAP, wp))
            oh = jnp.where((slot_r == cap_iota) & (f_r > 0), 1.0, 0.0)
            row_base = (tile * ROW_TILE + r) * w
            x = jnp.stack(
                [
                    val[r].astype(jnp.float32),
                    lane_f[0] + jnp.float32(row_base),
                    hi_hi[r],
                    hi_lo[r],
                    lo_hi[r],
                    lo_lo[r],
                ],
                axis=1,
            )  # [wp, 6]
            # HIGHEST precision: the MXU's default bf16 passes round
            # integer payloads > 2^8 (observed on hardware)
            out = out + jnp.dot(
                oh,
                x,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        vals_ref[0, 0, :] = out[:, 0]
        wins_ref[0, 0, :] = out[:, 1]
        hh_ref[0, 0, :] = out[:, 2]
        hl_ref[0, 0, :] = out[:, 3]
        lh_ref[0, 0, :] = out[:, 4]
        ll_ref[0, 0, :] = out[:, 5]
        cnt_ref[0, 0, :] = jnp.broadcast_to(
            inc[ROW_TILE - 1 : ROW_TILE, :1].astype(jnp.float32), (1, 128)
        ).reshape(128)

    return kernel


@functools.lru_cache(maxsize=None)
def _compact_call(nb: int, w: int, wp: int, interpret: bool):
    in_spec = pl.BlockSpec((ROW_TILE, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # 3D outputs [n_tiles, 1, 128]: block (1, 1, 128) satisfies the
    # last-two-dims tiling rule (middle dim equals the array dim)
    out_spec = pl.BlockSpec((1, 1, CAP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    n_tiles = nb // ROW_TILE
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, 1, CAP), jnp.float32) for _ in range(6)
    ] + [jax.ShapeDtypeStruct((n_tiles, 1, 128), jnp.float32)]
    return pl.pallas_call(
        _compact_kernel(w, wp),
        grid=(n_tiles,),
        in_specs=[in_spec] * 4,
        out_specs=[out_spec] * 7,
        out_shape=out_shape,
        interpret=interpret,
    )


def compact_rows(flag, val, min_hi, min_lo, w: int, interpret: bool = False):
    """Tile-wise stream compaction of flagged argmin values.

    Args:
      flag: int32 [nb, wp], 1 where a selected run starts (garbage lanes
        must be 0).
      val: int32 [nb, wp] argmin positions.
      min_hi/min_lo: uint32 [nb, wp] window-min hash halves (the
        selected position's printed hash; garbage where flag == 0).
    Returns (vals f32 [T, CAP], wins f32 [T, CAP], hash_hi u32 [T, CAP],
    hash_lo u32 [T, CAP], counts f32 [T]) with T = ceil(nb / 8) tiles of
    8 block rows (8*w windows each).
    """
    nb, wp = flag.shape
    pad = (-nb) % ROW_TILE
    if pad:
        flag = jnp.pad(flag, ((0, pad), (0, 0)))
        val = jnp.pad(val, ((0, pad), (0, 0)))
        min_hi = jnp.pad(min_hi, ((0, pad), (0, 0)))
        min_lo = jnp.pad(min_lo, ((0, pad), (0, 0)))
    vals, wins, hh, hl, lh, ll, cnt = _compact_call(nb + pad, w, wp, interpret)(
        flag, val, min_hi, min_lo
    )
    hash_hi = (hh[:, 0, :].astype(jnp.uint32) << 16) | hl[:, 0, :].astype(jnp.uint32)
    hash_lo = (lh[:, 0, :].astype(jnp.uint32) << 16) | ll[:, 0, :].astype(jnp.uint32)
    return vals[:, 0, :], wins[:, 0, :], hash_hi, hash_lo, cnt[:, 0, 0]


def _dedupe_pos_hash(pos: np.ndarray, h: np.ndarray):
    """Sort by position and drop duplicates, keeping hashes aligned
    (duplicates carry identical hashes — the hash is a function of the
    position)."""
    if len(pos) == 0:
        return pos.astype(np.int64), h.astype(np.uint64)
    order = np.argsort(pos, kind="stable")
    pos, h = pos[order], h[order]
    new = np.empty(len(pos), dtype=bool)
    new[0] = True
    np.not_equal(pos[1:], pos[:-1], out=new[1:])
    return pos[new], h[new]


def _n_tiles(seg: int, w: int) -> int:
    nk = seg + w - 1
    nb = -(-nk // w)
    return -(-nb // ROW_TILE)


SEG_SLOTS = 4096  # compacted selections per segment (expected ~2*seg/w
# at default density; headroom ~2x; overflow -> host recompute)


@functools.lru_cache(maxsize=None)
def _stream_fn(k: int, w: int, seg: int, segs_cap: int, n_common_log2, n_repeat_log2, interpret: bool):
    """Whole-stream sketcher: ONE dispatch runs a fori_loop over up to
    segs_cap segments (dispatch + transfer round-trips through the
    device tunnel cost ~100 ms each; 24 per genome dominated the wall
    clock before this). Each segment's per-tile CAP slots (mostly
    zeros — expected ~16 real entries per 8*w-window tile) are squeezed
    into SEG_SLOTS entries on device: the result transfer drops from
    ~34 MB to ~4 MB per 100 Mbp genome over the ~10-17 MB/s
    device->host tunnel."""
    seg_fn = _segment_fn(k, w, seg, n_common_log2, n_repeat_log2, interpret)
    tiles = _n_tiles(seg, w)

    @jax.jit
    def run(codes_buf, n_segs, common_words, repeat_words):
        def body(i, acc):
            vals_acc, wins_acc, hi_acc, lo_acc, cnt_acc = acc
            vals, wins, hhi, hlo, cnt = seg_fn(
                codes_buf, i * seg, common_words, repeat_words
            )
            # second-level compaction: scatter each tile's first
            # min(cnt, CAP) slots at its exclusive-prefix offset
            n_tile = jnp.minimum(cnt.astype(jnp.int32), CAP)  # [tiles]
            off = jnp.cumsum(n_tile) - n_tile  # exclusive [tiles]
            lane = jax.lax.broadcasted_iota(jnp.int32, (tiles, CAP), 1)
            ok = lane < n_tile[:, None]
            idx = jnp.where(ok, off[:, None] + lane, SEG_SLOTS).reshape(-1)  # OOB -> drop
            sv = jnp.zeros(SEG_SLOTS, jnp.uint32).at[idx].set(
                vals.astype(jnp.uint32).reshape(-1), mode="drop"
            )
            sw = jnp.zeros(SEG_SLOTS, jnp.uint32).at[idx].set(
                wins.astype(jnp.uint32).reshape(-1), mode="drop"
            )
            shi = jnp.zeros(SEG_SLOTS, jnp.uint32).at[idx].set(
                hhi.reshape(-1), mode="drop"
            )
            slo = jnp.zeros(SEG_SLOTS, jnp.uint32).at[idx].set(
                hlo.reshape(-1), mode="drop"
            )
            vals_acc = jax.lax.dynamic_update_slice(vals_acc, sv[None], (i, 0))
            wins_acc = jax.lax.dynamic_update_slice(wins_acc, sw[None], (i, 0))
            hi_acc = jax.lax.dynamic_update_slice(hi_acc, shi[None], (i, 0))
            lo_acc = jax.lax.dynamic_update_slice(lo_acc, slo[None], (i, 0))
            cnt_acc = jax.lax.dynamic_update_slice(cnt_acc, cnt[None], (i, 0))
            return vals_acc, wins_acc, hi_acc, lo_acc, cnt_acc

        init = (
            jnp.zeros((segs_cap, SEG_SLOTS), jnp.uint32),
            jnp.zeros((segs_cap, SEG_SLOTS), jnp.uint32),
            jnp.zeros((segs_cap, SEG_SLOTS), jnp.uint32),
            jnp.zeros((segs_cap, SEG_SLOTS), jnp.uint32),
            jnp.zeros((segs_cap, tiles), jnp.float32),
        )
        return jax.lax.fori_loop(0, n_segs, body, init)

    return run


@functools.lru_cache(maxsize=None)
def _segment_fn(k: int, w: int, seg: int, n_common_log2, n_repeat_log2, interpret: bool):
    """Per-segment sketcher: device codes buffer -> compacted selected
    minimizer positions (traceable; also jittable standalone)."""
    nk = seg + w - 1
    nc = nk + k - 1

    def run(codes_buf, offset, common_words, repeat_words):
        codes = jax.lax.dynamic_slice(codes_buf, (offset,), (nc,))
        use_pallas = winmin._use_pallas() or interpret
        want_canon = n_common_log2 is not None or n_repeat_log2 is not None
        if use_pallas:
            from . import nthash_pallas

            res = nthash_pallas.hash_keys(
                codes, k, nk, want_canon=want_canon, interpret=interpret
            )
            key_hi, key_lo = res[0], res[1]
            if want_canon:
                canon_hi, canon_lo = res[2], res[3]
        else:
            h = nthash.hash_tile(codes, k)
            valid0 = h["valid"]
            key_hi = jnp.where(valid0, h["out_hi"], winmin.UMAX)
            key_lo = jnp.where(valid0, h["out_lo"], winmin.UMAX)
            canon_hi, canon_lo = h["canon_hi"], h["canon_lo"]
        if want_canon:
            keep = jnp.ones(nk, dtype=bool)
            if n_common_log2 is not None:
                keep = keep & bloom.bf_probe(
                    common_words, canon_hi, canon_lo, n_common_log2
                )
            if n_repeat_log2 is not None:
                keep = keep & ~bloom.bf_probe(
                    repeat_words, canon_hi, canon_lo, n_repeat_log2
                )
            key_hi = jnp.where(keep, key_hi, winmin.UMAX)
            key_lo = jnp.where(keep, key_lo, winmin.UMAX)
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
        # previous of lane 0 is the previous row's lane w-1
        prev = jnp.where(lane == 0, row_up[:, w - 1 : w], prev)
        flag = (live & (arg != prev)).astype(jnp.int32)
        return compact_rows(flag, arg, min_hi, min_lo, w, interpret=interpret)

    return run


class DeviceSketcher:
    """Whole-stream sketching with the genome resident in HBM."""

    def __init__(self, k: int, w: int, seg_windows: int = SEG_WINDOWS_DEFAULT,
                 common_bf=None, repeat_bf=None, interpret: bool = False):
        self.k, self.w = k, w
        self.seg = seg_windows
        self.common_bf = common_bf
        self.repeat_bf = repeat_bf
        self.interpret = interpret
        self._bits = (
            None if common_bf is None else common_bf.bits_log2,
            None if repeat_bf is None else repeat_bf.bits_log2,
        )

    @staticmethod
    def required_len(n_windows: int, k: int, w: int, seg: int) -> int:
        """Minimum code-buffer length for a whole-stream dispatch: the
        last segment's dynamic_slice must be in range."""
        n_segs = -(-max(n_windows, 0) // seg)
        return n_segs * seg + w + k - 2

    def sketch_stream(self, stream_codes: np.ndarray, legit: np.ndarray,
                      dev_buf=None):
        """Return (positions, hashes): sorted unique selected k-mer
        stream positions and their printed ntHash values.

        Args:
          stream_codes: uint8 [L] code stream (contigs + separators).
          legit: bool [n_windows] legit-window mask (host-built).
          dev_buf: optional pre-uploaded uint8 device buffer holding
            stream_codes (padded with 4s to >= required_len) — lets the
            pipeline share ONE upload between BF build and sketching.
        """
        return self.collect_stream(self.dispatch_stream(stream_codes, legit, dev_buf))

    def dispatch_stream(self, stream_codes: np.ndarray, legit: np.ndarray,
                        dev_buf=None):
        """Issue the device dispatch and return a pending handle WITHOUT
        blocking on the result (jax dispatch is async): the pipeline
        dispatches genome i+1 before collecting genome i, overlapping
        genome i's host-side post-processing with i+1's device sweep."""
        k, w, seg = self.k, self.w, self.seg
        nwin = len(legit)
        if nwin <= 0:
            return None
        if dev_buf is not None:
            assert dev_buf.shape[0] >= self.required_len(nwin, k, w, seg)
            dbuf = dev_buf
        else:
            # bucket the length (same scheme as prepare_shared_stream) so
            # refinement-round re-sketches of varying condensed sizes hit
            # the same compiled program, and upload 2-bit packed
            from . import sketch as sketch_host

            need = max(self.required_len(nwin, k, w, seg), len(stream_codes), 1)
            bucket = max(1 << 23, 1 << (max(need - 1, 1).bit_length() - 4))
            need = -(-need // bucket) * bucket
            buf = np.full(need, 4, dtype=np.uint8)
            buf[: len(stream_codes)] = stream_codes
            packed2 = sketch_host._pack_stream_host(buf)
            isn = sketch_host._pack_nbits_host(buf)
            dbuf = sketch_host._unpack_stream_fn(need)(
                jnp.asarray(packed2), jnp.asarray(isn)
            )
        cw = jnp.zeros(1, jnp.uint32) if self.common_bf is None else self.common_bf.words
        rw = jnp.zeros(1, jnp.uint32) if self.repeat_bf is None else self.repeat_bf.words

        # one dispatch for the whole stream (fori_loop over segments),
        # one batched transfer back
        starts = list(range(0, nwin, seg))
        n_segs = len(starts)
        segs_cap = 1 << max(n_segs - 1, 1).bit_length()  # pow2 roundup
        fn = _stream_fn(
            self.k, self.w, seg, segs_cap, self._bits[0], self._bits[1], self.interpret
        )
        out = fn(dbuf, jnp.int32(n_segs), cw, rw)
        return (out, starts, stream_codes, legit)

    def collect_stream(self, pending):
        """Block on a dispatch_stream handle and map the compacted device
        output back to (positions, hashes): sorted unique selected k-mer
        stream positions and their printed ntHash values (from the
        kernel's hash lanes — the host never re-hashes selections)."""
        if pending is None:
            return np.zeros(0, np.int64), np.zeros(0, np.uint64)
        out, starts, stream_codes, legit = pending
        nwin = len(legit)
        all_vals, all_wins, all_hi, all_lo, all_cnt = jax.device_get(out)
        selected = []
        hashes = []
        for si, ws in enumerate(starts):
            cnt = all_cnt[si].astype(np.int64)  # per-tile counts
            n_tile = np.minimum(cnt, CAP)
            off = np.cumsum(n_tile) - n_tile  # device scatter offsets
            m = min(int(n_tile.sum()), SEG_SLOTS)
            v = all_vals[si][:m].astype(np.int64)
            j = all_wins[si][:m].astype(np.int64)
            h = (all_hi[si][:m].astype(np.uint64) << np.uint64(32)) | all_lo[si][:m]
            keep = legit[np.minimum(j + ws, nwin - 1)] & (j + ws < nwin)
            selected.append(v[keep] + ws)
            hashes.append(h[keep])
            # overflow: tile exceeded CAP slots, or its scatter range
            # crossed SEG_SLOTS (entries dropped) -> exact host recompute
            over = (cnt > CAP) | (off + n_tile > SEG_SLOTS)
            if over.any():
                op, oh = self._overflow_tiles(
                    stream_codes, legit, ws, np.where(over)[0]
                )
                selected.append(op)
                hashes.append(oh)
        # A selection run that starts in an ILLEGIT window (the partial
        # windows preceding a contig's first full window) and extends
        # into legit territory is only flagged at its illegit start, so
        # the device path would drop it. The affected value is exactly
        # the argmin of each contig's FIRST legit window — recompute
        # those on the host (n_contigs * w k-mers, negligible).
        first_legit = np.where(legit & ~np.concatenate([[False], legit[:-1]]))[0]
        if len(first_legit):
            fp, fh = self._first_window_argmins(stream_codes, first_legit)
            selected.append(fp)
            hashes.append(fh)
        if not selected:
            return np.zeros(0, np.int64), np.zeros(0, np.uint64)
        return _dedupe_pos_hash(np.concatenate(selected), np.concatenate(hashes))

    def _first_window_argmins(self, stream_codes, window_starts):
        from . import sketch as sketch_host

        k, w = self.k, self.w
        out, outh_l = [], []
        for j0 in window_starts:
            codes = stream_codes[j0 : j0 + w + k - 1]
            canon, outh, valid = nthash.hash_sequence_np(codes, k)
            if self.common_bf is not None and valid.any():
                valid &= sketch_host._probe_np(self.common_bf, canon)
            if self.repeat_bf is not None and valid.any():
                valid &= ~sketch_host._probe_np(self.repeat_bf, canon)
            if not valid.any():
                continue
            keys = np.where(valid, outh, np.uint64(0xFFFFFFFFFFFFFFFF))
            a = int(np.argmin(keys))
            if valid[a]:
                out.append(int(j0) + a)
                outh_l.append(outh[a])
        return np.asarray(out, dtype=np.int64), np.asarray(outh_l, dtype=np.uint64)

    def _overflow_tiles(self, stream_codes, legit, ws: int, tiles: np.ndarray):
        """Host-exact recompute of compaction tiles (8 block rows = 8*w
        windows) whose selections overflowed CAP (dense repeats; rare)."""
        from . import sketch as sketch_host

        k, w = self.k, self.w
        span = ROW_TILE * w
        nwin = len(legit)
        out, out_h = [], []
        for r in tiles:
            j0 = ws + int(r) * span
            j1 = min(j0 + span, ws + self.seg, nwin)
            if j0 >= j1:
                continue
            # windows [j0, j1) need kmers [j0, j1 - 1 + w) -> codes + k - 1
            lo = j0
            hi = j1 - 1 + w + k - 1
            codes = stream_codes[lo:hi]
            canon, outh, valid = nthash.hash_sequence_np(codes, k)
            if self.common_bf is not None:
                valid &= sketch_host._probe_np(self.common_bf, canon)
            if self.repeat_bf is not None:
                valid &= ~sketch_host._probe_np(self.repeat_bf, canon)
            keys = np.where(valid, outh, np.uint64(0xFFFFFFFFFFFFFFFF))
            for j in range(j0, j1):
                if not legit[j]:
                    continue
                win = keys[j - lo : j - lo + w]
                a = int(np.argmin(win))
                if valid[j - lo + a]:
                    out.append(j + a)  # global stream position of the kmer
                    out_h.append(outh[j - lo + a])
        return _dedupe_pos_hash(
            np.asarray(out, dtype=np.int64), np.asarray(out_h, dtype=np.uint64)
        )
