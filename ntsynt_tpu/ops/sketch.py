"""Minimizer sketching of whole genomes on TPU (indexlr replacement).

This is the pipeline's #1 hot kernel (see /root/repo/SURVEY.md §2.2 item 2
and BASELINE.json's Gbp/s/chip metric). It replaces the btllib ``indexlr``
binary (flags ``-k -w --long --seq --pos [-s common.bf] [-r repeat.bf]``,
bin/ntsynt_run_pipeline.smk:85) and the per-refinement-round re-invocation
(ntjoin_utils.run_indexlr, bin/ntsynt_synteny.py:173-182) with an
in-memory, device-resident computation:

  1. All contigs of a genome are concatenated into one code *stream* with
     (w+k) N-code separators, so k-mers and windows can never straddle a
     contig boundary; a host-side "legit window" interval set marks the
     windows that exist in per-contig semantics.
  2. Fixed-size chunks of the stream are hashed (ops/nthash.hash_tile)
     and swept with the two-pass sliding argmin (ops/winmin) under jit —
     one compiled executable per (k, w, chunk, filters) regardless of
     contig count or genome size.
  3. Optional common-BF ("solid", -s) and repeat-BF (-r) filters are
     fused into validity before window selection, exactly where indexlr
     applies them.
  4. Selected stream positions are deduped and mapped back to
     (contig, position); output hash values are the printed/ordering
     ntHash values, positions are 0-based k-mer starts.

Contigs with fewer than w+k-1 bases get a host-side fallback pass (one
window over all their k-mers) so short contigs are not dropped.
"""

from dataclasses import dataclass
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bloom, nthash, winmin
from ..utils import log

DEFAULT_CHUNK = 1 << 20  # windows per device segment. Measured best on
# the v5e: larger segments (2^22) made the Bloom-filter build ~2x slower
# (lax.sort cost grows super-linearly) without helping the sketch; the
# per-segment dispatch overhead is already amortized by the fori_loop
# single-dispatch stream.


@dataclass
class GenomeSketch:
    """Minimizer sketch of one genome."""

    name: str  # assembly key (genome file basename)
    k: int
    w: int
    contig_names: list
    # per-minimizer flat arrays, ordered by (contig, position):
    contig_idx: np.ndarray  # int32 [m]
    positions: np.ndarray  # int64 [m] 0-based k-mer starts
    hashes: np.ndarray  # uint64 [m] printed/ordering hash
    canon: np.ndarray  # uint64 [m] canonical hash (BF key)

    @property
    def n_minimizers(self) -> int:
        return len(self.positions)

    def per_contig(self):
        """Yield (contig_name, hashes, positions) per contig in order."""
        for ci, name in enumerate(self.contig_names):
            m = self.contig_idx == ci
            yield name, self.hashes[m], self.positions[m]

    def subset(self, keep: np.ndarray) -> "GenomeSketch":
        """New sketch restricted to the boolean mask `keep`."""
        return GenomeSketch(
            name=self.name, k=self.k, w=self.w, contig_names=self.contig_names,
            contig_idx=self.contig_idx[keep], positions=self.positions[keep],
            hashes=self.hashes[keep], canon=self.canon[keep],
        )


class _StreamCodesView:
    """Lazy ndarray-like view of a _Stream's code buffer supporting only
    len() and slicing — what DeviceSketcher's host-exact recomputes
    (first-window argmins, overflow tiles) need. Lets the device path
    skip the full concatenated host copy when the upload already went
    through the native packer."""

    def __init__(self, stream: "_Stream"):
        self._stream = stream

    def __len__(self) -> int:
        return self._stream.total

    def __getitem__(self, key):
        if isinstance(key, slice):
            lo, hi, step = key.indices(self._stream.total)
            assert step == 1
            return self._stream.slice(lo, hi)
        return self._stream.slice(key, key + 1)[0]


class _Stream:
    """A genome's contigs packed into one code stream with separators."""

    def __init__(self, genome, k: int, w: int, codes: np.ndarray | None = None):
        self.genome = genome
        self.k, self.w = k, w
        sep = w + k  # windows can never span two contigs
        self._src = genome.codes if codes is None else codes
        self._codes = None  # materialized lazily: the device path packs
        # straight from (src, offsets, starts) in native code and never
        # needs the 100 MB concatenated copy
        starts, pos = [], 0
        for i in range(genome.n_contigs):
            starts.append(pos)
            pos += int(genome.lengths[i]) + sep
        self.starts = np.asarray(starts, dtype=np.int64)
        self.total = pos

    @property
    def codes(self) -> np.ndarray:
        if self._codes is None:
            g = self.genome
            buf = np.full(self.total, 4, dtype=np.uint8)
            for i in range(g.n_contigs):
                o, ln = int(g.offsets[i]), int(g.lengths[i])
                s = int(self.starts[i])
                buf[s : s + ln] = self._src[o : o + ln]
            self._codes = buf if self.total else np.zeros(0, np.uint8)
        return self._codes

    def slice(self, lo: int, hi: int) -> np.ndarray:
        """Codes [lo, hi) of the stream without materializing the whole
        buffer (separator/padding positions read as 4)."""
        lo, hi = max(int(lo), 0), min(int(hi), self.total)
        if hi <= lo:
            return np.zeros(0, np.uint8)
        out = np.full(hi - lo, 4, dtype=np.uint8)
        g = self.genome
        i = max(int(np.searchsorted(self.starts, lo, side="right")) - 1, 0)
        while i < len(self.starts) and int(self.starts[i]) < hi:
            s, ln, o = int(self.starts[i]), int(g.lengths[i]), int(g.offsets[i])
            a, b = max(lo, s), min(hi, s + ln)
            if b > a:
                out[a - lo : b - lo] = self._src[o + (a - s) : o + (b - s)]
            i += 1
        return out

    def codes_view(self) -> "_StreamCodesView":
        return _StreamCodesView(self)

    def legit_windows(self) -> np.ndarray:
        """bool [n_windows_stream]: windows fully inside one contig."""
        k, w = self.k, self.w
        nwin = max(self.total - (w + k - 1) + 1, 0)
        legit = np.zeros(nwin, dtype=bool)
        for i in range(len(self.starts)):
            ln = int(self.genome.lengths[i])
            nk = ln - k + 1
            if nk >= w:
                s = int(self.starts[i])
                legit[s : s + nk - w + 1] = True
        return legit

    def short_contigs(self):
        """Indices of contigs with at least one k-mer but fewer than w."""
        k, w = self.k, self.w
        return [
            i
            for i in range(self.genome.n_contigs)
            if 1 <= int(self.genome.lengths[i]) - k + 1 < w
        ]

    def to_contig_pos(self, stream_pos: np.ndarray):
        idx = np.searchsorted(self.starts, stream_pos, side="right") - 1
        return idx.astype(np.int32), stream_pos - self.starts[idx]


@functools.lru_cache(maxsize=None)
def _sketch_chunk_fn(k: int, w: int, chunk: int, n_common_log2, n_repeat_log2):
    """Compiled chunk kernel: codes tile -> per-window (argmin, valid)."""
    nk = chunk + w - 1  # k-mers needed
    nc = nk + k - 1  # codes needed

    @jax.jit
    def run(codes_tile, common_words, repeat_words):
        assert codes_tile.shape == (nc,)
        h = nthash.hash_tile(codes_tile, k)
        valid = h["valid"]
        if n_common_log2 is not None:
            valid = valid & bloom.bf_probe(
                common_words, h["canon_hi"], h["canon_lo"], n_common_log2
            )
        if n_repeat_log2 is not None:
            valid = valid & ~bloom.bf_probe(
                repeat_words, h["canon_hi"], h["canon_lo"], n_repeat_log2
            )
        key_hi = jnp.where(valid, h["out_hi"], winmin.UMAX)
        key_lo = jnp.where(valid, h["out_lo"], winmin.UMAX)
        # block-layout outputs: the host flattens with numpy, which is
        # far cheaper than the (w-1)-lane relayout XLA would need
        arg, min_hi, min_lo = winmin.sliding_block_argmin(key_hi, key_lo, w)
        # window is valid iff its min is not the +inf sentinel (avoids a
        # big valid[arg] gather, which serializes on TPU)
        win_valid = ~((min_hi == winmin.UMAX) & (min_lo == winmin.UMAX))
        return arg, win_valid

    return run


def sketch_genome(
    genome,
    k: int,
    w: int,
    common_bf=None,
    repeat_bf=None,
    chunk: int = DEFAULT_CHUNK,
    codes: np.ndarray | None = None,
    engine: str | None = None,
    prepared=None,
) -> GenomeSketch:
    """Compute the (k, w) minimizer sketch of a genome.

    Args:
      genome: io.fasta.PackedGenome.
      k, w: sketching parameters.
      common_bf: optional DeviceBloomFilter; keep only minimizers whose
        k-mer is in it (indexlr -s semantics).
      repeat_bf: optional DeviceBloomFilter; drop k-mers in it (-r).
      chunk: windows per device call (static shape).
      codes: optional override of genome.codes (used by refinement
        rounds to sketch a masked copy without duplicating the genome).
      engine: 'device' (HBM-resident stream + on-device compaction —
        default on TPU), 'chunk' (per-chunk host loop — default
        elsewhere), or None for auto.
      prepared: optional (stream, legit, dev_buf) triple from
        prepare_shared_stream — reuses the pipeline's single upload of
        the genome's code stream (shared with the BF builders) instead
        of rebuilding and re-uploading it here.
    """
    return sketch_genome_collect(
        sketch_genome_dispatch(
            genome, k, w,
            common_bf=common_bf, repeat_bf=repeat_bf, chunk=chunk,
            codes=codes, engine=engine, prepared=prepared,
        )
    )


def sketch_genome_dispatch(
    genome, k, w, common_bf=None, repeat_bf=None, chunk=DEFAULT_CHUNK,
    codes=None, engine=None, prepared=None,
):
    """Phase 1 of sketch_genome: build/acquire the code stream and issue
    the device dispatch WITHOUT blocking on its result (jax dispatch is
    async). The pipeline dispatches genome i+1 before collecting genome
    i so i's host-side post-processing (contig mapping, hash recompute,
    TSV prep) overlaps i+1's device sweep. Host engines (numpy/chunk)
    run eagerly here. Finish with sketch_genome_collect."""
    dev_buf = None
    if prepared is not None:
        stream, legit, dev_buf = prepared
    else:
        stream = _Stream(genome, k, w, codes=codes)
        legit = stream.legit_windows()
    nwin = len(legit)

    if engine is None:
        if jax.default_backend() == "tpu":
            # tiny streams (refinement-round condensed genomes) are
            # dispatch-latency bound on device; sketch them on the host
            engine = "numpy" if (nwin <= NUMPY_MAX_WINDOWS and prepared is None) else "device"
        else:
            engine = "chunk"
    if isinstance(common_bf, bloom.HostModBloomFilter) or isinstance(
        repeat_bf, bloom.HostModBloomFilter
    ):
        # non-pow2 (reference-built btllib) filters probe h % num_bits
        # exactly on host; the device kernels' mask-modulo fast path
        # requires pow2, so the whole sketch runs the host formulation
        engine = "numpy"

    sel = pending = sketcher = None
    if engine == "numpy":
        sel = _sketch_numpy(stream, legit, k, w, common_bf, repeat_bf)
    elif engine == "device" and nwin > 0:
        from .sketch_device import DeviceSketcher

        sketcher = DeviceSketcher(
            k, w, seg_windows=chunk, common_bf=common_bf, repeat_bf=repeat_bf
        )
        stream_codes = stream.codes_view() if dev_buf is not None else stream.codes
        pending = sketcher.dispatch_stream(stream_codes, legit, dev_buf=dev_buf)
    else:
        sel = _sketch_chunked(stream, legit, k, w, chunk, common_bf, repeat_bf)
    return dict(
        genome=genome, k=k, w=w, common_bf=common_bf, repeat_bf=repeat_bf,
        codes=codes, stream=stream, sel=sel, pending=pending, sketcher=sketcher,
    )


def sketch_genome_collect(handle) -> GenomeSketch:
    """Phase 2 of sketch_genome: block on the device result (if any) and
    run the host-side epilogue (position mapping, short-contig
    fallback). The device engine returns the selected k-mers' printed
    hashes from its compaction kernel's hash lanes, so the epilogue
    inverts the nte64 mix (ops/nthash.unmix_np) instead of re-hashing
    every selection (~1.5 s of host table-XOR per 100 Mbp genome);
    host engines still recompute via _hash_at_positions."""
    genome, k, w = handle["genome"], handle["k"], handle["w"]
    common_bf, repeat_bf = handle["common_bf"], handle["repeat_bf"]
    codes, stream = handle["codes"], handle["stream"]
    if handle["sketcher"] is not None:
        sel, selh = handle["sketcher"].collect_stream(handle["pending"])
    else:
        sel, selh = handle["sel"], None

    cidx, cpos = stream.to_contig_pos(sel)

    # short-contig fallback (one window over all k-mers), host-side
    extra_ci, extra_pos, extra_h = [], [], []
    for i in stream.short_contigs():
        o, ln = int(genome.offsets[i]), int(genome.lengths[i])
        ccodes = (genome.codes if codes is None else codes)[o : o + ln]
        canon, out, valid = nthash.hash_sequence_np(ccodes, k)
        if common_bf is not None:
            valid = valid & _probe_np(common_bf, canon)
        if repeat_bf is not None:
            valid = valid & ~_probe_np(repeat_bf, canon)
        if valid.any():
            keys = np.where(valid, out, np.uint64(0xFFFFFFFFFFFFFFFF))
            a = int(np.argmin(keys))
            extra_ci.append(i)
            extra_pos.append(a)
            extra_h.append(out[a])
    if extra_ci:
        cidx = np.concatenate([cidx, np.asarray(extra_ci, np.int32)])
        cpos = np.concatenate([cpos, np.asarray(extra_pos, np.int64)])
        order = np.lexsort((cpos, cidx))
        cidx, cpos = cidx[order], cpos[order]
        if selh is not None:
            selh = np.concatenate([selh, np.asarray(extra_h, np.uint64)])[order]

    if selh is not None:
        hashes = selh
        canon = nthash.unmix_np(hashes, k)
    else:
        canon, hashes = _hash_at_positions(genome, k, cidx, cpos, codes=codes)
    return GenomeSketch(
        name=genome.name,
        k=k,
        w=w,
        contig_names=list(genome.contig_names),
        contig_idx=cidx,
        positions=cpos,
        hashes=hashes,
        canon=canon,
    )


def _pack_stream_host(buf: np.ndarray) -> np.ndarray:
    """2-bit-pack a code buffer (len divisible by 4) in PLANAR layout:
    byte b holds codes [b, b+n/4, b+2n/4, b+3n/4]. Interleaved layout
    would force the device unpack through a [n/4, 4] intermediate whose
    minor dim TPU tiling pads 4->128 (a 32x memory blowup — observed as
    a 32 GB allocation at 1 Gbp); planar unpack is pure 1-D
    concatenation. Code 4 packs as 0 and is restored from the separate
    N-bitmap."""
    v = (buf & 3).reshape(4, -1)
    return v[0] | (v[1] << 2) | (v[2] << 4) | (v[3] << 6)


def _pack_nbits_host(buf: np.ndarray) -> np.ndarray:
    """Planar 1-bit pack of the N/separator mask (len divisible by 8)."""
    m = (buf == 4).astype(np.uint8).reshape(8, -1)
    out = m[0]
    for j in range(1, 8):
        out = out | (m[j] << j)
    return out


@functools.lru_cache(maxsize=None)
def _unpack_stream_fn(out_len: int):
    """codes[i] = 4 if N-bit set else 2-bit code (1-D VPU ops only)."""
    assert out_len % 8 == 0

    @jax.jit
    def run(packed2, isn_bits):
        p = packed2
        # planar layout: plane j holds positions [j*len/4, (j+1)*len/4)
        codes = jnp.concatenate([p & 3, (p >> 2) & 3, (p >> 4) & 3, (p >> 6) & 3])
        b = isn_bits
        isn = jnp.concatenate([(b >> j) & 1 for j in range(8)])
        return jnp.where(isn != 0, jnp.uint8(4), codes.astype(jnp.uint8))

    return run


def prepare_shared_stream(genome, k: int, w: int, seg_windows: int = DEFAULT_CHUNK,
                          bf_chunk: int | None = None, codes: np.ndarray | None = None):
    """Build a genome's code stream ONCE and upload it ONCE, padded so
    the same device buffer serves both the BF builders' fixed-shape
    segment walk and the sketcher's whole-stream dispatch (each 100 Mbp
    upload costs seconds over the device tunnel; previously BF build and
    sketching uploaded separate copies).

    Returns (stream, legit, dev_buf, n_segs_bf). Separator/padding
    k-mers hash invalid, so the BF walk over the sketch-layout stream
    inserts exactly the genome's k-mer set (see bf_build docstring).
    """
    from . import bf_build
    from .sketch_device import DeviceSketcher

    if bf_chunk is None:
        bf_chunk = bf_build.DEFAULT_CHUNK
    stream = _Stream(genome, k, w, codes=codes)
    legit = stream.legit_windows()
    n_kmers = max(stream.total - k + 1, 0)
    n_segs_bf = bf_build.stream_segments(n_kmers, bf_chunk)
    need = max(
        DeviceSketcher.required_len(len(legit), k, w, seg_windows),
        n_segs_bf * bf_chunk + k - 1,
        stream.total,
        1,
    )
    # bucket the buffer length so genomes of similar size hit the same
    # compiled program (padding k-mers are invalid no-ops; first
    # compiles cost minutes over the device tunnel): round up to a
    # multiple of max(8 MB, need/16) => <= ~6% wasted upload
    bucket = max(1 << 23, 1 << (max(need - 1, 1).bit_length() - 4))
    need = -(-need // bucket) * bucket
    # upload 2-bit-packed codes + a 1-bit N/separator bitmap (37.5 MB
    # per 100 Mbp instead of 100 MB — host->device runs ~30-70 MB/s over
    # the tunnel) and reconstruct the uint8 code buffer on device
    from ..io import fasta as fio

    native = fio.pack_stream_native(
        stream._src, genome.offsets, genome.lengths, stream.starts, need
    )
    if native is not None:
        packed2, isn = native
    else:
        buf = np.full(need, 4, dtype=np.uint8)
        buf[: stream.total] = stream.codes
        packed2 = _pack_stream_host(buf)
        isn = _pack_nbits_host(buf)
    dev_buf = _unpack_stream_fn(need)(jnp.asarray(packed2), jnp.asarray(isn))
    return stream, legit, dev_buf, n_segs_bf


def _pack2_nbits(buf: np.ndarray):
    """Planar 2-bit pack + N-bitmap of a code buffer (native OpenMP pass
    when available, numpy otherwise)."""
    from ..io import fasta as fio

    lib = fio._native_lib()
    if lib is not None and hasattr(lib, "fastaio_pack2_nbits") and len(buf) % 8 == 0:
        packed2 = np.empty(len(buf) // 4, dtype=np.uint8)
        nbits = np.empty(len(buf) // 8, dtype=np.uint8)
        lib.fastaio_pack2_nbits(
            buf.ctypes.data, len(buf), packed2.ctypes.data, nbits.ctypes.data, 0
        )
        return packed2, nbits
    return _pack_stream_host(buf), _pack_nbits_host(buf)


@functools.lru_cache(maxsize=None)
def _dus_fn(total: int, glen: int, keep: int):
    """Write a group's first ``keep`` codes into the assembled buffer.

    ``off`` must be uint32: multi-Gbp streams put group offsets past
    2^31 (int32 overflow raised at 2x3 Gbp), and uint32 dynamic-slice
    starts index correctly on the TPU up to 2^32
    (scratch/tpu_bigbuf_probe.py)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(big, grp, off):
        return jax.lax.dynamic_update_slice(big, grp[:keep], (off,))

    return run


class ChunkedSharedStream:
    """Chunk-pipelined shared code stream.

    prepare_shared_stream uploads a genome's whole packed stream before
    anything can be dispatched on it, which leaves the FIRST genome's
    upload (~9 s/Gbp over the 30-70 MB/s tunnel) fully serial — nothing
    is queued ahead of it (later genomes' uploads already hide under the
    previous cascade level's async dispatch). This class slices the
    stream into groups of ``group_segs`` BF segments and exposes them as
    an iterator: the BF builder dispatches each group's inserts as it
    arrives, so group g+1's host pack + H2D transfer overlap group g's
    device inserts (transfers overlap queued compute on this tunnel —
    measured, scratch/tpu_overlap_micro.py). Each group is also
    dynamic-update-sliced into one assembled device buffer that then
    serves the sketcher exactly like prepare_shared_stream's dev_buf.
    Group walk order matches the monolithic fori segment order, so the
    resulting filters are bit-identical.
    """

    def __init__(self, genome, k: int, w: int, seg_windows: int = DEFAULT_CHUNK,
                 bf_chunk: int | None = None, codes: np.ndarray | None = None,
                 group_segs: int = 8):
        from . import bf_build
        from .sketch_device import DeviceSketcher

        if bf_chunk is None:
            bf_chunk = bf_build.DEFAULT_CHUNK
        self.k, self.w = k, w
        self.bf_chunk = bf_chunk
        self.stream = _Stream(genome, k, w, codes=codes)
        self.legit = self.stream.legit_windows()
        n_kmers = max(self.stream.total - k + 1, 0)
        self.n_segs_bf = bf_build.stream_segments(n_kmers, bf_chunk)
        self.group_segs = max(min(group_segs, self.n_segs_bf), 1)
        self.n_groups = -(-max(self.n_segs_bf, 1) // self.group_segs)
        need = max(
            DeviceSketcher.required_len(len(self.legit), k, w, seg_windows),
            self.n_groups * self.group_segs * bf_chunk + k - 1,
            self.stream.total,
            1,
        )
        bucket = max(1 << 23, 1 << (max(need - 1, 1).bit_length() - 4))
        self.need = -(-need // bucket) * bucket
        glen = self.group_segs * bf_chunk + k - 1
        self.glen = -(-glen // 8) * 8  # pack alignment
        self._big = None
        self._next_group = 0

    @property
    def dev_buf(self):
        assert self._next_group >= self.n_groups, "groups not fully consumed"
        return self._big

    def _upload_group(self, g: int):
        """Pack + upload group g, fold it into the assembled buffer, and
        return (group device buffer, segments in the group)."""
        if self._big is None:
            # separator code 4 everywhere (device fill, no host buffer)
            self._big = jnp.full(self.need, jnp.uint8(4))
        a = g * self.group_segs * self.bf_chunk
        buf = self.stream.slice(a, a + self.glen)
        if len(buf) < self.glen:
            buf = np.concatenate(
                [buf, np.full(self.glen - len(buf), 4, np.uint8)]
            )
        packed2, isn = _pack2_nbits(buf)
        grp = _unpack_stream_fn(self.glen)(jnp.asarray(packed2), jnp.asarray(isn))
        keep = min(self.group_segs * self.bf_chunk, self.need - a)
        self._big = _dus_fn(self.need, self.glen, keep)(
            self._big, grp, jnp.uint32(a)
        )
        n_segs = min(self.group_segs, self.n_segs_bf - g * self.group_segs)
        return grp, max(n_segs, 0)

    def bf_groups(self):
        """Iterator of (group codes device buffer, n_segments) for the
        BF cascade walk. Must be consumed in order and exactly once."""
        assert self._next_group == 0, "bf_groups already consumed"
        for g in range(self.n_groups):
            self._next_group = g + 1
            yield self._upload_group(g)

    def ensure_assembled(self):
        """Consume any remaining groups (upload + assemble only) so
        dev_buf is complete — the path taken when the BF stage was
        skipped (artifact reuse, --no-common)."""
        while self._next_group < self.n_groups:
            g = self._next_group
            self._next_group = g + 1
            self._upload_group(g)
        if self._big is None:
            self._big = jnp.full(self.need, jnp.uint8(4))
        return self._big


NUMPY_MAX_WINDOWS = 1 << 21  # auto-use the host engine below this size


def _np_sliding_argmin(keys: np.ndarray, w: int) -> np.ndarray:
    """Leftmost-tie sliding argmin over u64 keys, O(n) via the same
    two-pass block scheme as the device kernel (ops/winmin.py):
    window [j, j+w) argmin = leftmost-min of (block-suffix at j,
    next-block-prefix at j+w-1), suffix side winning ties."""
    n = len(keys)
    nw = n - w + 1
    if nw <= 0:
        return np.zeros(0, np.int64)
    umax = np.uint64(0xFFFFFFFFFFFFFFFF)
    nb = -(-n // w) + 1  # +1 so block b+1 always exists
    K = np.full(nb * w, umax, dtype=np.uint64)
    K[:n] = keys
    K = K.reshape(nb, w)
    cols = np.arange(w, dtype=np.int64)
    # leftmost prefix argmin per (block, col)
    pref = np.minimum.accumulate(K, axis=1)
    new = np.empty((nb, w), dtype=bool)
    new[:, 0] = True
    new[:, 1:] = K[:, 1:] < pref[:, :-1]
    pref_arg = np.maximum.accumulate(np.where(new, cols[None, :], -1), axis=1)
    # leftmost suffix argmin per (block, col): scan right->left, ties
    # move the argmin LEFT (<=)
    Kr = K[:, ::-1]
    prefr = np.minimum.accumulate(Kr, axis=1)
    suf = prefr[:, ::-1]
    newr = np.empty((nb, w), dtype=bool)
    newr[:, 0] = True
    newr[:, 1:] = Kr[:, 1:] <= prefr[:, :-1]
    lastr = np.maximum.accumulate(np.where(newr, cols[None, :], -1), axis=1)
    suf_arg = (w - 1) - lastr[:, ::-1]
    # combine per window j = b*w + c
    j = np.arange(nw, dtype=np.int64)
    b, c = j // w, j % w
    e = j + w - 1
    eb, ec = e // w, e % w
    sufv = suf[b, c]
    prefv = pref[eb, ec]
    take_suf = sufv <= prefv
    arg = np.where(take_suf, b * w + suf_arg[b, c], eb * w + pref_arg[eb, ec])
    return arg


def _sketch_numpy(stream, legit, k, w, common_bf, repeat_bf):
    """Host-vectorized sketching for small streams (refinement-round
    condensed genomes): avoids per-call device dispatch latency; BF
    probes (if any) are single batched device calls. Produces exactly
    the device/chunk engines' selections (leftmost ties)."""
    nwin = len(legit)
    canon, out, valid = nthash.hash_sequence_np(stream.codes, k)
    if len(out) == 0:
        return np.zeros(0, np.int64)
    if (common_bf is not None or repeat_bf is not None) and valid.any():
        valid = valid & _probe_stream_np(common_bf, repeat_bf, stream.codes, k)
    keys = np.where(valid, out, np.uint64(0xFFFFFFFFFFFFFFFF))
    arg = _np_sliding_argmin(keys, w)[:nwin]
    ok = legit[: len(arg)] & valid[arg]
    if not ok.any():
        return np.zeros(0, np.int64)
    return np.unique(arg[ok]).astype(np.int64)


def _sketch_chunked(stream, legit, k, w, chunk, common_bf, repeat_bf):
    """Per-chunk host-loop sketching (CPU default / fallback path)."""
    nwin = len(legit)
    sel_stream = []
    cw = jnp.zeros(1, jnp.uint32) if common_bf is None else common_bf.words
    rw = jnp.zeros(1, jnp.uint32) if repeat_bf is None else repeat_bf.words
    fn = _sketch_chunk_fn(
        k,
        w,
        chunk,
        None if common_bf is None else common_bf.bits_log2,
        None if repeat_bf is None else repeat_bf.bits_log2,
    )

    nc_need = chunk + w - 1 + k - 1
    w_eff = min(w, chunk + w - 1)  # kernel window (w <= n kmers always here)
    for ws in range(0, max(nwin, 0), chunk):
        tile = stream.codes[ws : ws + nc_need]
        if len(tile) < nc_need:
            tile = np.concatenate([tile, np.full(nc_need - len(tile), 4, np.uint8)])
        arg_b, valid_b = fn(jnp.asarray(tile), cw, rw)
        # block layout [nb, wp] -> flat windows [chunk] on host
        arg_b = np.asarray(arg_b)
        valid_b = np.asarray(valid_b)
        if w_eff > 1:
            arg = arg_b[:, :w_eff].reshape(-1)[:chunk]
            win_valid = valid_b[:, :w_eff].reshape(-1)[:chunk]
        else:
            arg = arg_b.reshape(-1)[:chunk]
            win_valid = valid_b.reshape(-1)[:chunk]
        lg = legit[ws : ws + chunk]
        if len(lg) < chunk:
            lg = np.concatenate([lg, np.zeros(chunk - len(lg), bool)])
        keep = lg & win_valid
        if keep.any():
            sel_stream.append(np.unique(arg[keep]).astype(np.int64) + ws)

    if sel_stream:
        return np.unique(np.concatenate(sel_stream))
    return np.zeros(0, dtype=np.int64)


@functools.lru_cache(maxsize=None)
def _probe_stream_fn(k: int, n_codes: int, common_log2, repeat_log2):
    """Fused device probe over a packed code stream: unpack -> ntHash ->
    BF probe(s) -> 1-bit-packed verdicts. One dispatch; the wire carries
    2-bit codes in and packed bits out instead of 16 B/k-mer of hashes
    in and 1 B/k-mer of bools out (the host->device tunnel runs
    ~30-70 MB/s, so hash uploads dominated refinement-round probes)."""
    assert n_codes % 8 == 0
    n_kmers = n_codes - k + 1
    n_out = -(-n_kmers // 8) * 8

    @jax.jit
    def run(packed2, isn_bits, common_words, repeat_words):
        p = packed2
        codes = jnp.concatenate([p & 3, (p >> 2) & 3, (p >> 4) & 3, (p >> 6) & 3])
        b = isn_bits
        isn = jnp.concatenate([(b >> j) & 1 for j in range(8)])
        codes = jnp.where(isn != 0, jnp.uint8(4), codes.astype(jnp.uint8))
        h = nthash.hash_tile(codes, k)
        hi, lo = h["canon_hi"], h["canon_lo"]
        ok = jnp.ones(hi.shape, dtype=bool)
        if common_log2 is not None:
            ok = ok & bloom.bf_probe(common_words, hi, lo, common_log2)
        if repeat_log2 is not None:
            ok = ok & ~bloom.bf_probe(repeat_words, hi, lo, repeat_log2)
        planes = jnp.pad(ok, (0, n_out - n_kmers)).reshape(8, n_out // 8)
        byte = planes[0].astype(jnp.uint8)
        for j in range(1, 8):
            byte = byte | (planes[j].astype(jnp.uint8) << j)
        return byte

    return run


def _probe_stream_np(common_bf, repeat_bf, codes: np.ndarray, k: int) -> np.ndarray:
    """Probe every k-mer of a host code stream against the common/repeat
    filters on device. Returns bool[n_kmers]: passes (-s and -r fused).
    Results at positions whose k-mer spans an N/separator are garbage —
    the caller masks them with its own validity."""
    n_kmers = len(codes) - k + 1
    if n_kmers <= 0:
        return np.zeros(0, dtype=bool)
    if isinstance(common_bf, bloom.HostModBloomFilter) or isinstance(
        repeat_bf, bloom.HostModBloomFilter
    ):
        # non-pow2 filter(s): hash + probe entirely on host
        canon, _, _ = nthash.hash_sequence_np(codes, k)
        ok = np.ones(n_kmers, dtype=bool)
        if common_bf is not None:
            ok &= _probe_np(common_bf, canon)
        if repeat_bf is not None:
            ok &= ~_probe_np(repeat_bf, canon)
        return ok
    # pow2 bucketing bounds distinct compiled shapes (padding codes are
    # N, whose k-mers probe to garbage and get sliced off)
    n_codes = max(1 << 14, 1 << (len(codes) - 1).bit_length())
    buf = np.full(n_codes, 4, dtype=np.uint8)
    buf[: len(codes)] = codes
    dummy = jnp.zeros(1, dtype=jnp.uint32)
    fn = _probe_stream_fn(
        k,
        n_codes,
        None if common_bf is None else common_bf.bits_log2,
        None if repeat_bf is None else repeat_bf.bits_log2,
    )
    bits = np.asarray(
        fn(
            jnp.asarray(_pack_stream_host(buf)),
            jnp.asarray(_pack_nbits_host(buf)),
            dummy if common_bf is None else common_bf.words,
            dummy if repeat_bf is None else repeat_bf.words,
        )
    )
    planes = [(bits >> j) & 1 for j in range(8)]
    return (np.concatenate(planes) != 0)[:n_kmers]


def _probe_np(bf, canon: np.ndarray) -> np.ndarray:
    """Host-side probe of a DeviceBloomFilter (tiny batches only) or a
    HostModBloomFilter (exact h % num_bits, stays on host).

    Device batches are zero-padded to a pow2 length: refinement rounds
    probe with a different batch size each round/genome/run, and every
    fresh shape would recompile bf_probe (~0.35 s per compile over the
    device tunnel — measured as the bulk of a cold synteny stage). Pow2
    bucketing bounds the distinct shapes to ~log2(range)."""
    if isinstance(bf, bloom.HostModBloomFilter):
        return bf.probe_np(canon)
    n = len(canon)
    if n == 0:
        return np.zeros(0, dtype=bool)
    bucket = max(1 << 14, 1 << (n - 1).bit_length())
    hi = np.zeros(bucket, dtype=np.uint32)
    lo = np.zeros(bucket, dtype=np.uint32)
    hi[:n] = (canon >> np.uint64(32)).astype(np.uint32)
    lo[:n] = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return np.asarray(bf.probe(jnp.asarray(hi), jnp.asarray(lo)))[:n]


def _hash_at_positions(genome, k: int, cidx, cpos, codes=None):
    """Recompute (canon, out) hashes for selected k-mer positions (host)."""
    m = len(cpos)
    if m == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    src = genome.codes if codes is None else codes
    starts = genome.offsets[cidx] + cpos
    gather = starts[:, None] + np.arange(k)[None, :]
    kmers = src[gather]  # [m, k]
    tf, tr = nthash.hash_tables(k)
    f = np.zeros(m, np.uint64)
    r = np.zeros(m, np.uint64)
    for j in range(k):
        f ^= tf[j][kmers[:, j]]
        r ^= tr[j][kmers[:, j]]
    canon = f + r
    t = canon * np.uint64(nthash.mix_multiplier(k))
    out = t ^ (t >> np.uint64(nthash.MULTISHIFT))
    return canon, out


# ---------------------------------------------------------------------------
# Pure NumPy oracle (tests)
# ---------------------------------------------------------------------------


def sketch_contig_np(ccodes: np.ndarray, k: int, w: int, common=None, repeat=None):
    """Reference implementation for one contig: returns sorted minimizer
    positions. `common`/`repeat` are NumpyBloomFilter or None."""
    canon, out, valid = nthash.hash_sequence_np(ccodes, k)
    n = len(out)
    if n == 0 or not valid.any():
        return np.zeros(0, np.int64)
    if common is not None:
        valid &= common.probe(canon)
    if repeat is not None:
        valid &= ~repeat.probe(canon)
    keys = np.where(valid, out, np.uint64(0xFFFFFFFFFFFFFFFF))
    w_eff = min(w, n)
    sel = set()
    for j in range(n - w_eff + 1):
        win = keys[j : j + w_eff]
        a = int(np.argmin(win)) + j
        if valid[a]:
            sel.add(a)
    return np.asarray(sorted(sel), dtype=np.int64)
