"""FASTA input -> packed base-code arrays + contig table.

TPU-native replacement for the reference's file-oriented sequence layer
(btllib SeqReader + `samtools faidx`, /root/repo/SURVEY.md §2.2 items 5-6):
one parse produces

  * ``codes``: uint8 per base, A=0 C=1 G=2 T=3, anything else=4
    (case-insensitive, so soft-masked genomes hash like indexlr's), and
  * ``raw``: the original sequence bytes (needed to emit the ``seq``
    column of sketch TSVs byte-identically), and
  * a contig table equivalent to a `samtools faidx` .fai (name, length,
    byte offset, linebases, linewidth) so we can write a matching .fai
    without shelling out (rule faidx, bin/ntsynt_run_pipeline.smk:48-53).

Supports plain and gzip FASTA. If the optional native helper
(csrc/fastaio.cpp) is built, large plain files are parsed by it.
"""

from dataclasses import dataclass, field
import gzip
import os

import numpy as np

CODE_LUT = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE_LUT[_c] = _i
    CODE_LUT[_c + 32] = _i  # lowercase

_DECODE = np.frombuffer(b"ACGTN", dtype=np.uint8)


@dataclass
class PackedGenome:
    """One genome assembly, packed for device-side sketching."""

    path: str
    name: str  # file basename (used as the assembly key, like the reference)
    contig_names: list
    lengths: np.ndarray  # int64 [n_contigs]
    offsets: np.ndarray  # int64 [n_contigs] start of each contig in `codes`
    codes: np.ndarray  # uint8 [total_bases]
    raw: np.ndarray | None  # uint8 [total_bases] original bytes (or None)
    fai_offsets: np.ndarray  # int64 byte offset of first base in file
    fai_linebases: np.ndarray  # int64 bases per line
    fai_linewidth: np.ndarray  # int64 bytes per line (incl newline)
    masks: dict = field(default_factory=dict)  # scratch: per-round mask codes

    @property
    def n_contigs(self) -> int:
        return len(self.contig_names)

    @property
    def total_bases(self) -> int:
        return int(self.lengths.sum())

    def contig_codes(self, i: int) -> np.ndarray:
        o = int(self.offsets[i])
        return self.codes[o : o + int(self.lengths[i])]

    def contig_raw(self, i: int) -> np.ndarray:
        if self.raw is None:
            return _DECODE[np.minimum(self.contig_codes(i), 4)]
        o = int(self.offsets[i])
        return self.raw[o : o + int(self.lengths[i])]

    def kmer_string(self, contig_idx: int, pos: int, k: int) -> str:
        return self.contig_raw(contig_idx)[pos : pos + k].tobytes().decode()

    def kmer_strings(self, contig_idx: int, positions, k: int) -> list:
        """Batch k-mer decode: one gather + bytes view instead of a
        per-minimizer Python loop (the sketch-TSV writer decodes ~2L/w
        k-mers per genome; the loop's GIL time contended with the
        synteny stage when the writer runs on a background thread)."""
        pos = np.asarray(positions, dtype=np.int64)
        if len(pos) == 0:
            return []
        o = int(self.offsets[contig_idx])
        gather = (o + pos)[:, None] + np.arange(k, dtype=np.int64)[None, :]
        if self.raw is not None:
            mat = self.raw[gather]
        else:
            mat = _DECODE[np.minimum(self.codes[gather], 4)]
        return [s.decode() for s in mat.reshape(-1).view(f"S{k}")]


_NATIVE = None


def _native_lib():
    """Load csrc/libfastaio.so (the OpenMP FASTA packer) if built."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    import ctypes

    lib_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
        "libfastaio.so",
    )
    if not os.path.exists(lib_path):
        _NATIVE = False
        return None
    lib = ctypes.CDLL(lib_path)
    lib.fastaio_parse.restype = ctypes.c_void_p
    lib.fastaio_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
    for fn in ("fastaio_n_contigs", "fastaio_total", "fastaio_names_len"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in (
        "fastaio_lengths",
        "fastaio_offsets",
        "fastaio_fai_offsets",
        "fastaio_fai_linebases",
        "fastaio_fai_linewidth",
    ):
        getattr(lib, fn).restype = ctypes.POINTER(ctypes.c_int64)
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("fastaio_codes", "fastaio_raw"):
        getattr(lib, fn).restype = ctypes.POINTER(ctypes.c_uint8)
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.fastaio_names.restype = ctypes.POINTER(ctypes.c_char)
    lib.fastaio_names.argtypes = [ctypes.c_void_p]
    lib.fastaio_free.restype = None
    lib.fastaio_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "fastaio_build_stream"):
        lib.fastaio_build_stream.restype = None
        lib.fastaio_build_stream.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.fastaio_pack2_nbits.restype = None
        lib.fastaio_pack2_nbits.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int,
        ]
    _NATIVE = lib
    return lib


def pack_stream_native(codes, offsets, lengths, starts, out_len: int, threads: int = 0):
    """Lay contigs out at stream positions ``starts`` inside an
    ``out_len``-byte padded buffer and return its device-upload packing
    (planar 2-bit codes, planar N-bitmap) in one native OpenMP pass.
    Returns None when the native library is unavailable (callers fall
    back to the numpy path in ops/sketch)."""
    lib = _native_lib()
    if lib is None or not hasattr(lib, "fastaio_build_stream") or out_len % 8 != 0:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = len(lengths)
    if n and int(starts[-1]) + int(lengths[-1]) > out_len:
        return None
    buf = np.empty(out_len, dtype=np.uint8)
    lib.fastaio_build_stream(
        codes.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
        starts.ctypes.data, n, buf.ctypes.data, out_len, threads,
    )
    packed2 = np.empty(out_len // 4, dtype=np.uint8)
    nbits = np.empty(out_len // 8, dtype=np.uint8)
    lib.fastaio_pack2_nbits(
        buf.ctypes.data, out_len, packed2.ctypes.data, nbits.ctypes.data, threads
    )
    return packed2, nbits


def _read_fasta_native(path: str, keep_raw: bool, lib, threads: int = 0) -> PackedGenome | None:
    import ctypes

    h = lib.fastaio_parse(path.encode(), threads)
    if not h:
        return None
    try:
        n = int(lib.fastaio_n_contigs(h))
        total = int(lib.fastaio_total(h))

        def arr64(fn):
            ptr = fn(h)
            return np.ctypeslib.as_array(ptr, shape=(n,)).copy() if n else np.zeros(0, np.int64)

        lengths = arr64(lib.fastaio_lengths)
        offsets = arr64(lib.fastaio_offsets)
        fai_off = arr64(lib.fastaio_fai_offsets)
        fai_lb = arr64(lib.fastaio_fai_linebases)
        fai_lw = arr64(lib.fastaio_fai_linewidth)
        names_blob = ctypes.string_at(lib.fastaio_names(h), int(lib.fastaio_names_len(h)))
        names = names_blob.decode().split("\x00")[:-1]
        codes = (
            np.ctypeslib.as_array(lib.fastaio_codes(h), shape=(total,)).copy()
            if total
            else np.zeros(0, np.uint8)
        )
        raw = (
            np.ctypeslib.as_array(lib.fastaio_raw(h), shape=(total,)).copy()
            if (keep_raw and total)
            else (np.zeros(0, np.uint8) if keep_raw else None)
        )
    finally:
        lib.fastaio_free(h)
    return PackedGenome(
        path=path,
        name=os.path.basename(path),
        contig_names=names,
        lengths=lengths.astype(np.int64),
        offsets=offsets.astype(np.int64),
        codes=codes,
        raw=raw,
        fai_offsets=fai_off.astype(np.int64),
        fai_linebases=fai_lb.astype(np.int64),
        fai_linewidth=fai_lw.astype(np.int64),
    )


def read_fasta(path: str, keep_raw: bool = True, native: bool | None = None, threads: int = 0) -> PackedGenome:
    """Parse a FASTA(.gz) file into a PackedGenome.

    Plain (non-gzip) files go through the native OpenMP packer when
    csrc/libfastaio.so is built (native=None auto-detects; native=False
    forces the pure-Python path used as the portable fallback).
    """
    if native is not False and not path.endswith(".gz"):
        lib = _native_lib()
        if lib is not None:
            g = _read_fasta_native(path, keep_raw, lib, threads=threads)
            if g is not None:
                return g
            if native:
                raise IOError(f"native FASTA parse failed for {path}")
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as fin:
            data = fin.read()
    else:
        with open(path, "rb") as fin:
            data = fin.read()

    names, seq_parts = [], []
    lengths, base_offsets = [], []
    fai_off, fai_lb, fai_lw = [], [], []
    cur_parts = None
    byte_pos = 0
    cur_len = 0
    cur_lb = cur_lw = 0
    total = 0

    def _finish():
        nonlocal cur_parts, cur_len, cur_lb, cur_lw, total
        if cur_parts is None:
            return
        lengths.append(cur_len)
        base_offsets.append(total)
        fai_lb.append(cur_lb)
        fai_lw.append(cur_lw)
        total += cur_len
        cur_parts = None

    for line in data.splitlines(keepends=True):
        stripped = line.rstrip(b"\r\n")
        if stripped.startswith(b">"):
            _finish()
            names.append(stripped[1:].split()[0].decode())
            byte_pos += len(line)
            fai_off.append(byte_pos)
            cur_parts = []
            seq_parts.append(cur_parts)
            cur_len = 0
            cur_lb = cur_lw = 0
        else:
            if cur_parts is not None and stripped:
                cur_parts.append(stripped)
                if cur_lb == 0:
                    cur_lb = len(stripped)
                    cur_lw = len(line)
                cur_len += len(stripped)
            byte_pos += len(line)
    _finish()

    raw = np.frombuffer(b"".join(b"".join(p) for p in seq_parts), dtype=np.uint8).copy()
    codes = CODE_LUT[raw]
    return PackedGenome(
        path=path,
        name=os.path.basename(path),
        contig_names=names,
        lengths=np.asarray(lengths, dtype=np.int64),
        offsets=np.asarray(base_offsets, dtype=np.int64),
        codes=codes,
        raw=raw if keep_raw else None,
        fai_offsets=np.asarray(fai_off, dtype=np.int64),
        fai_linebases=np.asarray(fai_lb, dtype=np.int64),
        fai_linewidth=np.asarray(fai_lw, dtype=np.int64),
    )


def write_fai(genome: PackedGenome, out_path: str | None = None) -> str:
    """Write a samtools-compatible .fai for the genome.

    Matches the 5-column format of `samtools faidx`
    (cf. tests/expected_result/*.fai in the reference).
    """
    out_path = out_path or f"{genome.name}.fai"
    with open(out_path, "w", encoding="utf-8") as fout:
        for i, name in enumerate(genome.contig_names):
            fout.write(
                f"{name}\t{genome.lengths[i]}\t{genome.fai_offsets[i]}"
                f"\t{genome.fai_linebases[i]}\t{genome.fai_linewidth[i]}\n"
            )
    return out_path
