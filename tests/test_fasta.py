"""FASTA parsing: native C++ path vs pure-Python path must agree."""

import gzip

import numpy as np
import pytest

from ntsynt_tpu.io import fasta as fio


CONTENT = (
    ">chr1 some description\n"
    "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n"
    "acgtnNACGT\n"
    ">empty\n"
    ">chr2\n"
    "TTTTGGGGCCCCAAAA\n"
)


@pytest.fixture()
def fa_file(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(CONTENT)
    return str(p)


def test_python_parse(fa_file):
    g = fio.read_fasta(fa_file, native=False)
    assert g.contig_names == ["chr1", "empty", "chr2"]
    assert g.lengths.tolist() == [50, 0, 16]
    assert g.kmer_string(0, 0, 8) == "ACGTACGT"
    # lowercase coded like uppercase, N -> 4
    codes = g.contig_codes(0)
    assert codes[40] == 0 and codes[44] == 4 and codes[45] == 4
    # fai fields: offset of first base, linebases, linewidth
    assert g.fai_offsets[0] == len(">chr1 some description\n")
    assert g.fai_linebases[0] == 40 and g.fai_linewidth[0] == 41


def test_native_matches_python(fa_file):
    if fio._native_lib() is None:
        pytest.skip("native lib not built")
    gp = fio.read_fasta(fa_file, native=False)
    gn = fio.read_fasta(fa_file, native=True)
    assert gn.contig_names == gp.contig_names
    assert (gn.lengths == gp.lengths).all()
    assert (gn.offsets == gp.offsets).all()
    assert (gn.codes == gp.codes).all()
    assert (gn.raw == gp.raw).all()
    assert (gn.fai_offsets == gp.fai_offsets).all()
    assert (gn.fai_linebases == gp.fai_linebases).all()
    assert (gn.fai_linewidth == gp.fai_linewidth).all()


def test_native_matches_python_large(tmp_path):
    if fio._native_lib() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    dec = np.array(list("ACGTN"))
    parts = []
    for i in range(5):
        codes = rng.integers(0, 5, rng.integers(10_000, 50_000))
        s = "".join(dec[codes])
        lines = "\n".join(s[j : j + 61] for j in range(0, len(s), 61))
        parts.append(f">ctg{i} desc {i}\n{lines}\n")
    p = tmp_path / "big.fa"
    p.write_text("".join(parts))
    gp = fio.read_fasta(str(p), native=False)
    gn = fio.read_fasta(str(p), native=True)
    assert gn.contig_names == gp.contig_names
    assert (gn.codes == gp.codes).all()
    assert (gn.raw == gp.raw).all()
    assert (gn.fai_offsets == gp.fai_offsets).all()


def test_gz_roundtrip(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wt") as f:
        f.write(CONTENT)
    g = fio.read_fasta(str(p))
    assert g.contig_names == ["chr1", "empty", "chr2"]
    assert g.lengths.tolist() == [50, 0, 16]


def test_crlf(tmp_path):
    p = tmp_path / "crlf.fa"
    p.write_bytes(CONTENT.replace("\n", "\r\n").encode())
    g = fio.read_fasta(str(p), native=False)
    assert g.lengths.tolist() == [50, 0, 16]
    if fio._native_lib() is not None:
        gn = fio.read_fasta(str(p), native=True)
        assert (gn.codes == g.codes).all()


def test_kmer_strings_batch(fa_file):
    g = fio.read_fasta(fa_file, native=False)
    k = 8
    positions = np.arange(0, 50 - k + 1, 3)
    batch = g.kmer_strings(0, positions, k)
    assert batch == [g.kmer_string(0, int(p), k) for p in positions]
    assert g.kmer_strings(0, np.zeros(0, np.int64), k) == []
    # raw-less genome falls back to code decoding
    g.raw = None
    batch2 = g.kmer_strings(2, np.array([0, 5]), 4)
    assert batch2 == [g.kmer_string(2, 0, 4), g.kmer_string(2, 5, 4)]


def test_pack_stream_native_matches_numpy():
    """fastaio_build_stream + fastaio_pack2_nbits == the numpy reference
    (ops/sketch._pack_stream_host/_pack_nbits_host over the padded
    stream layout)."""
    if fio._native_lib() is None:
        pytest.skip("native library not built")
    from ntsynt_tpu.ops import sketch as sk

    rng = np.random.default_rng(7)
    lengths = np.array([137, 0, 64, 1021], dtype=np.int64)
    codes = rng.integers(0, 5, size=int(lengths.sum()), dtype=np.uint8)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    sep = 31
    starts, pos = [], 0
    for ln in lengths:
        starts.append(pos)
        pos += int(ln) + sep
    starts = np.asarray(starts, dtype=np.int64)
    need = -(-(pos + 100) // 8) * 8
    out = fio.pack_stream_native(codes, offsets, lengths, starts, need)
    assert out is not None
    packed2, nbits = out
    buf = np.full(need, 4, dtype=np.uint8)
    for i, ln in enumerate(lengths):
        buf[starts[i] : starts[i] + int(ln)] = codes[offsets[i] : offsets[i] + int(ln)]
    assert np.array_equal(packed2, sk._pack_stream_host(buf))
    assert np.array_equal(nbits, sk._pack_nbits_host(buf))
