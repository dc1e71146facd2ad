"""Standalone BF-builder CLIs (ntsynt_tpu/make_bf.py) end-to-end.

Mirrors the reference's standalone tools: ntsynt_make_common_bf
(src/ntsynt_make_common_bf.cpp) and ntsynt_make_repeat_bfs.py."""

import numpy as np
import pytest

from ntsynt_tpu import make_bf
from ntsynt_tpu.ops import nthash
from ntsynt_tpu.ops.bloom import DeviceBloomFilter
from ntsynt_tpu.ops.sketch import _probe_np

DEC = np.array(list("ACGT"))


def _write_fasta(path, codes):
    s = "".join(DEC[codes])
    with open(path, "w", encoding="utf-8") as f:
        f.write(">chr1\n")
        f.write("\n".join(s[i : i + 70] for i in range(0, len(s), 70)) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def fastas(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("make_bf")
    rng = np.random.default_rng(3)
    a = rng.integers(0, 4, 8_000).astype(np.uint8)
    b = a.copy()
    b[2_000:3_000] = rng.integers(0, 4, 1_000)  # diverged region
    # a repeat: duplicate a 200 bp slab inside genome a
    a2 = np.concatenate([a, a[100:300]])
    return _write_fasta(tmp / "a.fa", a2), _write_fasta(tmp / "b.fa", b), a, b, a2


def test_common_bf_cli(fastas, tmp_path, monkeypatch):
    fa, fb, a, b, a2 = fastas
    monkeypatch.chdir(tmp_path)
    k = 24
    assert make_bf.common_main(["--genome", fb, fa, "-k", str(k), "-p", "cmn"]) == 0
    bf = DeviceBloomFilter.load("cmn.bf")
    assert bf.k == k
    # a k-mer from the shared prefix must be present; one from b's
    # diverged region must (almost surely) be absent
    shared = nthash.hash_sequence_np(a[:200], k)[0]
    assert _probe_np(bf, shared).all()
    div = nthash.hash_sequence_np(b[2_300:2_500], k)[0]
    assert not _probe_np(bf, div).all()


def test_repeat_bf_cli(fastas, tmp_path, monkeypatch):
    fa, fb, a, b, a2 = fastas
    monkeypatch.chdir(tmp_path)
    k = 24
    assert make_bf.repeat_main(["--genome", fa, "-k", str(k), "-p", "rep", "--bf", "64k"]) == 0
    bf = DeviceBloomFilter.load("rep.bf")
    # k-mers inside the duplicated slab are multiplicity-2 -> in the BF
    dup = nthash.hash_sequence_np(a[120:280], k)[0]
    assert _probe_np(bf, dup).all()
    # unique k-mers (outside the slab) are multiplicity-1 -> not all set
    uniq = nthash.hash_sequence_np(a[4_000:4_200], k)[0]
    assert not _probe_np(bf, uniq).all()


def test_parse_bf_size():
    assert make_bf.parse_bf_size("512B") == 512
    assert make_bf.parse_bf_size("3k") == 3_000
    assert make_bf.parse_bf_size("2M") == 2_000_000
    assert make_bf.parse_bf_size("1G") == 1_000_000_000
    with pytest.raises(Exception):
        make_bf.parse_bf_size("12q")
