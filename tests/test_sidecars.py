"""Analysis + viz sidecar tests on a small synthetic blocks TSV."""

import io
import os

from ntsynt_tpu.analysis.stats import compute_stats
from ntsynt_tpu.viz import (
    sort_blocks,
    write_chromosome_painting,
    write_links,
    write_sequence_lengths,
)

BLOCKS = """0\ta.fa\tchr1\t0\t50000\t+\t100\tNone
0\tb.fa\tchr1\t0\t50000\t+\t100\tNone
1\ta.fa\tchr1\t60000\t90000\t+\t60\tindel
1\tb.fa\tchr1\t61000\t91000\t-\t60\tindel
2\ta.fa\tchr2\t0\t5000\t+\t10\tid_change
2\tb.fa\tchr2\t0\t5000\t+\t10\tid_change
"""


def _write_inputs(tmp_path):
    tsv = tmp_path / "blocks.tsv"
    tsv.write_text(BLOCKS)
    for name, ctgs in [("a.fa", [("chr1", 100000), ("chr2", 6000)]),
                       ("b.fa", [("chr1", 101000), ("chr2", 6000)])]:
        with open(tmp_path / f"{name}.fai", "w") as f:
            for c, ln in ctgs:
                f.write(f"{c}\t{ln}\t0\t70\t71\n")
    return str(tsv)


def test_stats(tmp_path):
    tsv = _write_inputs(tmp_path)
    fais = [str(tmp_path / "a.fa.fai"), str(tmp_path / "b.fa.fai")]
    s = compute_stats(tsv, fais)
    assert s["Number_blocks"] == 3
    assert s["Number_blocks_all_asm"] == 3
    assert s["Total_length"] == 85000.0
    # coverage: a: 85000/106000, b: 85000/107000, averaged
    assert 75 < s["Average_coverage"] < 85
    # half of ~106kb = 53kb; cum 50000 -> 80000 crosses at the 30kb block
    assert s["NG50_length"] == 30000


def test_sort_blocks(tmp_path):
    tsv = _write_inputs(tmp_path)
    lines = sort_blocks(tsv, ["b.fa", "a.fa"])
    assert lines[0].split("\t")[1] == "b.fa"
    assert lines[1].split("\t")[1] == "a.fa"
    assert len(lines) == 6


def test_gggenomes_files(tmp_path):
    tsv = _write_inputs(tmp_path)
    fais = [str(tmp_path / "a.fa.fai"), str(tmp_path / "b.fa.fai")]
    seq = write_sequence_lengths(fais, str(tmp_path / "viz"))
    links = write_links(tsv, str(tmp_path / "viz"), min_length=10000, colour_assembly="a.fa")
    seq_lines = open(seq).read().strip().split("\n")
    assert seq_lines[0] == "bin_id\tseq_id\tlength"
    assert len(seq_lines) == 5  # header + 2 contigs x 2 assemblies
    link_lines = open(links).read().strip().split("\n")
    # blocks 0 and 1 pass the 10kb filter; block 2 (5kb) doesn't
    assert len(link_lines) == 3
    # inverted block 1 must carry relative strand '-'
    assert any(l.split("\t")[9] == "-" for l in link_lines[1:])


def test_chromosome_painting(tmp_path):
    tsv = _write_inputs(tmp_path)
    out = write_chromosome_painting(tsv, "a.fa", str(tmp_path / "paint.tsv"))
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 4  # header + 3 blocks x 1 other assembly
    # block 1 has opposite strands -> relative ori '-'
    row1 = [l for l in lines[1:] if l.split("\t")[0] == "1"][0]
    assert row1.split("\t")[5] == "-"


def test_plots(tmp_path):
    tsv = _write_inputs(tmp_path)
    fais = [str(tmp_path / "a.fa.fai"), str(tmp_path / "b.fa.fai")]
    seq = write_sequence_lengths(fais, str(tmp_path / "viz"))
    links = write_links(tsv, str(tmp_path / "viz"), min_length=1000)
    paint = write_chromosome_painting(tsv, "a.fa", str(tmp_path / "paint.tsv"))
    from ntsynt_tpu.viz.plot import painting_plot, ribbon_plot

    p1 = ribbon_plot(seq, links, str(tmp_path / "ribbon.png"))
    p2 = painting_plot(paint, str(tmp_path / "paint.png"))
    assert os.path.getsize(p1) > 5000
    assert os.path.getsize(p2) > 5000


def test_run_core_cli_from_tsvs(tmp_path):
    """ntsynt-tpu-run: core stage from existing sketch TSVs (parity with
    bin/ntsynt_run.py), exercising the TSV-input path end to end."""
    import numpy as np

    import sys

    sys.path.insert(0, str(tmp_path))
    from ntsynt_tpu.io.fasta import read_fasta
    from ntsynt_tpu.io.sketch_tsv import write_sketch_tsv
    from ntsynt_tpu.ops.sketch import sketch_genome
    from ntsynt_tpu.run_core import main as run_main

    rng = np.random.default_rng(3)
    dec = np.array(list("ACGT"))
    base = rng.integers(0, 4, 60_000)
    mut = base.copy()
    mut[20_000:30_000] = mut[20_000:30_000][::-1] ^ 3
    for name, g in [("ra.fa", base), ("rb.fa", mut)]:
        s = "".join(dec[g])
        (tmp_path / name).write_text(
            ">c1\n" + "\n".join(s[i : i + 70] for i in range(0, len(s), 70)) + "\n"
        )
    k, w = 24, 100
    tsvs = []
    for name in ("ra.fa", "rb.fa"):
        g = read_fasta(str(tmp_path / name))
        sk = sketch_genome(g, k, w, chunk=1 << 14)
        recs = []
        for ci, cname in enumerate(sk.contig_names):
            m = sk.contig_idx == ci
            seqs = [g.kmer_string(ci, int(p), k) for p in sk.positions[m]]
            recs.append((cname, sk.hashes[m], sk.positions[m], seqs))
        tsv = tmp_path / f"{name}.k{k}.w{w}.tsv"
        write_sketch_tsv(str(tsv), recs)
        tsvs.append(str(tsv))

    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = run_main(
            tsvs
            + [
                "--fastas",
                str(tmp_path / "ra.fa"),
                str(tmp_path / "rb.fa"),
                "-k",
                str(k),
                "-w",
                str(w),
                "--w-rounds",
                "50",
                "10",
                "--bp",
                "500",
                "--collinear-merge",
                "3000",
                "-z",
                "500",
                "-p",
                "core_out",
            ]
        )
    finally:
        os.chdir(cwd)
    assert rc == 0
    rows = open(tmp_path / "core_out.synteny_blocks.tsv").read().strip().split("\n")
    assert len(rows) >= 4  # at least 2 blocks x 2 assemblies (inversion)
    assert any("\t-\t" in r for r in rows)  # the inversion strand
    assert (tmp_path / "core_out.mx.dot").exists()


def test_viz_clis(tmp_path, capsys):
    tsv = _write_inputs(tmp_path)
    fais = [str(tmp_path / "a.fa.fai"), str(tmp_path / "b.fa.fai")]
    from ntsynt_tpu.viz.cli import gggenomes_main, painting_main, sort_blocks_main

    assert sort_blocks_main(["--synteny_blocks", tsv, "--sort_order", "b.fa", "a.fa"]) == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert out[0].split("\t")[1] == "b.fa"

    assert sort_blocks_main(["--synteny_blocks", tsv, "--sort_order", *fais, "--fais"]) == 0

    prefix = str(tmp_path / "gv")
    assert gggenomes_main(["--fai", *fais, "--blocks", tsv, "-p", prefix, "-l", "1000"]) == 0
    assert os.path.exists(prefix + ".links.tsv")

    outp = str(tmp_path / "pt.tsv")
    assert painting_main([tsv, "--target", "a.fa", "-o", outp]) == 0
    assert os.path.exists(outp)

def test_write_links_streaming_semantics(tmp_path):
    """Pin the reference's exact streaming quirks
    (format_blocks_gggenomes.py:26-61):
      * colour_block = last-seen colour-assembly chrom at flush time,
        carried ACROSS blocks (a block with no colour row inherits it);
      * the inversion flag ignores the block's first row;
      * the EOF flush reuses the block_type of the PREVIOUS boundary.
    """
    tsv = tmp_path / "b.tsv"
    # block 0: colour row (a.fa) on chrX; block 1: NO a.fa row (inherits
    # chrX); block 2: first row is '-' but later rows '+' -> block_ori
    # '+' at its own boundary; EOF block 3 genuinely inverted but must
    # print block 2's type '+' (stale EOF flush).
    tsv.write_text(
        "0\ta.fa\tchrX\t0\t50000\t+\n"
        "0\tb.fa\tchr1\t0\t50000\t+\n"
        "1\tb.fa\tchr2\t0\t50000\t+\n"
        "1\tc.fa\tchr2\t0\t50000\t+\n"
        "2\tb.fa\tchr3\t0\t50000\t-\n"
        "2\tc.fa\tchr3\t0\t50000\t+\n"
        "3\tb.fa\tchr4\t0\t50000\t+\n"
        "3\tc.fa\tchr4\t0\t50000\t-\n"
    )
    links = write_links(str(tsv), str(tmp_path / "v"), min_length=10000,
                        colour_assembly="a.fa")
    rows = [l.split("\t") for l in open(links).read().strip().split("\n")[1:]]
    by_id = {r[0]: r for r in rows}
    assert by_id["0"][11] == "chrX"
    assert by_id["1"][11] == "chrX"  # carried across blocks
    assert by_id["2"][10] == "+"     # first-row '-' exempt from the flag
    assert by_id["2"][9] == "-"      # rel strand: '+' row vs prev '-' row
    assert by_id["3"][10] == "+"     # EOF flush reuses block 2's type
    assert by_id["3"][9] == "-"      # but the rel strand is its own


def test_write_links_single_block_no_crash(tmp_path):
    """Single-block file: the reference would NameError (block_type never
    assigned before the EOF flush); we compute it fresh instead."""
    tsv = tmp_path / "b.tsv"
    tsv.write_text(
        "0\ta.fa\tchr1\t0\t50000\t+\n"
        "0\tb.fa\tchr1\t0\t50000\t-\n"
    )
    links = write_links(str(tsv), str(tmp_path / "v"), min_length=10000)
    rows = [l.split("\t") for l in open(links).read().strip().split("\n")[1:]]
    assert len(rows) == 1 and rows[0][10] == "-"


def test_run_core_cli_repeat_filter_modes(tmp_path):
    """--filter {Filter,Indexlr} with --repeat (bin/ntsynt_run.py:21-23):
    'Filter' drops TSV minimizers whose canonical k-mer hash probes the
    repeat BF at load time; 'Indexlr' threads the BF into refinement
    re-sketches. Both must run end to end; Filter must actually drop
    repeat-tandem minimizers."""
    import numpy as np

    from ntsynt_tpu.core.assembly import AssemblyMinimizers
    from ntsynt_tpu.io.fasta import read_fasta
    from ntsynt_tpu.io.sketch_tsv import read_sketch_tsv, write_sketch_tsv
    from ntsynt_tpu.ops.bf_build import build_repeat_bf
    from ntsynt_tpu.ops.nthash import unmix_np
    from ntsynt_tpu.ops import sketch as sketch_ops
    from ntsynt_tpu.run_core import main as run_main

    rng = np.random.default_rng(11)
    dec = np.array(list("ACGT"))
    base = rng.integers(0, 4, 60_000)
    # plant an exact tandem repeat so the repeat BF is non-trivial
    base[40_000:42_000] = base[38_000:40_000]
    mut = base.copy()
    mut[20_000:30_000] = mut[20_000:30_000][::-1] ^ 3
    for name, g in [("fa.fa", base), ("fb.fa", mut)]:
        s = "".join(dec[g])
        (tmp_path / name).write_text(
            ">c1\n" + "\n".join(s[i : i + 70] for i in range(0, len(s), 70)) + "\n"
        )
    k, w = 24, 100
    genomes = [read_fasta(str(tmp_path / n)) for n in ("fa.fa", "fb.fa")]
    rep = build_repeat_bf(genomes, k)
    rep_path = str(tmp_path / "rep.bf")
    rep.save(rep_path)

    tsvs = []
    for g, name in zip(genomes, ("fa.fa", "fb.fa")):
        sk = sketch_ops.sketch_genome(g, k, w, chunk=1 << 14)
        recs = []
        for ci, cname in enumerate(sk.contig_names):
            m = sk.contig_idx == ci
            seqs = [g.kmer_string(ci, int(p), k) for p in sk.positions[m]]
            recs.append((cname, sk.hashes[m], sk.positions[m], seqs))
        tsv = tmp_path / f"{name}.k{k}.w{w}.tsv"
        write_sketch_tsv(str(tsv), recs)
        tsvs.append(str(tsv))

    # unit: the load-time Filter mask drops the tandem-repeat minimizers
    recs = read_sketch_tsv(tsvs[0])
    probe = lambda out_h: sketch_ops._probe_np(rep, unmix_np(out_h, k))
    plain = AssemblyMinimizers.from_tsv_records("fa.fa", recs, genome=genomes[0])
    filt = AssemblyMinimizers.from_tsv_records(
        "fa.fa", recs, genome=genomes[0], repeat_out_filter=probe
    )
    assert len(filt.mx_info.sorted_hash) < len(plain.mx_info.sorted_hash)

    # --filter requires --repeat
    import pytest
    with pytest.raises(ValueError):
        run_main(tsvs + ["--fastas", str(tmp_path / "fa.fa"), str(tmp_path / "fb.fa"),
                         "-k", str(k), "-w", str(w), "--filter", "Filter"])

    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for mode in ("Filter", "Indexlr"):
            rc = run_main(
                tsvs
                + ["--fastas", str(tmp_path / "fa.fa"), str(tmp_path / "fb.fa"),
                   "-k", str(k), "-w", str(w), "--w-rounds", "50", "10",
                   "--filter", mode, "--repeat", rep_path,
                   "-p", f"flt_{mode}"]
            )
            assert rc == 0
            rows = open(tmp_path / f"flt_{mode}.synteny_blocks.tsv").read().strip()
            assert rows and any("\t-\t" in r for r in rows.split("\n"))
    finally:
        os.chdir(cwd)
