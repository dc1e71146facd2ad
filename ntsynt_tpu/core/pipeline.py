"""End-to-end pipeline: fastas in, synteny-block TSVs out.

Replaces the reference's snakemake DAG (bin/ntsynt_run_pipeline.smk:44-103)
with one in-memory flow, keeping its artifact contract and
resume-from-artifact behavior:

  rule faidx            -> write <basename>.fai
  rule make_common_bf   -> build + save <prefix>.common.bf
  rule make_repeat_bf   -> build + save <prefix>.repeat.bf (experimental)
  rule indexlr          -> sketch + write <basename>.k<k>.w<w>.tsv
  rule ntsynt_synteny   -> SyntenyDetector.run()

Like snakemake's mtime DAG, an existing sketch TSV newer than its
fasta (and the common BF) is reused instead of re-sketched; --force
recomputes everything. Per-stage wall-clock is recorded (the
reference's memusg/time wrappers, .smk:26-35) and written to
<prefix>.time.tsv under --benchmark.
"""

from dataclasses import dataclass
import os

import numpy as np

from ..io import fasta as fio
from ..io import sketch_tsv
from ..ops import bf_build, bloom, sketch as sketch_ops
from ..utils import StageTimer, log, set_verbose
from .assembly import AssemblyMinimizers
from .synteny import SyntenyDetector, SyntenyParams


@dataclass
class PipelineConfig:
    fastas: list
    k: int = 24
    w: int = 1000
    prefix: str | None = None
    fpr: float = 0.025
    block_size: int = 500  # -z
    indel: int = 500  # --bp
    merge: str = "1w"  # --collinear-merge
    w_rounds: tuple = (100, 10)
    n_min_weight: int = 0
    m_orient: float = 90.0
    common: bool = True
    repeat: bool = False  # experimental repeat-BF path
    repeat_filter: str | None = None  # None | 'Filter' | 'Indexlr'
    simplify_graph: bool = True
    benchmark: bool = False
    dev: bool = False
    force: bool = False
    dry_run: bool = False
    write_artifacts: bool = True
    out_dir: str = "."
    threads: int = 0  # host threads for the native FASTA reader (-t)
    chunk: int = sketch_ops.DEFAULT_CHUNK

    def resolved_prefix(self) -> str:
        p = self.prefix or f"ntSynt.k{self.k}.w{self.w}"
        return os.path.join(self.out_dir, p)


class NtSyntTPU:
    """The full ntSynt-equivalent run."""

    def __init__(self, config: PipelineConfig):
        self.cfg = config
        self.timer = StageTimer()
        set_verbose(config.dev)

    # ------------------------------------------------------------------
    def _artifact_fresh(self, artifact: str, *inputs) -> bool:
        """snakemake-style mtime check (bin/ntSynt:155-156 pins
        --rerun-trigger mtime)."""
        if self.cfg.force or not os.path.exists(artifact):
            return False
        amt = os.path.getmtime(artifact)
        return all(os.path.exists(i) and os.path.getmtime(i) <= amt for i in inputs)

    def plan(self):
        """Dry-run description (bin/ntSynt -n)."""
        cfg = self.cfg
        prefix = cfg.resolved_prefix()
        steps = [f"read_fasta + faidx: {f}" for f in cfg.fastas]
        if cfg.common:
            steps.append(f"build_common_bf -> {prefix}.common.bf (fpr={cfg.fpr}, k={cfg.k})")
        if cfg.repeat:
            steps.append(f"build_repeat_bf -> {prefix}.repeat.bf")
        for f in cfg.fastas:
            steps.append(
                f"sketch {os.path.basename(f)} -> "
                f"{os.path.basename(f)}.k{cfg.k}.w{cfg.w}.tsv"
            )
        steps.append(
            f"synteny: w_rounds={list(cfg.w_rounds)} bp={cfg.indel} "
            f"merge={cfg.merge} z={cfg.block_size} -> {prefix}.synteny_blocks.tsv"
        )
        return steps

    # ------------------------------------------------------------------
    def run(self) -> str:
        cfg = self.cfg
        prefix = cfg.resolved_prefix()
        if cfg.dry_run:
            for s in self.plan():
                print(s)
            return ""

        # --- load genomes (rule faidx) --------------------------------
        genomes = {}
        with self.timer.stage("read_fasta"):
            for path in cfg.fastas:
                g = fio.read_fasta(path, threads=cfg.threads)
                genomes[g.name] = g
                if cfg.write_artifacts:
                    fio.write_fai(g, os.path.join(cfg.out_dir, f"{g.name}.fai"))
        if len(genomes) < 2:
            raise ValueError("Must supply at least two genomes to compare")

        # --- Bloom filters (rules make_common_bf / make_repeat_bf) ----
        # .bf artifacts are saved on a background thread: the save is a
        # device->host download of the full bit array (hundreds of MB),
        # which otherwise serializes ~30 s in front of the sketch stage
        common_bf = repeat_bf = None
        save_threads = []
        import threading

        if cfg.common:
            bf_path = f"{prefix}.common.bf"
            with self.timer.stage("make_common_bf"):
                if self._artifact_fresh(bf_path, *cfg.fastas):
                    log(f"Reusing {bf_path}")
                    common_bf = bloom.DeviceBloomFilter.load(bf_path)
                else:
                    common_bf = bf_build.build_common_bf(
                        list(genomes.values()), cfg.k, cfg.fpr, chunk=cfg.chunk
                    )
                    if cfg.write_artifacts:
                        t = threading.Thread(target=common_bf.save, args=(bf_path,))
                        t.start()
                        save_threads.append(t)
        if cfg.repeat:
            rbf_path = f"{prefix}.repeat.bf"
            with self.timer.stage("make_repeat_bf"):
                if self._artifact_fresh(rbf_path, *cfg.fastas):
                    repeat_bf = bloom.DeviceBloomFilter.load(rbf_path)
                else:
                    repeat_bf = bf_build.build_repeat_bf(
                        list(genomes.values()), cfg.k, chunk=cfg.chunk
                    )
                    if cfg.write_artifacts:
                        t = threading.Thread(target=repeat_bf.save, args=(rbf_path,))
                        t.start()
                        save_threads.append(t)

        # --- sketching (rule indexlr) ---------------------------------
        sketch_repeat = repeat_bf if cfg.repeat_filter in ("Indexlr", None) and cfg.repeat else None
        if cfg.repeat_filter == "Filter":
            sketch_repeat = None  # filtering happens at read time instead
        assemblies = {}
        for name, g in genomes.items():
            tsv_path = os.path.join(cfg.out_dir, f"{name}.k{cfg.k}.w{cfg.w}.tsv")
            bf_inputs = [f"{prefix}.common.bf"] if cfg.common and cfg.write_artifacts else []
            rep_filter = None
            if cfg.repeat_filter == "Filter" and repeat_bf is not None:
                rep_filter = lambda canon, bf=repeat_bf: sketch_ops._probe_np(bf, canon)
            if rep_filter is None and self._artifact_fresh(tsv_path, g.path, *bf_inputs):
                # snakemake-style resume: reuse the sketch artifact
                log(f"Reusing {tsv_path}")
                records = sketch_tsv.read_sketch_tsv(tsv_path)
                assemblies[name] = AssemblyMinimizers.from_tsv_records(
                    name, records, genome=g
                )
            else:
                with self.timer.stage(f"sketch:{name}"):
                    sk = sketch_ops.sketch_genome(
                        g,
                        cfg.k,
                        cfg.w,
                        common_bf=common_bf,
                        repeat_bf=sketch_repeat,
                        chunk=cfg.chunk,
                    )
                    if cfg.write_artifacts:
                        recs = []
                        for ci, cname in enumerate(sk.contig_names):
                            mask = sk.contig_idx == ci
                            seqs = [
                                g.kmer_string(ci, int(p), cfg.k)
                                for p in sk.positions[mask]
                            ]
                            recs.append((cname, sk.hashes[mask], sk.positions[mask], seqs))
                        sketch_tsv.write_sketch_tsv(tsv_path, recs)
                assemblies[name] = AssemblyMinimizers.from_sketch(
                    sk, genome=g, repeat_canon_filter=rep_filter
                )
            log(f"{name}: {len(assemblies[name].mx_info.sorted_hash)} minimizers kept")

        # --- core synteny (rule ntsynt_synteny) -----------------------
        params = SyntenyParams(
            k=cfg.k,
            w=cfg.w,
            n=cfg.n_min_weight,
            m=cfg.m_orient,
            z=cfg.block_size,
            bp=cfg.indel,
            collinear_merge=cfg.merge,
            w_rounds=tuple(cfg.w_rounds),
            simplify_graph=cfg.simplify_graph,
            dev=cfg.dev,
            prefix=prefix,
            common_bf=common_bf,
            repeat_bf=sketch_repeat,
            chunk=cfg.chunk,
        )
        with self.timer.stage("synteny"):
            detector = SyntenyDetector(assemblies, params)
            out = detector.run()

        for t in save_threads:  # background .bf saves must land on disk
            t.join()
        if cfg.benchmark:
            self.timer.write_tsv(f"{prefix}.time.tsv")
            log("Stage timings:", self.timer.as_json())
        return out
