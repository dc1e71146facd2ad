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

from dataclasses import dataclass, replace
import os

import numpy as np

from ..io import fasta as fio
from ..io import sketch_tsv
from ..ops import bf_build, bloom, sketch as sketch_ops
from ..utils import StageTimer, log, set_verbose
from .assembly import AssemblyMinimizers
from .synteny import SyntenyDetector, SyntenyParams


def _is_bf_stub(path: str) -> bool:
    """True if ``path`` is a BF resume stub (JSON marker) rather than a
    byte-complete DeviceBloomFilter container."""
    try:
        with open(path, "rb") as fin:
            return fin.read(32).lstrip().startswith(b'{"magic": "ntsynt_tpu_bf_stub"')
    except OSError:
        return False


def _write_bf_stub(path: str, bf, cfg) -> None:
    """Write a resume stub in place of the full bit array: on this
    interconnect the 0.5 GB download (~9 MB/s) plus the re-upload on
    resume both lose to a deterministic on-device rebuild, so the stub
    carries only the parameters (its mtime anchors the snakemake-style
    freshness chain, like the reference's on-disk .bf)."""
    import json

    header = dict(
        magic="ntsynt_tpu_bf_stub",
        num_bits=bf.num_bits,
        k=bf.k,
        hash_fns=1,
        fastas=[os.path.abspath(f) for f in cfg.fastas],
        note="bit array not materialized; rebuilt deterministically on device at resume",
    )
    with open(path, "w") as fout:
        json.dump(header, fout)
        fout.write("\n")


@dataclass
class PipelineConfig:
    fastas: list
    k: int = 24
    w: int = 1000
    prefix: str | None = None
    fpr: float = 0.025
    bf_bytes: int | None = None  # force the common-BF byte size (else
    # sized from fpr by the reference formula; the 2^35-bit HBM cap can
    # raise effective FPR at multi-Gbp scale — see tests/test_e2e.py
    # test_capped_bf_block_quality for the measured block-level effect)
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
    bf_artifact: str = "stub"  # "stub" (resume marker; rebuild on device) | "full" (byte-complete .bf)
    use_mesh: bool = False  # shard BF build + sketching over all visible devices
    out_dir: str = "."
    threads: int = 0  # host threads for the native FASTA reader (-t)
    chunk: int = sketch_ops.DEFAULT_CHUNK

    def resolved_prefix(self) -> str:
        p = self.prefix or f"ntSynt.k{self.k}.w{self.w}"
        return os.path.join(self.out_dir, p)


class _LazyGenomes:
    """Dict-like name -> PackedGenome that reads each FASTA on first
    access (timed as a read_fasta:<name> stage, .fai emitted alongside).
    Gigabase reads cost ~20 s/Gbp of host wall on the dev VM; deferring
    them lets the BF cascade's lazy entries hide genome i+1's read
    under level i's async device dispatch."""

    def __init__(self, runner, path_of: dict):
        import threading

        self._runner = runner
        self._paths = dict(path_of)
        self._loaded = {}
        # per-name locks: the background prefetch thread (see
        # prefetch_async) and the pipeline may read DIFFERENT genomes
        # concurrently, while a race on the SAME genome serializes into
        # one read (the loser returns the winner's object)
        self._locks = {n: threading.Lock() for n in path_of}

    def __getitem__(self, name):
        if name not in self._loaded:
            with self._locks[name]:
                if name in self._loaded:  # lost the race: already read
                    return self._loaded[name]
                runner, cfg = self._runner, self._runner.cfg
                with runner.timer.stage(f"read_fasta:{name}"):
                    g = fio.read_fasta(self._paths[name], threads=cfg.threads)
                    if cfg.write_artifacts:
                        fio.write_fai(g, os.path.join(cfg.out_dir, f"{g.name}.fai"))
                self._loaded[name] = g
        return self._loaded[name]

    def prefetch_async(self, order):
        """Read genomes on a daemon thread in ``order``. The lazy
        entries already hide genome i+1's read under cascade level i's
        device dispatch, but the read then runs on the MAIN thread
        between dispatches — in degraded device windows the blocking
        reads (15-40 s/Gbp of fresh-page faults) extend the BF stage
        wall directly. A prefetch thread overlaps the reads with the
        main thread's pack/upload work and with each other."""
        import threading

        def run():
            for n in order:
                self[n]

        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t

    def __iter__(self):
        return iter(self._paths)

    def __len__(self):
        return len(self._paths)

    def values(self):
        return [self[n] for n in self._paths]

    def items(self):
        return [(n, self[n]) for n in self._paths]


class NtSyntTPU:
    """The full ntSynt-equivalent run."""

    def __init__(self, config: PipelineConfig):
        self.cfg = config
        self.timer = StageTimer(sample_memory=config.benchmark)
        set_verbose(config.dev)
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()

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
        # multi-host runs (parallel/multihost.py): all ranks compute
        # identical results; only rank 0 touches the shared filesystem
        try:
            import jax

            is_rank0 = jax.process_index() == 0
        except Exception:
            is_rank0 = True
        if not is_rank0:
            cfg = self.cfg = replace(cfg, write_artifacts=False, benchmark=False)

        # --- load genomes (rule faidx), LAZILY -------------------------
        # Reading a gigabase FASTA costs ~20 s of host wall on the dev
        # VM (mmap + fresh-page faults); reads after the first happen
        # inside the BF cascade's lazy entry callables, so genome i+1's
        # read/pack overlaps level i's (async) device dispatch.
        names = [os.path.basename(p) for p in cfg.fastas]
        path_of = dict(zip(names, cfg.fastas))
        if len(set(names)) != len(names):
            raise ValueError(
                "duplicate genome file basenames (the basename is the "
                f"assembly key, like the reference): {sorted(names)}"
            )
        if len(names) < 2:
            raise ValueError("Must supply at least two genomes to compare")
        genomes = _LazyGenomes(self, path_of)
        # background read-ahead in cascade (path-sorted) order; the
        # main thread's own access patterns are unchanged — it just
        # finds genomes already loaded (or joins an in-flight read)
        genomes.prefetch_async(sorted(names, key=lambda n: path_of[n]))

        # --- shared code-stream uploads --------------------------------
        # One host->device upload per genome, shared by the BF builders
        # and the sketcher (uploads run ~30-45 MB/s over the device
        # tunnel; BF build + sketch each uploading their own copy used
        # to double that cost). The upload is CHUNK-PIPELINED: the BF
        # cascade consumes the stream in groups, so each group's pack +
        # transfer overlaps the previous group's insert dispatches —
        # this is what hides the FIRST genome's upload, which nothing
        # else can cover (later genomes already hide under the previous
        # level's async dispatch).
        prepared = {}

        def _prepared(name):
            if name not in prepared:
                prepared[name] = sketch_ops.ChunkedSharedStream(
                    genomes[name], cfg.k, cfg.w,
                    seg_windows=cfg.chunk, bf_chunk=bf_build.DEFAULT_CHUNK,
                )
            return prepared[name]

        # --- Bloom filters (rules make_common_bf / make_repeat_bf) ----
        # The .bf artifact is a resume stub by default (bf_artifact=
        # "stub"): downloading the 0.5 GB bit array runs at ~9 MB/s over
        # the device tunnel (~55 s) and re-UPLOADING it on resume is
        # slower than the ~8 s deterministic on-device rebuild, so
        # materializing the bits loses on both sides. bf_artifact="full"
        # restores byte-complete .bf files (saved AFTER sketching so the
        # download never contends with sketch dispatches).
        common_bf = repeat_bf = None
        save_threads = []
        artifact_threads = []
        import threading

        if cfg.common:
            bf_path = f"{prefix}.common.bf"
            with self.timer.stage("make_common_bf"):
                if self._artifact_fresh(bf_path, *cfg.fastas) and not _is_bf_stub(bf_path):
                    log(f"Reusing {bf_path}")
                    common_bf = bloom.load_bf(bf_path)
                else:
                    stub_fresh = self._artifact_fresh(bf_path, *cfg.fastas)
                    if stub_fresh:
                        log(f"Reusing {bf_path} (stub: deterministic on-device rebuild)")
                    ordered_names = sorted(names, key=lambda n: path_of[n])
                    # sizing needs only the FIRST (path-sorted) genome
                    # (src/ntsynt_make_common_bf.cpp:109-117) — later
                    # genomes stay unread until their cascade level's
                    # entry resolves, hiding their ~20 s/Gbp host read
                    # under the previous level's device dispatch
                    num_bits = bf_build.bf_size_bits(
                        [genomes[ordered_names[0]]], cfg.fpr, cfg.bf_bytes
                    )
                    if cfg.use_mesh:
                        from ..parallel import mesh as pmesh

                        common_bf = pmesh.distributed_common_bf(
                            [genomes[n] for n in ordered_names], cfg.k, cfg.fpr,
                            bf_bytes=cfg.bf_bytes,
                        )
                    else:
                        entries = [
                            (n, lambda n=n: ("chunked", _prepared(n).bf_groups()))
                            for n in ordered_names
                        ]
                        # gigabase genomes: drop device code buffers as
                        # their cascade level is dispatched ONLY when the
                        # projected residency (two cascade levels + every
                        # stream) would not fit HBM — releasing costs the
                        # sketch stage a re-pack + re-upload (~5-12 s per
                        # Gbp over the tunnel), so keep buffers whenever
                        # the chip can hold them (2x1 Gbp + a capped
                        # 4 GiB filter fits a 16 GB chip with room).
                        # File size stands in for base count (~1.01x)
                        # so unread genomes stay unread.
                        fsize = {n: os.path.getsize(path_of[n]) for n in names}
                        resident = 2 * (num_bits // 8) + sum(
                            int(fsize[n] * 1.12) for n in ordered_names
                        )
                        # 10.5 GB threshold: leaves ~5 GB for XLA sort
                        # temporaries + fragmentation on a 16 GB chip
                        # (a 2^35-bit override run OOMed at a projected
                        # 10.9 GB with streams kept)
                        big = (
                            {n for n in ordered_names if fsize[n] > 505_000_000}
                            if resident > 10_500_000_000
                            else set()
                        )
                        common_bf = bf_build.build_common_bf_from_device(
                            entries, cfg.k, num_bits, chunk=bf_build.DEFAULT_CHUNK,
                            release=(
                                (lambda n: prepared.pop(n, None) if n in big else None)
                                if big else None
                            ),
                        )
                    if cfg.write_artifacts:
                        if cfg.bf_artifact == "full":
                            save_threads.append((common_bf, bf_path))
                        elif not stub_fresh:  # keep mtime: TSVs stay fresh
                            _write_bf_stub(bf_path, common_bf, cfg)
        if cfg.repeat:
            rbf_path = f"{prefix}.repeat.bf"
            with self.timer.stage("make_repeat_bf"):
                if self._artifact_fresh(rbf_path, *cfg.fastas) and not _is_bf_stub(rbf_path):
                    repeat_bf = bloom.load_bf(rbf_path)
                else:
                    rstub_fresh = self._artifact_fresh(rbf_path, *cfg.fastas)
                    if cfg.use_mesh:
                        from ..parallel import mesh as pmesh

                        repeat_bf = pmesh.distributed_repeat_bf(
                            list(genomes.values()), cfg.k
                        )
                    else:
                        repeat_bf = bf_build.build_repeat_bf(
                            list(genomes.values()), cfg.k, chunk=cfg.chunk
                        )
                    if cfg.write_artifacts:
                        if cfg.bf_artifact == "full":
                            save_threads.append((repeat_bf, rbf_path))
                        elif not rstub_fresh:
                            _write_bf_stub(rbf_path, repeat_bf, cfg)

        # --- sketching (rule indexlr) ---------------------------------
        sketch_repeat = repeat_bf if cfg.repeat_filter in ("Indexlr", None) and cfg.repeat else None
        if cfg.repeat_filter == "Filter":
            sketch_repeat = None  # filtering happens at read time instead
        assemblies = {}
        # plan which genomes need fresh sketches (vs artifact reuse) up
        # front so genome i+1's device sweep can be DISPATCHED before
        # genome i's result is collected: i's host-side post-processing
        # (position mapping, hash recompute, TSV prep) then overlaps
        # i+1's device time. Overlap is gated to sub-gigabase genomes so
        # at most two code streams + sweep outputs are resident in HBM.
        plan = []
        for name in names:
            tsv_path = os.path.join(cfg.out_dir, f"{name}.k{cfg.k}.w{cfg.w}.tsv")
            bf_inputs = [f"{prefix}.common.bf"] if cfg.common and cfg.write_artifacts else []
            rep_filter = None
            if cfg.repeat_filter == "Filter" and repeat_bf is not None:
                rep_filter = lambda canon, bf=repeat_bf: sketch_ops._probe_np(bf, canon)
            fresh = rep_filter is not None or not self._artifact_fresh(
                tsv_path, path_of[name], *bf_inputs
            )
            plan.append((name, tsv_path, rep_filter, fresh))

        # dispatch/collect overlap needs two code streams + one filter
        # resident: gate on the projected HBM footprint, not a fixed
        # per-genome size (a capped 4 GiB BF + 2x ~1.1 GB streams fits
        # a 16 GB chip, so 2x1 Gbp runs fully overlapped). Applies to
        # the mesh path too (sharded_sketch_dispatch/collect).
        bf_words_bytes = 0 if common_bf is None else common_bf.num_bits // 8
        if sketch_repeat is not None:
            bf_words_bytes += sketch_repeat.num_bits // 8
        top2 = sorted(
            (int(os.path.getsize(path_of[name]) * 1.12) for name, *_ in plan),
            reverse=True,
        )[:2]
        overlap_ok = bf_words_bytes + sum(top2) + (1 << 30) <= 14_000_000_000
        fresh_queue = [p[0] for p in plan if p[3]]

        def _dispatch(name):
            if cfg.use_mesh:
                from ..parallel import mesh as pmesh

                return pmesh.sharded_sketch_dispatch(
                    genomes[name], cfg.k, cfg.w,
                    common_bf=common_bf, repeat_bf=sketch_repeat,
                )
            cs = _prepared(name)
            cs.ensure_assembled()  # no-op after the BF walk consumed it
            return sketch_ops.sketch_genome_dispatch(
                genomes[name], cfg.k, cfg.w,
                common_bf=common_bf, repeat_bf=sketch_repeat,
                chunk=cfg.chunk, prepared=(cs.stream, cs.legit, cs.dev_buf),
            )

        def _collect(handle):
            if cfg.use_mesh:
                from ..parallel import mesh as pmesh

                return pmesh.sharded_sketch_collect(handle)
            return sketch_ops.sketch_genome_collect(handle)

        handles = {}
        for name, tsv_path, rep_filter, fresh in plan:
            if not fresh:
                # snakemake-style resume: reuse the sketch artifact
                log(f"Reusing {tsv_path}")
                records = sketch_tsv.read_sketch_tsv(tsv_path)
                assemblies[name] = AssemblyMinimizers.from_tsv_records(
                    name, records, genome=genomes[name]
                )
            else:
                with self.timer.stage(f"sketch:{name}"):
                    h = handles.pop(name, None) or _dispatch(name)
                    fresh_queue.remove(name)
                    if overlap_ok and fresh_queue and fresh_queue[0] not in handles:
                        handles[fresh_queue[0]] = _dispatch(fresh_queue[0])
                    sk = _collect(h)
                    prepared.pop(name, None)  # free the device buffer
                    if cfg.write_artifacts:
                        # artifact-only (assemblies are built from `sk`
                        # directly): the per-minimizer kmer_string loop +
                        # file write run on a background thread
                        def _write_tsv(sk=sk, g=genomes[name], tsv_path=tsv_path):
                            recs = []
                            for ci, cname in enumerate(sk.contig_names):
                                mask = sk.contig_idx == ci
                                seqs = g.kmer_strings(ci, sk.positions[mask], cfg.k)
                                recs.append(
                                    (cname, sk.hashes[mask], sk.positions[mask], seqs)
                                )
                            sketch_tsv.write_sketch_tsv(tsv_path, recs)

                        t = threading.Thread(target=_write_tsv)
                        t.start()
                        artifact_threads.append(t)
                assemblies[name] = AssemblyMinimizers.from_sketch(
                    sk, genome=genomes[name], repeat_canon_filter=rep_filter
                )
            log(f"{name}: {len(assemblies[name].mx_info.sorted_hash)} minimizers kept")

        # deferred full .bf saves: start the big device->host downloads
        # only now, overlapping the (mostly host-side) synteny stage
        save_threads = [
            threading.Thread(target=bf.save, args=(path,)) for bf, path in save_threads
        ]
        for t in save_threads:
            t.start()

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
            repeat_bf=repeat_bf,
            repeat_filter=cfg.repeat_filter,
            chunk=cfg.chunk,
            use_mesh=cfg.use_mesh,
            write_output=is_rank0,
        )
        with self.timer.stage("synteny"):
            detector = SyntenyDetector(assemblies, params)
            out = detector.run()

        for t in save_threads + artifact_threads:  # background artifact writes must land on disk
            t.join()
        if cfg.benchmark:
            self.timer.write_tsv(f"{prefix}.time.tsv")
            log("Stage timings:", self.timer.as_json())
        return out
