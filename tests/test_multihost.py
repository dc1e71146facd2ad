"""Multi-host (>= 2 jax processes) dry run on CPU.

Spawns two subprocesses, each emulating a 4-chip host
(xla_force_host_platform_device_count=4), joined into one 8-device
global mesh via jax.distributed + Gloo collectives: genome slabs are
partitioned per host, Bloom-filter words OR-all-reduced across the
process boundary (the DCN analog), compacted selections all-gathered.
Rank 0's final blocks must be byte-identical to a single-process run —
the BASELINE.json ">= 2 hosts" scaling story.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_e2e import _cfg, write_fasta  # noqa: E402

from ntsynt_tpu.core.pipeline import NtSyntTPU  # noqa: E402


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pipeline_matches_single(tmp_path):
    rng = np.random.default_rng(33)
    base = rng.integers(0, 4, 50_000).astype(np.uint8)
    mut = base.copy()
    mut[18_000:26_000] = mut[18_000:26_000][::-1] ^ 3  # engineered inversion
    snp = rng.random(len(mut)) < 0.001
    mut[snp] = (mut[snp] + rng.integers(1, 4, int(snp.sum()))) % 4
    fa = write_fasta(tmp_path / "mhA.fa", [("chr1", base)])
    fb = write_fasta(tmp_path / "mhB.fa", [("chr1", mut)])

    # single-process reference run (the session's 8-device CPU mesh)
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    out_single = NtSyntTPU(
        _cfg([str(fa), str(fb)], single_dir, prefix="mh", chunk=1 << 14)
    ).run()

    # two workers, 4 virtual devices each -> 8-device global mesh
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # drop the axon plugin site: its import hook initializes the XLA
    # backend, which must not happen before jax.distributed.initialize
    # (the workers force JAX_PLATFORMS=cpu, so the plugin is unused)
    keep = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker))] + keep
    )
    out_dirs = []
    procs = []
    for rank in (0, 1):
        od = tmp_path / f"rank{rank}"
        od.mkdir()
        out_dirs.append(od)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(rank), "2", str(port),
                 str(tmp_path), str(od)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"WORKER_OK rank={rank}" in out

    multi = open(out_dirs[0] / "mh.synteny_blocks.tsv").read()
    single = open(out_single).read()
    assert multi == single, "multi-host blocks diverge from single-process"
