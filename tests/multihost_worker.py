"""Worker process for the 2-process multi-host dry run
(tests/test_multihost.py). Not a test module.

Usage: python multihost_worker.py RANK NPROCS PORT DATA_DIR OUT_DIR
"""

import os
import sys


def main():
    rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_dir, out_dir = sys.argv[4], sys.argv[5]

    # each "host" emulates 4 chips; must be set before jax initializes
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    from ntsynt_tpu.parallel import multihost

    # distributed init must precede anything that initializes the XLA
    # backend (including jax.config.update("jax_platforms", ...))
    multihost.initialize(f"localhost:{port}", nprocs, rank)
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    from ntsynt_tpu.core.pipeline import NtSyntTPU, PipelineConfig

    fastas = [os.path.join(data_dir, f) for f in ("mhA.fa", "mhB.fa")]
    cfg = PipelineConfig(
        fastas=fastas, k=24, w=100, w_rounds=(50, 10), block_size=500,
        indel=500, merge="3000", prefix="mh", out_dir=out_dir,
        use_mesh=True, chunk=1 << 14,
    )
    out = NtSyntTPU(cfg).run()
    if rank == 0:
        assert os.path.exists(out), "rank 0 must write the blocks TSV"
    else:
        # rank > 0 computes but never touches the shared filesystem
        assert not os.listdir(out_dir), f"rank {rank} wrote artifacts"
    print(f"WORKER_OK rank={rank}", flush=True)


if __name__ == "__main__":
    main()
