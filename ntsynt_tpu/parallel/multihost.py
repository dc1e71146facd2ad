"""Multi-host (>= 2 processes) scale-out.

The reference caps out at one node (snakemake fan-out over local cores,
bin/ntsynt_run_pipeline.smk:44-85). The TPU-native design extends the
single-process mesh layer (parallel/mesh.py) across hosts with
jax.distributed: every process contributes its local devices to one
global 1-D mesh, genome code slabs are partitioned per host (each host
materializes and uploads ONLY its own devices' slabs —
mesh._slab_rows(only_rows=...)), and the two global exchanges ride the
collective fabric:

  * Bloom-filter words: bitwise-OR all-reduce (ppermute butterfly) —
    XLA routes the intra-host hops over ICI and the cross-host hops
    over DCN,
  * minimizer selections: compacted per-slab outputs, gathered to every
    host with a process all-gather (mesh._get_full).

The host-side graph/blocks stages are deterministic and run identically
on every process from the gathered selections, so all ranks hold
identical blocks with no further communication; rank 0 writes the
artifacts.

Usage — one invocation per host, same arguments everywhere plus the
rank descriptor:

    python -m ntsynt_tpu.parallel.multihost \
        --coordinator host0:9355 --num-processes 2 --process-id 0 -- \
        genomeA.fa genomeB.fa -d 1 -p out

Validated by a 2-process CPU dry run (tests/test_multihost.py): both
ranks and a single-process reference run produce byte-identical
synteny-block TSVs.
"""

import argparse
import sys


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_ids=None) -> None:
    """Join the jax.distributed process group (call before any other jax
    API touches the backend). On CPU test rigs set
    XLA_FLAGS=--xla_force_host_platform_device_count=N per process
    BEFORE importing jax to emulate N chips per host."""
    import jax

    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def build_parser():
    parser = argparse.ArgumentParser(
        prog="ntsynt-tpu-multihost",
        description=(
            "Run the ntsynt-tpu pipeline across >= 2 hosts: start this "
            "once per host with identical pipeline arguments after '--'"
        ),
    )
    parser.add_argument("--coordinator", required=True,
                        help="host:port of the rank-0 coordinator")
    parser.add_argument("--num-processes", required=True, type=int)
    parser.add_argument("--process-id", required=True, type=int)
    parser.add_argument("cli_args", nargs=argparse.REMAINDER,
                        help="pipeline arguments (see ntsynt-tpu --help), "
                             "preceded by --")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    initialize(args.coordinator, args.num_processes, args.process_id)
    import jax

    from .. import cli

    rest = args.cli_args
    if rest and rest[0] == "--":
        rest = rest[1:]
    rest = list(rest) + ["--mesh"]
    print(
        f"[multihost] process {jax.process_index()}/{jax.process_count()}: "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global devices",
        flush=True,
    )
    return cli.main(rest)


if __name__ == "__main__":
    sys.exit(main())
