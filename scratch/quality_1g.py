"""Capped-BF quality at real scale (VERDICT r2 #5, PARITY #1).

Runs the full pipeline twice on the same 2x1 Gbp pair: once with the
default 2^34-bit HBM-capped common filter (effective FPR ~5.7%), once
with a 2^35-bit filter (~2.9%, the closest-to-requested size that fits
alongside the cascade). Diffs the final block TSVs.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    sys.argv = ["bench.py"]
    import bench

    tmp = tempfile.mkdtemp(prefix="ntsynt_q1g_")
    t0 = time.time()
    fastas = bench.make_genomes(tmp, 2, 1_000_000_000)
    print(f"genomes in {time.time()-t0:.0f}s", flush=True)

    from ntsynt_tpu.core.pipeline import NtSyntTPU, PipelineConfig

    outs = {}
    for tag, bf_bytes in [("cap34", None), ("bf35", (1 << 35) // 8)]:
        cfg = PipelineConfig(
            fastas=fastas, k=24, w=1000, w_rounds=(100, 10),
            block_size=500, indel=10_000, merge="10000",
            prefix=f"q_{tag}", out_dir=tmp, force=True, bf_bytes=bf_bytes,
            dev=True,
        )
        t = time.time()
        out = NtSyntTPU(cfg).run()
        print(f"{tag}: {time.time()-t:.1f}s -> {out}", flush=True)
        outs[tag] = [l.split("\t", 1)[1] for l in open(out)]

    a, b = outs["cap34"], outs["bf35"]
    if a == b:
        print(f"RESULT: block rows IDENTICAL ({len(a)} rows) at 2^34 vs 2^35 bits")
    else:
        sa, sb = set(a), set(b)
        print(
            f"RESULT: {len(a)} vs {len(b)} rows; only-cap34={len(sa-sb)} "
            f"only-bf35={len(sb-sa)}"
        )
        for l in list(sa ^ sb)[:10]:
            print("  diff:", l.strip())


if __name__ == "__main__":
    main()
