"""bf35 leg of the capped-BF quality study: rerun with an explicit
2^35-bit filter (bf_size_bits no longer caps explicit bf_bytes) and
diff against the saved cap34 blocks."""

import sys
import time

sys.path.insert(0, "/root/repo")

CAP34_TSV = sys.argv[1]
FASTAS = sys.argv[3:]


def main():
    from ntsynt_tpu.core.pipeline import NtSyntTPU, PipelineConfig
    import os

    tmp = os.path.dirname(FASTAS[0])
    cfg = PipelineConfig(
        fastas=FASTAS, k=24, w=1000, w_rounds=(100, 10),
        block_size=500, indel=10_000, merge="10000",
        prefix=f"q_bf{int(sys.argv[2]).bit_length()+3}", out_dir=tmp, force=True,
        bf_bytes=int(sys.argv[2]),
    )
    t = time.time()
    out = NtSyntTPU(cfg).run()
    print(f"alt-bf: {time.time()-t:.1f}s -> {out}", flush=True)
    a = [l.split("\t", 1)[1] for l in open(CAP34_TSV)]
    b = [l.split("\t", 1)[1] for l in open(out)]
    if a == b:
        print(f"RESULT: block rows IDENTICAL ({len(a)} rows) vs cap34")
    else:
        sa, sb = set(a), set(b)
        print(
            f"RESULT: {len(a)} vs {len(b)} rows; only-cap34={len(sa-sb)} "
            f"only-alt={len(sb-sa)}"
        )
        for l in sorted(sa ^ sb)[:12]:
            print("  diff:", l.strip())


if __name__ == "__main__":
    main()
