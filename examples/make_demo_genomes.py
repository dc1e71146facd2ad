"""Generate the demo dataset: genome A (2 contigs), B = A + SNPs +
inversion, C = A + SNPs + translocated tails + insertion."""
import os
import sys

import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "."
rng = np.random.default_rng(42)
dec = np.frombuffer(b"ACGT", dtype=np.uint8)

c1 = rng.integers(0, 4, 800_000).astype(np.uint8)
c2 = rng.integers(0, 4, 500_000).astype(np.uint8)

def snps(g, rate=0.002):
    g = g.copy()
    m = rng.random(len(g)) < rate
    g[m] = (g[m] + rng.integers(1, 4, int(m.sum()))) % 4
    return g

b1, b2 = snps(c1), snps(c2)
b1[200_000:300_000] = b1[200_000:300_000][::-1] ^ 3  # inversion

d1, d2 = snps(c1), snps(c2)
d1, d2 = (
    np.concatenate([d1[:600_000], d2[300_000:]]),  # translocation
    np.concatenate([d2[:300_000], rng.integers(0, 4, 30_000).astype(np.uint8), d1[600_000:]]),
)

def write(name, contigs):
    with open(os.path.join(out, name), "wb") as f:
        for cname, g in contigs:
            f.write(f">{cname}\n".encode())
            raw = dec[g]
            pad = (-len(raw)) % 70
            body = np.full(((len(raw) + pad) // 70, 71), ord("\n"), np.uint8)
            body[:, :70] = np.concatenate([raw, np.full(pad, ord("A"), np.uint8)]).reshape(-1, 70)
            if pad:
                body[-1, 70 - pad :] = ord("\n")  # ragged tail: trim pad
                f.write(body[:-1].tobytes())
                f.write(raw[-(len(raw) % 70):].tobytes() + b"\n")
            else:
                f.write(body.tobytes())

write("demoA.fa", [("chrI", c1), ("chrII", c2)])
write("demoB.fa", [("chrI", b1), ("chrII", b2)])
write("demoC.fa", [("chrI", d1), ("chrII", d2)])
print("wrote demoA/B/C.fa")
