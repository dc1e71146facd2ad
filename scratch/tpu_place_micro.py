"""Placement-kernel microbench: ops/bf_place vs the scatter path on the
real chip, at the production shape (2^34-bit filter, 2^23-key segments).

Correctness: same salted keys through both paths, device-side word
mismatch count (downloading 2 GiB to compare on host would take
minutes over the tunnel). Rate: fori differencing per CLAUDE.md."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ntsynt_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ntsynt_tpu.ops import bloom

N = 1 << 23
LGB = 34
SALT = [100]


def prng_keys(i, n, salt=0):
    x = (
        jnp.arange(n, dtype=jnp.uint32)
        + jnp.uint32(0x9E3779B9) * (i.astype(jnp.uint32) + jnp.uint32(salt))
    )
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def insert_body(place, n=N):
    def body(i, w):
        hi = prng_keys(i, n)
        lo = prng_keys(i, n, salt=7919)
        valid = (prng_keys(i, n, salt=31337) & jnp.uint32(31)) != 0  # ~97%
        return bloom.insert_words(w, hi, lo, valid, LGB, scratch=True, place=place)

    return body


def check_correctness():
    nw = (1 << LGB) // 32

    @jax.jit
    def both(k):
        w_sc = jax.lax.fori_loop(0, k, insert_body(False), jnp.zeros(nw, jnp.uint32))
        w_pl = jax.lax.fori_loop(0, k, insert_body("tpu"), jnp.zeros(nw, jnp.uint32))
        return (
            jnp.sum((w_sc != w_pl).astype(jnp.int32)),
            jnp.sum((w_sc != 0).astype(jnp.int32)),
        )

    t0 = time.perf_counter()
    mism, nonzero = jax.device_get(both(jnp.int32(3)))
    print(
        f"correctness: {mism} mismatched words ({nonzero} nonzero) "
        f"[{time.perf_counter()-t0:.1f}s incl compile]",
        flush=True,
    )
    assert mism == 0, "PLACEMENT KERNEL MISMATCH"


def diff_rate(name, body, k1=3, k2=11, n=N):
    nw = (1 << LGB) // 32

    @jax.jit
    def run(k, salt):
        w = jax.lax.fori_loop(
            0,
            k,
            lambda i, w: body(i * jnp.int32(65536) + salt, w),
            jnp.zeros(nw, jnp.uint32),
        )
        return jnp.max(w[:4096])

    jax.device_get(run(jnp.int32(k1), jnp.int32(SALT[0])))

    def wall(k):
        best = 9e9
        for _ in range(2):
            SALT[0] += 1
            t0 = time.perf_counter()
            jax.device_get(run(jnp.int32(k), jnp.int32(SALT[0])))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = wall(k1), wall(k2)
    per = (t2 - t1) / (k2 - k1)
    rate = n / per / 1e6 if per > 0 else float("inf")
    print(f"{name}: {per*1000:.2f} ms/iter ({rate:.0f} M elem/s)", flush=True)
    return per


def check_coverage():
    """How many real keys fall outside their fixed-stride window (must
    be 0 for the kernel path to engage)."""
    from ntsynt_tpu.ops import bf_place

    n_words = (1 << LGB) // 32

    @jax.jit
    def diag(salt):
        hi = prng_keys(salt, N)
        lo = prng_keys(salt, N, salt=7919)
        valid = (prng_keys(salt, N, salt=31337) & jnp.uint32(31)) != 0
        word, _ = bloom._bit_index(hi, lo, LGB)
        word = jnp.where(valid, word, jnp.int32(n_words))
        word = jax.lax.sort(word)
        nv = jnp.sum(valid, dtype=jnp.int32)
        _, n_steps, krows, _, padded_rows, slack = bf_place._geom(LGB, N)
        log2ns = n_steps.bit_length() - 1
        r0u = bf_place._r0(word >> 16, nv, n_steps, log2ns, slack,
                           padded_rows - krows)
        rowj = jnp.arange(N, dtype=jnp.int32) >> 7
        covered = (rowj >= r0u) & (rowj < r0u + krows)
        return jnp.sum((~covered & (word < n_words)).astype(jnp.int32))

    bad = int(jax.device_get(diag(jnp.int32(5))))
    print(f"coverage: {bad} uncovered real keys", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    check_coverage()
    check_correctness()
    diff_rate("insert scatter 2^34 seg 2^23", insert_body(False))
    diff_rate("insert place   2^34 seg 2^23", insert_body("tpu"))
    for lg in (24, 25, 26):
        n = 1 << lg
        diff_rate(
            f"insert place   2^34 pooled 2^{lg}", insert_body("tpu", n),
            k1=1, k2=3, n=n,
        )

    # isolated sort costs (result folded into the carry via a max so the
    # sort cannot be DCE'd; rates include nothing else)
    def sort_pair(n):
        def body(i, w):
            word = prng_keys(i, n).astype(jnp.int32)
            mask = prng_keys(i, n, salt=7919)
            sw, sm = jax.lax.sort((word, mask), num_keys=1)
            return w.at[0].max(sw[0].astype(jnp.uint32) ^ sm[0])

        return body

    def sort_single(n):
        def body(i, w):
            key = jax.lax.sort(prng_keys(i, n))
            return w.at[0].max(key[0])

        return body

    for lg in (23, 24, 25, 26):
        n = 1 << lg
        diff_rate(f"pair sort 2^{lg}", sort_pair(n), k1=1, k2=5, n=n)
        diff_rate(f"u32  sort 2^{lg}", sort_single(n), k1=1, k2=5, n=n)


if __name__ == "__main__":
    main()
