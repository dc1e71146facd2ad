"""Microbench: BF insert/probe primitives on the real TPU.

Method: ONE jit per variant with a DYNAMIC fori_loop bound (dispatch
with K1 and K2 iterations; (wall2-wall1)/(K2-K1) differences out
tunnel/dispatch latency). Inputs vary per iteration via an
iteration-indexed PRNG so RPC result caching can't hit.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ntsynt_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ntsynt_tpu.ops import bloom

N = 1 << 21  # keys per segment


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


SALT = [0]


def _to_scalar(x):
    if isinstance(x, tuple):
        return sum(_to_scalar(v) for v in x)
    if getattr(x, "ndim", 0) == 0:
        return x.astype(jnp.uint32)
    return jnp.max(x).astype(jnp.uint32)


def diff_rate(name, body, init, n_per_iter, k1=3, k2=15):
    # a fresh uint32 salt per dispatch defeats the tunnel's RPC result
    # cache; the jit returns a SCALAR that we device_get — the only
    # real sync over the axon tunnel (block_until_ready is not,
    # CLAUDE.md). The scalar-reduction cost is per-call constant and
    # differences out.
    @jax.jit
    def run(k, salt, x0):
        out = jax.lax.fori_loop(
            0, k, lambda i, x: body(i * jnp.int32(65536) + salt, x), x0
        )
        return _to_scalar(out)

    jax.device_get(run(jnp.int32(k1), jnp.int32(SALT[0]), init))  # compile

    def wall(k):
        best = 9e9
        for _ in range(2):
            SALT[0] += 1
            t0 = time.perf_counter()
            jax.device_get(run(jnp.int32(k), jnp.int32(SALT[0]), init))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = wall(k1), wall(k2)
    per = (t2 - t1) / (k2 - k1)
    rate = n_per_iter / per / 1e6 if per > 0 else float("inf")
    print(
        f"{name}: {per*1000:.2f} ms/iter ({rate:.0f} M elem/s)  [K{k1}={t1:.3f}s K{k2}={t2:.3f}s]",
        flush=True,
    )
    return per


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- full insert_words (production formulation) -----------------------
    for lgb in (32, 35):
        n_words = (1 << lgb) // 32
        words0 = jnp.zeros(n_words, jnp.uint32)

        def body(i, words, lgb=lgb):
            hi = prng_keys(i, N)
            lo = prng_keys(i, N, salt=7919)
            return bloom.insert_words(words, hi, lo, jnp.ones(N, bool), lgb)

        diff_rate(f"insert_words 2^{lgb} bits", body, words0, N)
        del words0

    # --- scatter-ADD sorted dup-zero alternative at 2^32 -------------------
    lgb = 32
    n_words = (1 << lgb) // 32
    words0 = jnp.zeros(n_words, jnp.uint32)

    def body_add(i, words):
        bit = jax.lax.sort(prng_keys(i, N))
        word = (bit >> 5).astype(jnp.int32)
        mask = jnp.uint32(1) << (bit & jnp.uint32(31))
        dup = jnp.concatenate([jnp.zeros(1, bool), bit[1:] == bit[:-1]])
        mask = jnp.where(dup, jnp.uint32(0), mask)
        return words.at[word].add(
            mask, mode="drop", indices_are_sorted=True, unique_indices=False
        )

    diff_rate("scatter-ADD sorted 2^32", body_add, words0, N)

    # raw scatter-set, no sort (upper bound on scatter itself)
    def body_raw(i, words):
        keys = prng_keys(i, N)
        word = (keys >> 5).astype(jnp.int32)
        mask = jnp.uint32(1) << (keys & jnp.uint32(31))
        return words.at[word].set(mask, mode="drop")

    diff_rate("raw scatter-set 2^32 unsorted", body_raw, words0, N)
    del words0

    # --- gather probe at 2^32 ----------------------------------------------
    words = jnp.zeros(n_words, jnp.uint32)

    def body_probe(i, acc):
        hi = prng_keys(i, N)
        lo = prng_keys(i, N, salt=31)
        v = bloom.bf_probe(words, hi, lo, lgb)
        return acc ^ jnp.sum(v.astype(jnp.uint32))

    diff_rate("bf_probe gather 2^32", body_probe, jnp.uint32(0), N)
    del words

    # --- bare sort scaling ---------------------------------------------------
    for lgn in (21, 23):
        n = 1 << lgn

        def body_sort(i, acc, n=n):
            s = jax.lax.sort(prng_keys(i, n))
            return acc ^ s[0] ^ s[n - 1]

        diff_rate(f"sort u32 2^{lgn}", body_sort, jnp.uint32(0), n)


if __name__ == "__main__":
    main()
