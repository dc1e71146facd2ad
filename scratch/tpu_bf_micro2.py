"""Microbench round 2: gather/scatter variants + capped-filter inserts."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ntsynt_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ntsynt_tpu.ops import bloom

N = 1 << 21
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


def _to_scalar(x):
    if isinstance(x, tuple):
        # scalars only (summing a 2^27-word carry costs a full pass)
        return sum(_to_scalar(v) for v in x if getattr(v, "ndim", 0) == 0) + (
            _to_scalar(x[-1]) if all(getattr(v, "ndim", 0) != 0 for v in x) else jnp.uint32(0)
        )
    if getattr(x, "ndim", 0) == 0:
        return x.astype(jnp.uint32)
    return jnp.max(x).astype(jnp.uint32)


def diff_rate(name, body, init, n_per_iter, k1=3, k2=15):
    @jax.jit
    def run(k, salt, x0):
        out = jax.lax.fori_loop(
            0, k, lambda i, x: body(i * jnp.int32(65536) + salt, x), x0
        )
        return _to_scalar(out)

    jax.device_get(run(jnp.int32(k1), jnp.int32(SALT[0]), init))

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
    print(f"{name}: {per*1000:.2f} ms/iter ({rate:.0f} M elem/s)", flush=True)
    return per


def main():
    print("backend:", jax.default_backend(), flush=True)
    n_words = (1 << 32) // 32
    words = jnp.zeros(n_words, jnp.uint32)

    # gather variants at 2^32 bits — the table rides in the loop carry
    # (a closed-over device array would be baked into the HLO as a
    # 512 MB constant and stall the tunnel compile)
    def g_plain(i, st):
        w, acc = st
        idx = (prng_keys(i, N) >> 5).astype(jnp.int32)
        return w, acc ^ jnp.max(w[idx])

    diff_rate("gather plain", g_plain, (words, jnp.uint32(0)), N)

    def g_pib(i, st):
        w, acc = st
        idx = (prng_keys(i, N) >> 5).astype(jnp.int32)
        v = w.at[idx].get(mode="promise_in_bounds")
        return w, acc ^ jnp.max(v)

    diff_rate("gather promise_in_bounds", g_pib, (words, jnp.uint32(0)), N)

    def g_sorted(i, st):
        w, acc = st
        idx = jax.lax.sort((prng_keys(i, N) >> 5).astype(jnp.int32))
        v = w.at[idx].get(mode="promise_in_bounds", indices_are_sorted=True)
        return w, acc ^ jnp.max(v)

    diff_rate("gather sorted+hints (incl sort)", g_sorted, (words, jnp.uint32(0)), N)

    # scatter with promise_in_bounds
    def s_pib(i, w):
        keys = prng_keys(i, N)
        word = (keys >> 5).astype(jnp.int32)
        mask = jnp.uint32(1) << (keys & jnp.uint32(31))
        return w.at[word].set(mask, mode="promise_in_bounds")

    diff_rate("scatter-set promise_in_bounds", s_pib, words, N)
    del words

    # capped-filter inserts (scratch path)
    for lgb in (33, 34):
        nw = (1 << lgb) // 32
        w0 = jnp.zeros(nw, jnp.uint32)

        def body(i, w, lgb=lgb):
            hi = prng_keys(i, N)
            lo = prng_keys(i, N, salt=7919)
            return bloom.insert_words(w, hi, lo, jnp.ones(N, bool), lgb,
                                      scratch=True)

        diff_rate(f"insert scratch 2^{lgb}", body, w0, N)
        del w0

    # insert at 2^34 with a BIGGER segment (2^22)
    nw = (1 << 34) // 32
    w0 = jnp.zeros(nw, jnp.uint32)
    N4 = 1 << 22

    def body4(i, w):
        hi = prng_keys(i, N4)
        lo = prng_keys(i, N4, salt=7919)
        return bloom.insert_words(w, hi, lo, jnp.ones(N4, bool), 34, scratch=True)

    diff_rate("insert scratch 2^34 seg 2^22", body4, w0, N4)


if __name__ == "__main__":
    main()
