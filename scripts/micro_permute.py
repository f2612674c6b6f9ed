"""Microbench: row gather vs row scatter vs per-leaf gathers at bench scale.

Decides the local_rebin redesign (PERF.md round-3): the round-2 docstrings
claimed a wide row permute costs ~36-40 us at Ns ~ 4e5, but the profiled
scan shows the 55-channel row SCATTER at 4.3 ms.  Measures, under lax.scan
(so DCE cannot flatter anything):

  s_wide : zeros.at[perm].set(big)      (405600, 56)  — current local_rebin
  g_wide : big[perm]                                   — inverse-gather
  g_leaf : per-leaf gathers in native layouts (25 leaves, same total bytes)
  s_int  : int32 (Ns,) scatter          — the inverse-permutation build
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    os.makedirs("/root/jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    ns = 405600
    ch = 56
    n_inner = 20
    key = jax.random.PRNGKey(0)
    big = jax.random.normal(key, (ns, ch), jnp.float32)
    perm = jax.random.permutation(jax.random.PRNGKey(1), ns).astype(jnp.int32)
    # leaf widths mirroring the Particles SoA
    widths = [2, 2, 2, 2, 1, 1, 1, 4, 4, 4, 1, 4, 1, 4, 4, 1, 1, 2, 1, 1, 1, 1, 2, 4, 1]
    leaves = [jax.random.normal(key, (ns, w), jnp.float32) for w in widths]

    def scan20(body, init):
        def bd(c, _):
            return body(c), None

        return jax.jit(lambda c: jax.lax.scan(bd, c, None, length=n_inner)[0])

    f_swide = scan20(lambda b: jnp.zeros_like(b).at[perm].set(b), big)
    f_gwide = scan20(lambda b: b[perm], big)
    f_gleaf = scan20(lambda ls: [l[perm] for l in ls], leaves)
    f_sint = scan20(
        lambda v: jnp.zeros_like(v).at[perm].set(v),
        jnp.arange(ns, dtype=jnp.int32),
    )

    out = {}
    out["s_wide_ms"] = 1e3 * timeit(f_swide, big) / n_inner
    out["g_wide_ms"] = 1e3 * timeit(f_gwide, big) / n_inner
    out["g_leaf_ms"] = 1e3 * timeit(f_gleaf, leaves) / n_inner
    out["s_int_ms"] = 1e3 * timeit(f_sint, jnp.arange(ns, dtype=jnp.int32)) / n_inner
    print(json.dumps(out))


if __name__ == "__main__":
    main()
