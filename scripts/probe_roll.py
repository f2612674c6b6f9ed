"""Probe: pltpu.roll across a multi-tile lane axis (merged-lane 3D layout
feasibility check).  Rolls an (8, 3456) f32 array by shifts spanning
several 128-lane tiles inside a kernel and checks against jnp.roll."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    L = 3456
    shifts = [0, 1, 57, 58, 127, 128, 129, 354, L - 354, L - 1]

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        for s in shifts:
            acc = acc + pltpu.roll(x, s, 1)
        o_ref[...] = acc

    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, L)), jnp.float32)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
        )(x)
    )
    got = np.asarray(f(x))
    want = np.sum([np.roll(np.asarray(x), s, 1) for s in shifts], axis=0)
    err = np.abs(got - want).max()
    print("max err:", err)
    assert err == 0.0, "roll mismatch"

    # timing: many rolls
    def kernel_t(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        for s in range(160):
            acc = acc + pltpu.roll(x, 3 + 2 * s, 1)
        o_ref[...] = acc

    g = jax.jit(
        lambda x: pl.pallas_call(
            kernel_t,
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
        )(x)
    )
    g(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(100):
        r = g(x)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 100
    print(f"160 rolls of (8,{L}): {dt*1e6:.1f} us -> {dt/160*1e9:.0f} ns/roll")


if __name__ == "__main__":
    main()
