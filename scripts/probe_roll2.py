"""Probe 2: marginal cost of pltpu.roll vs plain adds at several shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(shape, n_ops, use_roll, reps=50):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        for s in range(n_ops):
            v = pltpu.roll(x, 3 + 2 * s, 1) if use_roll else x * (1.0 + s)
            acc = acc + v
        o_ref[...] = acc

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), jnp.float32
    )
    g = jax.jit(
        lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32)
        )(x)
    )
    g(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = g(x)
    r.block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    for shape in [(8, 128), (8, 3456), (40, 3456), (16, 3456)]:
        t_mul = bench(shape, 160, False)
        t_roll = bench(shape, 160, True)
        tiles = (shape[0] + 7) // 8 * ((shape[1] + 127) // 128)
        print(
            f"{shape}: mul+add {t_mul*1e6:8.1f} us, roll+add {t_roll*1e6:8.1f} us,"
            f" marginal roll {(t_roll-t_mul)/160*1e9:7.0f} ns "
            f"({(t_roll-t_mul)/160/tiles*1e9:6.1f} ns/tile)"
        )


if __name__ == "__main__":
    main()
