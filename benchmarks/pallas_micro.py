"""Micro-benchmarks: Pallas grid-step overhead + one-hot matmul rate."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recommender_system_tpu.utils.benchmark import bench_fn


def grid_overhead(n_steps, tr, c):
    """Grid of n_steps; each step: [tr,c]@[c,128] matmul from pipelined blocks."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    a = jnp.ones((n_steps * 1, tr, c), jnp.float32)  # one block per step
    b = jnp.ones((c, 128), jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, tr, c), lambda i: (i, 0, 0)),
                  pl.BlockSpec((c, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, tr, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_steps, tr, 128), jnp.float32),
    )
    # adapt kernel signature for the leading block dim
    def kernel3(a_ref, b_ref, o_ref):
        o_ref[0] = jnp.dot(a_ref[0], b_ref[:],
                           preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kernel3,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, tr, c), lambda i: (i, 0, 0)),
                  pl.BlockSpec((c, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, tr, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_steps, tr, 128), jnp.float32),
    )
    t = bench_fn(jax.jit(f), a, b)
    flops = n_steps * tr * c * 128 * 2
    bw = n_steps * (tr * c + tr * 128) * 4
    print(f"steps={n_steps:5d} block [{tr:4d},{c:4d}]@[{c:4d},128]: "
          f"{t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s  "
          f"{bw/t/1e9:6.0f} GB/s  {t/n_steps*1e6:6.2f} us/step")


for n, tr, c in [(512, 512, 1024), (1024, 512, 512), (2048, 256, 256),
                 (1024, 256, 256), (592, 512, 1024), (488, 512, 2048),
                 (2048, 8, 128)]:
    try:
        grid_overhead(n, tr, c)
    except Exception as e:
        print(f"steps={n} [{tr},{c}]: FAILED {str(e)[:100]}")

# bf16 variant
def grid_overhead_bf16(n_steps, tr, c):
    def kernel3(a_ref, b_ref, o_ref):
        o_ref[0] = jnp.dot(a_ref[0], b_ref[:],
                           preferred_element_type=jnp.float32)

    a = jnp.ones((n_steps, tr, c), jnp.bfloat16)
    b = jnp.ones((c, 128), jnp.bfloat16)
    f = pl.pallas_call(
        kernel3,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, tr, c), lambda i: (i, 0, 0)),
                  pl.BlockSpec((c, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, tr, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_steps, tr, 128), jnp.float32),
    )
    t = bench_fn(jax.jit(f), a, b)
    flops = n_steps * tr * c * 128 * 2
    print(f"bf16 steps={n_steps:5d} block [{tr},{c}]: {t*1e3:7.3f} ms  "
          f"{flops/t/1e12:6.1f} TF/s  {t/n_steps*1e6:6.2f} us/step")


for n, tr, c in [(512, 512, 1024), (1024, 512, 512)]:
    grid_overhead_bf16(n, tr, c)
