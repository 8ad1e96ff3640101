"""Compile/run check: pool_moments fwd+bwd at the packed block-1 shape.

The round-3b backward kernel overflowed Mosaic's ~16 MB scoped VMEM at
(33, 224, 112, 128) bf16 (tile 28 -> 16.83 MB stack); the byte-budgeted
row tile (ops/_pallas_utils.pool_row_tile) must keep it compiling. Run
on the real TPU: `python benchmarks/pool_vmem_check.py`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from fpsg_tpu.ops.pool_moments import pool_moments

    b, h, w2, c2 = 33, 224, 112, 128
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (b, h, w2, c2), jnp.bfloat16)
    s = jnp.zeros((c2,), jnp.float32)

    def loss(y):
        zs, zq, ymax, ymin = pool_moments(y, s)
        return (jnp.sum(zs) + jnp.sum(zq)
                + jnp.sum(ymax.astype(jnp.float32))
                + jnp.sum(ymin.astype(jnp.float32)))

    g = jax.jit(jax.grad(loss))(y)
    print("grad ok:", g.shape, g.dtype,
          float(jnp.sum(jnp.abs(g).astype(jnp.float32))))


if __name__ == "__main__":
    main()
