"""Precision control for small-matrix geometry math.

On TPU, f32 matmuls default to bfloat16 MXU passes (~3e-3 relative error).
That is the right trade for the big front-end kernels, but fatal for 3x3
rotation algebra, Jacobians, and normal-equation assembly. Every small
matrix product in geometry/imu/optim goes through `matmul_hp`, which pins
`precision='highest'` (full f32 on the MXU/VPU).
"""
from functools import partial

import jax.numpy as jnp

matmul_hp = partial(jnp.matmul, precision="highest")


def einsum_hp(subscripts, *operands):
    return jnp.einsum(subscripts, *operands, precision="highest")
