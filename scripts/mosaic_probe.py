"""Isolate the Mosaic 'vector.broadcast f32 -> bf16 vector' verification
failure that appeared on the remote-compile toolchain (2026-08-18): tiny
pallas kernels exercising each suspect pattern from edge_kernel_v5."""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def run(name, body, n_in=1, dtype=jnp.bfloat16):
    x = jnp.asarray(np.random.randn(64, 2048), dtype)

    def kern(x_ref, o_ref):
        o_ref[:] = body(x_ref[:]).astype(jnp.float32)

    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((64, 2048), jnp.float32),
        )
        r = jax.jit(f)(x)
        float(jnp.sum(r[:2, :2]))
        print(f"{name:<40s} OK")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:<40s} FAIL {msg}")
        return False


def main():
    print("backend:", jax.default_backend())
    run("sigmoid bf16", lambda z: jax.nn.sigmoid(z))
    run("1.0 - bf16", lambda z: 1.0 - z)
    run("bf16 * (1.0 - s)", lambda z: z * (1.0 - jax.nn.sigmoid(z)))
    run("exp bf16", lambda z: jnp.exp(z))
    run("f32row bcast * bf16 -> bf16",
        lambda z: (jnp.broadcast_to(
            jnp.sum(z.astype(jnp.float32), 0, keepdims=True),
            z.shape) * 1.0).astype(jnp.bfloat16) * z)
    run("astype-chain f32->bf16",
        lambda z: (z.astype(jnp.float32) + 1.0).astype(jnp.bfloat16))
    run("zeros bf16 concat",
        lambda z: jnp.concatenate(
            [z[:32], jnp.zeros((32, z.shape[1]), z.dtype)], 0))
    run("scalar f32 traced bcast to bf16",
        lambda z: (jnp.float32(2.0) * z.astype(jnp.float32)).astype(
            jnp.bfloat16))


if __name__ == "__main__":
    main()
