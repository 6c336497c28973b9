"""Micro-bench: optax tree-Adam vs flat-vector Adam on the real param tree.

Hypothesis (step_parts3: Adam adds 4.45 ms to a 2.7 ms grad): ~130 small
leaves x ~8 elementwise ops each = ~1000 tiny TPU kernels, fixed overhead
dominated.  A single ravel'd vector should collapse this to a handful of
large fused kernels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_batch
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import torch_adam


def timed(label, fn, n=100):
    r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:8].astype(jnp.float32)))
    print(f"{label:<40s} {(time.perf_counter() - t0) / n * 1e3:9.3f} ms")


def main():
    print("backend:", jax.default_backend())
    batch, _, _ = build_batch(400, 20, channels=3)
    model = FastEGNN(hidden=64, virtual_channels=3, n_layers=4,
                     gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
    params = model.init(jax.random.key(0), batch)["params"]
    leaves = jax.tree.leaves(params)
    print("leaves:", len(leaves), "params:", sum(l.size for l in leaves))

    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, params)

    tx = torch_adam(5e-4, 1e-12)
    opt_state = tx.init(params)

    @jax.jit
    def tree_update(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state

    timed("optax tree adam", lambda: tree_update(params, opt_state, grads))

    # flat variant
    from jax.flatten_util import ravel_pytree
    flat0, unravel = ravel_pytree(params)
    mu = jnp.zeros_like(flat0)
    nu = jnp.zeros_like(flat0)
    cnt = jnp.zeros((), jnp.int32)

    @jax.jit
    def flat_update(params, mu, nu, cnt, grads):
        g, _ = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        g = g + 1e-12 * p
        cnt = cnt + 1
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * (g * g)
        t = cnt.astype(jnp.float32)
        mu_hat = mu / (1.0 - 0.9**t)
        nu_hat = nu / (1.0 - 0.999**t)
        p = p - 5e-4 * mu_hat / (jnp.sqrt(nu_hat) + 1e-8)
        return unravel(p), mu, nu, cnt

    timed("flat adam (ravel per step)",
          lambda: flat_update(params, mu, nu, cnt, grads))

    # flat state variant: params live flat between steps
    @jax.jit
    def flat_update2(pflat, mu, nu, cnt, grads):
        g, _ = ravel_pytree(grads)
        g = g + 1e-12 * pflat
        cnt = cnt + 1
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * (g * g)
        t = cnt.astype(jnp.float32)
        mu_hat = mu / (1.0 - 0.9**t)
        nu_hat = nu / (1.0 - 0.999**t)
        pflat = pflat - 5e-4 * mu_hat / (jnp.sqrt(nu_hat) + 1e-8)
        return pflat, mu, nu, cnt

    timed("flat adam (flat params state)",
          lambda: flat_update2(flat0, mu, nu, cnt, grads))


if __name__ == "__main__":
    main()
