"""Second round of Mosaic probes for the block-pair fused kernel design."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, label, n=50):
    try:
        r = fn()
        float(jnp.sum(r.astype(jnp.float32)))
    except Exception as e:
        print(f"{label:<56s} FAIL: {type(e).__name__}: {str(e)[:130]}")
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<56s} {dt:9.3f} ms")
    return dt


def probe_vmem_lane_slice():
    """Read a [F, 256] lane window of a VMEM-resident [F, 8192] table at a
    dynamic 128-aligned offset; and accumulate back (read-modify-write)."""
    F, N, W = 72, 8192, 256

    def kernel(off_ref, tab_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        off = pl.multiple_of(off_ref[i], 128)
        win = tab_ref[:, pl.ds(off, W)]          # dynamic lane-slice read
        out_ref[:] = win * 2.0
        # read-modify-write accumulate at dynamic lane offset
        acc_ref[:, pl.ds(off, W)] += win

    tab = jnp.asarray(np.random.default_rng(0).normal(size=(F, N)), jnp.float32)
    offs = jnp.asarray([1024, 2048], jnp.int32)

    @jax.jit
    def run(offs, tab):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(2,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((F, W), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((2 * F, W), jnp.float32),
                jax.ShapeDtypeStruct((F, N), jnp.float32),
            ),
        )(offs, tab)

    try:
        out, acc = run(offs, tab)
        out, acc = np.asarray(out), np.asarray(acc)
        ref = np.asarray(tab)
        ok1 = np.allclose(out[:F], ref[:, 1024:1280] * 2)
        ok2 = np.allclose(out[F:], ref[:, 2048:2304] * 2)
        print(f"{'probe: VMEM dynamic lane-slice read':<56s} correct={ok1 and ok2}")
    except Exception as e:
        print(f"{'probe: VMEM dynamic lane-slice read':<56s} FAIL: {str(e)[:200]}")


def probe_small_matmul_loop():
    """Per-iteration overhead: loops of small dots + one-hot builds."""
    for NT, S, W in ((2000, 512, 256), (1000, 1024, 256), (500, 1024, 512)):
        F = 72

        def kern(x_ref, src_ref, out_ref):
            def body(t, acc):
                j = jax.lax.broadcasted_iota(jnp.int32, (W, S), 0)
                s = jnp.broadcast_to(src_ref[t, 0:1, :], (W, S))
                S_T = (j == s).astype(jnp.bfloat16)
                g = jax.lax.dot_general(
                    x_ref[:], S_T, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )   # [F, S]
                return acc + jnp.sum(g, axis=1, keepdims=True)
            out_ref[:] = jax.lax.fori_loop(
                0, NT, body, jnp.zeros((F, 1), jnp.float32)
            ) + jnp.zeros((F, 128), jnp.float32)

        x = jnp.asarray(np.random.default_rng(1).normal(size=(F, W)), jnp.bfloat16)
        src = jnp.asarray(
            np.random.default_rng(2).integers(0, W, (NT, 8, S)), jnp.int32
        )

        @jax.jit
        def run(x, src):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((F, 128), jnp.float32)
            )(x, src)

        dt = timeit(lambda: run(x, src), f"loop x{NT}: eq-dot [F,{W}]x[{W},{S}]")
        if dt:
            print(f"    -> {dt*1e3/NT:.2f} us/iter, slots/s = {NT*S/(dt/1e3)/1e6:.0f}M")


def probe_sublane_gather():
    """dynamic_gather variant [0]: out[i, l] = x[idx[i, l], l]."""
    W = 512

    def kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:, :, None], axis=0)[
            :, :, 0
        ]

    x = jnp.arange(W * 128, dtype=jnp.float32).reshape(W, 128)
    idx_np = np.random.default_rng(3).integers(0, W, (W, 128))
    idx = jnp.asarray(idx_np, jnp.int32)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((W, 128), jnp.float32)
        )(x, idx)

    try:
        out = np.asarray(run(x, idx))
        ref = np.asarray(x)[idx_np, np.arange(128)[None, :]]
        print(f"{'probe: sublane dynamic_gather':<56s} correct={np.allclose(out, ref)}")
    except Exception as e:
        print(f"{'probe: sublane dynamic_gather':<56s} FAIL: {str(e)[:160]}")


def probe_transpose_small():
    """In-kernel transpose [8, 2048] -> [2048, 8] (index column extraction)."""

    def kernel(x_ref, out_ref):
        out_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    x = jnp.arange(8 * 2048, dtype=jnp.float32).reshape(8, 2048)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((2048, 8), jnp.float32)
        )(x)

    try:
        out = np.asarray(run(x))
        print(f"{'probe: transpose [8,2048]->[2048,8]':<56s} correct={np.allclose(out, np.asarray(x).T)}")
    except Exception as e:
        print(f"{'probe: transpose small':<56s} FAIL: {str(e)[:160]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe_vmem_lane_slice()
    probe_sublane_gather()
    probe_transpose_small()
    probe_small_matmul_loop()
