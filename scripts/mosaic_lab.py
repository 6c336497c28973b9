"""Mosaic capability probes for the fused edge-block v2 design.

Tests, on the real TPU:
 1. take_along_axis lane gather (tpu.dynamic_gather) inside a kernel
 2. sublane slice of a VMEM ref + broadcast along sublanes
 3. equality one-hot build S^T[j,e] = (j == src[e]) via broadcasted iota
 4. dot_general with non-standard contraction dims (1,1) and (0,0)
 5. DMA of a lane-slice window from an HBM-resident [F, N] array
 6. timing: gather variants at workload scale
"""

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
        jnp.sum(r).block_until_ready()
        float(jnp.sum(r.astype(jnp.float32)))
    except Exception as e:
        print(f"{label:<56s} FAIL: {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<56s} {dt:9.3f} ms")
    return dt


W = 2048     # window lanes
CH = 2048    # chunk (edges per iteration)
F = 64       # feature sublanes


def probe1_dynamic_gather():
    """out[f, e] = x[f, idx[f, e]] — lane gather, idx replicated on sublanes."""

    def kernel(x_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0:1, :], (F, W))
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

    x = jnp.arange(F * W, dtype=jnp.float32).reshape(F, W)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, W, (8, W)), jnp.int32)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((F, W), jnp.float32),
        )(x, idx)

    try:
        out = np.asarray(run(x, idx))
        ref = np.asarray(x)[np.arange(F)[:, None], np.asarray(idx)[0][None, :]]
        ok = np.allclose(out, ref)
        print(f"{'probe1 dynamic_gather lanes f32':<56s} correct={ok}")
    except Exception as e:
        print(f"{'probe1 dynamic_gather lanes f32':<56s} FAIL: {str(e)[:150]}")
        return False
    # bf16 variant
    def kernel16(x_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0:1, :], (F, W))
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

    @jax.jit
    def run16(x, idx):
        return pl.pallas_call(
            kernel16, out_shape=jax.ShapeDtypeStruct((F, W), jnp.bfloat16)
        )(x, idx)

    try:
        out = np.asarray(run16(x.astype(jnp.bfloat16), idx))
        print(f"{'probe1b dynamic_gather lanes bf16':<56s} correct={np.allclose(out, ref, atol=8)}")
    except Exception as e:
        print(f"{'probe1b dynamic_gather lanes bf16':<56s} FAIL: {str(e)[:150]}")
    return True


def probe3_eq_onehot():
    """S^T [W, CH] = (iota_sub == src_row) and gather via dot_general."""

    def kernel(x_ref, src_ref, out_ref):
        j = jax.lax.broadcasted_iota(jnp.int32, (W, CH), 0)
        s = jnp.broadcast_to(src_ref[0:1, :], (W, CH))
        S_T = (j == s).astype(jnp.bfloat16)           # [W, CH]
        xw = x_ref[:]                                  # [F, W] bf16
        out_ref[:] = jax.lax.dot_general(
            xw, S_T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(F, W)), jnp.bfloat16
    )
    src = jnp.asarray(np.random.default_rng(2).integers(0, W, (8, CH)), jnp.int32)

    @jax.jit
    def run(x, src):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((F, CH), jnp.float32)
        )(x, src)

    try:
        out = np.asarray(run(x, src))
        ref = np.asarray(x.astype(jnp.float32))[:, np.asarray(src)[0]]
        print(f"{'probe3 eq-onehot gather via dot (1,0)':<56s} correct={np.allclose(out, ref, atol=1e-2)}")
    except Exception as e:
        print(f"{'probe3 eq-onehot gather via dot':<56s} FAIL: {str(e)[:150]}")


def probe4_scatter_dot():
    """d_window [F, W] = dot(dm [F, CH], S^T [W, CH]) contracting (1,1)."""

    def kernel(dm_ref, src_ref, out_ref):
        j = jax.lax.broadcasted_iota(jnp.int32, (W, CH), 0)
        s = jnp.broadcast_to(src_ref[0:1, :], (W, CH))
        S_T = (j == s).astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            dm_ref[:], S_T, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dm = jnp.asarray(np.random.default_rng(3).normal(size=(F, CH)), jnp.bfloat16)
    src_np = np.random.default_rng(4).integers(0, W, CH)
    src = jnp.asarray(np.broadcast_to(src_np, (8, CH)), jnp.int32)

    @jax.jit
    def run(dm, src):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((F, W), jnp.float32)
        )(dm, src)

    try:
        out = np.asarray(run(dm, src))
        ref = np.zeros((F, W), np.float32)
        np.add.at(ref.T, src_np, np.asarray(dm.astype(jnp.float32)).T)
        print(f"{'probe4 eq-onehot scatter via dot (1,1)':<56s} correct={np.allclose(out, ref, atol=2e-1)}")
    except Exception as e:
        print(f"{'probe4 eq-onehot scatter via dot':<56s} FAIL: {str(e)[:150]}")


def probe5_lane_slice_dma():
    """DMA a lane-window [F, W] from HBM [F, N] at dynamic 512-aligned offset."""
    N = 8192

    def kernel(off_ref, hbm_ref, out_ref, buf, sem):
        w0 = pl.multiple_of(off_ref[0], 512)
        cp = pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(w0, W)], buf, sem
        )
        cp.start()
        cp.wait()
        out_ref[:] = buf[:]

    x = jnp.arange(F * N, dtype=jnp.float32).reshape(F, N)
    off = jnp.asarray([1024], jnp.int32)

    @jax.jit
    def run(off, x):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((F, W), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((F, W), jnp.float32),
        )(off, x)

    try:
        out = np.asarray(run(off, x))
        ref = np.asarray(x)[:, 1024 : 1024 + W]
        print(f"{'probe5 lane-slice DMA HBM window':<56s} correct={np.allclose(out, ref)}")
    except Exception as e:
        print(f"{'probe5 lane-slice DMA HBM window':<56s} FAIL: {str(e)[:150]}")


def probe6_timing():
    """Time: 200 chunks of eq-onehot gather+scatter vs dynamic_gather."""
    NCH = 200

    def kern_eq(x_ref, src_ref, out_ref):
        def body(c, acc):
            j = jax.lax.broadcasted_iota(jnp.int32, (W, CH), 0)
            s = jnp.broadcast_to(src_ref[c, 0:1, :], (W, CH))
            S_T = (j == s).astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                x_ref[:], S_T, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(g, axis=1, keepdims=True)
        out_ref[:] = jax.lax.fori_loop(
            0, NCH, body, jnp.zeros((F, 1), jnp.float32)
        ) + jnp.zeros((F, 128), jnp.float32)

    x = jnp.asarray(np.random.default_rng(5).normal(size=(F, W)), jnp.bfloat16)
    src = jnp.asarray(
        np.random.default_rng(6).integers(0, W, (NCH, 8, CH)), jnp.int32
    )

    @jax.jit
    def run_eq(x, src):
        return pl.pallas_call(
            kern_eq, out_shape=jax.ShapeDtypeStruct((F, 128), jnp.float32)
        )(x, src)

    timeit(lambda: run_eq(x, src), f"probe6 eq-onehot gather x{NCH} chunks (W={W},CH={CH})")

    def kern_dg(x_ref, src_ref, out_ref):
        def body(c, acc):
            idx = jnp.broadcast_to(src_ref[c, 0:1, :], (F, CH))
            g = jnp.take_along_axis(x_ref[:], idx, axis=1)
            return acc + jnp.sum(g.astype(jnp.float32), axis=1, keepdims=True)
        out_ref[:] = jax.lax.fori_loop(
            0, NCH, body, jnp.zeros((F, 1), jnp.float32)
        ) + jnp.zeros((F, 128), jnp.float32)

    @jax.jit
    def run_dg(x, src):
        return pl.pallas_call(
            kern_dg, out_shape=jax.ShapeDtypeStruct((F, 128), jnp.float32)
        )(x, src)

    timeit(lambda: run_dg(x, src), f"probe6 dynamic_gather x{NCH} chunks")

    # matmul throughput reference: same loop, plain [F,W]@[W,CH] dots
    w_mat = jnp.asarray(np.random.default_rng(7).normal(size=(W, CH)), jnp.bfloat16)

    def kern_mm(x_ref, w_ref, out_ref):
        def body(c, acc):
            g = jax.lax.dot_general(
                x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(g, axis=1, keepdims=True)
        out_ref[:] = jax.lax.fori_loop(
            0, NCH, body, jnp.zeros((F, 1), jnp.float32)
        ) + jnp.zeros((F, 128), jnp.float32)

    @jax.jit
    def run_mm(x, w):
        return pl.pallas_call(
            kern_mm, out_shape=jax.ShapeDtypeStruct((F, 128), jnp.float32)
        )(x, w)

    dt = timeit(lambda: run_mm(x, w_mat), f"probe6 plain dot [64,{W}]x[{W},{CH}] x{NCH}")
    if dt:
        fl = NCH * 2 * F * W * CH / (dt / 1e3)
        print(f"    -> {fl/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe1_dynamic_gather()
    probe3_eq_onehot()
    probe4_scatter_dot()
    probe5_lane_slice_dma()
    probe6_timing()
