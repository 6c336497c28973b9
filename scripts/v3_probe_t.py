"""Probes for the transposed-stream v3 redesign:
  p1: dot_general (0,0) contraction  big = PT^T @ T    — correctness + time
  p2: bitcast i32->f32 of a sublane slice inside a kernel
  p3: iota-vs-row compare building PdT [128, chunk]
  p4: timing: (0,0) form vs (1,0) form of the big gather dot
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512
K = 646


def timeit(fn, label, n=100):
    r = fn(); float(jnp.sum(r.ravel()[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(r.ravel()[:8].astype(jnp.float32)))
    print(f"{label:<44s} {(time.perf_counter()-t0)/n*1e3:8.4f} ms")


def p1():
    def k(pt_ref, t_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            pt_ref[:], t_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    pt = jnp.asarray(np.random.default_rng(0).normal(size=(K, CHUNK)), jnp.bfloat16)
    t = jnp.asarray(np.random.default_rng(1).normal(size=(K, 70)), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((CHUNK, 70), jnp.float32),
        )(pt, t)
        ref = np.asarray(pt, np.float32).T @ np.asarray(t, np.float32)
        ok = np.allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-1)
        print(f"{'p1 dot (0,0) PT^T@T correct':<44s} {ok}")
    except Exception as e:
        print(f"p1 FAIL: {str(e)[:160]}")


def p2():
    def k(blk_ref, o_ref):
        ea = jax.lax.bitcast_convert_type(blk_ref[2:8, :], jnp.float32)
        o_ref[:] = ea

    rng = np.random.default_rng(0)
    f = rng.normal(size=(8, CHUNK)).astype(np.float32)
    blk = jnp.asarray(f.view(np.int32))
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((6, CHUNK), jnp.float32),
        )(blk)
        ok = np.allclose(np.asarray(out), f[2:8])
        print(f"{'p2 bitcast i32->f32 sublane slice':<44s} {ok}")
    except Exception as e:
        print(f"p2 FAIL: {str(e)[:160]}")


def p3():
    def k(blk_ref, o_ref):
        dl = blk_ref[0:1, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, CHUNK), 0)
        o_ref[:] = (iota == dl).astype(jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (8, CHUNK)).astype(np.int32)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, CHUNK), jnp.float32),
        )(jnp.asarray(ids))
        ref = (np.arange(128)[:, None] == ids[0:1]).astype(np.float32)
        print(f"{'p3 PdT iota==row compare':<44s} {np.array_equal(np.asarray(out), ref)}")
    except Exception as e:
        print(f"p3 FAIL: {str(e)[:160]}")


def p4():
    NCH = 200

    def k00(pt_ref, t_ref, o_ref):
        c = pl.program_id(0)
        acc = jax.lax.dot_general(
            pt_ref[:], t_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(c == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += acc

    def k10(p_ref, t_ref, o_ref):
        c = pl.program_id(0)
        acc = jax.lax.dot_general(
            p_ref[:], t_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(c == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += acc

    rng = np.random.default_rng(0)
    pt = jnp.asarray(rng.normal(size=(K, CHUNK)), jnp.bfloat16)
    p = jnp.asarray(rng.normal(size=(CHUNK, K)), jnp.bfloat16)
    t = jnp.asarray(rng.normal(size=(K, 70)), jnp.bfloat16)

    @jax.jit
    def r00(pt, t):
        return pl.pallas_call(
            k00, grid=(NCH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CHUNK, 70), jnp.float32),
        )(pt, t)

    @jax.jit
    def r10(p, t):
        return pl.pallas_call(
            k10, grid=(NCH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CHUNK, 70), jnp.float32),
        )(p, t)

    try:
        timeit(lambda: r00(pt, t), f"p4 dot (0,0) x{NCH}")
    except Exception as e:
        print(f"p4 (0,0) FAIL: {str(e)[:160]}")
    try:
        timeit(lambda: r10(p, t), f"p4 dot (1,0) x{NCH}")
    except Exception as e:
        print(f"p4 (1,0) FAIL: {str(e)[:160]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    p1(); p2(); p3(); p4()
