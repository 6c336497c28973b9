"""Probes for the flat-chunk-grid orientation-B kernel design.

 p1: column [C,1] lane-broadcast compare (slot-major one-hot build)
 p2: blocked input with narrow lane dim (block (chunk, 8) of [n,8] i32)
 p3: out BlockSpec revisiting same block across grid steps (prefetch
     index_map) with read-modify-write accumulation
 p4: full-VMEM out RMW at dynamic sublane offsets across MANY grid steps
"""

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 512


def run_probe(label, fn):
    try:
        out = fn()
        print(f"{label}: OK {out}")
    except Exception:
        print(f"{label}: FAIL")
        print(traceback.format_exc()[-1200:])


def p1():
    def kernel(ids_ref, out_ref):
        dl = ids_ref[:, 0:1]                       # [C, 1] i32
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
        P = (iota == dl).astype(jnp.bfloat16)      # [C, 128]
        out_ref[:] = jax.lax.dot_general(
            P, jnp.ones((C, 8), jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    ids = jnp.asarray(
        np.random.default_rng(0).integers(-1, 128, (C, 8)), jnp.int32
    )
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32)
    )(ids)
    idn = np.asarray(ids)[:, 0]
    ref = np.zeros(128)
    for v in idn:
        if v >= 0:
            ref[v] += 1
    ok = np.allclose(np.asarray(out)[:, 0], ref)
    return f"correct={ok}"


def p2():
    n_chunks = 8

    def kernel(ids_ref, out_ref):
        out_ref[:] = jnp.sum(
            ids_ref[:].astype(jnp.float32), axis=0, keepdims=True
        ) + jnp.zeros((8, 8), jnp.float32)

    ids = jnp.asarray(
        np.arange(n_chunks * C * 8).reshape(n_chunks * C, 8) % 97, jnp.int32
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((C, 8), lambda c: (c, 0))],
        out_specs=pl.BlockSpec((8, 8), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
    )(ids)
    ref = np.asarray(ids)[(n_chunks - 1) * C :].sum(0)
    ok = np.allclose(np.asarray(out)[0], ref)
    return f"correct={ok} (last block)"


def p3():
    n_chunks = 12
    cdb = np.repeat(np.arange(4), 3).astype(np.int32)   # 3 chunks per block
    first = (np.arange(12) % 3 == 0).astype(np.int32)

    def kernel(cdb_ref, first_ref, x_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += x_ref[:]

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_chunks * 8, 128)), jnp.float32
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((8, 128), lambda c, cdb, first: (c, 0))],
            out_specs=pl.BlockSpec(
                (8, 128), lambda c, cdb, first: (cdb[c], 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((4 * 8, 128), jnp.float32),
    )(jnp.asarray(cdb), jnp.asarray(first), x)
    xn = np.asarray(x).reshape(n_chunks, 8, 128)
    ref = np.stack([xn[3 * b : 3 * b + 3].sum(0) for b in range(4)])
    ok = np.allclose(np.asarray(out).reshape(4, 8, 128), ref, atol=1e-5)
    return f"correct={ok}"


def p4():
    n_chunks = 48
    NP = 2048
    rng = np.random.default_rng(2)
    off = rng.integers(0, NP // 128, n_chunks).astype(np.int32)

    def kernel(off_ref, x_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        o = off_ref[c] * 128
        cur = out_ref[pl.ds(o, 128), :]
        out_ref[pl.ds(o, 128), :] = cur + x_ref[:]

    x = jnp.asarray(rng.normal(size=(n_chunks * 128, 128)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((128, 128), lambda c, off: (c, 0))],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NP, 128), jnp.float32),
    )(jnp.asarray(off), x)
    xn = np.asarray(x).reshape(n_chunks, 128, 128)
    ref = np.zeros((NP, 128), np.float32)
    for c in range(n_chunks):
        ref[off[c] * 128 : off[c] * 128 + 128] += xn[c]
    ok = np.allclose(np.asarray(out), ref, atol=1e-4)
    return f"correct={ok}"


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run_probe("p1 column lane-broadcast compare", p1)
    run_probe("p2 narrow-lane blocked input", p2)
    run_probe("p3 revisited out block accumulate", p3)
    run_probe("p4 full-VMEM out dynamic RMW across grid", p4)
