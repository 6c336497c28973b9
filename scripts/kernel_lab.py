"""Micro-benchmarks for the Pallas segment-sum kernel + gather strategies.

Findings feed the fused-edge-block v2 design. Run on the real TPU only.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8000
DEGREE = 60


def build_edges(seed=0, sort_nodes=False):
    rng = np.random.default_rng(seed)
    r = 0.035
    vol = N * (4.0 / 3.0) * np.pi * r**3 / DEGREE
    side = vol ** (1.0 / 3.0)
    loc = (rng.random((N, 3)) * side).astype(np.float32)
    if sort_nodes:
        # Morton-order (bit-interleave) spatial sort of nodes
        q = np.clip((loc / side * 1024).astype(np.int64), 0, 1023)
        code = np.zeros(N, np.int64)
        for b in range(10):
            for d in range(3):
                code |= ((q[:, d] >> b) & 1) << (3 * b + d)
        order = np.argsort(code, kind="stable")
        loc = loc[order]
    from fastegnn_tpu.ops.neighbors import radius_graph_np

    dst, src = radius_graph_np(loc, r)
    o = np.argsort(dst, kind="stable")
    dst, src = dst[o].astype(np.int32), src[o].astype(np.int32)
    E = dst.size
    E_pad = ((E + 4095) // 4096) * 4096
    dst = np.concatenate([dst, np.full(E_pad - E, N, np.int32)])
    src = np.concatenate([src, np.zeros(E_pad - E, np.int32)])
    return dst, src, E


def timeit(fn, label, n=50):
    r = fn(); float(jnp.sum(r[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(r[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<52s} {dt:9.3f} ms")
    return dt


# --- variant kernels ---------------------------------------------------------

def _round_up(x, m):
    return ((x + m - 1) // m) * m


def seg_kernel(cstart_ref, cnum_ref, starts_ref, ends_ref, data_hbm,
               out_ref, msg, sems, *, rows, chunk, feat, do_p, do_dot):
    i = pl.program_id(0)
    e0 = cstart_ref[i]
    nchunks = cnum_ref[i]

    def dma(c, slot):
        e = pl.multiple_of(e0 + c * chunk, chunk)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(e, chunk)], msg.at[slot], sems.at[slot]
        )

    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()
        starts = starts_ref[i, :]
        ends = ends_ref[i, :]

        def body(c, acc):
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                dma(c + 1, (c + 1) % 2).start()

            dma(c, slot).wait()
            chunk_data = msg[slot]
            if do_p:
                pos = (
                    e0 + c * chunk
                    + jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 0)
                )
                onehot = (
                    (pos >= starts[None, :]) & (pos < ends[None, :])
                ).astype(chunk_data.dtype)
            else:
                onehot = jnp.zeros((chunk, rows), chunk_data.dtype)
            if do_dot:
                acc = acc + jax.lax.dot_general(
                    onehot, chunk_data,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                acc = acc + jnp.sum(chunk_data, axis=0)[None, :] + onehot[0, 0]
            return acc

        acc = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((rows, feat), jnp.float32)
        )
        out_ref[:] = acc


def make_segsum(dst_np, rows, chunk, do_p=True, do_dot=True, feat=128):
    n_seg_pad = _round_up(N, rows)
    n_blocks = n_seg_pad // rows
    rowptr = np.searchsorted(dst_np, np.arange(n_seg_pad + 1)).astype(np.int32)
    starts = rowptr[:-1].reshape(n_blocks, rows)
    ends = rowptr[1:].reshape(n_blocks, rows)
    cstart = (starts[:, 0] // chunk) * chunk
    cnum = np.ceil((ends[:, -1] - cstart) / chunk).astype(np.int32)
    cstart_j, cnum_j = jnp.asarray(cstart), jnp.asarray(cnum)
    starts_j, ends_j = jnp.asarray(starts), jnp.asarray(ends)

    @jax.jit
    def run(data):
        return pl.pallas_call(
            functools.partial(seg_kernel, rows=rows, chunk=chunk, feat=feat,
                              do_p=do_p, do_dot=do_dot),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (rows, feat), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, chunk, feat), data.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((n_seg_pad, feat), jnp.float32),
        )(cstart_j, cnum_j, starts_j, ends_j, data)

    return run


def main():
    print("backend:", jax.default_backend())
    dst, src, E_real = build_edges(sort_nodes=False)
    dst_s, src_s, _ = build_edges(sort_nodes=True)
    E = dst.shape[0]
    print(f"edges real={E_real} padded={E}")
    data16 = jnp.ones((E, 128), jnp.bfloat16)
    data32 = jnp.ones((E, 128), jnp.float32)
    table16 = jnp.ones((N, 128), jnp.bfloat16)

    src_j = jnp.asarray(src)
    srcs_j = jnp.asarray(src_s)

    take = jax.jit(lambda h, i: jnp.take(h, i, axis=0, mode="clip"))
    timeit(lambda: take(table16, src_j), "XLA take by src, random node order")
    timeit(lambda: take(table16, srcs_j), "XLA take by src, Morton node order")

    for chunk in (1024, 2048, 4096):
        run = make_segsum(dst, rows=128, chunk=chunk)
        timeit(lambda: run(data16), f"segsum bf16 rows=128 chunk={chunk}")
    for rows in (256, 512):
        run = make_segsum(dst, rows=rows, chunk=2048)
        timeit(lambda: run(data16), f"segsum bf16 rows={rows} chunk=2048")
    run = make_segsum(dst, rows=128, chunk=2048)
    timeit(lambda: run(data32), "segsum f32 rows=128 chunk=2048")
    # ablations at rows=128 chunk=2048
    run = make_segsum(dst, rows=128, chunk=2048, do_dot=False)
    timeit(lambda: run(data16), "  ablate: DMA+rowsum only (no P, no dot)")
    run = make_segsum(dst, rows=128, chunk=2048, do_p=False)
    timeit(lambda: run(data16), "  ablate: dot with zero P (no compare build)")


if __name__ == "__main__":
    main()
