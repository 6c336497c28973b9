"""Fused FastEGNN edge-block forward kernel (Pallas TPU).

One pass over the dst-sorted edge stream computing, per edge,
``m = silu(silu([h_dst, h_src, |x_dst-x_src|^2, e_attr] W1 + b1) W2 + b2)``,
the coordinate gate ``g = (silu(m Wg1 + bg1)) w_g``, ``trans = (x_dst -
x_src) * g``, and the per-destination sums of ``m`` and ``trans`` — i.e. the
whole real<->real block of an EGCLVel layer (models/fast_egnn.py) minus the
division by cached in-degrees.

Design (extends ops/spmm.py's interval matching):
- ONE packed 128-lane layout everywhere (Mosaic permits neither narrow-lane
  DMA nor lane slicing): node stream ``[h | x | 0]``, edge stream
  ``[h_src | x_src | e_attr | 0]``; weight matrices are zero-padded so each
  matmul picks out its block, the x-columns are isolated by an elementwise
  mask, and real columns are sliced only *outside* the kernel;
- grid over output row blocks of ROWS destinations; the dst-side features
  are "gathered" to edges by the same one-hot interval matmul used for the
  reduction — dst gather costs MXU flops instead of HBM random access;
- the src side (random access) is pre-gathered by XLA and streamed in
  double-buffered chunks;
- backward: ``jax.custom_vjp`` whose bwd runs the VJP of the *unfused*
  composition (which itself scatters through the Pallas CSR kernel), so
  gradients are exactly the reference math's.

Supported config: no attention, no normalize, no tanh, mean aggregation —
the reference-paper configuration; the layer falls back otherwise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastegnn_tpu.ops.spmm import CSRMeta, _round_up

LANES = 128


class EdgeBlockWeights(NamedTuple):
    """Edge-path weights in the packed 128-lane layout."""

    w1d: jax.Array    # [128, 128] rows 0:H = W1[h_dst block]
    w1s: jax.Array    # [128, 128] rows 0:H = W1[h_src], rows H+3:H+3+Fe = W1[e_attr]
    w1r: jax.Array    # [1, 128]   W1[radial row]
    b1: jax.Array     # [1, 128]
    w2: jax.Array     # [128, 128]
    b2: jax.Array     # [1, 128]
    wg1: jax.Array    # [128, 128]
    bg1: jax.Array    # [1, 128]
    wg2: jax.Array    # [128, 128] (col 0 = gate head)
    xmask: jax.Array  # [1, 128]   1.0 at the x columns H:H+3


def pack_weights(W1, b1, W2, b2, Wg1, bg1, wg2, H: int, Fe: int,
                 dtype=jnp.float32) -> EdgeBlockWeights:
    """Split/pad raw [2H+1+Fe, H]... weights into the packed kernel layout."""

    def pad(a, rows=LANES, at_row=0):
        out = jnp.zeros((rows, LANES), dtype)
        return out.at[at_row : at_row + a.shape[0], : a.shape[1]].set(
            a.astype(dtype)
        )

    w1s = pad(W1[H : 2 * H])
    w1s = w1s.at[H + 3 : H + 3 + Fe, : W1.shape[1]].set(
        W1[2 * H + 1 :].astype(dtype)
    )
    xmask = jnp.zeros((1, LANES), dtype).at[0, H : H + 3].set(1.0)
    return EdgeBlockWeights(
        w1d=pad(W1[:H]),
        w1s=w1s,
        w1r=pad(W1[2 * H : 2 * H + 1], rows=1),
        b1=pad(b1[None], rows=1),
        w2=pad(W2),
        b2=pad(b2[None], rows=1),
        wg1=pad(Wg1),
        bg1=pad(bg1[None], rows=1),
        wg2=pad(wg2),
        xmask=xmask,
    )


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _fused_kernel(cstart_ref, cnum_ref, starts_ref, ends_ref,
                  hx_win,
                  w1d, w1s, w1r, b1, w2, b2, wg1, bg1, wg2, xmask,
                  src_hbm,
                  msum_ref, tsum_ref,
                  src_buf, sems,
                  *, rows, chunk):
    i = pl.program_id(0)
    e0 = cstart_ref[i]
    nchunks = cnum_ref[i]

    def dma(c, slot):
        e = pl.multiple_of(e0 + c * chunk, chunk)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(e, chunk)], src_buf.at[slot], sems.at[slot]
        )

    msum_ref[:] = jnp.zeros_like(msum_ref)
    tsum_ref[:] = jnp.zeros_like(tsum_ref)

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()
        starts = starts_ref[i, :]
        ends = ends_ref[i, :]
        hw = hx_win[:]                       # [R, 128]
        xm = xmask[0, :]                     # [128]
        w1r_row = w1r[0, :]
        dot32 = functools.partial(
            jax.lax.dot_general, preferred_element_type=jnp.float32
        )
        dn = (((1,), (0,)), ((), ()))
        dn_T = (((0,), (0,)), ((), ()))
        cd = hw.dtype

        def body(c, accs):
            acc_m, acc_t = accs
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                dma(c + 1, (c + 1) % 2).start()

            dma(c, slot).wait()
            pos = (
                e0 + c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 0)
            )
            P = ((pos >= starts[None, :]) & (pos < ends[None, :])).astype(cd)
            hx_dst = dot32(P, hw, dimension_numbers=dn).astype(cd)
            src = src_buf[slot]
            diffx = (hx_dst - src) * xm      # only x columns survive
            radial = jnp.sum(diffx * diffx, axis=1, keepdims=True)

            m = (
                dot32(hx_dst, w1d[:], dimension_numbers=dn)
                + dot32(src, w1s[:], dimension_numbers=dn)
                + radial * w1r_row
                + b1[0, :]
            )
            m = _silu(m).astype(cd)
            m = _silu(
                dot32(m, w2[:], dimension_numbers=dn) + b2[0, :]
            ).astype(cd)
            gp = _silu(
                dot32(m, wg1[:], dimension_numbers=dn) + bg1[0, :]
            ).astype(cd)
            g = jnp.sum(
                dot32(gp, wg2[:], dimension_numbers=dn), axis=1, keepdims=True
            )
            transp = (diffx * g).astype(cd)

            acc_m = acc_m + dot32(P, m, dimension_numbers=dn_T)
            acc_t = acc_t + dot32(P, transp, dimension_numbers=dn_T)
            return acc_m, acc_t

        acc_m, acc_t = jax.lax.fori_loop(
            0, nchunks, body,
            (jnp.zeros((rows, LANES), jnp.float32),
             jnp.zeros((rows, LANES), jnp.float32)),
        )
        msum_ref[:] = acc_m
        tsum_ref[:] = acc_t


@functools.partial(
    jax.jit,
    static_argnames=("num_segments", "rows", "chunk", "interpret", "H"),
)
def _fused_fwd_impl(hx_node, src_pre, weights: EdgeBlockWeights,
                    meta: CSRMeta, num_segments, rows, chunk, interpret,
                    H=64):
    n_seg_pad = _round_up(num_segments, rows)
    n_blocks = n_seg_pad // rows
    if hx_node.shape[0] != n_seg_pad:
        hx_node = jnp.zeros((n_seg_pad, LANES), hx_node.dtype).at[
            : hx_node.shape[0]
        ].set(hx_node)

    msum, tsum = pl.pallas_call(
        functools.partial(_fused_kernel, rows=rows, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # starts
                pl.BlockSpec(memory_space=pltpu.VMEM),   # ends
                pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),   # hx window
                *[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,  # weights
                pl.BlockSpec(memory_space=pl.ANY),       # src stream (HBM)
            ],
            out_specs=(
                pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, chunk, LANES), hx_node.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_seg_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_seg_pad, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(meta.cstart, meta.cnum, meta.starts, meta.ends, hx_node, *weights,
      src_pre)
    return msum[:num_segments, :H], tsum[:num_segments, H : H + 3]


def fused_edge_block(
    h: jax.Array,            # [N, H] node features (unpadded width)
    x: jax.Array,            # [N, 3]
    graph,                   # GraphBatch with csr_dst etc.
    W1, b1, W2, b2, Wg1, bg1, wg2,
    unfused_fn,              # callable(h, x, W1..wg2) -> (m_sum, t_sum)
    compute_dtype=jnp.float32,
):
    """Fused forward; backward = VJP of ``unfused_fn`` (exact reference math)."""
    meta = graph.csr_dst
    H = h.shape[1]
    Fe = graph.edge_attr.shape[1]
    assert H + 3 + Fe <= LANES, "packed layout needs H + 3 + Fe <= 128"
    interpret = jax.default_backend() != "tpu"
    N = h.shape[0]

    @jax.custom_vjp
    def f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        cd = jnp.dtype(compute_dtype)
        weights = pack_weights(W1, b1, W2, b2, Wg1, bg1, wg2, H, Fe, cd)
        hx_node = (
            jnp.zeros((N, LANES), cd)
            .at[:, :H].set(h.astype(cd))
            .at[:, H : H + 3].set(x.astype(cd))
        )
        src_pre = jnp.take(hx_node, graph.src, axis=0, mode="clip")
        src_pre = src_pre.at[:, H + 3 : H + 3 + Fe].set(
            graph.edge_attr.astype(cd)
        )
        return _fused_fwd_impl(
            hx_node, src_pre, weights, meta, N, meta.rows, meta.chunk,
            interpret, H=H,
        )

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(unfused_fn, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)
