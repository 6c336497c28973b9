"""Pallas TPU kernel: sorted-CSR segment-sum (the SpMM aggregation core).

The per-destination reduction ``out[n] = sum_{e: dst[e]==n} data[e]`` is the
aggregation backbone of every model (reference ``torch.scatter_add_`` /
``torch_scatter``, SURVEY.md §2b).  XLA's scatter lowering on TPU runs at a
few percent of HBM bandwidth (measured ~7.9 ms for [648k, 64] -> [8000, 64]);
this kernel reformulates the reduction as dense MXU work.

Key idea: with edges sorted by destination, membership of edge position
``p`` in row ``n`` is the *interval* test ``rowptr[n] <= p < rowptr[n+1]`` —
no index values needed in the inner loop, so no misaligned integer DMA:

- grid over output row blocks of ``ROWS`` destinations; each block's CSR
  boundaries (``rowptr`` slices) arrive via an auto-pipelined BlockSpec;
- the covering edge range is streamed from HBM in double-buffered
  ``CHUNK``-edge slices via async DMA (chunk-aligned starts);
- each chunk builds ``P[c, r] = (start_r <= pos_c < end_r)`` with pure
  vector compares and accumulates ``P^T @ data_chunk`` on the MXU;
- leading alignment edges and trailing/padded-sentinel edges fall outside
  every row interval, so they self-exclude.

The feature dim is padded to 128 lanes (Mosaic tiling); callers amortize by
fusing several per-edge reductions into one wide call (see EGCLVel).
Backward of segment-sum is a row gather, wired via ``custom_vjp``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class CSRMeta:
    """Per-batch CSR block tables for the Pallas segment-sum kernel.

    Computed once per GraphBatch on the host (:func:`make_csr_meta`); the
    per-layer kernel calls then run with zero index preprocessing.
    """

    starts: jax.Array   # [n_blocks, rows] int32: rowptr[base + r]
    ends: jax.Array     # [n_blocks, rows] int32: rowptr[base + r + 1]
    cstart: jax.Array   # [n_blocks] int32 chunk-aligned first edge
    cnum: jax.Array     # [n_blocks] int32 number of chunks
    rows: int = struct.field(pytree_node=False, default=128)
    chunk: int = struct.field(pytree_node=False, default=1024)


def make_csr_meta(
    dst: np.ndarray,
    num_segments: int,
    rows: int = 128,
    chunk: int = 1024,
) -> CSRMeta:
    """Host-side CSR block tables from sorted ``dst`` (numpy)."""
    dst = np.asarray(dst)
    n_seg_pad = _round_up(num_segments, rows)
    n_blocks = n_seg_pad // rows
    rowptr = np.searchsorted(dst, np.arange(n_seg_pad + 1), side="left").astype(
        np.int32
    )
    starts = rowptr[:-1].reshape(n_blocks, rows)
    ends = rowptr[1:].reshape(n_blocks, rows)
    cstart = (starts[:, 0] // chunk) * chunk
    cnum = np.ceil((ends[:, -1] - cstart) / chunk).astype(np.int32)
    return CSRMeta(
        starts=jnp.asarray(starts),
        ends=jnp.asarray(ends),
        cstart=jnp.asarray(cstart),
        cnum=jnp.asarray(cnum),
        rows=rows,
        chunk=chunk,
    )


def _segment_sum_kernel(cstart_ref, cnum_ref, starts_ref, ends_ref, data_hbm,
                        out_ref, msg, sems, *, rows, chunk, feat):
    i = pl.program_id(0)
    e0 = cstart_ref[i]          # chunk-aligned first edge of this row block
    nchunks = cnum_ref[i]

    def start_dma(c, slot):
        e = pl.multiple_of(e0 + c * chunk, chunk)
        pltpu.make_async_copy(
            data_hbm.at[pl.ds(e, chunk)], msg.at[slot], sems.at[slot]
        ).start()

    def wait_dma(c, slot):
        e = pl.multiple_of(e0 + c * chunk, chunk)
        pltpu.make_async_copy(
            data_hbm.at[pl.ds(e, chunk)], msg.at[slot], sems.at[slot]
        ).wait()

    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(nchunks > 0)
    def _():
        start_dma(0, 0)

        starts = starts_ref[i, :]   # [rows] int32: rowptr[base + r]
        ends = ends_ref[i, :]       # [rows] int32: rowptr[base + r + 1]

        def body(c, acc):
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                start_dma(c + 1, (c + 1) % 2)

            wait_dma(c, slot)
            chunk_data = msg[slot]
            pos = (
                e0 + c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 0)
            )
            onehot = (
                (pos >= starts[None, :]) & (pos < ends[None, :])
            ).astype(chunk_data.dtype)
            acc = acc + jax.lax.dot_general(
                onehot, chunk_data,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc

        acc = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((rows, feat), jnp.float32)
        )
        out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("num_segments", "rows", "chunk", "interpret")
)
def _segment_sum_fwd_impl(data, dst, num_segments, rows, chunk, interpret):
    E, H = data.shape
    H_pad = _round_up(H, 128)
    E_pad = _round_up(E, chunk) + chunk  # slack: aligned DMA never overruns
    n_seg_pad = _round_up(num_segments, rows)
    n_blocks = n_seg_pad // rows

    data_p = jnp.zeros((E_pad, H_pad), jnp.float32).at[:E, :H].set(data)

    # CSR row pointer over sorted dst; boundaries clamp padded rows to the
    # edge count so their intervals are empty beyond num_segments - 1.
    bounds = jnp.arange(n_seg_pad + 1, dtype=jnp.int32)
    rowptr = jnp.searchsorted(dst, bounds, side="left").astype(jnp.int32)
    starts_blk = rowptr[:-1].reshape(n_blocks, rows)
    ends_blk = rowptr[1:].reshape(n_blocks, rows)

    # per-block chunk loop bounds (scalar prefetch)
    blk_first = starts_blk[:, 0]
    blk_last = ends_blk[:, rows - 1]
    cstart = (blk_first // chunk) * chunk
    cnum = jnp.ceil((blk_last - cstart) / chunk).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _segment_sum_kernel, rows=rows, chunk=chunk, feat=H_pad
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                # full rowptr-slice tables resident in VMEM (n_blocks x rows
                # int32 = KBs); indexed by program_id inside the kernel
                pl.BlockSpec(memory_space=pltpu.VMEM),   # starts
                pl.BlockSpec(memory_space=pltpu.VMEM),   # ends
                pl.BlockSpec(memory_space=pl.ANY),       # data in HBM
            ],
            out_specs=pl.BlockSpec(
                (rows, H_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, chunk, H_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_seg_pad, H_pad), jnp.float32),
        interpret=interpret,
    )(cstart, cnum, starts_blk, ends_blk, data_p)
    return out[:num_segments, :H]


@functools.partial(
    jax.jit, static_argnames=("num_segments", "rows", "chunk", "interpret")
)
def _segment_sum_csr_impl(data, meta: CSRMeta, num_segments, rows, chunk,
                          interpret):
    """Kernel call with precomputed CSR tables; avoids copies when the caller
    already conforms (E % chunk == 0, H % 128 == 0).  Accepts f32 or bf16
    data; accumulation and output are always f32."""
    E, H = data.shape
    H_pad = _round_up(H, 128)
    E_pad = E if E % chunk == 0 else _round_up(E, chunk)
    n_seg_pad = _round_up(num_segments, rows)
    n_blocks = n_seg_pad // rows

    if E_pad != E or H_pad != H:
        data = jnp.zeros((E_pad, H_pad), data.dtype).at[:E, :H].set(data)

    out = pl.pallas_call(
        functools.partial(
            _segment_sum_kernel, rows=rows, chunk=chunk, feat=H_pad
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # starts
                pl.BlockSpec(memory_space=pltpu.VMEM),   # ends
                pl.BlockSpec(memory_space=pl.ANY),       # data in HBM
            ],
            out_specs=pl.BlockSpec(
                (rows, H_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, chunk, H_pad), data.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_seg_pad, H_pad), jnp.float32),
        interpret=interpret,
    )(meta.cstart, meta.cnum, meta.starts, meta.ends, data)
    return out[:num_segments, :H]


def sorted_segment_sum_csr(
    data: jax.Array,
    dst: jax.Array,
    meta: CSRMeta,
    num_segments: int,
) -> jax.Array:
    """Segment-sum with precomputed :class:`CSRMeta` (the production path).

    Differentiable in ``data``; backward is a row gather at ``dst``.
    """
    interpret = jax.default_backend() != "tpu"
    in_dtype = data.dtype

    @jax.custom_vjp
    def f(d):
        return _segment_sum_csr_impl(
            d, meta, num_segments, meta.rows, meta.chunk, interpret
        )

    def fwd(d):
        return f(d), None

    def bwd(_, g):
        valid = dst < num_segments
        gd = jnp.take(g, dst, axis=0, mode="clip")
        return ((gd * valid[:, None].astype(gd.dtype)).astype(in_dtype),)

    f.defvjp(fwd, bwd)
    return f(data)


def sorted_segment_sum(
    data: jax.Array,
    dst: jax.Array,
    num_segments: int,
    rows: int = 128,
    chunk: int = 512,
) -> jax.Array:
    """Pallas segment-sum over dst-sorted edges (self-contained variant that
    builds the CSR tables on device each call — prefer
    :func:`sorted_segment_sum_csr` with a cached :class:`CSRMeta`).

    ``data`` [E, H] float32, ``dst`` [E] int32 non-decreasing (out-of-range
    values are dropped).  Returns [num_segments, H].  Falls back to
    interpreter mode off-TPU (tests).  Differentiable in ``data`` (backward
    is a row gather).
    """
    interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def f(d):
        return _segment_sum_fwd_impl(
            d.astype(jnp.float32), dst, num_segments, rows, chunk, interpret
        )

    def fwd(d):
        return f(d), None

    def bwd(_, g):
        valid = (dst >= 0) & (dst < num_segments)
        gd = jnp.take(g, dst, axis=0, mode="clip")
        return (gd * valid[:, None].astype(gd.dtype),)

    f.defvjp(fwd, bwd)
    return f(data)


# ---------------------------------------------------------------------------
# Gather ops whose backward reuses the kernel (the transpose of a gather is
# exactly the sorted scatter XLA is slow at).
# ---------------------------------------------------------------------------


def gather_dst(h: jax.Array, dst: jax.Array, meta: CSRMeta) -> jax.Array:
    """``h[dst]`` with Pallas segment-sum backward (dst is sorted)."""
    n = h.shape[0]

    @jax.custom_vjp
    def f(hh):
        return jnp.take(hh, dst, axis=0, mode="clip")

    def fwd(hh):
        return f(hh), None

    def bwd(_, g):
        return (sorted_segment_sum_csr(g, dst, meta, n),)

    f.defvjp(fwd, bwd)
    return f(h)


def gather_src(
    h: jax.Array,
    src: jax.Array,
    src_perm: jax.Array,
    src_sorted: jax.Array,
    meta_src: CSRMeta,
) -> jax.Array:
    """``h[src]`` with backward = permute-to-src-sorted + Pallas segment-sum.

    ``src_perm`` sorts edges by src; ``src_sorted = src[src_perm]``;
    ``meta_src`` is the CSR table over ``src_sorted``.
    """
    n = h.shape[0]

    @jax.custom_vjp
    def f(hh):
        return jnp.take(hh, src, axis=0, mode="clip")

    def fwd(hh):
        return f(hh), None

    def bwd(_, g):
        g_sorted = jnp.take(g, src_perm, axis=0)
        return (sorted_segment_sum_csr(g_sorted, src_sorted, meta_src, n),)

    f.defvjp(fwd, bwd)
    return f(h)
