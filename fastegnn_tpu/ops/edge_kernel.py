"""Fused FastEGNN edge block v2 — feature-major Pallas fwd AND bwd kernels.

Computes, per layer, the whole real<->real block of ``EGCLVel``
(reference ``models/FastEGNN.py:102-133,180-189``):

    m_e    = silu(silu([h_dst, h_src, |x_dst-x_src|^2, e_attr] W1 + b1) W2 + b2)
    gate_e = silu(m_e Wg1 + bg1) wg2
    msum_n = sum_{e: dst=n} m_e          tsum_n = sum_{e: dst=n} diff_e*gate_e

Design (validated by scripts/mosaic_lab*.py probes on the real chip):

- **Feature-major layout**: features live on *sublanes*, edges stream on
  *lanes*.  A [64, chunk] tile wastes nothing, whereas the edge-major
  [chunk, 128] layout of v1 (ops/fused_edge.py) pads H=64 -> 128 lanes and
  burns 2-4x the MXU flops.
- **Slot space**: edges are dst-sorted then re-laid-out so that every
  128-row destination block's edge range starts at a chunk-aligned offset
  (host inserts ~8-15% sentinel slots).  Grid steps therefore own disjoint
  chunk ranges — the backward pass can stream its per-edge src-gradient to
  HBM with no write races.
- **Interval one-hot**: membership of slot p in dst row r is the interval
  test ``starts[r] <= p < ends[r]``; P [chunk, rows] costs two compares.
  dst gather = hT_block @ P^T and dst scatter = stream @ P both run on the
  MXU (no random memory access anywhere in the kernel).
- **src side**: XLA pre-gathers node features by ``src`` (random-access HBM
  gather measures ~80 GB/s — cheaper than any in-kernel one-hot matmul over
  a node window, see scripts/kernel_lab.py); the kernel streams the
  pre-gathered arrays feature-major with double-buffered DMA.
- **Backward = recompute**: forward materialises nothing per-edge; bwd
  re-runs the chain per chunk, accumulates every weight grad in VMEM scratch
  across the (sequential) grid, emits dst-side node grads per block, and
  writes the per-edge src-side grad stream; XLA then permutes it src-sorted
  and the CSR segsum kernel (ops/spmm.py) scatters it into node grads.

Precision: the h/MLP path runs in ``compute_dtype`` (bf16 in production);
geometry (x, diff, radial, trans) and all accumulations stay float32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastegnn_tpu.ops.spmm import CSRMeta, make_csr_meta, sorted_segment_sum_csr

H_MAX = 64     # kernels assume hidden == 64 (the reference default)
XROWS = 8      # eattr stream rows: 0:Fe edge attrs, rest zero
# packed src-stream feature rows (one XLA gather of a [N, 128] table):
#   0:64 h (compute dtype) | 64:67 x hi | 67:70 x lo (bf16 split; lo = 0 and
#   hi = x exactly when the table dtype is f32)
PACK = 128
SROWS = 72     # d_src stream rows: 0:64 d_h_src, 64:67 d_x_src, pad
OUT_ROWS = 72  # output plane rows: 0:64 msum, 64:67 tsum, pad


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class EdgeKernelMeta:
    """Host-precomputed slot-space layout for the v2 edge kernels.

    Slot space: each 128-row dst block's (dst-sorted) edges sit contiguously
    from a chunk-aligned base; leftover slots are sentinels (outside every
    row interval; ``src_k`` 0, attrs 0).
    """

    src_k: jax.Array        # [Ek] int32 src node per slot (sentinel -> 0)
    dst_k: jax.Array        # [Ek] int32 dst node per slot (sentinel -> 0)
    eattr_k: jax.Array      # [XROWS, Ek] f32: rows 0:Fe edge attrs (sentinel 0)
    starts: jax.Array       # [n_blocks, rows] int32 slot-interval starts
    ends: jax.Array         # [n_blocks, rows] int32 slot-interval ends
    cstart: jax.Array       # [n_blocks] int32 first slot (chunk-aligned)
    cnum: jax.Array         # [n_blocks] int32 chunks in block
    blo: jax.Array          # [n_blocks] int32 first real slot (== cstart)
    bhi: jax.Array          # [n_blocks] int32 end of real slots
    # d_src scatter: slot permutation sorted by src + CSR over it
    sperm: jax.Array        # [Ek] int32
    ssorted: jax.Array      # [Ek] int32 = src at sperm (sentinels -> N)
    csr_s: CSRMeta
    rows: int = struct.field(pytree_node=False, default=128)
    chunk: int = struct.field(pytree_node=False, default=1024)
    n_slots: int = struct.field(pytree_node=False, default=0)
    eattr_fe: int = struct.field(pytree_node=False, default=2)


def make_edge_kernel_meta(
    dst: np.ndarray,
    src: np.ndarray,
    edge_attr: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    rows: int = 128,
    chunk: int = 1024,
) -> EdgeKernelMeta:
    """Build slot-space tables from (host, numpy) edge arrays."""
    dst = np.asarray(dst)
    src = np.asarray(src)
    edge_attr = np.asarray(edge_attr, np.float32)
    real = np.asarray(edge_mask) & (dst < num_nodes)
    dst_r, src_r, ea_r = dst[real], src[real], edge_attr[real]
    order = np.argsort(dst_r, kind="stable")
    dst_r, src_r, ea_r = dst_r[order], src_r[order], ea_r[order]

    n_seg_pad = _round_up(num_nodes, rows)
    n_blocks = n_seg_pad // rows
    rowptr = np.searchsorted(dst_r, np.arange(n_seg_pad + 1)).astype(np.int64)

    blk_lo = rowptr[0 : n_seg_pad : rows]
    blk_hi = rowptr[rows : n_seg_pad + 1 : rows]
    blk_e = blk_hi - blk_lo
    blk_slots = ((blk_e + chunk - 1) // chunk) * chunk
    slot_base = np.concatenate([[0], np.cumsum(blk_slots)])
    Ek = max(int(slot_base[-1]), chunk)

    # vectorised slot mapping: edge i (dst-sorted) lands at
    # slot_base[blk(i)] + (i - blk_lo[blk(i)])
    blk_of_edge = (dst_r // rows).astype(np.int64)
    slot_idx = slot_base[blk_of_edge] + np.arange(dst_r.size) - blk_lo[blk_of_edge]
    src_k = np.zeros(Ek, np.int32)
    dst_k = np.zeros(Ek, np.int32)
    eattr_k = np.zeros((XROWS, Ek), np.float32)
    sentinel = np.ones(Ek, bool)
    src_k[slot_idx] = src_r
    dst_k[slot_idx] = dst_r
    eattr_k[: edge_attr.shape[1], slot_idx] = ea_r.T
    sentinel[slot_idx] = False

    blk_of_row = np.repeat(np.arange(n_blocks), rows)
    shift = slot_base[blk_of_row] - blk_lo[blk_of_row]
    starts = (rowptr[:-1] + shift).reshape(n_blocks, rows).astype(np.int32)
    ends = (rowptr[1:] + shift).reshape(n_blocks, rows).astype(np.int32)

    src_for_sort = np.where(sentinel, num_nodes, src_k).astype(np.int64)
    sperm = np.argsort(src_for_sort, kind="stable").astype(np.int32)
    ssorted = src_for_sort[sperm].astype(np.int32)
    csr_s = make_csr_meta(ssorted, num_nodes, rows=rows, chunk=chunk)

    return EdgeKernelMeta(
        src_k=jnp.asarray(src_k),
        dst_k=jnp.asarray(dst_k),
        eattr_k=jnp.asarray(eattr_k),
        starts=jnp.asarray(starts),
        ends=jnp.asarray(ends),
        cstart=jnp.asarray(slot_base[:-1].astype(np.int32)),
        cnum=jnp.asarray((blk_slots // chunk).astype(np.int32)),
        blo=jnp.asarray(slot_base[:-1].astype(np.int32)),
        bhi=jnp.asarray(
            (slot_base[:-1] + blk_e).astype(np.int32)
        ),
        sperm=jnp.asarray(sperm),
        ssorted=jnp.asarray(ssorted),
        csr_s=csr_s,
        rows=rows,
        chunk=chunk,
        n_slots=Ek,
        eattr_fe=int(edge_attr.shape[1]),
    )


# ---------------------------------------------------------------------------
# weight packing: math layout [out, in], small vectors as columns
# ---------------------------------------------------------------------------


class PackedWeights(NamedTuple):
    wp: jax.Array   # [256, 64] cd: 0:64 W1d | 64:128 W1s | 128:192 W2 | 192:256 Wg1 (each [out, in])
    vp: jax.Array   # [64, 8] f32 columns: 0 w1r | 1 wg2 | 2:2+Fe W1e^T | 5 b1 | 6 b2 | 7 bg1


def pack_weights(W1, b1, W2, b2, Wg1, bg1, wg2, H: int, Fe: int, cd):
    """Raw flax weights (kernels are [in, out]) -> packed kernel planes."""
    assert H == H_MAX, "edge kernel v2 assumes hidden == 64"
    assert Fe <= 3, f"edge_attr dim {Fe} exceeds packing capacity"
    wp = jnp.concatenate(
        [W1[:H].T, W1[H : 2 * H].T, W2.T, Wg1.T], axis=0
    ).astype(cd)
    cols = [
        W1[2 * H][:, None],          # w1r   [H, 1]
        wg2,                         # wg2   [H, 1]
        W1[2 * H + 1 :].T,           # W1e^T [H, Fe]
        jnp.zeros((H, 3 - Fe), jnp.float32),
        b1[:, None],
        b2[:, None],
        bg1[:, None],
    ]
    vp = jnp.concatenate(cols, axis=1).astype(jnp.float32)  # [64, 8]
    return PackedWeights(wp=wp, vp=vp)


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _dsilu(z, s):
    """d silu(z) / dz given s = sigmoid(z)."""
    return s * (1.0 + z * (1.0 - s))


def _dot(a, b, dims, hp=False):
    """MXU dot; single pass, f32 accumulation (TPU f32 operands are
    truncated to bf16 per pass — use :func:`_dot_split` where that is not
    acceptable; Mosaic supports neither HIGH nor a usable HIGHEST)."""
    del hp
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_split(a, b01, dims):
    """~f32-exact dot of f32 ``a`` against an exactly-representable (0/1
    one-hot) ``b01``: split ``a`` into bf16 hi + bf16 lo and run two native
    bf16 MXU passes (error ~2^-16 relative vs 2^-8 for a single pass)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b16 = b01.astype(jnp.bfloat16)
    return _dot(hi, b16, dims) + _dot(lo, b16, dims)


def _chain_fwd(wp, vp, hd, hs, xd, xs_m, ea, fe):
    """Shared forward math on feature-major chunk tiles; returns the full
    set of intermediates (bwd recomputes through the same function)."""
    H = H_MAX
    w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]
    w2, wg1 = wp[2 * H : 3 * H, :], wp[3 * H : 4 * H, :]
    w1r, wg2 = vp[:, 0:1], vp[:, 1:2]
    w1e = vp[:, 2 : 2 + fe]
    b1, b2, bg1 = vp[:, 5:6], vp[:, 6:7], vp[:, 7:8]

    diff = xd - xs_m                                   # [3, chunk] f32
    radial = jnp.sum(diff * diff, axis=0, keepdims=True)
    z1 = (
        _dot(w1d, hd, ((1,), (0,)))
        + _dot(w1s, hs, ((1,), (0,)))
        + w1r * radial
        + _dot(w1e, ea.astype(jnp.float32), ((1,), (0,)))
        + b1
    )
    s1 = jax.nn.sigmoid(z1)
    a1 = (z1 * s1).astype(hd.dtype)
    z2 = _dot(w2, a1, ((1,), (0,))) + b2
    s2 = jax.nn.sigmoid(z2)
    m = (z2 * s2).astype(hd.dtype)
    zg = _dot(wg1, m, ((1,), (0,))) + bg1
    sg = jax.nn.sigmoid(zg)
    g1 = (zg * sg).astype(hd.dtype)
    gate = jnp.sum(wg2 * g1.astype(jnp.float32), axis=0, keepdims=True)
    trans = diff * gate
    return dict(diff=diff, radial=radial, z1=z1, s1=s1, a1=a1, z2=z2, s2=s2,
                m=m, zg=zg, sg=sg, g1=g1, gate=gate, trans=trans)




def _unpack_stream(tile, cd):
    """Packed src-stream tile [PACK, chunk] -> (hs [64, chunk] cd,
    xs [3, chunk] f32).  x columns are hi/lo bf16 split when cd is bf16."""
    hs = tile[0:H_MAX, :]
    if cd == jnp.float32:
        xs = tile[H_MAX : H_MAX + 3, :]
    else:
        xs = (
            tile[H_MAX : H_MAX + 3, :].astype(jnp.float32)
            + tile[H_MAX + 3 : H_MAX + 6, :].astype(jnp.float32)
        )
    return hs, xs


def _fwd_kernel(cstart_ref, cnum_ref, blo_ref, bhi_ref,
                starts_ref, ends_ref, wp_ref, vp_ref, hT_blk, xT_blk,
                hxs_hbm, ea_hbm,
                out_ref,
                hxs_buf, ea_buf, sems, *, rows, chunk, fe):
    b = pl.program_id(0)
    s0 = cstart_ref[b]
    nchunks = cnum_ref[b]
    hi_slot = bhi_ref[b]
    H = H_MAX

    def dma(c, slot):
        s = pl.multiple_of(s0 + c * chunk, chunk)
        return (
            pltpu.make_async_copy(hxs_hbm.at[:, pl.ds(s, chunk)],
                                  hxs_buf.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(ea_hbm.at[:, pl.ds(s, chunk)],
                                  ea_buf.at[slot], sems.at[1, slot]),
        )

    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(nchunks > 0)
    def _():
        for d in dma(0, 0):
            d.start()
        starts = starts_ref[b, :]
        ends = ends_ref[b, :]
        wp = wp_ref[:]
        vp = vp_ref[:]
        hT = hT_blk[:]
        xT = xT_blk[:].astype(jnp.float32)
        cd = hT.dtype

        def body(c, acc):
            acc_m, acc_t = acc
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                for d in dma(c + 1, (c + 1) % 2):
                    d.start()

            for d in dma(c, slot):
                d.wait()
            hs, xs = _unpack_stream(hxs_buf[slot], cd)
            ea = ea_buf[slot][0:fe, :]
            pos = (
                s0 + c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 0)
            )
            Pm = (pos >= starts[None, :]) & (pos < ends[None, :])
            P = Pm.astype(cd)
            Pf = Pm.astype(jnp.float32)
            pos1 = (
                s0 + c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            )
            inc = (pos1 < hi_slot).astype(jnp.float32)

            hd = _dot(hT, P, ((1,), (1,))).astype(cd)
            xd = _dot_split(xT[0:3, :], Pf, ((1,), (1,)))   # exact-ish gather
            f = _chain_fwd(wp, vp, hd, hs, xd, xs * inc, ea, fe)

            acc_m = acc_m + _dot(f["m"], P, ((1,), (0,)))
            acc_t = acc_t + _dot_split(f["trans"], Pf, ((1,), (0,)))
            return acc_m, acc_t

        acc_m, acc_t = jax.lax.fori_loop(
            0, nchunks, body,
            (jnp.zeros((H, rows), jnp.float32),
             jnp.zeros((3, rows), jnp.float32)),
        )
        out_ref[0:H, :] = acc_m
        out_ref[H : H + 3, :] = acc_t


def _bwd_kernel(cstart_ref, cnum_ref, blo_ref, bhi_ref,
                starts_ref, ends_ref, wp_ref, vp_ref, hT_blk, xT_blk,
                dout_blk, hxs_hbm, ea_hbm,
                ddst_ref, dwp_ref, dvp_ref, dsrc_hbm,
                hxs_buf, ea_buf, ds_buf, dwp_acc, dvp_acc, sems, dsems,
                *, rows, chunk, fe, sdt):
    b = pl.program_id(0)
    s0 = cstart_ref[b]
    nchunks = cnum_ref[b]
    hi_slot = bhi_ref[b]
    H = H_MAX

    @pl.when(b == 0)
    def _():
        dwp_acc[:] = jnp.zeros_like(dwp_acc)
        dvp_acc[:] = jnp.zeros_like(dvp_acc)

    def dma_in(c, slot):
        s = pl.multiple_of(s0 + c * chunk, chunk)
        return (
            pltpu.make_async_copy(hxs_hbm.at[:, pl.ds(s, chunk)],
                                  hxs_buf.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(ea_hbm.at[:, pl.ds(s, chunk)],
                                  ea_buf.at[slot], sems.at[1, slot]),
        )

    def dma_out(c, slot):
        s = pl.multiple_of(s0 + c * chunk, chunk)
        return pltpu.make_async_copy(
            ds_buf.at[slot], dsrc_hbm.at[:, pl.ds(s, chunk)], dsems.at[slot]
        )

    ddst_ref[:] = jnp.zeros_like(ddst_ref)

    @pl.when(nchunks > 0)
    def _():
        for d in dma_in(0, 0):
            d.start()
        starts = starts_ref[b, :]
        ends = ends_ref[b, :]
        wp = wp_ref[:]
        vp = vp_ref[:]
        w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]
        w2, wg1 = wp[2 * H : 3 * H, :], wp[3 * H : 4 * H, :]
        w1r, wg2 = vp[:, 0:1], vp[:, 1:2]
        hT = hT_blk[:]
        xT = xT_blk[:].astype(jnp.float32)
        cd = hT.dtype
        dms = dout_blk[0:H, :].astype(jnp.float32)
        dts = dout_blk[H : H + 3, :].astype(jnp.float32)

        def body(c, carry):
            acc_dh, acc_dx = carry
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                for d in dma_in(c + 1, (c + 1) % 2):
                    d.start()

            for d in dma_in(c, slot):
                d.wait()
            hs, xs = _unpack_stream(hxs_buf[slot], cd)
            ea = ea_buf[slot][0:fe, :]
            pos = (
                s0 + c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 0)
            )
            Pm = (pos >= starts[None, :]) & (pos < ends[None, :])
            P = Pm.astype(cd)
            Pf = Pm.astype(jnp.float32)
            pos1 = (
                s0 + c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            )
            inc = (pos1 < hi_slot).astype(jnp.float32)

            hd = _dot(hT, P, ((1,), (1,))).astype(cd)
            xd = _dot_split(xT[0:3, :], Pf, ((1,), (1,)))
            f = _chain_fwd(wp, vp, hd, hs, xd, xs * inc, ea, fe)

            dm_e = _dot_split(dms, Pf, ((1,), (1,)))
            dt_e = _dot_split(dts, Pf, ((1,), (1,)))

            # gate path
            d_gate = jnp.sum(f["diff"] * dt_e, axis=0, keepdims=True)
            d_diff = f["gate"] * dt_e
            d_g1 = wg2 * d_gate
            d_zg = d_g1 * _dsilu(f["zg"], f["sg"])
            d_zg_c = d_zg.astype(cd)
            d_m = dm_e + _dot(wg1, d_zg_c, ((0,), (0,)))
            # MLP chain
            d_z2 = d_m * _dsilu(f["z2"], f["s2"])
            d_z2_c = d_z2.astype(cd)
            d_a1 = _dot(w2, d_z2_c, ((0,), (0,)))
            d_z1 = d_a1 * _dsilu(f["z1"], f["s1"])
            d_z1_c = d_z1.astype(cd)
            d_hd = _dot(w1d, d_z1_c, ((0,), (0,)))
            d_hs = _dot(w1s, d_z1_c, ((0,), (0,)))
            d_rad = jnp.sum(w1r * d_z1, axis=0, keepdims=True)
            d_diff = d_diff + 2.0 * f["diff"] * d_rad

            # weight grads (VMEM accumulators across the sequential grid)
            dwp_acc[0:H, :] += _dot(d_z1_c, hd, ((1,), (1,)))
            dwp_acc[H : 2 * H, :] += _dot(d_z1_c, hs, ((1,), (1,)))
            dwp_acc[2 * H : 3 * H, :] += _dot(d_z2_c, f["a1"], ((1,), (1,)))
            dwp_acc[3 * H : 4 * H, :] += _dot(d_zg_c, f["m"], ((1,), (1,)))
            g1f = f["g1"].astype(jnp.float32)
            dvp_acc[:] += jnp.concatenate(
                [
                    jnp.sum(d_z1 * f["radial"], axis=1, keepdims=True),
                    jnp.sum(g1f * d_gate, axis=1, keepdims=True),
                    _dot(d_z1, ea.astype(jnp.float32), ((1,), (1,))),
                    jnp.zeros((H, 3 - fe), jnp.float32),
                    jnp.sum(d_z1, axis=1, keepdims=True),
                    jnp.sum(d_z2, axis=1, keepdims=True),
                    jnp.sum(d_zg, axis=1, keepdims=True),
                ],
                axis=1,
            )

            # dst-side node grads
            acc_dh = acc_dh + _dot(d_hd, Pf, ((1,), (0,)))
            acc_dx = acc_dx + _dot_split(d_diff, Pf, ((1,), (0,)))

            # src-side per-edge grad stream (packed like the input stream:
            # 0:64 d_h, 64:67 d_x hi, 67:70 d_x lo), double-buffered
            @pl.when(c >= 2)
            def _():
                dma_out(c - 2, slot).wait()
            dx_hi = (-d_diff).astype(jnp.bfloat16)
            dx_lo = (-d_diff) - dx_hi.astype(jnp.float32)
            ds_buf[slot] = jnp.concatenate(
                [
                    d_hs.astype(sdt),
                    dx_hi.astype(sdt),
                    dx_lo.astype(sdt),
                    jnp.zeros((PACK - H - 6, d_hs.shape[1]), sdt),
                ],
                axis=0,
            )
            dma_out(c, slot).start()
            return acc_dh, acc_dx

        acc_dh, acc_dx = jax.lax.fori_loop(
            0, nchunks, body,
            (jnp.zeros((H, rows), jnp.float32),
             jnp.zeros((3, rows), jnp.float32)),
        )
        ddst_ref[0:H, :] = acc_dh
        ddst_ref[H : H + 3, :] = acc_dx

        @pl.when(nchunks >= 1)
        def _():
            dma_out(nchunks - 1, (nchunks - 1) % 2).wait()

        @pl.when(nchunks >= 2)
        def _():
            dma_out(nchunks - 2, (nchunks - 2) % 2).wait()

    dwp_ref[:] = dwp_acc[:]
    dvp_ref[:] = dvp_acc[:]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _common_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # starts
        pl.BlockSpec(memory_space=pltpu.VMEM),   # ends
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
        pl.BlockSpec(memory_space=pltpu.VMEM),   # vp
    ]


@functools.partial(
    jax.jit,
    static_argnames=("rows", "chunk", "fe", "n_seg_pad", "interpret"),
)
def _fwd_impl(meta_arrs, wp, vp, hT, xT, hxsT, eaT, rows, chunk, fe,
              n_seg_pad, interpret):
    cstart, cnum, blo, bhi, starts, ends = meta_arrs
    n_blocks = n_seg_pad // rows
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rows=rows, chunk=chunk, fe=fe),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_blocks,),
            in_specs=[
                *_common_specs(),
                pl.BlockSpec((H_MAX, rows), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((XROWS, rows), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),     # packed src stream
                pl.BlockSpec(memory_space=pl.ANY),     # edge-attr stream
            ],
            out_specs=pl.BlockSpec(
                (OUT_ROWS, rows), lambda i, *_: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, PACK, chunk), hxsT.dtype),
                pltpu.VMEM((2, XROWS, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, n_seg_pad), jnp.float32),
        interpret=interpret,
    )(cstart, cnum, blo, bhi, starts, ends, wp, vp, hT, xT, hxsT, eaT)


@functools.partial(
    jax.jit,
    static_argnames=("rows", "chunk", "fe", "n_seg_pad", "n_slots",
                     "interpret", "sdt"),
)
def _bwd_impl(meta_arrs, wp, vp, hT, xT, doutT, hxsT, eaT, rows, chunk, fe,
              n_seg_pad, n_slots, interpret, sdt):
    cstart, cnum, blo, bhi, starts, ends = meta_arrs
    n_blocks = n_seg_pad // rows
    sdt = jnp.dtype(sdt)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rows=rows, chunk=chunk, fe=fe, sdt=sdt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_blocks,),
            in_specs=[
                *_common_specs(),
                pl.BlockSpec((H_MAX, rows), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((XROWS, rows), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((OUT_ROWS, rows), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),     # packed src stream
                pl.BlockSpec(memory_space=pl.ANY),     # edge-attr stream
            ],
            out_specs=(
                pl.BlockSpec((OUT_ROWS, rows), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, PACK, chunk), hxsT.dtype),
                pltpu.VMEM((2, XROWS, chunk), jnp.float32),
                pltpu.VMEM((2, PACK, chunk), sdt),
                pltpu.VMEM((4 * H_MAX, H_MAX), jnp.float32),
                pltpu.VMEM((H_MAX, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((OUT_ROWS, n_seg_pad), jnp.float32),
            jax.ShapeDtypeStruct((4 * H_MAX, H_MAX), jnp.float32),
            jax.ShapeDtypeStruct((H_MAX, 8), jnp.float32),
            jax.ShapeDtypeStruct((PACK, n_slots), sdt),
        ),
        interpret=interpret,
    )(cstart, cnum, blo, bhi, starts, ends, wp, vp, hT, xT, doutT, hxsT, eaT)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def fused_edge_block_v2(
    h: jax.Array,                 # [N, H]
    x: jax.Array,                 # [N, 3] f32
    meta: EdgeKernelMeta,
    W1, b1, W2, b2, Wg1, bg1, wg2,
    compute_dtype=jnp.float32,
    grad_stream_dtype=None,
):
    """Fully-fused edge block: ``(m_sum [N, H], trans_sum [N, 3])`` — f32
    sums over incoming edges (divide by in-degree outside for means).

    Differentiable in (h, x, weights): custom Pallas forward AND backward.
    ``grad_stream_dtype`` (default = ``compute_dtype``) sets the per-edge
    src-gradient stream precision; d_x rides a bf16 hi/lo split either way.
    """
    N, H = h.shape
    Fe = meta.eattr_fe
    cd = jnp.dtype(compute_dtype)
    sdt = jnp.dtype(grad_stream_dtype or compute_dtype)
    rows, chunk = meta.rows, meta.chunk
    n_seg_pad = _round_up(N, rows)
    interpret = jax.default_backend() != "tpu"
    meta_arrs = (meta.cstart, meta.cnum, meta.blo, meta.bhi, meta.starts,
                 meta.ends)

    def build_streams(h, x):
        hT = jnp.zeros((H_MAX, n_seg_pad), cd).at[:H, :N].set(h.astype(cd).T)
        xT = jnp.zeros((XROWS, n_seg_pad), jnp.float32).at[:3, :N].set(x.T)
        # packed per-node table -> one gather -> one transpose
        if cd == jnp.float32:
            xcols = jnp.concatenate([x, jnp.zeros((N, 3), jnp.float32)], 1)
        else:
            x_hi = x.astype(jnp.bfloat16)
            x_lo = x - x_hi.astype(jnp.float32)
            xcols = jnp.concatenate(
                [x_hi.astype(jnp.float32), x_lo.astype(jnp.float32)], 1
            )
        table = jnp.concatenate(
            [
                h.astype(jnp.float32),
                xcols,
                jnp.zeros((N, PACK - H - 6), jnp.float32),
            ],
            axis=1,
        ).astype(cd)                                      # [N, PACK]
        hxsT = jnp.take(table, meta.src_k, axis=0).T      # [PACK, Ek]
        return hT, xT, hxsT

    @jax.custom_vjp
    def f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        out, _ = _fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)
        return out

    def _fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        wp, vp = pack_weights(W1, b1, W2, b2, Wg1, bg1, wg2, H, Fe, cd)
        hT, xT, hxsT = build_streams(h, x)
        outT = _fwd_impl(meta_arrs, wp, vp, hT, xT, hxsT, meta.eattr_k,
                         rows, chunk, Fe, n_seg_pad, interpret)
        m_sum = outT[:H, :N].T
        t_sum = outT[H : H + 3, :N].T
        return (m_sum, t_sum), (wp, vp, hT, xT, hxsT)

    def fwd(*args):
        return _fwd(*args)

    def bwd(res, g):
        wp, vp, hT, xT, hxsT = res
        d_msum, d_tsum = g
        doutT = (
            jnp.zeros((OUT_ROWS, n_seg_pad), jnp.float32)
            .at[:H, :N].set(d_msum.astype(jnp.float32).T)
            .at[H : H + 3, :N].set(d_tsum.astype(jnp.float32).T)
        )
        ddstT, dwp, dvp, dsrcT = _bwd_impl(
            meta_arrs, wp, vp, hT, xT, doutT, hxsT, meta.eattr_k, rows,
            chunk, Fe, n_seg_pad, meta.n_slots, interpret, sdt,
        )
        # scatter the src stream: permute to src-sorted order + CSR segsum
        dsrc_sorted = jnp.take(dsrcT.T, meta.sperm, axis=0)
        dnode = sorted_segment_sum_csr(
            dsrc_sorted, meta.ssorted, meta.csr_s, N
        )                                                  # [N, PACK] f32
        d_h = ddstT[:H, :N].T + dnode[:, :H]
        d_x = (
            ddstT[H : H + 3, :N].T
            + dnode[:, H : H + 3]
            + dnode[:, H + 3 : H + 6]
        )
        dW1 = jnp.concatenate(
            [
                dwp[:H, :].T,
                dwp[H : 2 * H, :].T,
                dvp[:, 0][None, :],
                dvp[:, 2 : 2 + Fe].T,
            ],
            axis=0,
        )
        return (
            d_h.astype(h.dtype),
            d_x,
            dW1,
            dvp[:, 5],
            dwp[2 * H : 3 * H, :].T,
            dvp[:, 6],
            dwp[3 * H : 4 * H, :].T,
            dvp[:, 7],
            dvp[:, 1][:, None],
        )

    f.defvjp(fwd, bwd)
    return f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)
