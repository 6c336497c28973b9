"""Fused FastEGNN edge block v3 — window-tiled one-big-matmul kernels.

Computes the same real<->real edge block as v2 (``ops/edge_kernel.py``;
reference ``models/FastEGNN.py:102-133,180-189``):

    m_e    = silu(silu([h_dst, h_src, |x_dst-x_src|^2, e_attr] W1 + b1) W2 + b2)
    gate_e = silu(m_e Wg1 + bg1) wg2
    msum_n = sum_{e: dst=n} m_e          tsum_n = sum_{e: dst=n} diff_e*gate_e

Design (v2's two XLA-side costs — the per-edge src pre-gather and the
d_src permute+segsum scatter, ~10 ms/layer of the 15 — are eliminated;
everything runs inside two Pallas kernels):

- **Window tiling**: edges are grouped by destination 128-row block; each
  block's edges are packed into CHUNK-slot chunks whose sources are drawn
  from a *window* of at most W source 128-node blocks (host greedy pack,
  `make_v3_meta`).  Spatially-ordered nodes (datasets emit them; Morton
  sort upstream if not) make W=2..4 cover real radius graphs with a few
  percent padding.
- **Node-major VMEM table**: one [Npad, 128] table (cols 0:64 h,
  64:67 x hi, 67:70 x lo) lives whole in VMEM.  The dst slice and the W
  window slices are dynamic sublane subslices — no HBM gather stream.
- **One-hot matmuls, weight-folded**: per chunk, dst/src one-hots are
  iota==id compares; the z1 linear is ONE matmul `T @ P` where
  T = [w1d@tab_d | w1s@tab_win | W1e | b1] and P = [Pd; Ps; ea; 1] —
  gather, both input projections, the edge-attr term and the bias fused
  into a single MXU pass.
- **Backward in-kernel scatter**: node grads accumulate into a whole-VMEM
  node-major accumulator (dst block via the blocked output, src windows
  via read-modify-write at dynamic sublane offsets) — the v2 d_src
  HBM stream, permute, and CSR segsum are gone.

Precision: h/MLP path in ``compute_dtype`` (bf16 production); x rides the
table as an exact bf16 hi+lo split; accumulation f32 everywhere.
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

H_MAX = 64
ROWS = 128          # dst block rows / src window block size
EA_ROWS = 8         # ea stream rows: 0:fe edge attrs, rest zero


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class EdgeKernelV3Meta:
    """Host-precomputed window-tiled slot layout (see module docstring).

    Slot-major streams: the kernels iterate a flat grid over chunks, and
    Mosaic's pipeline streams the per-chunk blocks automatically.
    """

    ids: jax.Array       # [n_slots, 8] i32: col 0 dst-local id, col 1 window
                         #  gid (= widx*128 + src-local); sentinel slots -1
    eattr_k: jax.Array   # [n_slots, 8] f32: cols 0:fe edge attrs (sentinel
                         #  0), col 7 constant 1.0 (bias lane)
    win: jax.Array       # [n_chunks, W] i32 window src-block ids (pad 0)
    cdb: jax.Array       # [n_chunks] i32 dst block of each chunk
    first: jax.Array     # [n_chunks] i32 1 iff first chunk of its dst block
    chunk: int = struct.field(pytree_node=False, default=512)
    W: int = struct.field(pytree_node=False, default=2)
    n_slots: int = struct.field(pytree_node=False, default=0)
    n_chunks: int = struct.field(pytree_node=False, default=0)
    n_blocks: int = struct.field(pytree_node=False, default=0)
    eattr_fe: int = struct.field(pytree_node=False, default=2)


def make_v3_meta(
    dst: np.ndarray,
    src: np.ndarray,
    edge_attr: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    chunk: int = 512,
    W: int = 2,
) -> EdgeKernelV3Meta:
    """Greedy window packing of (dst-block, src-block) tiles into chunks.

    Edges are sorted by (dst_block, src_block); per dst block, tiles are
    packed into chunks of ``chunk`` slots holding at most ``W`` distinct
    source blocks; a chunk closes (sentinel-padded) when either capacity
    is exhausted.
    """
    dst = np.asarray(dst)
    src = np.asarray(src)
    edge_attr = np.asarray(edge_attr, np.float32)
    real = np.asarray(edge_mask) & (dst < num_nodes)
    eidx = np.nonzero(real)[0]
    dst_r, src_r = dst[eidx], src[eidx]
    db = dst_r // ROWS
    sb = src_r // ROWS
    order = np.lexsort((sb, db))
    eidx, dst_r, src_r, db, sb = (
        eidx[order], dst_r[order], src_r[order], db[order], sb[order]
    )

    n_blocks = _round_up(num_nodes, ROWS) // ROWS
    # tile runs: consecutive equal (db, sb)
    key = db.astype(np.int64) * (sb.max(initial=0) + 1) + sb
    tile_bounds = np.concatenate(
        [[0], np.nonzero(np.diff(key))[0] + 1, [key.size]]
    )

    # greedy pack (python loop over tiles; ~hundreds per batch)
    chunks = []          # (db, window[list], slots[list of edge positions])
    cur = None

    def close():
        nonlocal cur
        if cur is not None:
            chunks.append(cur)
            cur = None

    for t in range(tile_bounds.size - 1):
        lo, hi = int(tile_bounds[t]), int(tile_bounds[t + 1])
        if lo == hi:
            continue
        tdb, tsb = int(db[lo]), int(sb[lo])
        pos = lo
        while pos < hi:
            if cur is not None and cur[0] != tdb:
                close()
            if cur is None:
                cur = (tdb, [], [])
            if tsb not in cur[1]:
                if len(cur[1]) == W:
                    close()
                    cur = (tdb, [], [])
                cur[1].append(tsb)
            take = min(chunk - len(cur[2]), hi - pos)
            if take == 0:
                close()
                continue
            widx = cur[1].index(tsb)
            cur[2].extend(
                (int(p), widx) for p in range(pos, pos + take)
            )
            pos += take
            if len(cur[2]) == chunk:
                close()
    close()

    # Every dst block must be visited by >= 1 chunk: the kernels zero the
    # block's output plane on its first chunk, so an uncovered block (no
    # in-edges — possible with heavy padding or isolated nodes) would
    # otherwise return uninitialised memory.  Append all-sentinel chunks.
    covered = {c[0] for c in chunks}
    chunks.extend((b, [], []) for b in range(n_blocks) if b not in covered)
    n_chunks = len(chunks)

    n_slots = n_chunks * chunk
    ids = np.full((n_slots, 8), -1, np.int32)
    eattr_k = np.zeros((n_slots, 8), np.float32)
    eattr_k[:, 7] = 1.0                 # bias lane
    win = np.zeros((n_chunks, W), np.int32)
    cdb_arr = np.zeros(n_chunks, np.int32)
    for ci, (cdb, window, slots) in enumerate(chunks):
        win[ci, : len(window)] = window
        cdb_arr[ci] = cdb
        base = ci * chunk
        if slots:
            p = np.asarray([s[0] for s in slots])
            widx = np.asarray([s[1] for s in slots])
            sl = slice(base, base + len(slots))
            ids[sl, 0] = dst_r[p] % ROWS
            ids[sl, 1] = widx * ROWS + src_r[p] % ROWS
            eattr_k[sl, : edge_attr.shape[1]] = edge_attr[eidx[p]]
    first = np.ones(n_chunks, np.int32)
    first[1:] = (np.diff(cdb_arr) != 0).astype(np.int32)

    return EdgeKernelV3Meta(
        ids=jnp.asarray(ids),
        eattr_k=jnp.asarray(eattr_k),
        win=jnp.asarray(win),
        cdb=jnp.asarray(cdb_arr),
        first=jnp.asarray(first),
        chunk=chunk,
        W=W,
        n_slots=n_slots,
        n_chunks=n_chunks,
        n_blocks=n_blocks,
        eattr_fe=int(edge_attr.shape[1]),
    )


# ---------------------------------------------------------------------------
# weight packing (orientation B: flax [in, out] kernels used directly)
# ---------------------------------------------------------------------------


class PackedWeightsV3(NamedTuple):
    wp: jax.Array    # [256, 64] cd: 0:64 W1d | 64:128 W1s | 128:192 W2 |
                     #   192:256 Wg1 (all [in, out])
    eT: jax.Array    # [8, 72] cd: rows 0:fe = W1 edge-attr rows, row 7 = b1
                     #   (cols 64:72 zero) — the T-matrix tail block
    vp3: jax.Array   # [8, 1, 128] f32 rows (own tiles, offset-0 broadcast):
                     #   0 w1r | 1 wg2 | 2 b2 | 3 bg1


def pack_weights_v3(W1, b1, W2, b2, Wg1, bg1, wg2, H: int, Fe: int, cd):
    assert H == H_MAX, "edge kernel v3 assumes hidden == 64"
    assert Fe <= 3, f"edge_attr dim {Fe} exceeds packing capacity"
    wp = jnp.concatenate([W1[:H], W1[H : 2 * H], W2, Wg1], axis=0).astype(cd)
    eT = jnp.zeros((8, 72), jnp.float32)
    eT = eT.at[0:Fe, 0:H].set(W1[2 * H + 1 :])
    eT = eT.at[7, 0:H].set(b1)
    vp3 = jnp.zeros((8, 1, 128), jnp.float32)
    vp3 = vp3.at[0, 0, 0:H].set(W1[2 * H])
    vp3 = vp3.at[1, 0, 0:H].set(wg2[:, 0])
    vp3 = vp3.at[2, 0, 0:H].set(b2)
    vp3 = vp3.at[3, 0, 0:H].set(bg1)
    return PackedWeightsV3(wp=wp, eT=eT.astype(cd), vp3=vp3)


def _silu_f32(z):
    s = jax.nn.sigmoid(z)
    return z * s, s


def _dsilu(z, s):
    return s * (1.0 + z * (1.0 - s))


def _hi_lo(v, cd):
    """Split an f32 value into (hi, lo) in compute dtype; exact when cd is
    f32 (lo = 0) and a 2^-16-relative split when cd is bf16."""
    hi = v.astype(cd)
    lo = (v - hi.astype(jnp.float32)).astype(cd)
    return hi, lo


def _chunk_fwd(tab_ref, wp_ref, eT_ref, vp3_ref, ids, ea, cdb_ref, win_ref, c, W, cd):
    """Shared per-chunk forward; returns intermediates for reuse in bwd."""
    H = H_MAX
    chunk = ids.shape[0]
    wp = wp_ref[:]
    w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]

    td = tab_ref[pl.ds(cdb_ref[c] * 128, 128), :]           # dst block slice
    stacked = jnp.concatenate(
        [tab_ref[pl.ds(win_ref[c, k] * 128, 128), :] for k in range(W)],
        axis=0,
    )                                                        # [W*128, 128]
    fold_d = jax.lax.dot_general(
        td[:, 0:H], w1d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)                                             # [128, 64]
    fold_w = jax.lax.dot_general(
        stacked[:, 0:H], w1s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)                                             # [W*128, 64]
    block_d = jnp.concatenate([fold_d, td[:, H : H + 6]], axis=1)
    block_w = jnp.concatenate([fold_w, -stacked[:, H : H + 6]], axis=1)
    T = jnp.concatenate(
        [block_d, block_w, eT_ref[:, 0:70]], axis=0
    )                                                        # [K, 70]

    dl = ids[:, 0:1]
    gl = ids[:, 1:2]
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (chunk, W * 128), 1)
    Pd = (iota_d == dl).astype(cd)                           # [chunk, 128]
    Ps = (iota_s == gl).astype(cd)
    P = jnp.concatenate([Pd, Ps, ea.astype(cd)], axis=1)     # [chunk, K]

    big = jax.lax.dot_general(
        P, T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [chunk, 70]
    diff = big[:, H : H + 3] + big[:, H + 3 : H + 6]         # f32
    radial = jnp.sum(diff * diff, axis=1, keepdims=True)
    w1r = vp3_ref[0]                                         # [1, 128]
    z1 = big[:, 0:H] + radial * w1r[:, 0:H]
    a1f, s1 = _silu_f32(z1)
    a1 = a1f.astype(cd)
    z2 = jax.lax.dot_general(
        a1, wp[2 * H : 3 * H, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + vp3_ref[2][:, 0:H]
    mf, s2 = _silu_f32(z2)
    m = mf.astype(cd)
    zg = jax.lax.dot_general(
        m, wp[3 * H : 4 * H, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + vp3_ref[3][:, 0:H]
    g1, sg = _silu_f32(zg)
    gate = jnp.sum(g1 * vp3_ref[1][:, 0:H], axis=1, keepdims=True)
    trans = diff * gate
    return dict(td=td, stacked=stacked, P=P, Pd=Pd, diff=diff, radial=radial,
                z1=z1, s1=s1, a1=a1, z2=z2, s2=s2, m=m, zg=zg, sg=sg, g1=g1,
                gate=gate, trans=trans)


def _fwd_kernel(cdb_ref, first_ref, win_ref, wp_ref, eT_ref, vp3_ref,
                tab_ref, ids_ref, ea_ref, out_ref, *, W, cd):
    c = pl.program_id(0)
    f = _chunk_fwd(tab_ref, wp_ref, eT_ref, vp3_ref, ids_ref[:], ea_ref[:],
                   cdb_ref, win_ref, c, W, cd)
    t_hi, t_lo = _hi_lo(f["trans"], cd)
    chunk = ids_ref.shape[0]
    scat_in = jnp.concatenate(
        [f["m"], t_hi, t_lo, jnp.zeros((chunk, 2), cd)], axis=1
    )                                                        # [chunk, 72]
    contrib = jax.lax.dot_general(
        f["Pd"], scat_in, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [128, 72]

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


def _bwd_kernel(cdb_ref, first_ref, win_ref, wp_ref, eT_ref, vp3_ref,
                tab_ref, ids_ref, ea_ref, dout_ref,
                ddst_ref, dsrc_ref, dwmat_ref, dvec_ref, *, W, cd):
    H = H_MAX
    c = pl.program_id(0)
    KW = 128 + W * 128
    chunk = ids_ref.shape[0]

    @pl.when(c == 0)
    def _():
        dsrc_ref[:] = jnp.zeros_like(dsrc_ref)
        dwmat_ref[:] = jnp.zeros_like(dwmat_ref)
        dvec_ref[:] = jnp.zeros_like(dvec_ref)

    f = _chunk_fwd(tab_ref, wp_ref, eT_ref, vp3_ref, ids_ref[:], ea_ref[:],
                   cdb_ref, win_ref, c, W, cd)
    wp = wp_ref[:]
    w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]
    w2, wg1 = wp[2 * H : 3 * H, :], wp[3 * H : 4 * H, :]

    de = jax.lax.dot_general(
        f["Pd"], dout_ref[:].astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [chunk, 72]
    dm_e = de[:, 0:H]
    dt_e = de[:, H : H + 3]

    d_gate = jnp.sum(f["diff"] * dt_e, axis=1, keepdims=True)
    d_diff = f["gate"] * dt_e
    wg2 = vp3_ref[1][:, 0:H]
    d_zg = (d_gate * wg2) * _dsilu(f["zg"], f["sg"])
    d_zg_c = d_zg.astype(cd)
    d_m = dm_e + jax.lax.dot_general(
        d_zg_c, wg1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_z2 = d_m * _dsilu(f["z2"], f["s2"])
    d_z2_c = d_z2.astype(cd)
    d_a1 = jax.lax.dot_general(
        d_z2_c, w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_z1 = d_a1 * _dsilu(f["z1"], f["s1"])
    w1r = vp3_ref[0][:, 0:H]
    d_radial = jnp.sum(d_z1 * w1r, axis=1, keepdims=True)
    d_diff = d_diff + 2.0 * f["diff"] * d_radial
    d_z1_c = d_z1.astype(cd)
    dhi, dlo = _hi_lo(d_diff, cd)
    dbig = jnp.concatenate(
        [d_z1_c, dhi, dlo, jnp.zeros((chunk, 2), cd)], axis=1
    )                                                        # [chunk, 72]

    dT = jax.lax.dot_general(
        f["P"], dbig, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [K, 72]

    # ---- weight grads ----
    td, stacked = f["td"], f["stacked"]
    dW1d = jax.lax.dot_general(
        td[:, 0:H], dT[0:128, 0:H].astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dW1s = jax.lax.dot_general(
        stacked[:, 0:H], dT[128:KW, 0:H].astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dW2 = jax.lax.dot_general(
        f["a1"], d_z2_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dWg1 = jax.lax.dot_general(
        f["m"], d_zg_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwmat_ref[:] += jnp.concatenate([dW1d, dW1s, dW2, dWg1], axis=0)

    z72 = jnp.zeros((1, 72 - H), jnp.float32)

    def row(v):                                   # [1, H] -> [1, 72]
        return jnp.concatenate([v, z72], axis=1)

    dvec_ref[:] += jnp.concatenate(
        [
            dT[KW : KW + 8, :],
            row(jnp.sum(d_z1 * f["radial"], axis=0, keepdims=True)),
            row(jnp.sum(f["g1"] * d_gate, axis=0, keepdims=True)),
            row(jnp.sum(d_z2, axis=0, keepdims=True)),
            row(jnp.sum(d_zg, axis=0, keepdims=True)),
            jnp.zeros((4, 72), jnp.float32),
        ],
        axis=0,
    )                                                        # [16, 72]

    # ---- dst node grads (blocked out, accumulated per block) ----
    dn_h = jax.lax.dot_general(
        dT[0:128, 0:H].astype(cd), w1d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [128, 64]
    dn_x = dT[0:128, H : H + 3] + dT[0:128, H + 3 : H + 6]
    dn = jnp.concatenate(
        [dn_h, dn_x, jnp.zeros((128, 5), jnp.float32)], axis=1
    )                                                        # [128, 72]

    @pl.when(first_ref[c] == 1)
    def _():
        ddst_ref[:] = jnp.zeros_like(ddst_ref)

    ddst_ref[:] += dn

    # ---- src node grads (full-VMEM accumulator, dynamic RMW per window) ----
    dw_h = jax.lax.dot_general(
        dT[128:KW, 0:H].astype(cd), w1s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [W*128, 64]
    dw_x = -(dT[128:KW, H : H + 3] + dT[128:KW, H + 3 : H + 6])
    dw = jnp.concatenate(
        [dw_h, dw_x, jnp.zeros((W * 128, 128 - H - 3), jnp.float32)], axis=1
    )                                                        # [W*128, 128]
    for k in range(W):
        o = pl.multiple_of(win_ref[c, k] * 128, 128)
        cur = dsrc_ref[pl.ds(o, 128), :]
        dsrc_ref[pl.ds(o, 128), :] = cur + dw[k * 128 : (k + 1) * 128, :]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("chunk", "W", "n_seg_pad", "interpret")
)
def _fwd_impl(meta_arrs, wp, eT, vp3, tab, ids, ea, chunk, W, n_seg_pad,
              interpret):
    cdb, first, win = meta_arrs
    n_chunks = cdb.shape[0]
    cd = tab.dtype
    # f32 mode: force full-precision MXU passes (TPU default is one bf16
    # pass, which would silently degrade the "exact" f32 path to ~1e-2)
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, W=W, cd=cd),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eT
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vp3
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tab (resident)
                    pl.BlockSpec((chunk, 8), lambda c, cdb, first, win: (c, 0)),
                    pl.BlockSpec((chunk, 8), lambda c, cdb, first, win: (c, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (128, 72), lambda c, cdb, first, win: (cdb[c], 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((n_seg_pad, 72), jnp.float32),
            interpret=interpret,
        )(cdb, first, win, wp, eT, vp3, tab, ids, ea)


@functools.partial(
    jax.jit, static_argnames=("chunk", "W", "n_seg_pad", "interpret")
)
def _bwd_impl(meta_arrs, wp, eT, vp3, tab, ids, ea, dout, chunk, W,
              n_seg_pad, interpret):
    cdb, first, win = meta_arrs
    n_chunks = cdb.shape[0]
    cd = tab.dtype
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, W=W, cd=cd),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eT
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vp3
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tab (resident)
                    pl.BlockSpec((chunk, 8), lambda c, cdb, first, win: (c, 0)),
                    pl.BlockSpec((chunk, 8), lambda c, cdb, first, win: (c, 0)),
                    pl.BlockSpec(
                        (128, 72), lambda c, cdb, first, win: (cdb[c], 0)
                    ),                                       # dout (blocked)
                ],
                out_specs=(
                    pl.BlockSpec(
                        (128, 72), lambda c, cdb, first, win: (cdb[c], 0)
                    ),                                       # ddst
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # dsrc (full, RMW)
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # dwmat
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # dvec
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_seg_pad, 72), jnp.float32),
                jax.ShapeDtypeStruct((n_seg_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((256, 64), jnp.float32),
                jax.ShapeDtypeStruct((16, 72), jnp.float32),
            ),
            interpret=interpret,
        )(cdb, first, win, wp, eT, vp3, tab, ids, ea, dout)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def fused_edge_block_v3(
    h: jax.Array,                 # [N, H]
    x: jax.Array,                 # [N, 3] f32
    meta: EdgeKernelV3Meta,
    W1, b1, W2, b2, Wg1, bg1, wg2,
    compute_dtype=jnp.float32,
):
    """Fully-fused edge block: ``(m_sum [N, H], trans_sum [N, 3])`` — f32
    sums over incoming edges (divide by in-degree outside for means).

    Differentiable in (h, x, weights); Pallas forward AND backward with
    in-kernel gather/scatter on both edge endpoints (no XLA-side per-edge
    streams at all).  Same contract as :func:`fused_edge_block_v2`.
    """
    N, H = h.shape
    Fe = meta.eattr_fe
    cd = jnp.dtype(compute_dtype)
    chunk, W = meta.chunk, meta.W
    n_seg_pad = meta.n_blocks * ROWS
    interpret = jax.default_backend() != "tpu"
    meta_arrs = (meta.cdb, meta.first, meta.win)

    def build_tab(h, x):
        x_hi = x.astype(cd).astype(jnp.float32)
        x_lo = x - x_hi
        tab = jnp.zeros((n_seg_pad, 128), jnp.float32)
        tab = tab.at[:N, 0:H].set(h.astype(jnp.float32))
        tab = tab.at[:N, H : H + 3].set(x_hi)
        tab = tab.at[:N, H + 3 : H + 6].set(x_lo)
        return tab.astype(cd)

    @jax.custom_vjp
    def f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        out, _ = _fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)
        return out

    def _fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        wp, eT, vp3 = pack_weights_v3(W1, b1, W2, b2, Wg1, bg1, wg2, H, Fe,
                                      cd)
        tab = build_tab(h, x)
        outn = _fwd_impl(meta_arrs, wp, eT, vp3, tab, meta.ids, meta.eattr_k,
                         chunk, W, n_seg_pad, interpret)
        m_sum = outn[:N, 0:H]
        t_sum = outn[:N, H : H + 3] + outn[:N, H + 3 : H + 6]
        return (m_sum, t_sum), (wp, eT, vp3, tab)

    def fwd(*args):
        return _fwd(*args)

    def bwd(res, g):
        wp, eT, vp3, tab = res
        d_msum, d_tsum = g
        dout = (
            jnp.zeros((n_seg_pad, 72), jnp.float32)
            .at[:N, 0:H].set(d_msum.astype(jnp.float32))
            .at[:N, H : H + 3].set(d_tsum.astype(jnp.float32))
        )
        ddst, dsrc, dwmat, dvec = _bwd_impl(
            meta_arrs, wp, eT, vp3, tab, meta.ids, meta.eattr_k, dout,
            chunk, W, n_seg_pad, interpret,
        )
        d_h = (ddst[:N, 0:H] + dsrc[:N, 0:H]).astype(h.dtype)
        d_x = ddst[:N, H : H + 3] + dsrc[:N, H : H + 3]
        dW1 = jnp.concatenate(
            [
                dwmat[0:H],                       # h_dst rows
                dwmat[H : 2 * H],                 # h_src rows
                dvec[8:9, 0:H],                   # radial row
                dvec[0:Fe, 0:H],                  # edge-attr rows
            ],
            axis=0,
        )
        return (
            d_h,
            d_x,
            dW1,
            dvec[7, 0:H],                         # b1
            dwmat[2 * H : 3 * H],                 # W2
            dvec[10, 0:H],                        # b2
            dwmat[3 * H : 4 * H],                 # Wg1
            dvec[11, 0:H],                        # bg1
            dvec[9, 0:H][:, None],                # wg2
        )

    f.defvjp(fwd, bwd)
    return f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)
