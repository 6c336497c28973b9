"""Fused FastEGNN edge block v3 — window-tiled one-big-matmul kernels.

Computes the same real<->real edge block as v2 (``ops/edge_kernel.py``;
reference ``models/FastEGNN.py:102-133,180-189``):

    m_e    = silu(silu([h_dst, h_src, |x_dst-x_src|^2, e_attr] W1 + b1) W2 + b2)
    gate_e = silu(m_e Wg1 + bg1) wg2
    msum_n = sum_{e: dst=n} m_e          tsum_n = sum_{e: dst=n} diff_e*gate_e

Design (v2's two XLA-side costs — the per-edge src pre-gather and the
d_src permute+segsum scatter — are eliminated; everything runs inside two
Pallas kernels):

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
  iota==id compares built FEATURE-MAJOR (PdT [128, chunk]) and contracted
  on the sublane axis (`dot_general` (0,0) form — measured faster than the
  row-major (1,0) form); the z1 linear is ONE matmul contracting
  PT = [PdT; PsT; eaT] against T = [w1d@tab_d | w1s@tab_win | W1e+b1] —
  gather, both input projections, edge-attr term and bias in one MXU pass.
- **Packed slot stream, superchunked grid**: the per-slot operands travel
  as ONE [8, n_slots] i32 stream (rows: dst-local, window gid, bitcast
  edge attrs, bitcast 1.0 bias) — a [8, G*chunk] block is ~64 KB true
  bytes vs the ~512 KB two lane-padded [chunk, 8] streams cost before.
  Each grid step processes G chunks (default 4): grid-step and DMA-issue
  overhead (measured ~2 us/step on this chip, half the old kernel's
  runtime) amortizes G-fold.
- **Full-VMEM accumulators, no blocked outputs**: forward output and all
  backward grads accumulate in whole-VMEM buffers via read-modify-write at
  dynamic 128-aligned sublane offsets (zeroed once at step 0).  Dst and
  src node grads share ONE accumulator; uncovered dst blocks are zero by
  construction (no sentinel-chunk padding needed).

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
EA_ROWS = 6         # eaT rows: 0:fe edge attrs, 3,4 zero, 5 bias (1.0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class EdgeKernelV3Meta:
    """Host-precomputed window-tiled slot layout (see module docstring)."""

    idsx: jax.Array      # [8, n_slots] i32 rows: 0 dst-local id, 1 window
                         #  gid (= widx*128 + src-local; sentinel -1),
                         #  2:2+fe edge attrs (f32 bits), 7 = bits of 1.0
    win: jax.Array       # [n_chunks, W] i32 window src-block ids (pad 0)
    cdb: jax.Array       # [n_chunks] i32 dst block of each chunk
    chunk: int = struct.field(pytree_node=False, default=512)
    W: int = struct.field(pytree_node=False, default=4)
    G: int = struct.field(pytree_node=False, default=4)
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
    W: int = 4,
    G: int = 4,
) -> EdgeKernelV3Meta:
    """Greedy window packing of (dst-block, src-block) tiles into chunks.

    Edges are sorted by (dst_block, src_block); per dst block, tiles are
    packed into chunks of ``chunk`` slots holding at most ``W`` distinct
    source blocks; a chunk closes (sentinel-padded) when either capacity
    is exhausted.  The chunk list is padded to a multiple of ``G`` (the
    grid superchunk factor) with all-sentinel chunks.
    """
    dst = np.asarray(dst)
    src = np.asarray(src)
    edge_attr = np.asarray(edge_attr, np.float32)
    fe = edge_attr.shape[1]
    assert fe <= 3, f"edge_attr dim {fe} exceeds v3 packing capacity"
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

    # pad the chunk list to a multiple of G with empty (all-sentinel) chunks
    n_chunks = _round_up(max(len(chunks), 1), G)
    chunks.extend((0, [], []) for _ in range(n_chunks - len(chunks)))

    n_slots = n_chunks * chunk
    idsx = np.full((8, n_slots), -1, np.int32)
    idsx[2:7] = 0
    idsx[7] = np.float32(1.0).view(np.int32)      # bias lane (all slots)
    win = np.zeros((n_chunks, W), np.int32)
    cdb_arr = np.zeros(n_chunks, np.int32)
    ea_bits = np.ascontiguousarray(edge_attr).view(np.int32)
    for ci, (cdb, window, slots) in enumerate(chunks):
        win[ci, : len(window)] = window
        cdb_arr[ci] = cdb
        base = ci * chunk
        if slots:
            p = np.asarray([s[0] for s in slots])
            widx = np.asarray([s[1] for s in slots])
            sl = slice(base, base + len(slots))
            idsx[0, sl] = dst_r[p] % ROWS
            idsx[1, sl] = widx * ROWS + src_r[p] % ROWS
            idsx[2 : 2 + fe, sl] = ea_bits[eidx[p]].T

    return EdgeKernelV3Meta(
        idsx=jnp.asarray(idsx),
        win=jnp.asarray(win),
        cdb=jnp.asarray(cdb_arr),
        chunk=chunk,
        W=W,
        G=G,
        n_slots=n_slots,
        n_chunks=n_chunks,
        n_blocks=n_blocks,
        eattr_fe=fe,
    )


# ---------------------------------------------------------------------------
# weight packing (orientation B: flax [in, out] kernels used directly)
# ---------------------------------------------------------------------------


class PackedWeightsV3(NamedTuple):
    wp: jax.Array    # [256, 64] cd: 0:64 W1d | 64:128 W1s | 128:192 W2 |
                     #   192:256 Wg1 (all [in, out])
    eT: jax.Array    # [6, 70] cd: rows 0:fe = W1 edge-attr rows, row 5 = b1
                     #   (cols 64:70 zero) — the T-matrix tail block
    vp3: jax.Array   # [8, 1, 128] f32 rows (own tiles, offset-0 broadcast):
                     #   0 w1r | 1 wg2 | 2 b2 | 3 bg1


def pack_weights_v3(W1, b1, W2, b2, Wg1, bg1, wg2, H: int, Fe: int, cd):
    assert H == H_MAX, "edge kernel v3 assumes hidden == 64"
    assert Fe <= 3, f"edge_attr dim {Fe} exceeds packing capacity"
    wp = jnp.concatenate([W1[:H], W1[H : 2 * H], W2, Wg1], axis=0).astype(cd)
    eT = jnp.zeros((EA_ROWS, 70), jnp.float32)
    eT = eT.at[0:Fe, 0:H].set(W1[2 * H + 1 :])
    eT = eT.at[5, 0:H].set(b1)
    vp3 = jnp.zeros((8, 1, 128), jnp.float32)
    vp3 = vp3.at[0, 0, 0:H].set(W1[2 * H])
    vp3 = vp3.at[1, 0, 0:H].set(wg2[:, 0])
    vp3 = vp3.at[2, 0, 0:H].set(b2)
    vp3 = vp3.at[3, 0, 0:H].set(bg1)
    return PackedWeightsV3(wp=wp, eT=eT.astype(cd), vp3=vp3)


def _silu_f32(z):
    # The sigmoid itself always runs in f32: Mosaic's logistic lowering
    # broadcasts an f32 scalar into the result vector, which fails to
    # verify when z is bf16 (vector.broadcast f32 -> bf16).  Storage of
    # the returned s/activation stays in z.dtype, so the bf16 chain keeps
    # its VPU-traffic savings; for f32 inputs this is a bit-exact no-op.
    #
    # bf16 path: sigmoid(x) = 0.5*(1 + tanh(x/2)) — Mosaic lowers tanh to a
    # single hardware transcendental while the logistic goes through
    # exp + divide; measured ~20% off the whole fwd kernel at the bench
    # geometry (scripts/r3_klab.py "tanhsig").  The two forms differ by
    # ~1 ulp f32, far below bf16 storage rounding.  f32 inputs keep the
    # exact logistic (bit-exact vs the XLA composition for parity tests).
    zf = z.astype(jnp.float32)
    if z.dtype == jnp.bfloat16:
        s = 0.5 + 0.5 * jnp.tanh(0.5 * zf)
    else:
        s = jax.nn.sigmoid(zf)
    s = s.astype(z.dtype)
    return z * s, s


def _dsilu(z, s):
    return s * (1.0 + z * (1.0 - s))


def _hi_lo(v, cd):
    """Split an f32 value into (hi, lo) in compute dtype; exact when cd is
    f32 (lo = 0) and a 2^-16-relative split when cd is bf16."""
    hi = v.astype(cd)
    lo = (v - hi.astype(jnp.float32)).astype(cd)
    return hi, lo


def _gather_big(tab_ref, wp_ref, eT_ref, blk, cdb_ref, win_ref, cg, W, cd):
    """Per-chunk gather stage: table slices, weight folds, one-hot builds
    and the fused gather matmul.  ``blk`` is the [8, chunk] i32 slot block
    for chunk ``cg`` (see EdgeKernelV3Meta.idsx row layout).  Returns the
    pre-activation ``big [chunk, 70]`` plus everything bwd reuses.
    """
    H = H_MAX
    chunk = blk.shape[1]
    wp = wp_ref[:]
    w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]

    td = tab_ref[pl.ds(cdb_ref[cg] * 128, 128), :]          # dst block slice
    stacked = jnp.concatenate(
        [tab_ref[pl.ds(win_ref[cg, k] * 128, 128), :] for k in range(W)],
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
        [block_d, block_w, eT_ref[:]], axis=0
    )                                                        # [K, 70]

    dl = blk[0:1, :]                                         # [1, chunk]
    gl = blk[1:2, :]
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (128, chunk), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (W * 128, chunk), 0)
    PdT = (iota_d == dl).astype(cd)                          # [128, chunk]
    PsT = (iota_s == gl).astype(cd)                          # [W*128, chunk]
    eaT = jax.lax.bitcast_convert_type(blk[2:8, :], jnp.float32).astype(cd)
    PT = jnp.concatenate([PdT, PsT, eaT], axis=0)            # [K, chunk]

    big = jax.lax.dot_general(
        PT, T, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [chunk, 70]
    return dict(td=td, stacked=stacked, PT=PT, PdT=PdT, big=big)


def _wide_fwd(big, wp_ref, vp3_ref, cd):
    """MLP/gate chain on the G-wide concatenated ``big`` [R, 70].

    Batching the sequential silu chain across all G subchunks quarters the
    number of op issues on the chain — the kernel is latency-bound on this
    dependency chain, not throughput-bound (measured: ablating any single
    stage changes runtime by <5%, while the empty grid costs ~half).
    """
    H = H_MAX
    wp = wp_ref[:]
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
    return dict(diff=diff, radial=radial, z1=z1, s1=s1, a1=a1, z2=z2, s2=s2,
                m=m, zg=zg, sg=sg, g1=g1, gate=gate, trans=trans)


def _fwd_kernel(cdb_ref, win_ref, wp_ref, eT_ref, vp3_ref,
                tab_ref, idsx_ref, out_ref, *, G, W, cd, chunk):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # stage 1 (per subchunk, independent): gather matmuls
    gs = [
        _gather_big(
            tab_ref, wp_ref, eT_ref,
            idsx_ref[:, g * chunk : (g + 1) * chunk],
            cdb_ref, win_ref, c * G + g, W, cd,
        )
        for g in range(G)
    ]
    # stage 2 (wide): the latency-bound MLP chain over all G subchunks
    big = jnp.concatenate([f["big"] for f in gs], axis=0)    # [G*chunk, 70]
    w = _wide_fwd(big, wp_ref, vp3_ref, cd)
    t_hi, t_lo = _hi_lo(w["trans"], cd)
    scat_in = jnp.concatenate(
        [w["m"], t_hi, t_lo, jnp.zeros((G * chunk, 2), cd)], axis=1
    )                                                        # [G*chunk, 72]
    # stage 3 (per subchunk): scatter into the whole-VMEM accumulator
    for g in range(G):
        contrib = jax.lax.dot_general(
            gs[g]["PdT"], scat_in[g * chunk : (g + 1) * chunk],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [128, 72]
        o = pl.multiple_of(cdb_ref[c * G + g] * 128, 128)
        out_ref[pl.ds(o, 128), :] += contrib


def _bwd_kernel(cdb_ref, win_ref, wp_ref, eT_ref, vp3_ref,
                tab_ref, idsx_ref, dout_ref,
                nacc_ref, dwmat_ref, dvec_ref, *, G, W, cd, chunk):
    H = H_MAX
    c = pl.program_id(0)
    KW = 128 + W * 128

    @pl.when(c == 0)
    def _():
        nacc_ref[:] = jnp.zeros_like(nacc_ref)
        dwmat_ref[:] = jnp.zeros_like(dwmat_ref)
        dvec_ref[:] = jnp.zeros_like(dvec_ref)

    wp = wp_ref[:]
    w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]
    w2, wg1 = wp[2 * H : 3 * H, :], wp[3 * H : 4 * H, :]
    R = G * chunk

    # stage 1 (per subchunk): gather matmuls + upstream-grad gathers
    gs = []
    des = []
    for g in range(G):
        cg = c * G + g
        blk = idsx_ref[:, g * chunk : (g + 1) * chunk]
        f = _gather_big(tab_ref, wp_ref, eT_ref, blk,
                        cdb_ref, win_ref, cg, W, cd)
        gs.append(f)
        ob = pl.multiple_of(cdb_ref[cg] * 128, 128)
        dout_blk = dout_ref[pl.ds(ob, 128), :]               # [128, 72]
        des.append(jax.lax.dot_general(
            f["PdT"], dout_blk.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))                                                   # [chunk, 72]

    # stage 2 (wide): forward recompute + backward chain over G subchunks
    big = jnp.concatenate([f["big"] for f in gs], axis=0)
    w = _wide_fwd(big, wp_ref, vp3_ref, cd)
    de = jnp.concatenate(des, axis=0)                        # [R, 72]
    dm_e = de[:, 0:H]
    dt_e = de[:, H : H + 3]

    d_gate = jnp.sum(w["diff"] * dt_e, axis=1, keepdims=True)
    d_diff = w["gate"] * dt_e
    wg2 = vp3_ref[1][:, 0:H]
    d_zg = (d_gate * wg2) * _dsilu(w["zg"], w["sg"])
    d_zg_c = d_zg.astype(cd)
    d_m = dm_e + jax.lax.dot_general(
        d_zg_c, wg1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_z2 = d_m * _dsilu(w["z2"], w["s2"])
    d_z2_c = d_z2.astype(cd)
    d_a1 = jax.lax.dot_general(
        d_z2_c, w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_z1 = d_a1 * _dsilu(w["z1"], w["s1"])
    w1r = vp3_ref[0][:, 0:H]
    d_radial = jnp.sum(d_z1 * w1r, axis=1, keepdims=True)
    d_diff = d_diff + 2.0 * w["diff"] * d_radial
    d_z1_c = d_z1.astype(cd)
    dhi, dlo = _hi_lo(d_diff, cd)
    dbig = jnp.concatenate(
        [d_z1_c, dhi, dlo, jnp.zeros((R, 2), cd)], axis=1
    )                                                        # [R, 72]

    # ---- wide weight grads (input-side grads need per-subchunk dT) ----
    dW2 = jax.lax.dot_general(
        w["a1"], d_z2_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dWg1 = jax.lax.dot_general(
        w["m"], d_zg_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    z72 = jnp.zeros((1, 72 - H), jnp.float32)

    def row(v):                                       # [1, H] -> [1, 72]
        return jnp.concatenate([v, z72], axis=1)

    # stage 3 (per subchunk): dT matmuls, W1 grads, node-grad RMW
    dW1d_acc = None
    dW1s_acc = None
    dea_acc = None
    for g in range(G):
        cg = c * G + g
        f = gs[g]
        dbig_g = dbig[g * chunk : (g + 1) * chunk]
        dT = jax.lax.dot_general(
            f["PT"], dbig_g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [K, 72]
        dW1d = jax.lax.dot_general(
            f["td"][:, 0:H], dT[0:128, 0:H].astype(cd),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dW1s = jax.lax.dot_general(
            f["stacked"][:, 0:H], dT[128:KW, 0:H].astype(cd),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dea = dT[KW : KW + EA_ROWS, :]
        dW1d_acc = dW1d if dW1d_acc is None else dW1d_acc + dW1d
        dW1s_acc = dW1s if dW1s_acc is None else dW1s_acc + dW1s
        dea_acc = dea if dea_acc is None else dea_acc + dea

        # node grads: ONE full-VMEM accumulator (cols 0:64 dh, 64:67 dx),
        # RMW at dynamic 128-aligned offsets for dst AND src windows
        dn_h = jax.lax.dot_general(
            dT[0:128, 0:H].astype(cd), w1d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [128, 64]
        dn_x = dT[0:128, H : H + 3] + dT[0:128, H + 3 : H + 6]
        dn = jnp.concatenate(
            [dn_h, dn_x, jnp.zeros((128, 128 - H - 3), jnp.float32)], axis=1
        )                                                    # [128, 128]
        ob = pl.multiple_of(cdb_ref[cg] * 128, 128)
        cur = nacc_ref[pl.ds(ob, 128), :]
        nacc_ref[pl.ds(ob, 128), :] = cur + dn

        dw_h = jax.lax.dot_general(
            dT[128:KW, 0:H].astype(cd), w1s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [W*128, 64]
        dw_x = -(dT[128:KW, H : H + 3] + dT[128:KW, H + 3 : H + 6])
        dw = jnp.concatenate(
            [dw_h, dw_x, jnp.zeros((W * 128, 128 - H - 3), jnp.float32)],
            axis=1,
        )                                                    # [W*128, 128]
        for k in range(W):
            o = pl.multiple_of(win_ref[cg, k] * 128, 128)
            cur = nacc_ref[pl.ds(o, 128), :]
            nacc_ref[pl.ds(o, 128), :] = cur + dw[k * 128 : (k + 1) * 128, :]

    dwmat_ref[:] += jnp.concatenate(
        [dW1d_acc, dW1s_acc, dW2, dWg1], axis=0)
    dvec_ref[:] += jnp.concatenate(
        [
            dea_acc,
            jnp.zeros((2, 72), jnp.float32),
            row(jnp.sum(d_z1 * w["radial"], axis=0, keepdims=True)),
            row(jnp.sum(w["g1"] * d_gate, axis=0, keepdims=True)),
            row(jnp.sum(d_z2, axis=0, keepdims=True)),
            row(jnp.sum(d_zg, axis=0, keepdims=True)),
            jnp.zeros((4, 72), jnp.float32),
        ],
        axis=0,
    )                                                        # [16, 72]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("chunk", "W", "G", "n_seg_pad", "interpret")
)
def _fwd_impl(meta_arrs, wp, eT, vp3, tab, idsx, chunk, W, G, n_seg_pad,
              interpret):
    cdb, win = meta_arrs
    n_super = cdb.shape[0] // G
    cd = tab.dtype
    # f32 mode: force full-precision MXU passes (TPU default is one bf16
    # pass, which would silently degrade the "exact" f32 path to ~1e-2)
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, G=G, W=W, cd=cd, chunk=chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_super,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eT
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vp3
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tab (resident)
                    pl.BlockSpec((8, G * chunk), lambda c, cdb, win: (0, c)),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_seg_pad, 72), jnp.float32),
            interpret=interpret,
        )(cdb, win, wp, eT, vp3, tab, idsx)


@functools.partial(
    jax.jit, static_argnames=("chunk", "W", "G", "n_seg_pad", "interpret")
)
def _bwd_impl(meta_arrs, wp, eT, vp3, tab, idsx, dout, chunk, W, G,
              n_seg_pad, interpret):
    cdb, win = meta_arrs
    n_super = cdb.shape[0] // G
    cd = tab.dtype
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, G=G, W=W, cd=cd, chunk=chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_super,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eT
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vp3
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tab (resident)
                    pl.BlockSpec((8, G * chunk), lambda c, cdb, win: (0, c)),
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # dout (resident)
                ],
                out_specs=(
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # nacc (RMW)
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # dwmat
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # dvec
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_seg_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((256, 64), jnp.float32),
                jax.ShapeDtypeStruct((16, 72), jnp.float32),
            ),
            interpret=interpret,
        )(cdb, win, wp, eT, vp3, tab, idsx, dout)


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
    chunk, W, G = meta.chunk, meta.W, meta.G
    n_seg_pad = meta.n_blocks * ROWS
    interpret = jax.default_backend() != "tpu"
    meta_arrs = (meta.cdb, meta.win)

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
        outn = _fwd_impl(meta_arrs, wp, eT, vp3, tab, meta.idsx,
                         chunk, W, G, n_seg_pad, interpret)
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
        nacc, dwmat, dvec = _bwd_impl(
            meta_arrs, wp, eT, vp3, tab, meta.idsx, dout,
            chunk, W, G, n_seg_pad, interpret,
        )
        d_h = nacc[:N, 0:H].astype(h.dtype)
        d_x = nacc[:N, H : H + 3]
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
            dvec[5, 0:H],                         # b1 (eaT bias row)
            dwmat[2 * H : 3 * H],                 # W2
            dvec[10, 0:H],                        # b2
            dwmat[3 * H : 4 * H],                 # Wg1
            dvec[11, 0:H],                        # bg1
            dvec[9, 0:H][:, None],                # wg2
        )

    f.defvjp(fwd, bwd)
    return f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)
