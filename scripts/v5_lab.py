"""v5 feature-major edge kernel: same-db superchunks + streamed bwd.

Builds on scripts/v4_lab.py's measured result (feature-major chain is
2.3x faster than slot-major: 1.01 vs 2.37 ms fwd — the slot-major chain's
[R, 1]/[R, 3] intermediates each burn full 128-lane vregs).

Additions here:
- **make_v5_meta**: the packer groups each grid step's G chunks under ONE
  destination block (chunk list is (db, sb)-sorted already; pad each db's
  chunk run to a multiple of G with same-db sentinel chunks, and emit an
  empty run for edge-less blocks).  Per-superchunk scalars: sdb [n_super].
- **bwd kernel**: feature-major backward with dout and the dst-role grad
  accumulator STREAMED per superchunk via index_map on sdb (consecutive
  same-index steps keep the block in VMEM — classic reduction pattern);
  only the src-role accumulator [Npad, 128] stays resident.  Weight grads
  for W1 and dh become XLA epilogue matmuls from the accumulated per-node
  dUd / dUs (= scattered d_z1 sums), so the chunk loop carries no
  weight-grad dots for the gather layer.

Usage: python scripts/v5_lab.py [check] [grad] [time]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/scripts")
from v4_lab import (  # noqa: E402
    H, ROWS, EA_ROWS, _round_up, build_graph, oracle, timeit,
    build_tab_v5, pack_w_v5, _fm_chain_fwd, _gather_v5,
)
from fastegnn_tpu.ops.edge_kernel_v3 import _silu_f32, _hi_lo, _dsilu  # noqa


# ---------------------------------------------------------------------------
# packer
# ---------------------------------------------------------------------------


def make_v5_meta(dst, src, edge_attr, edge_mask, num_nodes,
                 chunk=256, W=2, G=4):
    """Contiguous-window chunks grouped into same-dst-block superchunks."""
    dst = np.asarray(dst); src = np.asarray(src)
    edge_attr = np.asarray(edge_attr, np.float32)
    fe = edge_attr.shape[1]
    real = np.asarray(edge_mask) & (dst < num_nodes)
    eidx = np.nonzero(real)[0]
    dst_r, src_r = dst[eidx], src[eidx]
    db, sb = dst_r // ROWS, src_r // ROWS
    order = np.lexsort((sb, db))
    eidx, dst_r, src_r, db, sb = (
        eidx[order], dst_r[order], src_r[order], db[order], sb[order])

    n_blocks = _round_up(num_nodes, ROWS) // ROWS
    key = db.astype(np.int64) * n_blocks + sb
    tb = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1, [key.size]])
    max_w0 = max(n_blocks - W, 0)

    # chunks per dst block
    per_db = {b: [] for b in range(n_blocks)}
    cur = None

    def close():
        nonlocal cur
        if cur is not None:
            per_db[cur[0]].append(cur); cur = None

    for t in range(tb.size - 1):
        lo, hi = int(tb[t]), int(tb[t + 1])
        tdb, tsb = int(db[lo]), int(sb[lo])
        pos = lo
        while pos < hi:
            if cur is not None and (cur[0] != tdb or tsb - cur[1] >= W
                                    or tsb < cur[1]):
                close()
            if cur is None:
                cur = (tdb, min(tsb, max_w0), [])
            take = min(chunk - len(cur[2]), hi - pos)
            if take == 0:
                close(); continue
            woff = tsb - cur[1]
            cur[2].extend((int(p), woff * ROWS + int(src_r[p]) % ROWS)
                          for p in range(pos, pos + take))
            pos += take
            if len(cur[2]) == chunk:
                close()
    close()

    # pad each db's run to a multiple of G (same-db sentinels); every block
    # gets at least one (possibly empty) superchunk so its output block is
    # written (streamed-out correctness)
    chunks = []
    for b in range(n_blocks):
        run = per_db[b]
        want = _round_up(max(len(run), 1), G)
        run = run + [(b, 0, [])] * (want - len(run))
        chunks.extend(run)

    n_chunks = len(chunks)
    n_super = n_chunks // G
    n_slots = n_chunks * chunk
    idsx = np.full((8, n_slots), -1, np.int32)
    idsx[2:8] = 0
    w0_arr = np.zeros(n_chunks, np.int32)
    sdb = np.zeros(n_super, np.int32)
    ea_bits = np.ascontiguousarray(edge_attr).view(np.int32)
    for ci, (cdb, w0, slots) in enumerate(chunks):
        w0_arr[ci] = w0
        if ci % G == 0:
            sdb[ci // G] = cdb
        if slots:
            p = np.asarray([s[0] for s in slots])
            g = np.asarray([s[1] for s in slots])
            sl = slice(ci * chunk, ci * chunk + len(slots))
            idsx[0, sl] = dst_r[p] % ROWS
            idsx[1, sl] = g
            idsx[2:2 + fe, sl] = ea_bits[eidx[p]].T
    return dict(idsx=jnp.asarray(idsx), w0=jnp.asarray(w0_arr),
                sdb=jnp.asarray(sdb), chunk=chunk, W=W, G=G,
                n_slots=n_slots, n_chunks=n_chunks, n_super=n_super,
                n_blocks=n_blocks, fe=fe)


# ---------------------------------------------------------------------------
# fwd kernel (streamed out block; one RMW per superchunk)
# ---------------------------------------------------------------------------


def _gather_v5b(tab_ref, eW_ref, sdb_ref, w0_ref, blk, c, cg, W, cd):
    chunk = blk.shape[1]
    dl, gl = blk[0:1, :], blk[1:2, :]
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (ROWS, chunk), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (W * ROWS, chunk), 0)
    PdT = (iota_d == dl).astype(cd)
    PsT = (iota_s == gl).astype(cd)
    eaT = jax.lax.bitcast_convert_type(blk[2:8, :], jnp.float32).astype(cd)
    td = tab_ref[pl.ds(sdb_ref[c] * ROWS, ROWS), 0:128]
    tw = tab_ref[pl.ds(w0_ref[cg] * ROWS, W * ROWS), 128:256]
    bigT = jax.lax.dot_general(
        td, PdT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    bigT = bigT + jax.lax.dot_general(
        tw, PsT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ea_z1T = jax.lax.dot_general(
        eW_ref[:], eaT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dict(PdT=PdT, PsT=PsT, eaT=eaT, bigT=bigT, ea_z1T=ea_z1T)


def _fwd_kernel_v5b(sdb_ref, w0_ref, wp_ref, eW_ref, vpc_ref,
                    tab_ref, idsx_ref, out_ref, *, G, W, cd, chunk):
    c = pl.program_id(0)
    first = jnp.logical_or(c == 0, sdb_ref[c] != sdb_ref[jnp.maximum(c - 1, 0)])

    gs = [
        _gather_v5b(tab_ref, eW_ref, sdb_ref, w0_ref,
                    idsx_ref[:, g * chunk:(g + 1) * chunk], c, c * G + g,
                    W, cd)
        for g in range(G)
    ]
    bigT = jnp.concatenate([f["bigT"] for f in gs], axis=1)
    ea_z1T = jnp.concatenate([f["ea_z1T"] for f in gs], axis=1)
    w = _fm_chain_fwd(bigT, ea_z1T, wp_ref, vpc_ref, cd)
    t_hi, t_lo = _hi_lo(w["trans"], cd)
    scat_T = jnp.concatenate(
        [w["m"], t_hi, t_lo, jnp.zeros((128 - H - 16, w["m"].shape[1]), cd)],
        axis=0)
    contrib = None
    for g in range(G):
        d = jax.lax.dot_general(
            gs[g]["PdT"], scat_T[:, g * chunk:(g + 1) * chunk],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        contrib = d if contrib is None else contrib + d

    @pl.when(first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("chunk", "W", "G", "n_seg_pad",
                                             "interpret"))
def fwd_v5b(meta_arrs, wp, eW, vpc, tab, idsx, chunk, W, G, n_seg_pad,
            interpret):
    sdb, w0 = meta_arrs
    n_super = sdb.shape[0]
    cd = tab.dtype
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_fwd_kernel_v5b, G=G, W=W, cd=cd, chunk=chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_super,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eW
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vpc
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tab
                    pl.BlockSpec((8, G * chunk), lambda c, sdb, w0: (0, c)),
                ],
                out_specs=pl.BlockSpec(
                    (ROWS, 128), lambda c, sdb, w0: (sdb[c], 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_seg_pad, 128), jnp.float32),
            interpret=interpret,
        )(sdb, w0, wp, eW, vpc, tab, idsx)


# ---------------------------------------------------------------------------
# bwd kernel
# ---------------------------------------------------------------------------


def _fm_chain_bwd(w, deT, wp_ref, vpc_ref, cd):
    """Feature-major backward through the chain.  deT [128, R]: rows 0:64
    d(m_sum) gathered to slots, rows 64:72 d(t_sum) (rows 3:8 zero).
    Returns d_z1 [64, R] (f32), d_diff [8, R], plus weight-grad pieces."""
    wp = wp_ref[:]
    vpc = vpc_ref[:]
    dm_e = deT[0:H]
    dt_e = deT[64:72]
    d_gate = jnp.sum(w["diff"] * dt_e, axis=0, keepdims=True)   # [1, R]
    d_diff = dt_e * jnp.broadcast_to(w["gate"], dt_e.shape)
    d_zg = (jnp.broadcast_to(d_gate, (H, d_gate.shape[1])) * vpc[:, 1:2]
            ) * _dsilu(w["zg"], w["sg"])
    d_zg_c = d_zg.astype(cd)
    d_m = dm_e + jax.lax.dot_general(
        wp[3 * H:4 * H], d_zg_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_z2 = d_m * _dsilu(w["z2"], w["s2"])
    d_z2_c = d_z2.astype(cd)
    d_a1 = jax.lax.dot_general(
        wp[2 * H:3 * H], d_z2_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_z1 = d_a1 * _dsilu(w["z1"], w["s1"])
    d_radial = jnp.sum(d_z1 * vpc[:, 0:1], axis=0, keepdims=True)
    d_diff = d_diff + 2.0 * w["diff"] * jnp.broadcast_to(
        d_radial, w["diff"].shape)
    return dict(d_z1=d_z1, d_diff=d_diff, d_z2=d_z2, d_z2_c=d_z2_c,
                d_zg=d_zg, d_zg_c=d_zg_c, d_gate=d_gate)


def _bwd_kernel_v5(sdb_ref, w0_ref, wp_ref, eW_ref, vpc_ref,
                   tab_ref, idsx_ref, dout_ref,
                   daccd_ref, daccs_ref, dw_ref, *, G, W, cd, chunk):
    c = pl.program_id(0)
    n_super = pl.num_programs(0)
    first = jnp.logical_or(c == 0, sdb_ref[c] != sdb_ref[jnp.maximum(c - 1, 0)])

    @pl.when(c == 0)
    def _():
        daccs_ref[:] = jnp.zeros_like(daccs_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    gs = []
    des = []
    dout_c = dout_ref[:].astype(cd)                     # [128n, 128f]
    for g in range(G):
        cg = c * G + g
        blk = idsx_ref[:, g * chunk:(g + 1) * chunk]
        f = _gather_v5b(tab_ref, eW_ref, sdb_ref, w0_ref, blk, c, cg, W, cd)
        gs.append(f)
        des.append(jax.lax.dot_general(
            dout_c, f["PdT"], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))        # [128f, chunk]
    bigT = jnp.concatenate([f["bigT"] for f in gs], axis=1)
    ea_z1T = jnp.concatenate([f["ea_z1T"] for f in gs], axis=1)
    deT = jnp.concatenate(des, axis=1)
    w = _fm_chain_fwd(bigT, ea_z1T, wp_ref, vpc_ref, cd)
    b = _fm_chain_bwd(w, deT, wp_ref, vpc_ref, cd)

    d_z1_c = b["d_z1"].astype(cd)
    dhi, dlo = _hi_lo(b["d_diff"], cd)
    dstuff = jnp.concatenate(
        [d_z1_c, dhi, dlo,
         jnp.zeros((128 - H - 16, d_z1_c.shape[1]), cd)], axis=0)

    # dst-role scatter: one streamed block per superchunk
    contrib = None
    for g in range(G):
        d = jax.lax.dot_general(
            gs[g]["PdT"], dstuff[:, g * chunk:(g + 1) * chunk],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        contrib = d if contrib is None else contrib + d

    @pl.when(first)
    def _():
        daccd_ref[:] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        daccd_ref[:] += contrib

    # src-role scatter: resident accumulator, RMW per chunk
    for g in range(G):
        cg = c * G + g
        dsw = jax.lax.dot_general(
            gs[g]["PsT"], dstuff[:, g * chunk:(g + 1) * chunk],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [W*128, 128]
        o = pl.multiple_of(w0_ref[cg] * ROWS, ROWS)
        daccs_ref[pl.ds(o, W * ROWS), :] += dsw

    # wide weight grads: rows 0:64 dW2, 64:128 dWg1, 128:134 dW1e(+pad),
    # 134 dw1r | 135 dwg2 | 136 db2 | 137 dbg1 (cols 0:64)
    dW2 = jax.lax.dot_general(
        w["a1"], b["d_z2_c"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [64in, 64out]
    dWg1 = jax.lax.dot_general(
        w["m"], b["d_zg_c"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    eaT = jnp.concatenate([f["eaT"] for f in gs], axis=1)
    dW1e = jax.lax.dot_general(
        eaT, d_z1_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [6, 64]
    dw1r = jax.lax.dot_general(
        w["radial"].astype(cd), d_z1_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [1, 64]
    g1dg = w["g1"] * jnp.broadcast_to(b["d_gate"], w["g1"].shape)
    dwg2 = jnp.sum(g1dg, axis=1, keepdims=True)          # [64, 1]
    db2 = jnp.sum(b["d_z2"], axis=1, keepdims=True)      # [64, 1]
    dbg1 = jnp.sum(b["d_zg"], axis=1, keepdims=True)
    upd = jnp.concatenate([
        dW2, dWg1, dW1e, dw1r, dwg2.T, db2.T, dbg1.T,
        jnp.zeros((144 - 138, 64), jnp.float32)], axis=0)
    dw_ref[:] += upd


@functools.partial(jax.jit, static_argnames=("chunk", "W", "G", "n_seg_pad",
                                             "interpret"))
def bwd_v5(meta_arrs, wp, eW, vpc, tab, idsx, dout, chunk, W, G, n_seg_pad,
           interpret):
    sdb, w0 = meta_arrs
    n_super = sdb.shape[0]
    cd = tab.dtype
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_bwd_kernel_v5, G=G, W=W, cd=cd, chunk=chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_super,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eW
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vpc
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tab
                    pl.BlockSpec((8, G * chunk), lambda c, sdb, w0: (0, c)),
                    pl.BlockSpec(
                        (ROWS, 128), lambda c, sdb, w0: (sdb[c], 0)),  # dout
                ],
                out_specs=(
                    pl.BlockSpec(
                        (ROWS, 128), lambda c, sdb, w0: (sdb[c], 0)),  # daccd
                    pl.BlockSpec(memory_space=pltpu.VMEM),             # daccs
                    pl.BlockSpec(memory_space=pltpu.VMEM),             # dw
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_seg_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_seg_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((144, 64), jnp.float32),
            ),
            interpret=interpret,
        )(sdb, w0, wp, eW, vpc, tab, idsx, dout)


# ---------------------------------------------------------------------------
# public: custom-vjp edge block
# ---------------------------------------------------------------------------


def edge_block_v5(h, x, meta, W1, b1, W2, b2, Wg1, bg1, wg2, cd):
    return _edge_block_v5(
        h, x, meta["idsx"], meta["sdb"], meta["w0"],
        W1, b1, W2, b2, Wg1, bg1, wg2,
        cd=jnp.dtype(cd).name, chunk=meta["chunk"], W=meta["W"],
        G=meta["G"], fe=meta["fe"])


def _edge_block_v5(h, x, idsx, sdb, w0, W1, b1, W2, b2, Wg1, bg1, wg2,
                   *, cd, chunk, W, G, fe):
    cd = jnp.dtype(cd)
    N = h.shape[0]
    n_seg_pad = _round_up(N, ROWS)
    interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        return fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)[0]

    def fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        tab, _ = build_tab_v5(h, x, W1, b1, cd)
        wp, eW, vpc = pack_w_v5(W1, b1, W2, b2, Wg1, bg1, wg2, fe, cd)
        out = fwd_v5b((sdb, w0), wp, eW, vpc, tab, idsx,
                      chunk, W, G, n_seg_pad, interpret)
        m_sum = out[:N, 0:H]
        t_sum = out[:N, H:H + 8] + out[:N, H + 8:H + 16]
        return (m_sum, t_sum[:, 0:3]), (h, x, tab, wp, eW, vpc, W1)

    def bwd(res, g):
        h, x, tab, wp, eW, vpc, W1 = res
        d_msum, d_tsum = g
        dt8 = jnp.pad(d_tsum.astype(jnp.float32), ((0, 0), (0, 5)))
        dout = jnp.zeros((n_seg_pad, 128), jnp.float32)
        dout = dout.at[:N, 0:H].set(d_msum.astype(jnp.float32))
        dout = dout.at[:N, H:H + 8].set(dt8)
        daccd, daccs, dw = bwd_v5(
            (sdb, w0), wp, eW, vpc, tab, idsx, dout,
            chunk, W, G, n_seg_pad, interpret)
        # epilogue: dUd/dUs -> dh, dW1, db1, dx
        dUd = daccd[:N, 0:H]
        dUs = daccs[:N, 0:H]
        cdh = h.dtype
        dh = (
            jax.lax.dot_general(
                dUd.astype(cd), W1[0:H].astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                dUs.astype(cd), W1[H:2 * H].astype(cd),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        ).astype(cdh)
        hc = h.astype(cd)
        dW1d = jax.lax.dot_general(
            hc, dUd.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dW1s = jax.lax.dot_general(
            hc, dUs.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1 = jnp.sum(dUd, axis=0)
        # x grads: dst role stored +x (hi+lo), src role stored -x
        dxd = daccd[:N, H:H + 8] + daccd[:N, H + 8:H + 16]
        dxs = daccs[:N, H:H + 8] + daccs[:N, H + 8:H + 16]
        dx = (dxd - dxs)[:, 0:3]
        dW1 = jnp.concatenate(
            [dW1d, dW1s, dw[134:135], dw[128:128 + fe]], axis=0)
        return (dh, dx, dW1, db1, dw[0:64], dw[136], dw[64:128], dw[137],
                dw[135][:, None])

    f.defvjp(fwd, bwd)
    return f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def main():
    modes = sys.argv[1:] or ["check", "grad"]
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(7)

    def weights(fe, dtype=jnp.float32):
        r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, dtype)
        return (r(2 * H + 1 + fe, H), r(H), r(H, H), r(H), r(H, H), r(H),
                r(H, 1))

    if "check" in modes or "grad" in modes:
        N, DEG = 640, 12
        loc, dst, src, ea, _ = build_graph(N, DEG, seed=3)
        meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), N,
                            chunk=256, W=2, G=2)
        print(f"check: E={dst.size} slots={meta['n_slots']} "
              f"chunks={meta['n_chunks']}")
        h = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
        x = jnp.asarray(loc)
        ws = weights(2)
        dstj, srcj, eaj = (jnp.asarray(dst), jnp.asarray(src),
                           jnp.asarray(ea))

    if "check" in modes:
        ms, ts = edge_block_v5(h, x, meta, *ws, cd=jnp.float32)
        mo, to = oracle(h, x, dstj, srcj, eaj, *ws)
        em = float(jnp.max(jnp.abs(ms - mo)) / (jnp.max(jnp.abs(mo)) + 1e-9))
        et = float(jnp.max(jnp.abs(ts - to)) / (jnp.max(jnp.abs(to)) + 1e-9))
        print(f"v5b fwd rel err msum {em:.2e} tsum {et:.2e}")
        assert em < 1e-5 and et < 1e-5
        print("FWD CHECK OK")

    if "grad" in modes:
        def loss_k(h, x, *w):
            ms, ts = edge_block_v5(h, x, meta, *w, cd=jnp.float32)
            return jnp.sum(jnp.sin(ms)) + jnp.sum(ts * ts)

        def loss_o(h, x, *w):
            ms, ts = oracle(h, x, dstj, srcj, eaj, *w)
            return jnp.sum(jnp.sin(ms)) + jnp.sum(ts * ts)

        gk = jax.grad(loss_k, argnums=tuple(range(9)))(h, x, *ws)
        go = jax.grad(loss_o, argnums=tuple(range(9)))(h, x, *ws)
        names = ["h", "x", "W1", "b1", "W2", "b2", "Wg1", "bg1", "wg2"]
        ok = True
        for n, a, b_ in zip(names, gk, go):
            err = float(jnp.max(jnp.abs(a - b_)) /
                        (jnp.max(jnp.abs(b_)) + 1e-9))
            flag = "OK" if err < 1e-4 else "BAD"
            ok &= err < 1e-4
            print(f"  d{n:<4s} rel err {err:.2e} {flag}")
        assert ok, "v5 grad mismatch"
        print("GRAD CHECK OK")

    if "time" in modes:
        N, DEG = 8000, 60
        loc, dst, src, ea, _ = build_graph(N, DEG)
        E = dst.size
        h = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
        x = jnp.asarray(loc)
        ws = weights(2)
        cot_m = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
        cot_t = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

        for chunk, W, G in [(256, 2, 4), (256, 2, 8), (128, 2, 8),
                            (128, 2, 16)]:
            meta = make_v5_meta(dst, src, ea, np.ones(E, bool), N,
                                chunk=chunk, W=W, G=G)
            pad = (meta["n_slots"] - E) / E * 100
            idsx, sdb, w0 = meta["idsx"], meta["sdb"], meta["w0"]

            def mk(chunk, W, G):
                # meta arrays are jit ARGUMENTS (capture = re-upload/call)
                @jax.jit
                def fwd_j(h, x, idsx, sdb, w0, *ws):
                    return _edge_block_v5(
                        h, x, idsx, sdb, w0, *ws,
                        cd="bfloat16", chunk=chunk, W=W, G=G, fe=2)

                @jax.jit
                def grad_j(h, x, idsx, sdb, w0, cot_m, cot_t, *ws):
                    def loss(h, x):
                        m, t = _edge_block_v5(
                            h, x, idsx, sdb, w0, *ws,
                            cd="bfloat16", chunk=chunk, W=W, G=G, fe=2)
                        return jnp.sum(m * cot_m) + jnp.sum(t * cot_t)
                    return jax.grad(loss, argnums=(0, 1))(h, x)

                return fwd_j, grad_j

            fwd_j, grad_j = mk(chunk, W, G)
            dt = timeit(lambda: fwd_j(h, x, idsx, sdb, w0, *ws),
                        f"v5b fwd c{chunk} W{W} G{G} (pad {pad:.1f}%)")
            if dt:
                print(f"   -> {E / (dt / 1e3) / 1e6:.0f} M edges/s")
            dt = timeit(
                lambda: grad_j(h, x, idsx, sdb, w0, cot_m, cot_t, *ws),
                f"v5b fwd+bwd c{chunk} W{W} G{G}")
            if dt:
                print(f"   -> {E / (dt / 1e3) / 1e6:.0f} M edges/s "
                      f"train-equiv")


if __name__ == "__main__":
    main()
