"""Time the v2 kernel's pieces separately on the TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from fastegnn_tpu.ops import edge_kernel as ek
from fastegnn_tpu.ops.neighbors import radius_graph_np

H, FE = 64, 2


def timeit(fn, label, n=50):
    r = fn()
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<52s} {dt:9.3f} ms")
    return dt


def main():
    print("backend:", jax.default_backend())
    N, DEGREE = 8000, 60
    rng = np.random.default_rng(0)
    import os
    if os.environ.get("EK_CLUSTERED"):
        from bench import _positions
        loc, r = _positions(N, DEGREE, rng)
        dst, src = radius_graph_np(loc, r)
        actual = dst.size / N
        if abs(actual - DEGREE) > 0.15 * DEGREE:
            loc = (loc * (actual / DEGREE) ** (1 / 3)).astype(np.float32)
            dst, src = radius_graph_np(loc, r)
    else:
        r = 0.035
        vol = N * (4 / 3) * np.pi * r**3 / DEGREE
        side = vol ** (1 / 3)
        loc = (rng.random((N, 3)) * side).astype(np.float32)
        dst, src = radius_graph_np(loc, r)
    o = np.argsort(dst, kind="stable")
    dst, src = dst[o].astype(np.int32), src[o].astype(np.int32)
    E = dst.size
    ea = rng.normal(size=(E, FE)).astype(np.float32)
    import os
    CH = int(os.environ.get("EK_CHUNK", 1024))
    RW = int(os.environ.get("EK_ROWS", 128))
    meta = ek.make_edge_kernel_meta(dst, src, ea, np.ones(E, bool), N,
                                    rows=RW, chunk=CH)
    Ek = meta.n_slots
    print(f"E={E} slots={Ek}")

    cd = jnp.bfloat16
    h = jnp.asarray(rng.normal(size=(N, H)), jnp.float32) * 0.5
    x = jnp.asarray(loc)
    W1 = jnp.asarray(rng.normal(size=(2 * H + 1 + FE, H)), jnp.float32) * 0.1
    b1 = jnp.zeros(H)
    W2 = jnp.asarray(rng.normal(size=(H, H)), jnp.float32) * 0.1
    Wg1 = jnp.asarray(rng.normal(size=(H, H)), jnp.float32) * 0.1
    wg2 = jnp.asarray(rng.normal(size=(H, 1)), jnp.float32) * 0.1

    n_seg_pad = ek._round_up(N, meta.rows)
    meta_arrs = (meta.cstart, meta.cnum, meta.blo, meta.bhi, meta.starts,
                 meta.ends)

    @jax.jit
    def streams(h, x):
        wp, vp = ek.pack_weights(W1, b1, W2, b1, Wg1, b1, wg2, H, FE, cd)
        hT = jnp.zeros((ek.H_MAX, n_seg_pad), cd).at[:H, :N].set(h.astype(cd).T)
        xT = jnp.zeros((ek.XROWS, n_seg_pad), jnp.float32).at[:3, :N].set(x.T)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = x - x_hi.astype(jnp.float32)
        table = jnp.concatenate(
            [h.astype(jnp.float32), x_hi.astype(jnp.float32),
             x_lo.astype(jnp.float32),
             jnp.zeros((N, ek.PACK - H - 6), jnp.float32)], axis=1
        ).astype(cd)
        hxsT = jnp.take(table, meta.src_k, axis=0).T
        return wp, vp, hT, xT, hxsT

    wp, vp, hT, xT, hxsT = streams(h, x)
    timeit(lambda: streams(h, x), "build_streams (take + transpose)")

    fwd = jax.jit(lambda wp, vp, hT, xT, hxsT: ek._fwd_impl(
        meta_arrs, wp, vp, hT, xT, hxsT, meta.eattr_k, meta.rows, meta.chunk,
        FE, n_seg_pad, False))
    timeit(lambda: fwd(wp, vp, hT, xT, hxsT), "fwd kernel only")

    dout = jnp.asarray(rng.normal(size=(ek.OUT_ROWS, n_seg_pad)), jnp.float32)
    bwd = jax.jit(lambda *a: ek._bwd_impl(
        meta_arrs, *a, meta.eattr_k, meta.rows, meta.chunk, FE, n_seg_pad,
        Ek, False, jnp.bfloat16))
    timeit(lambda: bwd(wp, vp, hT, xT, dout, hxsT), "bwd kernel only")

    ddstT, dwp, dvp, dsrcT = bwd(wp, vp, hT, xT, dout, hxsT)

    from fastegnn_tpu.ops.spmm import sorted_segment_sum_csr

    @jax.jit
    def scatter(dsrcT):
        dsrc = dsrcT.T
        dsrc_sorted = jnp.take(dsrc, meta.sperm, axis=0)
        return sorted_segment_sum_csr(dsrc_sorted, meta.ssorted, meta.csr_s, N)

    timeit(lambda: scatter(dsrcT), "d_src scatter (transpose+permute+segsum)")

    @jax.jit
    def scatter_noT(dsrc):
        dsrc_sorted = jnp.take(dsrc, meta.sperm, axis=0)
        return sorted_segment_sum_csr(dsrc_sorted, meta.ssorted, meta.csr_s, N)

    dsrc_pre = jnp.zeros((Ek, ek.PACK), jnp.bfloat16)
    timeit(lambda: scatter_noT(dsrc_pre), "  ... permute+segsum only")

    tr = jax.jit(lambda a: a.T)
    timeit(lambda: tr(dsrcT), "  ... transpose [72, Ek] -> [Ek, 72] only")

    print(f"(chunk={CH} rows={RW} slots={Ek})")


if __name__ == "__main__":
    main()
