"""Isolate + optimize the per-layer non-edge (virtual/node) math.

Reproduces the FastEGNN layer's dense virtual block + coord/node updates
(fast_egnn.py:274-322) with random inputs at bench scale, as one jit, and
times variants:
  base    — verbatim shapes ([N, C, k] 3D tensors, f32/bf16 mix as model)
  flat    — channels-in-rows [N*C, k] for MLP paths, [N, 3C] coord packs
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N, B, C, H = 8000, 4, 3, 64
cd = jnp.bfloat16


def timed(label, fn, n=100):
    r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    print(f"{label:<40s} {(time.perf_counter() - t0) / n * 1e3:9.3f} ms")


def make_inputs(key):
    ks = jax.random.split(key, 12)
    h = jax.random.normal(ks[0], (N, H), jnp.float32)
    x = jax.random.normal(ks[1], (N, 3), jnp.float32)
    v = jax.random.normal(ks[2], (N, 3), jnp.float32)
    vx = jax.random.normal(ks[3], (B, C, 3), jnp.float32)
    vh = jax.random.normal(ks[4], (B, C, H), jnp.float32)
    gid = jnp.sort(jax.random.randint(ks[5], (N,), 0, B))
    agg_x = jax.random.normal(ks[6], (N, 3), jnp.float32)
    agg_e = jax.random.normal(ks[7], (N, H), jnp.float32)
    W = {
        "ev1": jax.random.normal(ks[8], (2 * H + 1 + C, H), jnp.float32) * 0.1,
        "ev2": jax.random.normal(ks[9], (H, H), jnp.float32) * 0.1,
        "gr1": jax.random.normal(ks[10], (H, H), jnp.float32) * 0.1,
        "gr2": jax.random.normal(ks[11], (H, 1), jnp.float32) * 0.1,
        "gx1": jax.random.normal(ks[8], (H, H), jnp.float32) * 0.1,
        "gx2": jax.random.normal(ks[9], (H, 1), jnp.float32) * 0.1,
        "vel1": jax.random.normal(ks[10], (H, H), jnp.float32) * 0.1,
        "vel2": jax.random.normal(ks[11], (H, 1), jnp.float32) * 0.1,
        "g1": jax.random.normal(ks[8], (H, H), jnp.float32) * 0.1,
        "g2": jax.random.normal(ks[9], (H, 1), jnp.float32) * 0.1,
        "nm1": jax.random.normal(ks[10], (2 * H + C * H, H), jnp.float32) * 0.1,
        "nm2": jax.random.normal(ks[11], (H, H), jnp.float32) * 0.1,
        "nv1": jax.random.normal(ks[8], (2 * H, H), jnp.float32) * 0.1,
        "nv2": jax.random.normal(ks[9], (H, H), jnp.float32) * 0.1,
    }
    grav = jnp.asarray([0.0, -1.0, 0.0])
    return (h, x, v, vx, vh, gid, agg_x, agg_e, grav), W


def mlp(z, w1, w2):
    return jax.nn.silu(jax.nn.silu(z @ w1) @ w2)


def head(z, w1, w2):  # CoordMLP: silu(z@w1)@w2 -> [.., 1]
    return jax.nn.silu(z @ w1) @ w2


def pool(z, gid, nmask=None):
    s = jax.ops.segment_sum(z, gid, num_segments=B)
    n = jax.ops.segment_sum(jnp.ones((N,) + (1,) * (z.ndim - 1)), gid,
                            num_segments=B)
    return s / jnp.maximum(n, 1.0)


def base(h, x, v, vx, vh, gid, agg_x, agg_e, grav, W):
    vx_n = jnp.take(vx, gid, axis=0)                   # [N, C, 3]
    vh_n = jnp.take(vh, gid, axis=0)                   # [N, C, H]
    vdiff = vx_n - x[:, None, :]
    vrad = jnp.linalg.norm(vdiff, axis=-1, keepdims=True)
    coord_mean = pool(x, gid)
    m_x = vx - coord_mean[:, None, :]
    gram = jnp.einsum("bci,bdi->bcd", m_x, m_x)
    gram_n = jnp.take(gram, gid, axis=0)
    ev_in = jnp.concatenate(
        [jnp.broadcast_to(h[:, None, :], (N, C, H)), vh_n, vrad, gram_n],
        axis=-1).astype(cd)
    m_v = mlp(ev_in, W["ev1"].astype(cd), W["ev2"].astype(cd))
    m_v32 = m_v.astype(jnp.float32)
    x_new = x + agg_x
    gate_xv = head(m_v, W["gr1"].astype(cd), W["gr2"].astype(cd)).astype(jnp.float32)
    x_new = x_new + jnp.mean(-vdiff * gate_xv, axis=1)
    x_new = x_new + head(h.astype(cd), W["vel1"].astype(cd), W["vel2"].astype(cd)).astype(jnp.float32) * v
    x_new = x_new + head(h.astype(cd), W["g1"].astype(cd), W["g2"].astype(cd)).astype(jnp.float32) * grav
    gate_X = head(m_v, W["gx1"].astype(cd), W["gx2"].astype(cd)).astype(jnp.float32)
    vx_new = vx + pool(vdiff * gate_X, gid)
    pool_mv = pool(m_v32, gid)
    dvh = mlp(jnp.concatenate([vh, pool_mv], -1).astype(cd),
              W["nv1"].astype(cd), W["nv2"].astype(cd)).astype(jnp.float32)
    flat_mv = m_v32.reshape(N, C * H)
    dh = mlp(jnp.concatenate([h, agg_e, flat_mv], -1).astype(cd),
             W["nm1"].astype(cd), W["nm2"].astype(cd)).astype(jnp.float32)
    return x_new, h + dh, vx + vx_new, vh + dvh


def flat(h, x, v, vx, vh, gid, agg_x, agg_e, grav, W):
    """Channels-in-rows: all [N, C, k] -> [N*C, k]; coords packed [N, 3C]."""
    hc = h.astype(cd)
    vxf = vx.reshape(B, C * 3)
    vx_nf = jnp.take(vxf, gid, axis=0)                 # [N, 3C]
    vh_nf = jnp.take(vh.reshape(B, C * H), gid, axis=0)  # [N, CH]
    xt = jnp.tile(x, (1, C))                           # [N, 3C]
    vdiff_f = vx_nf - xt                               # [N, 3C]
    vd2 = vdiff_f * vdiff_f
    # per-channel rad: sum groups of 3 lanes
    vrad = jnp.sqrt(vd2.reshape(N, C, 3).sum(-1))      # [N, C]
    coord_mean = pool(x, gid)
    m_x = vx - coord_mean[:, None, :]
    gram = jnp.einsum("bci,bdi->bcd", m_x, m_x)        # [B, C, C]
    gram_n = jnp.take(gram.reshape(B, C * C), gid, axis=0)  # [N, CC]
    # rows = channels: [N*C, 2H+1+C]
    ev_in = jnp.concatenate(
        [
            jnp.repeat(hc, C, axis=0).reshape(N * C, H),
            vh_nf.reshape(N * C, H).astype(cd),
            vrad.reshape(N * C, 1).astype(cd),
            gram_n.reshape(N * C, C).astype(cd),
        ],
        axis=-1,
    )
    m_v = mlp(ev_in, W["ev1"].astype(cd), W["ev2"].astype(cd))  # [N*C, H]
    gate_xv = head(m_v, W["gr1"].astype(cd), W["gr2"].astype(cd))  # [N*C, 1]
    gate_X = head(m_v, W["gx1"].astype(cd), W["gx2"].astype(cd))
    gates2 = jnp.concatenate([gate_xv, gate_X], -1).astype(jnp.float32)
    gxv = gates2[:, 0].reshape(N, C)
    gX = gates2[:, 1].reshape(N, C)
    vdiff3 = vdiff_f.reshape(N, C, 3)
    x_new = x + agg_x
    x_new = x_new + jnp.einsum("ncd,nc->nd", -vdiff3, gxv) / C
    hh = head(hc, W["vel1"].astype(cd), W["vel2"].astype(cd)).astype(jnp.float32)
    gg = head(hc, W["g1"].astype(cd), W["g2"].astype(cd)).astype(jnp.float32)
    x_new = x_new + hh * v + gg * grav
    vxg = (vdiff3 * gX[:, :, None]).reshape(N, C * 3)
    vx_new = vx + pool(vxg, gid).reshape(B, C, 3)
    m_v32 = m_v.astype(jnp.float32).reshape(N, C * H)
    pool_mv = pool(m_v32, gid).reshape(B, C, H)
    dvh = mlp(jnp.concatenate([vh, pool_mv], -1).astype(cd),
              W["nv1"].astype(cd), W["nv2"].astype(cd)).astype(jnp.float32)
    dh = mlp(jnp.concatenate([hc, agg_e.astype(cd), m_v32.astype(cd)], -1),
             W["nm1"].astype(cd), W["nm2"].astype(cd)).astype(jnp.float32)
    return x_new, h + dh, vx + vx_new, vh + dvh


def flat2(h, x, v, vx, vh, gid, agg_x, agg_e, grav, W):
    """flat + split first-layer dots (no ev_in concat), one merged pool
    pass, combined two-output heads."""
    hc = h.astype(cd)
    W1 = W["ev1"].astype(cd)
    W1h, W1v, w1r, W1g = W1[:H], W1[H:2*H], W1[2*H], W1[2*H+1:]
    vxf = vx.reshape(B, C * 3)
    vx_nf = jnp.take(vxf, gid, axis=0)                 # [N, 3C]
    xt = jnp.tile(x, (1, C))
    vdiff_f = vx_nf - xt                               # [N, 3C]
    vd2 = vdiff_f * vdiff_f
    vrad = jnp.sqrt(vd2.reshape(N, C, 3).sum(-1))      # [N, C]
    coord_mean = pool(x, gid)
    m_x = vx - coord_mean[:, None, :]
    gram = jnp.einsum("bci,bdi->bcd", m_x, m_x)        # [B, C, C]
    # first-layer split: z1[n,c] = h@W1h (shared) + (vh@W1v + gram@W1g)[b,c]
    #                      + vrad[n,c]*w1r  — no ev_in concat at all
    zh = hc @ W1h                                      # [N, H]
    zb = (vh.astype(cd) @ W1v
          + gram.astype(cd) @ W1g)                     # [B, C, H]
    zb_n = jnp.take(zb.reshape(B, C * H), gid, axis=0).reshape(N * C, H)
    z1 = (zh[:, None, :] + vrad[:, :, None].astype(cd) * w1r).reshape(N * C, H) + zb_n
    m_v = jax.nn.silu(jax.nn.silu(z1) @ W["ev2"].astype(cd))   # [N*C, H]
    # combined gate heads: silu(m_v @ [gr1|gx1]) -> block-diag [2H, 2]
    G1 = jnp.concatenate([W["gr1"], W["gx1"]], axis=1).astype(cd)   # [H, 2H]
    G2 = jnp.zeros((2 * H, 2), jnp.float32)
    G2 = G2.at[:H, 0].set(W["gr2"][:, 0]).at[H:, 1].set(W["gx2"][:, 0]).astype(cd)
    gates2 = (jax.nn.silu(m_v @ G1) @ G2).astype(jnp.float32)   # [N*C, 2]
    gxv = gates2[:, 0].reshape(N, C)
    gX = gates2[:, 1].reshape(N, C)
    vdiff3 = vdiff_f.reshape(N, C, 3)
    # combined h heads (vel, gravity)
    Hh1 = jnp.concatenate([W["vel1"], W["g1"]], axis=1).astype(cd)
    Hh2 = jnp.zeros((2 * H, 2), jnp.float32)
    Hh2 = Hh2.at[:H, 0].set(W["vel2"][:, 0]).at[H:, 1].set(W["g2"][:, 0]).astype(cd)
    hg = (jax.nn.silu(hc @ Hh1) @ Hh2).astype(jnp.float32)      # [N, 2]
    x_new = x + agg_x
    x_new = x_new + jnp.einsum("ncd,nc->nd", -vdiff3, gxv) / C
    x_new = x_new + hg[:, 0:1] * v + hg[:, 1:2] * grav
    m_v32 = m_v.astype(jnp.float32).reshape(N, C * H)
    vxg = (vdiff3 * gX[:, :, None]).reshape(N, C * 3)
    # ONE pooled pass over [x | vdiff*gX | m_v]
    pooled = pool(jnp.concatenate([vxg, m_v32], axis=-1), gid)  # [B, 3C+CH]
    vx_new = vx + pooled[:, :3 * C].reshape(B, C, 3)
    pool_mv = pooled[:, 3 * C:].reshape(B, C, H)
    dvh = mlp(jnp.concatenate([vh, pool_mv], -1).astype(cd),
              W["nv1"].astype(cd), W["nv2"].astype(cd)).astype(jnp.float32)
    dh = mlp(jnp.concatenate([hc, agg_e.astype(cd), m_v32.astype(cd)], -1),
             W["nm1"].astype(cd), W["nm2"].astype(cd)).astype(jnp.float32)
    return x_new, h + dh, vx + vx_new, vh + dvh


def flat3(h, x, v, vx, vh, gid, agg_x, agg_e, grav, W):
    """flat2 + all per-graph gathers/pools as one-hot matmuls.

    onehot [N, B] is built once (per step, shared across layers in the real
    model); take(z, gid) = onehot @ z[B], pool(z) = onehot.T @ z / counts.
    """
    hc = h.astype(cd)
    onehot = (gid[:, None] == jnp.arange(B)[None, :]).astype(cd)   # [N, B]
    inv_cnt = 1.0 / jnp.maximum(
        jnp.sum(onehot.astype(jnp.float32), axis=0), 1.0)          # [B]

    def bpool(z):   # [N, K] f32/cd -> [B, K] f32 mean
        s = jax.lax.dot_general(onehot, z.astype(cd), (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s * inv_cnt[:, None]

    def btake(zb):  # [B, K] -> [N, K] (cd)
        return onehot @ zb.astype(cd)

    W1 = W["ev1"].astype(cd)
    W1h, W1v, w1r, W1g = W1[:H], W1[H:2*H], W1[2*H], W1[2*H+1:]
    vx_nf = btake(vx.reshape(B, C * 3))                # [N, 3C]
    xt = jnp.tile(x, (1, C))
    vdiff_f = vx_nf.astype(jnp.float32) - xt           # [N, 3C]
    vd2 = vdiff_f * vdiff_f
    vrad = jnp.sqrt(vd2.reshape(N, C, 3).sum(-1))      # [N, C]
    coord_mean = bpool(x)
    m_x = vx - coord_mean[:, None, :]
    gram = jnp.einsum("bci,bdi->bcd", m_x, m_x)
    zh = hc @ W1h
    zb = (vh.astype(cd) @ W1v + gram.astype(cd) @ W1g)  # [B, C, H]
    zb_n = btake(zb.reshape(B, C * H)).reshape(N * C, H)
    z1 = (zh[:, None, :] + vrad[:, :, None].astype(cd) * w1r).reshape(N * C, H) + zb_n
    m_v = jax.nn.silu(jax.nn.silu(z1) @ W["ev2"].astype(cd))
    G1 = jnp.concatenate([W["gr1"], W["gx1"]], axis=1).astype(cd)
    G2 = jnp.zeros((2 * H, 2), jnp.float32)
    G2 = G2.at[:H, 0].set(W["gr2"][:, 0]).at[H:, 1].set(W["gx2"][:, 0]).astype(cd)
    gates2 = (jax.nn.silu(m_v @ G1) @ G2).astype(jnp.float32)
    gxv = gates2[:, 0].reshape(N, C)
    gX = gates2[:, 1].reshape(N, C)
    vdiff3 = vdiff_f.reshape(N, C, 3)
    Hh1 = jnp.concatenate([W["vel1"], W["g1"]], axis=1).astype(cd)
    Hh2 = jnp.zeros((2 * H, 2), jnp.float32)
    Hh2 = Hh2.at[:H, 0].set(W["vel2"][:, 0]).at[H:, 1].set(W["g2"][:, 0]).astype(cd)
    hg = (jax.nn.silu(hc @ Hh1) @ Hh2).astype(jnp.float32)
    x_new = x + agg_x
    x_new = x_new + jnp.einsum("ncd,nc->nd", -vdiff3, gxv) / C
    x_new = x_new + hg[:, 0:1] * v + hg[:, 1:2] * grav
    m_v32 = m_v.astype(jnp.float32).reshape(N, C * H)
    vxg = (vdiff3 * gX[:, :, None]).reshape(N, C * 3)
    pooled = bpool(jnp.concatenate([vxg.astype(cd),
                                    m_v.reshape(N, C * H)], axis=-1))
    vx_new = vx + pooled[:, :3 * C].reshape(B, C, 3)
    pool_mv = pooled[:, 3 * C:].reshape(B, C, H)
    dvh = mlp(jnp.concatenate([vh, pool_mv], -1).astype(cd),
              W["nv1"].astype(cd), W["nv2"].astype(cd)).astype(jnp.float32)
    dh = mlp(jnp.concatenate([hc, agg_e.astype(cd), m_v32.astype(cd)], -1),
             W["nm1"].astype(cd), W["nm2"].astype(cd)).astype(jnp.float32)
    return x_new, h + dh, vx + vx_new, vh + dvh


def main():
    print("backend:", jax.default_backend())
    inputs, W = make_inputs(jax.random.key(0))

    fb = jax.jit(lambda *a: base(*a, W))
    ff = jax.jit(lambda *a: flat(*a, W))
    f2 = jax.jit(lambda *a: flat2(*a, W))
    f3 = jax.jit(lambda *a: flat3(*a, W))
    rb = fb(*inputs)
    rf = ff(*inputs)
    r2 = f2(*inputs)
    r3 = f3(*inputs)
    for i, (a, b, c, d) in enumerate(zip(rb, rf, r2, r3)):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        er2 = float(jnp.max(jnp.abs(a - c)) / (jnp.max(jnp.abs(a)) + 1e-9))
        er3 = float(jnp.max(jnp.abs(a - d)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(f"out{i} rel err: flat {err:.2e}  flat2 {er2:.2e}  flat3 {er3:.2e}")
    timed("base fwd", lambda: fb(*inputs))
    timed("flat fwd", lambda: ff(*inputs))
    timed("flat2 fwd", lambda: f2(*inputs))
    timed("flat3 fwd", lambda: f3(*inputs))

    def lb(*a):
        r = fb(*a)
        return jnp.sum(r[0]) + jnp.sum(r[1]) + jnp.sum(r[2]) + jnp.sum(r[3])

    def lf(*a):
        r = ff(*a)
        return jnp.sum(r[0]) + jnp.sum(r[1]) + jnp.sum(r[2]) + jnp.sum(r[3])

    gb = jax.jit(jax.grad(lambda h, x, rest: jnp.sum(sum(map(jnp.sum, base(h, x, *rest, W)))), argnums=(0, 1)))
    # simpler: value_and_grad over (h, x)
    gb = jax.jit(jax.grad(lambda h, x, v, vx, vh, gid, ax_, ae, gr:
                          sum(map(jnp.sum, base(h, x, v, vx, vh, gid, ax_, ae, gr, W))),
                          argnums=(0, 1, 3, 4)))
    gf = jax.jit(jax.grad(lambda h, x, v, vx, vh, gid, ax_, ae, gr:
                          sum(map(jnp.sum, flat(h, x, v, vx, vh, gid, ax_, ae, gr, W))),
                          argnums=(0, 1, 3, 4)))
    g2 = jax.jit(jax.grad(lambda h, x, v, vx, vh, gid, ax_, ae, gr:
                          sum(map(jnp.sum, flat2(h, x, v, vx, vh, gid, ax_, ae, gr, W))),
                          argnums=(0, 1, 3, 4)))
    timed("base fwd+bwd", lambda: gb(*inputs))
    timed("flat fwd+bwd", lambda: gf(*inputs))
    g3 = jax.jit(jax.grad(lambda h, x, v, vx, vh, gid, ax_, ae, gr:
                          sum(map(jnp.sum, flat3(h, x, v, vx, vh, gid, ax_, ae, gr, W))),
                          argnums=(0, 1, 3, 4)))
    timed("flat2 fwd+bwd", lambda: g2(*inputs))
    timed("flat3 fwd+bwd", lambda: g3(*inputs))


if __name__ == "__main__":
    main()
