"""Break the FastEGNN layer into pieces and time fwd/bwd of each at
Water-3D scale (8000 nodes, ~422k edges, tight padding)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
from fastegnn_tpu.ops.neighbors import radius_graph_np, sort_cutoff_np


def build(n_nodes=8000, degree=60, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    r = 0.035
    vol = n_nodes * (4.0 / 3.0) * np.pi * r**3 / degree
    side = vol ** (1.0 / 3.0)
    loc = (rng.random((n_nodes, 3)) * side).astype(np.float32)
    vel = (rng.normal(size=(n_nodes, 3)) * 0.01).astype(np.float32)
    dst, src = radius_graph_np(loc, r)
    dst, src = sort_cutoff_np(dst, src, loc, 0.0)
    max_edges = int(np.ceil(dst.size / 4096) * 4096)
    spec = GraphSpec(max_nodes=n_nodes, max_edges=max_edges, n_graphs=1,
                     edge_attr_dim=2, virtual_channels=channels)
    d0 = np.linalg.norm(loc[dst] - loc[src], axis=1, keepdims=True).astype(np.float32)
    q = np.ones((n_nodes, 1), np.float32)
    g = pad_graph(spec, node_feat=np.concatenate(
        [np.linalg.norm(vel, axis=1, keepdims=True), q], 1),
        coord=loc, vel=vel, dst=dst, src=src,
        edge_attr=np.concatenate([d0, d0], 1), coord_target=loc + vel,
        node_attr=q)
    return batch_graphs([g], spec, edge_align=4096)


def main():
    batch = build()
    N = batch.num_nodes
    E = batch.num_edges
    H, C = 64, 3
    print(f"N={N} E={E} backend={jax.default_backend()}")

    def overhead():
        t0 = time.perf_counter()
        float(jnp.sum(batch.coord[:8]))
        return time.perf_counter() - t0
    ov = min(overhead() for _ in range(3))

    def timeit(fn, args, label, n=30):
        r = fn(*args)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).reshape(()))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).reshape(()))
        dt = max(time.perf_counter() - t0 - ov, 1e-9) / n * 1e3
        print(f"{label:<52s} {dt:9.3f} ms")
        return dt

    key = jax.random.key(0)
    h = jax.random.normal(key, (N, H), jnp.float32)
    x, v = batch.coord, batch.vel
    cd = jnp.bfloat16

    W1 = jax.random.normal(key, (2 * H + 3, H), jnp.float32) * 0.1
    b1 = jnp.zeros((H,))
    W2 = jax.random.normal(key, (H, H), jnp.float32) * 0.1
    b2 = jnp.zeros((H,))
    Wg1 = jax.random.normal(key, (H, H), jnp.float32) * 0.1
    bg1 = jnp.zeros((H,))
    wg2 = jax.random.normal(key, (H, 1), jnp.float32) * 0.01

    from fastegnn_tpu.ops.spmm import gather_dst, gather_src, sorted_segment_sum_csr

    def edge_block(h, x, W1, b1, W2, b2, Wg1, bg1, wg2, graph):
        hx = jnp.concatenate([h, x], axis=-1)
        hd = gather_dst(hx, graph.dst, graph.csr_dst)
        hs = gather_src(hx, graph.src, graph.src_perm, graph.src_sorted,
                        graph.csr_src)
        diff = hd[:, H:] - hs[:, H:]
        rad = jnp.sum(diff**2, axis=-1, keepdims=True)
        ein = jnp.concatenate([hd[:, :H], hs[:, :H], rad, graph.edge_attr],
                              axis=-1).astype(cd)
        mm = jax.nn.silu(ein @ W1.astype(cd) + b1.astype(cd))
        mm = jax.nn.silu(mm @ W2.astype(cd) + b2.astype(cd))
        gg = jax.nn.silu(mm @ Wg1.astype(cd) + bg1.astype(cd))
        gate = (gg @ wg2.astype(cd)).astype(jnp.float32)
        tr = diff * gate
        comb = jnp.concatenate([mm, tr.astype(cd)], axis=-1)
        summed = sorted_segment_sum_csr(comb, graph.dst, graph.csr_dst, N)
        return summed[:, :H], summed[:, H:]

    eb = jax.jit(edge_block)
    timeit(eb, (h, x, W1, b1, W2, b2, Wg1, bg1, wg2, batch), "edge block fwd (XLA+pallas segsum)")

    def eb_loss(h, x, *w):
        a, b = edge_block(h, x, *w, batch)
        return jnp.sum(a) + jnp.sum(b)
    eb_grad = jax.jit(jax.grad(eb_loss, argnums=(0, 1, 2, 4, 6, 8)))
    timeit(eb_grad, (h, x, W1, b1, W2, b2, Wg1, bg1, wg2), "edge block fwd+bwd")

    # virtual dense block (all virtual machinery of one layer)
    Wev = jax.random.normal(key, (2 * H + 1 + C, H), jnp.float32) * 0.1
    Wev2 = jax.random.normal(key, (H, H), jnp.float32) * 0.1
    Wr1 = jax.random.normal(key, (H, H), jnp.float32) * 0.1
    wr2 = jax.random.normal(key, (H, 1), jnp.float32) * 0.01
    vx = jnp.zeros((1, C, 3))
    vh = jax.random.normal(key, (1, C, H), jnp.float32)

    def virtual_block(h, x, vx, vh, Wev, Wev2, Wr1, wr2, graph):
        gid, nmask = graph.graph_id, graph.node_mask
        from fastegnn_tpu.ops.segment import graph_mean_pool
        vx_n = jnp.take(vx, gid, axis=0, mode="clip")
        vh_n = jnp.take(vh, gid, axis=0, mode="clip")
        vdiff = vx_n - x[:, None, :]
        vrad = jnp.linalg.norm(vdiff, axis=-1, keepdims=True)
        coord_mean = graph_mean_pool(x, gid, graph.n_graphs, nmask)
        m_x = vx - coord_mean[:, None, :]
        gram = jnp.einsum("bci,bdi->bcd", m_x, m_x)
        gram_n = jnp.take(gram, gid, axis=0, mode="clip")
        ev_in = jnp.concatenate(
            [jnp.broadcast_to(h[:, None, :], (N, C, H)), vh_n, vrad, gram_n],
            axis=-1).astype(cd)
        m_v = jax.nn.silu(jax.nn.silu(ev_in @ Wev.astype(cd)) @ Wev2.astype(cd))
        gate = (jax.nn.silu(m_v @ Wr1.astype(cd)) @ wr2.astype(cd)).astype(jnp.float32)
        dx = jnp.mean(-vdiff * gate, axis=1)
        vx_new = vx + graph_mean_pool(vdiff * gate, gid, graph.n_graphs, nmask)
        pool = graph_mean_pool(m_v.astype(jnp.float32), gid, graph.n_graphs, nmask)
        return dx, vx_new, pool, m_v.astype(jnp.float32)

    vb = jax.jit(lambda *a: virtual_block(*a, batch))
    timeit(vb, (h, x, vx, vh, Wev, Wev2, Wr1, wr2), "virtual block fwd")

    def vb_loss(*a):
        dx, vxn, pool, mv = virtual_block(*a, batch)
        return jnp.sum(dx) + jnp.sum(vxn) + jnp.sum(pool) + jnp.sum(mv)
    vb_grad = jax.jit(jax.grad(vb_loss, argnums=(0, 1, 2, 3, 4, 6)))
    timeit(vb_grad, (h, x, vx, vh, Wev, Wev2, Wr1, wr2), "virtual block fwd+bwd")

    # node mlp block
    Wn1 = jax.random.normal(key, (2 * H + C * H, H), jnp.float32) * 0.1
    Wn2 = jax.random.normal(key, (H, H), jnp.float32) * 0.1
    mv = jax.random.normal(key, (N, C, H), jnp.float32)
    agg = jax.random.normal(key, (N, H), jnp.float32)

    def node_block(h, agg, mv, Wn1, Wn2):
        flat = mv.reshape(N, C * H)
        z = jnp.concatenate([h, agg, flat], axis=-1).astype(cd)
        dh = (jax.nn.silu(z @ Wn1.astype(cd)) @ Wn2.astype(cd)).astype(jnp.float32)
        return h + dh

    nb = jax.jit(node_block)
    timeit(nb, (h, agg, mv, Wn1, Wn2), "node mlp fwd")
    nb_grad = jax.jit(jax.grad(lambda *a: jnp.sum(node_block(*a)), argnums=(0, 1, 2, 3)))
    timeit(nb_grad, (h, agg, mv, Wn1, Wn2), "node mlp fwd+bwd")

    # raw take / permute rates with tight padding, passed as args
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
    t16 = jnp.zeros((N, 128), cd)
    timeit(take, (t16, batch.src), "take [N,128]bf16 by src (arg)")
    e16 = jnp.zeros((E, 128), cd)
    timeit(take, (e16, batch.src_perm), "permute [E,128]bf16 by src_perm (arg)")
    tr = jax.jit(lambda a: jnp.transpose(a, (1, 0)))
    timeit(tr, (e16,), "transpose [E,128]bf16 -> [128,E]")


if __name__ == "__main__":
    main()
