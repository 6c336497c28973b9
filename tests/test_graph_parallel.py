"""Graph-parallel (edge/node-sharded) correctness: G shards == 1 device.

The core distributed-exactness guarantee (SURVEY.md §4 class (d)): identical
params, identical batch -> sharded forward/step allclose to single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from jax.sharding import Mesh

from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.parallel import make_mesh
from fastegnn_tpu.parallel.graph_parallel import (
    make_gp_forward,
    make_gp_train_step,
    shard_graph_batch,
)
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_train_step

from helpers import random_raw_graph


def _build_batch(rng, n_graphs=2, n_nodes=8, pad_edges_to=None):
    raws = [random_raw_graph(rng, n_nodes) for _ in range(n_graphs)]
    e = raws[0]["dst"].shape[0]
    cap = pad_edges_to or e
    spec = GraphSpec(max_nodes=n_nodes, max_edges=cap, n_graphs=n_graphs,
                     edge_attr_dim=2)
    return batch_graphs([pad_graph(spec, **r) for r in raws], spec)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_gp_forward_matches_single(n_shards):
    rng = np.random.default_rng(0)
    # 8 nodes/graph, 2 graphs -> N=16 divisible by 2 and 4;
    # edge capacity padded to a multiple of n_shards
    e = 8 * 7
    cap = ((2 * e) // (2 * n_shards) + 1) * n_shards  # per-graph cap, multiple
    batch = _build_batch(rng, 2, 8, pad_edges_to=cap)

    model_1 = FastEGNN(hidden=16, virtual_channels=3, n_layers=2)
    params = model_1.init(jax.random.key(0), batch)["params"]
    x1, vx1 = model_1.apply({"params": params}, batch)

    mesh = make_mesh((n_shards,), ("graph",), devices=jax.devices()[:n_shards])
    model_g = FastEGNN(hidden=16, virtual_channels=3, n_layers=2,
                       shard_axis="graph", shard_axis_size=n_shards)
    stacked = shard_graph_batch(batch, n_shards)
    fwd = make_gp_forward(model_g, mesh)
    xg, vxg = fwd(params, stacked)

    np.testing.assert_allclose(np.asarray(xg), np.asarray(x1), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(vxg), np.asarray(vx1), atol=2e-5, rtol=2e-5)


def test_gp_train_step_matches_single():
    n_shards = 2
    rng = np.random.default_rng(1)
    cap = 60  # 2-graph edge capacity 120, divisible by 2
    batch = _build_batch(rng, 2, 8, pad_edges_to=cap)

    model_1 = FastEGNN(hidden=16, virtual_channels=3, n_layers=2)
    params = model_1.init(jax.random.key(0), batch)["params"]
    tx = torch_adam(1e-3)

    single_step = make_train_step(model_1, tx, use_mmd=True, donate=False,
                                  per_graph_sampling=False)
    s1 = TrainState.create(params, tx)
    key = jax.random.key(7)
    s1, m1 = single_step(s1, batch, key)

    mesh = make_mesh((n_shards,), ("graph",), devices=jax.devices()[:n_shards])
    model_g = FastEGNN(hidden=16, virtual_channels=3, n_layers=2,
                       shard_axis="graph", shard_axis_size=n_shards)
    gp_step = make_gp_train_step(model_g, tx, mesh, use_mmd=True)
    params_g = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    sg = TrainState.create(params_g, tx)
    sg, mg = gp_step(sg, shard_graph_batch(batch, n_shards), key)

    np.testing.assert_allclose(float(mg["mse"]), float(m1["mse"]), rtol=1e-5)
    np.testing.assert_allclose(float(mg["mmd"]), float(m1["mmd"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(sg.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_gp_with_data_axis():
    """2D mesh: data x graph — one step runs and is finite."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(2)
    cap = 60
    batches = [_build_batch(rng, 2, 8, pad_edges_to=cap) for _ in range(2)]

    mesh = make_mesh((2, 2), ("data", "graph"), devices=jax.devices()[:4])
    model_g = FastEGNN(hidden=16, virtual_channels=3, n_layers=1,
                       shard_axis="graph", shard_axis_size=2)
    # init with the unsharded twin (identical param tree); shard_axis models
    # only run inside shard_map
    params = FastEGNN(hidden=16, virtual_channels=3, n_layers=1).init(
        jax.random.key(0), batches[0]
    )["params"]
    tx = torch_adam(1e-3)
    step = make_gp_train_step(model_g, tx, mesh, data_axis="data")

    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[shard_graph_batch(b, 2) for b in batches]
    )
    state = TrainState.create(params, tx)
    state, metrics = step(state, stacked, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------
# owner-sharded graph parallelism (parallel/owner_graph.py)
# ---------------------------------------------------------------------------


def _spatial_batch(n=256, seed=0, radius=0.22):
    """One spatially-sorted radius graph (locality keeps halos small)."""
    import numpy as np
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
    from fastegnn_tpu.ops.neighbors import radius_graph_np

    rng = np.random.default_rng(seed)
    loc = rng.random((n, 3)).astype(np.float32)
    order = np.argsort(loc[:, 0], kind="stable")   # 1-D spatial sort
    loc = loc[order]
    vel = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    dst, src = radius_graph_np(loc, radius)
    o = np.argsort(dst, kind="stable")
    dst, src = dst[o].astype(np.int32), src[o].astype(np.int32)
    d0 = np.linalg.norm(loc[dst] - loc[src], axis=1, keepdims=True)
    spec = GraphSpec(max_nodes=n, max_edges=dst.size, n_graphs=1,
                     edge_attr_dim=2, virtual_channels=3)
    g = pad_graph(
        spec,
        node_feat=np.concatenate(
            [np.linalg.norm(vel, axis=1, keepdims=True),
             np.ones((n, 1), np.float32)], axis=1),
        coord=loc, vel=vel, dst=dst, src=src,
        edge_attr=np.concatenate([d0, d0], 1).astype(np.float32),
        coord_target=loc + vel,
    )
    return batch_graphs([g], spec, edge_align=256)


def test_owner_sharded_forward_matches_unsharded():
    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.parallel.owner_graph import (
        make_owner_gp_forward,
        make_owner_sharded_batch,
    )

    G = 4
    batch = _spatial_batch()
    model = FastEGNN(hidden=64, virtual_channels=3, n_layers=2)
    params = model.init(jax.random.key(0), batch)["params"]
    ref_x, ref_v = model.apply({"params": params}, batch)

    sb = make_owner_sharded_batch(batch, G)
    # O(N/G) node state: every node leaf is [G, N/G, ...]
    assert sb.node_feat.shape[:2] == (G, batch.num_nodes // G)
    # halo stays a fraction of the owned rows for a spatially-sorted graph
    # (send_idx is [owner, dest, S] with the targeted per-pair exchange)
    assert sb.send_idx.shape[2] < batch.num_nodes // G

    mesh = Mesh(np.asarray(jax.devices()[:G]), ("graph",))
    fwd = make_owner_gp_forward(mesh, axis="graph", n_layers=2)
    x, vx = fwd(params, sb)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(ref_v),
                               atol=2e-5, rtol=2e-5)


def test_owner_sharded_train_step_matches_unsharded():
    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.parallel.owner_graph import (
        make_owner_gp_train_step,
        make_owner_sharded_batch,
    )
    from fastegnn_tpu.train import TrainState, torch_adam
    from fastegnn_tpu.train.step import make_train_step

    G = 4
    batch = _spatial_batch(seed=3)
    model = FastEGNN(hidden=64, virtual_channels=3, n_layers=2)
    params = model.init(jax.random.key(1), batch)["params"]
    tx = torch_adam(5e-4, 1e-12)
    key = jax.random.key(7)

    ref_step = make_train_step(model, tx, sigma=1.5, weight=0.01, sample=3,
                               per_graph_sampling=True, donate=False)
    ref_state, ref_metrics = ref_step(TrainState.create(params, tx), batch, key)

    sb = make_owner_sharded_batch(batch, G)
    mesh = Mesh(np.asarray(jax.devices()[:G]), ("graph",))
    step = make_owner_gp_train_step(tx, mesh, axis="graph", n_layers=2,
                                    sigma=1.5, weight=0.01, sample=3,
                                    per_graph_sampling=True)
    state, metrics = step(TrainState.create(params, tx), sb, key)

    np.testing.assert_allclose(float(metrics["mse"]),
                               float(ref_metrics["mse"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(ref_state.params)):
        # post-Adam params; small slack over exactness because the targeted
        # halo layout permutes the kernel's slot packing, so f32 edge-grad
        # sums associate differently (ordering noise ~1e-6, amplified a bit
        # by step-1 Adam's g/(|g|+eps) on tiny grads)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6)


def test_owner_sharded_segment_path_matches_kernel_path():
    """The owner layer has two edge-block implementations (fused v5 Pallas
    kernel over the local gather table vs plain segment ops); both must
    agree with each other and the unsharded model."""
    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.parallel.owner_graph import (
        make_owner_gp_forward,
        make_owner_sharded_batch,
    )

    G = 2
    batch = _spatial_batch(seed=9)
    model = FastEGNN(hidden=64, virtual_channels=3, n_layers=2)
    params = model.init(jax.random.key(2), batch)["params"]
    ref_x, _ = model.apply({"params": params}, batch)

    mesh = Mesh(np.asarray(jax.devices()[:G]), ("graph",))
    fwd = make_owner_gp_forward(mesh, axis="graph", n_layers=2)
    sb_k = make_owner_sharded_batch(batch, G)
    sb_s = make_owner_sharded_batch(batch, G, build_ek5=False)
    assert sb_k.ek5_idsx is not None and sb_s.ek5_idsx is None
    x_k, _ = fwd(params, sb_k)
    x_s, _ = fwd(params, sb_s)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_s),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(ref_x),
                               atol=2e-5, rtol=2e-5)


def test_owner_batch_factory_shape_stability():
    """Capacity quantisation keeps owner-sharded batch shapes stable across
    batches with different edge distributions (one jitted step, no
    per-batch retraces)."""
    from fastegnn_tpu.parallel.owner_graph import OwnerBatchFactory

    factory = OwnerBatchFactory(2, ek5_sblocks=1)
    shapes = []
    for seed in range(3):
        sb = factory(_spatial_batch(n=256, seed=seed))
        shapes.append(jax.tree.map(lambda a: a.shape, sb))
    assert shapes[0] == shapes[1] == shapes[2]
    # capacities quantised upward
    assert shapes[0].dst_local[1] % 1024 == 0
    assert shapes[0].send_idx[2] % 256 == 0


def test_owner_batch_factory_grows_super_capacity():
    """A later batch that packs MORE v5 superchunks than the first batch's
    quantized capacity must grow the capacity and rebuild — not raise
    ValueError mid-training (round-4 advisor finding)."""
    from fastegnn_tpu.parallel.owner_graph import OwnerBatchFactory

    factory = OwnerBatchFactory(2, ek5_sblocks=1, ek5_super=2)
    small = factory(_spatial_batch(n=128, seed=0))
    assert small.ek5_sdb is not None
    # ~16x the edges of the n=128 batch -> far more superchunks
    big = factory(_spatial_batch(n=512, seed=1))
    assert big.ek5_sdb.shape[1] > small.ek5_sdb.shape[1]
    # capacity is now monotone: a small batch pads up to the big shape
    small2 = factory(_spatial_batch(n=128, seed=2))
    assert small2.ek5_sdb.shape[1] == big.ek5_sdb.shape[1]


def test_iter_owner_sharded_batches_uniform_subs_under_growth():
    """With data>1, a capacity that grows between the D sub-batches of one
    global batch must not leave earlier subs with smaller leaves (jnp.stack
    would raise; round-4 advisor finding)."""
    from fastegnn_tpu.parallel.owner_graph import (
        OwnerBatchFactory,
        iter_owner_sharded_batches,
    )

    class _DS:
        # index -> graph density: idx 0 sparse, idx 1 dense, within ONE
        # global batch so the el/halo/super capacities grow mid-loop
        _r = {0: 0.10, 1: 0.30, 2: 0.30, 3: 0.10}

        def __len__(self):
            return 4

        def collate(self, idxs):
            (i,) = idxs
            return _spatial_batch(n=256, seed=i, radius=self._r[i])

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("data", "graph"))
    factory = OwnerBatchFactory(2, ek5_sblocks=1, ek5_super=2)
    batches = list(iter_owner_sharded_batches(
        _DS(), 2, mesh, factory, data=2))
    assert len(batches) == 2
    for b in batches:
        # stacked leaves exist and are finite-shaped: [D, G, ...]
        assert b.dst_local.shape[0] == 2 and b.dst_local.shape[1] == 2
