"""Graph-parallel (owner-sharded) correctness: G shards == 1 device.

The core distributed-exactness guarantee (SURVEY.md §4 class (d)): identical
params, identical batch -> sharded forward/step allclose to single-device.
One implementation: ``parallel/owner_graph.py`` (O(N/G) owned node state,
targeted per-pair halo all_to_all, per-shard fused v5 kernels).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import TrainState, torch_adam


def test_owner_step_with_data_axis():
    """2D mesh (data x owner-sharded graph): the composed step the CLI
    ``--mesh data=D,graph=G`` runs executes and is finite.  Exactness of the
    composed path vs single-device is covered end-to-end by
    tests/test_cli_mesh.py::test_cli_mesh_matches_single_device."""
    from fastegnn_tpu.parallel.owner_graph import (
        OwnerBatchFactory,
        make_owner_gp_train_step,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("data", "graph"))
    factory = OwnerBatchFactory(2)
    batches = [_spatial_batch(n=64, seed=i) for i in range(2)]
    [factory(b) for b in batches]          # settle capacities
    subs = [factory(b) for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subs)
    params = FastEGNN(hidden=64, virtual_channels=3, n_layers=2).init(
        jax.random.key(0), batches[0])["params"]
    tx = torch_adam(1e-3)
    step = make_owner_gp_train_step(
        tx, mesh, axis="graph", data_axis="data", n_layers=2)
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
