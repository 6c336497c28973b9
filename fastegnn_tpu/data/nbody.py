"""N-body dataset: .npy trajectories -> padded GraphBatch graphs.

Loader semantics match the reference (``datasets/nbody/dataset.py``):
- input frame 30, target frame 40 of each sampled trajectory (``:17,64-65``);
- per-system complete graph cut to the ``(1-cutoff_rate)`` shortest edges
  (``:102-113``);
- node features ``[|v|, q / max(q)]`` (``:91-93``);
- edge attributes ``[d0, d0]``: the stored initial distance plus the
  "current" distance the reference training loop concatenates at loc_0 —
  identical values at t=0 (``:88`` + ``utils/train.py:41-43``);
- the *test* split is randomly rotated once at construction (``:78-84``).

File layout is the generator's (``fastegnn_tpu/data/nbody_sim.py`` /
reference ``datasets/nbody/datagen/generate_dataset.py:89-116``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from fastegnn_tpu.data.batcher import GraphDataset
from fastegnn_tpu.graph import GraphSpec, pad_graph
from fastegnn_tpu.ops.neighbors import cutoff_edges_np
from fastegnn_tpu.ops.rotation import random_rotation


class NBodyDataset(GraphDataset):
    def __init__(
        self,
        data_dir: str,
        dataset_name: str,
        partition: str = "train",
        virtual_channels: int = 3,
        cutoff_rate: float = 0.0,
        max_samples: int = int(1e8),
        frame_0: int = 30,
        frame_t: int = 40,
        rotation_seed: Optional[int] = None,
    ):
        sfx = f"{partition}_charged{dataset_name}"
        loc = np.load(os.path.join(data_dir, f"loc_{sfx}.npy"))      # [S, T, n, 3]
        vel = np.load(os.path.join(data_dir, f"vel_{sfx}.npy"))
        charges = np.load(os.path.join(data_dir, f"charges_{sfx}.npy"))  # [S, n, 1]

        loc, vel, charges = loc[:max_samples], vel[:max_samples], charges[:max_samples]
        n = loc.shape[2]
        n_edges = int(n * (n - 1) * (1.0 - cutoff_rate))
        spec = GraphSpec(
            max_nodes=n,
            max_edges=n_edges,
            n_graphs=1,
            node_feat_dim=2,
            edge_attr_dim=2,
            node_attr_dim=1,
            virtual_channels=virtual_channels,
        )

        rot_rng = np.random.default_rng(rotation_seed)
        graphs = []
        for i in range(loc.shape[0]):
            loc_0 = loc[i, frame_0].astype(np.float32)
            loc_t = loc[i, frame_t].astype(np.float32)
            vel_0 = vel[i, frame_0].astype(np.float32)
            q = charges[i].astype(np.float32)
            if partition == "test":
                R = random_rotation(rot_rng).astype(np.float32)
                loc_0, loc_t, vel_0 = loc_0 @ R, loc_t @ R, vel_0 @ R
            dst, src = cutoff_edges_np(loc_0, cutoff_rate)
            d0 = np.linalg.norm(loc_0[dst] - loc_0[src], axis=1, keepdims=True).astype(
                np.float32
            )
            node_feat = np.concatenate(
                [np.linalg.norm(vel_0, axis=1, keepdims=True), q / q.max()], axis=1
            )
            graphs.append(
                pad_graph(
                    spec,
                    node_feat=node_feat,
                    coord=loc_0,
                    vel=vel_0,
                    dst=dst,
                    src=src,
                    edge_attr=np.concatenate([d0, d0], axis=1),
                    coord_target=loc_t,
                    node_attr=q,
                )
            )
        super().__init__(graphs, spec)
