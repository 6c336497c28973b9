"""Water-3D particle-simulation dataset (h5 trajectories -> GraphBatch).

Loader semantics match the reference (``datasets/simulation/dataset.py``):
- each h5 group holds ``particle_type`` [n] and ``position`` [T, n, 3]
  (``:51-54``);
- up to 15 random frames per trajectory from [0, 250] (``:57``);
- velocity = one-step finite difference ``x[t+1]-x[t]``; target =
  ``x[t+delta_t]`` with delta_t=15 default / 20 via CLI (``:60-63``);
- radius graph r=0.035 with unbounded neighbours (``:80``), then the
  shortest ``(1-cutoff_rate)`` fraction kept (``:96-101``);
- node features [|v|, type/max(type)] (``:85-87``);
- the *test* split gets a random y-axis rotation (gravity-aligned) once at
  construction (``:71-77``);
- samples shuffled after processing (``:32``).

Variable particle counts are handled by padding to the max across
trajectories (static shapes).  ``make_synthetic_simulation_h5`` writes a
small schema-compatible file (falling particles in a box) for tests and
benchmarks when the real Water-3D download is unavailable.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from fastegnn_tpu.data.batcher import GraphDataset
from fastegnn_tpu.graph import GraphSpec, pad_graph
from fastegnn_tpu.ops.neighbors import radius_graph_np, sort_cutoff_np
from fastegnn_tpu.ops.rotation import random_rotation_y


class SimulationDataset(GraphDataset):
    def __init__(
        self,
        data_dir: str,
        dataset_name: str = "Water-3D",
        partition: str = "train",
        virtual_channels: int = 3,
        cutoff_rate: float = 0.0,
        max_samples: int = int(1e8),
        delta_t: int = 15,
        radius: float = 0.035,
        frames_per_trajectory: int = 15,
        frame_range: int = 250,
        seed: int = 0,
        max_nodes: Optional[int] = None,
        max_edges: Optional[int] = None,
        protocol: Optional[dict] = None,
    ):
        """``protocol``: replay a recorded sampling protocol (matched-parity
        experiments, scripts/parity_simulation.py --matched): dict with
        ``frames`` {trajectory key: [frame,...]}, ``rot_deg`` [deg per
        sample in processing order] and ``order`` (permutation replacing
        the post-processing shuffle)."""
        import h5py

        path = os.path.join(data_dir, dataset_name, f"{partition}.h5")
        rng = np.random.default_rng(seed)

        samples = []  # raw (loc_0, vel_0, loc_t, node_type)
        with h5py.File(path, "r") as f:
            for k in list(f.keys()):
                ptype = np.asarray(f[k]["particle_type"], np.float32)[:, None]
                pos = np.asarray(f[k]["position"], np.float32)  # [T, n, 3]
                n_frames = min(
                    frames_per_trajectory, max_samples - len(samples)
                )
                hi = min(frame_range, pos.shape[0] - delta_t - 2)
                if protocol is not None:
                    frames = np.asarray(protocol["frames"][k][:n_frames])
                else:
                    frames = rng.integers(0, hi + 1, size=n_frames)
                for t in frames:
                    samples.append(
                        (
                            pos[t],
                            pos[t + 1] - pos[t],
                            pos[t + delta_t],
                            ptype,
                        )
                    )
                if len(samples) >= max_samples:
                    break

        graphs = []
        raw = []
        for si, (loc_0, vel_0, loc_t, ptype) in enumerate(samples):
            if partition == "test":
                if protocol is not None:
                    from fastegnn_tpu.ops.rotation import rotation_y

                    R = rotation_y(
                        np.radians(protocol["rot_deg"][si])
                    ).astype(np.float32)
                else:
                    R = random_rotation_y(rng).astype(np.float32)
                loc_0, loc_t, vel_0 = loc_0 @ R, loc_t @ R, vel_0 @ R
            dst, src = radius_graph_np(loc_0, radius)
            dst, src = sort_cutoff_np(dst, src, loc_0, cutoff_rate)
            d0 = np.linalg.norm(loc_0[dst] - loc_0[src], axis=1, keepdims=True)
            node_feat = np.concatenate(
                [
                    np.linalg.norm(vel_0, axis=1, keepdims=True),
                    ptype / max(ptype.max(), 1e-12),
                ],
                axis=1,
            ).astype(np.float32)
            raw.append(
                dict(
                    node_feat=node_feat,
                    coord=loc_0,
                    vel=vel_0,
                    dst=dst,
                    src=src,
                    edge_attr=np.concatenate([d0, d0], axis=1).astype(np.float32),
                    coord_target=loc_t,
                    node_attr=ptype,
                )
            )

        n_max = max_nodes or max(r["coord"].shape[0] for r in raw)
        e_max = max_edges or max(r["dst"].shape[0] for r in raw)
        spec = GraphSpec(
            max_nodes=n_max,
            max_edges=e_max,
            n_graphs=1,
            node_feat_dim=2,
            edge_attr_dim=2,
            node_attr_dim=1,
            virtual_channels=virtual_channels,
        )
        graphs = [pad_graph(spec, **r) for r in raw]
        if protocol is not None:
            graphs = [graphs[i] for i in protocol["order"]]
        else:
            rng.shuffle(graphs)
        super().__init__(graphs, spec)


def make_synthetic_simulation_h5(
    path: str,
    n_trajectories: int = 2,
    n_particles: int = 200,
    n_frames: int = 300,
    seed: int = 0,
) -> None:
    """Write a schema-compatible synthetic {train,valid,test}.h5 trio.

    Particles fall under gravity inside a unit box with damping and noise —
    enough physical structure for loaders/benchmarks, not a physics claim.
    """
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    for split in ["train", "valid", "test"]:
        with h5py.File(os.path.join(path, f"{split}.h5"), "w") as f:
            for i in range(n_trajectories):
                n = n_particles
                x = rng.random((n, 3)).astype(np.float32) * 0.4 + 0.3
                v = rng.normal(size=(n, 3)).astype(np.float32) * 1e-3
                traj = np.empty((n_frames, n, 3), np.float32)
                for t in range(n_frames):
                    v[:, 1] -= 1e-4           # gravity
                    v *= 0.999                # damping
                    v += rng.normal(size=(n, 3)).astype(np.float32) * 1e-5
                    x = x + v
                    # reflective box walls
                    for d in range(3):
                        low, high = x[:, d] < 0.0, x[:, d] > 1.0
                        x[low, d] *= -1.0
                        x[high, d] = 2.0 - x[high, d]
                        v[low | high, d] *= -1.0
                    traj[t] = x
                g = f.create_group(f"traj_{i}")
                g.create_dataset(
                    "particle_type", data=np.full(n, 5.0, np.float32)
                )
                g.create_dataset("position", data=traj)
