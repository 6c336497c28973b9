"""Protein (AdK MD) both-sides converged parity on a synthetic npz.

Real AdK MD data cannot flow in this environment (MDAnalysis is not
installable), but loader+trainer parity is checkable TODAY (VERDICT r4
item 3), mirroring the Water-3D pattern: ONE synthetic trajectory drives

- ``--side torch``: the reference's OWN ``datasets/protein/dataset.py``
  MDAnalysisDataset and ``models/FastEGNN.py`` through shims that stand in
  for MDAnalysis/MDAnalysisData and feed the npz arrays (Universe /
  trajectory / contact_matrix), with the reference protein recipe:
  delta_frame=15, sigma=1.0, weight=0.5, bs=50, lr 5e-4, wd 1e-12,
  test-split random rotation AND translation
  (``main_protein.py:37-38,50,93-106``, ``datasets/protein/dataset.py:131-141``),
  fixed-N MMD path (``utils/train.py:144-161``);
- ``--side jax``: our ``ProteinDataset`` + ``train()`` on the same npz.

The npz carries 4187 frames so the reference's HARDCODED split frame
ranges ([0,2481) / [2481,3308) / [3308,4171), ``dataset.py:54``) coincide
exactly with our proportional split of the usable frames — both sides see
the same (sequential, deterministic) frames.  Per-side randomness left:
weight init, test-split rot+trans draws, MMD node sampling.

Usage:
  python scripts/parity_protein.py --side torch --epochs 150
  python scripts/parity_protein.py --side jax --epochs 150 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

NPZ = "/root/repo/data/protein_parity/synthetic_adk.npz"
HP = dict(sigma=1.0, weight=0.5, batch_size=50, lr=5e-4, wd=1e-12,
          hidden=64, channels=3, layers=4, cutoff=0.0, sample=3,
          delta_frame=15, test_interval=5, early_stop=100,
          n_atoms=60, n_frames=4187, contact_cutoff=10.0)


def ensure_data():
    from fastegnn_tpu.data.protein import make_synthetic_protein_npz

    if not os.path.exists(NPZ):
        os.makedirs(os.path.dirname(NPZ), exist_ok=True)
        make_synthetic_protein_npz(
            NPZ, n_atoms=HP["n_atoms"], n_frames=HP["n_frames"], seed=11)
    return NPZ


def install_mda_shims(npz_path: str):
    """Stand-ins for MDAnalysis / MDAnalysisData that serve the npz arrays
    through the exact attribute surface ``datasets/protein/dataset.py``
    touches (fetch_adk_equilibrium, Universe, trajectory timesteps,
    contact_matrix)."""
    data = np.load(npz_path)
    pos = data["positions"].astype(np.float32)
    vel = data["velocities"].astype(np.float32)
    charges = data["charges"].astype(np.float64).squeeze(-1)
    dims = np.concatenate(
        [data["dimensions"], [90.0, 90.0, 90.0]]).astype(np.float32)
    n = pos.shape[1]

    class TS:
        def __init__(self, i):
            self.positions = pos[i]
            self.velocities = vel[i]
            self.has_velocities = True
            self.dimensions = dims

        def copy(self):
            return self

    class Trajectory:
        def __getitem__(self, i):
            return TS(i)

        def __len__(self):
            return pos.shape[0]

    class Atoms:
        def __init__(self):
            self.ix = np.arange(n)
            self.charges = charges

        def __getitem__(self, idx):
            out = Atoms()
            out.ix = self.ix[idx]
            out.charges = self.charges[idx]
            return out

    class Universe:
        def __init__(self, *a, **k):
            self.atoms = Atoms()
            self.trajectory = Trajectory()

        def select_atoms(self, sel):
            return self.atoms

    def contact_matrix(coord, cutoff=15.0, returntype="numpy", box=None):
        from scipy import sparse

        d2 = ((coord[:, None, :] - coord[None, :, :]) ** 2).sum(-1)
        return sparse.lil_matrix(d2 < cutoff * cutoff)

    mda = types.ModuleType("MDAnalysis")
    mda.Universe = Universe
    mda.transformations = types.ModuleType("MDAnalysis.transformations")
    analysis = types.ModuleType("MDAnalysis.analysis")
    distances = types.ModuleType("MDAnalysis.analysis.distances")
    distances.contact_matrix = contact_matrix
    analysis.distances = distances
    mda.analysis = analysis
    mdad = types.ModuleType("MDAnalysisData")
    mdad.datasets = types.SimpleNamespace(
        fetch_adk_equilibrium=lambda data_home=None: types.SimpleNamespace(
            topology="synthetic", trajectory="synthetic"))
    sys.modules["MDAnalysis"] = mda
    sys.modules["MDAnalysis.transformations"] = mda.transformations
    sys.modules["MDAnalysis.analysis"] = analysis
    sys.modules["MDAnalysis.analysis.distances"] = distances
    sys.modules["MDAnalysisData"] = mdad


def run_torch(epochs: int, out_json: str):
    import jax

    jax.config.update("jax_platform_name", "cpu")
    import random

    import torch

    from fastegnn_tpu.utils.torch_ref import (
        install_pyg_shims, load_reference_module)

    ensure_data()
    random.seed(43)
    torch.manual_seed(43)
    np.random.seed(43)
    install_pyg_shims()
    install_mda_shims(NPZ)
    load_reference_module("utils/rotate.py", module_name="utils.rotate")
    if "utils" not in sys.modules:
        pkg = types.ModuleType("utils")
        pkg.rotate = sys.modules["utils.rotate"]
        sys.modules["utils"] = pkg
    ds_mod = load_reference_module("datasets/protein/dataset.py")
    fe_mod = load_reference_module("models/FastEGNN.py")

    class _SerialParallel:
        """joblib.Parallel stand-in: the shimmed Universe is process-local
        (unpicklable), so the reference's n_jobs=10 build runs serially."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, tasks):
            return [f(*args, **kw) for f, args, kw in tasks]

    ds_mod.Parallel = _SerialParallel

    # reference protein recipe: main_protein.py:93-106 (delta_frame=15,
    # test_rot/test_trans=True); backbone=False — the synthetic chain has
    # no backbone subset, and our side uses all atoms too
    mk = lambda part: ds_mod.MDAnalysisDataset(
        "adk", data_dir=os.path.dirname(NPZ),
        virtual_channels=HP["channels"], partition=part,
        delta_frame=HP["delta_frame"], cutoff_rate=HP["cutoff"],
        test_rot=True, test_trans=True, backbone=False)
    dtr, dva, dte = mk("train"), mk("valid"), mk("test")

    def collate(items):
        feats, locs, vels, targets = [], [], [], []
        ei, batch, loc_means = [], [], []
        off = 0
        for g, d in enumerate(items):
            nn = d.loc_0.shape[0]
            feats.append(d.node_feat)
            locs.append(d.loc_0)
            vels.append(d.vel_0)
            targets.append(d.loc_t)
            ei.append(d.edge_index + off)
            batch.append(torch.full((nn,), g, dtype=torch.long))
            loc_means.append(d.loc_mean)
            off += nn
        loc = torch.cat(locs)
        ei = torch.cat(ei, dim=1)
        # trainer edge_attr = [initial_dist, current_dist]
        # (utils/train.py:41-43); equal at construction time
        d0 = torch.norm(loc[ei[0]] - loc[ei[1]], dim=1, keepdim=True)
        return dict(
            feat=torch.cat(feats), loc=loc, vel=torch.cat(vels),
            target=torch.cat(targets), ei=ei,
            ea=torch.cat([d0, d0], dim=1),
            batch=torch.cat(batch), loc_mean=torch.cat(loc_means),
        )

    def batches(ds, bs):
        idx = list(range(len(ds)))
        nb = len(idx) - len(idx) % bs
        return [collate([ds[i] for i in idx[lo:lo + bs]])
                for lo in range(0, nb, bs)]

    btr, bva, bte = (batches(d, HP["batch_size"]) for d in (dtr, dva, dte))
    print(f"torch: {len(btr)}/{len(bva)}/{len(bte)} batches", flush=True)

    model = fe_mod.FastEGNN(
        node_feat_nf=2, node_attr_nf=0, edge_attr_nf=2,
        hidden_nf=HP["hidden"], virtual_channels=HP["channels"],
        n_layers=HP["layers"], device="cpu")
    opt = torch.optim.Adam(model.parameters(), lr=HP["lr"],
                           weight_decay=HP["wd"])
    mse = torch.nn.MSELoss()

    def kernel(x, y, sigma):  # utils/train.py:17-20
        return torch.exp(-torch.cdist(x, y) / (2 * sigma * sigma))

    C = HP["channels"]

    def epoch(bs_, backprop):
        model.train(backprop)
        tot, cnt = 0.0, 0
        for d in bs_:
            opt.zero_grad()
            B = int(d["batch"].max()) + 1
            pred, vloc = model(node_feat=d["feat"], node_loc=d["loc"],
                               node_vel=d["vel"], edge_index=d["ei"],
                               data_batch=d["batch"],
                               loc_mean=d["loc_mean"], edge_attr=d["ea"])
            l = mse(pred, d["target"])
            tot += float(l) * B
            cnt += B
            # fixed-N MMD path (utils/train.py:144-161)
            v = vloc.permute(0, 2, 1)
            nl = pred.reshape(B, -1, 3)
            ns = min(HP["sample"] * C, nl.shape[1])
            ridx = torch.randperm(nl.shape[1])[:ns]
            nl = nl[:, ridx, :]
            l_vv = torch.sum(kernel(v, v, HP["sigma"])) / B / C / C
            l_rv = 2 * torch.sum(kernel(nl, v, HP["sigma"])) / B / ns / C
            l = l + HP["weight"] * (l_vv - l_rv)
            if backprop:
                l.backward()
                opt.step()
        return tot / max(cnt, 1)

    best = {"epoch_index": 0, "loss_valid": 1e8, "loss_test": 1e8}
    log = {"loss_train": [], "epochs": [], "loss": []}
    t0 = time.perf_counter()
    for ep in range(1, epochs + 1):
        lt = epoch(btr, True)
        log["loss_train"].append(lt)
        if ep % HP["test_interval"] == 0:
            with torch.no_grad():
                lv = epoch(bva, False)
                lte = epoch(bte, False)
            log["epochs"].append(ep)
            log["loss"].append(lte)
            if lv < best["loss_valid"]:
                best = {"epoch_index": ep, "loss_valid": lv,
                        "loss_test": lte, "loss_train": lt}
            print(f"ep {ep}: train {lt:.6f} valid {lv:.6f} test {lte:.6f} "
                  f"(best test {best['loss_test']:.6f})", flush=True)
            best["time_cost"] = time.perf_counter() - t0
            with open(out_json, "w") as f:
                json.dump([best, log], f, indent=2)
            if ep - best["epoch_index"] >= HP["early_stop"]:
                break
    with open(out_json, "w") as f:
        json.dump([best, log], f, indent=2)
    print("TORCH BEST:", json.dumps(best))


def run_jax(epochs: int, out_json: str, platform=None):
    import jax

    if platform:
        jax.config.update("jax_platform_name", platform)
    from fastegnn_tpu.data.protein import ProteinDataset
    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.train import TrainState, torch_adam, train

    ensure_data()
    mk = lambda part, seed: ProteinDataset(
        NPZ, partition=part, virtual_channels=HP["channels"],
        cutoff_rate=HP["cutoff"], delta_frame=HP["delta_frame"],
        contact_cutoff=HP["contact_cutoff"], test_rot=True, test_trans=True,
        seed=seed)
    dtr, dva, dte = mk("train", 43), mk("valid", 44), mk("test", 45)
    model = FastEGNN(hidden=HP["hidden"], virtual_channels=HP["channels"],
                     n_layers=HP["layers"])
    example = dtr.collate(list(range(HP["batch_size"])))
    params = jax.jit(model.init)(jax.random.key(43), example)["params"]
    tx = torch_adam(HP["lr"], HP["wd"])
    state = TrainState.create(params, tx)
    best, log, state = train(
        model, state, tx, dtr, dva, dte, batch_size=HP["batch_size"],
        sigma=HP["sigma"], weight=HP["weight"], sample=HP["sample"],
        per_graph_sampling=False, test_interval=HP["test_interval"],
        early_stop=HP["early_stop"], max_epochs=epochs, seed=43,
        shuffle=False, log_directory=os.path.dirname(out_json) or ".",
        log_name=os.path.basename(out_json).replace(".json", "_live.json"),
        verbose=True,
    )
    with open(out_json, "w") as f:
        json.dump([best, log], f, indent=2)
    print("JAX BEST:", json.dumps(best))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["torch", "jax"], required=True)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    a = p.parse_args()
    out = a.out or f"/root/repo/logs/parity_protein_{a.side}.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if a.side == "torch":
        run_torch(a.epochs, out)
    else:
        run_jax(a.epochs, out, a.platform)
