"""Converged N-body MSE parity: train the LIVE torch reference and our JAX
model with identical data, hyperparameters, and loop semantics; compare
best test MSE (BASELINE.md "match locally-run reference" criterion).

Reference recipe anchors: run_nbody.sh:3-9 (virtual_channel 3, cutoff 0.5,
seed 43), main_nbody.py:27-56 defaults (sigma 1.5, weight 0.01, bs 100,
lr 5e-4, wd 1e-12, H 64, L 4, test_interval 5), trainer utils/train.py.
The reference DataLoader does not shuffle (main_nbody.py:94), and with
5-node graphs the MMD node sampling (min(sample*C, N) = 5 of 5) selects
every node — both sides are deterministic given their weight init.

Usage:
  python scripts/parity_nbody.py --side torch --epochs 300
  python scripts/parity_nbody.py --side jax --epochs 300 [--platform cpu]
  python scripts/parity_nbody.py --side {torch,jax} --model EGNN|VNEGNN ...

``--model`` generalizes the harness over the zoo (VERDICT r4 item 6): EGNN
(reference ``models/basic.py``, dispatch ``utils/train.py:66-68``, no MMD)
and VNEGNN (reference ``models/VNEGNN.py``, dispatch ``utils/train.py:54-56``,
fibonacci-sphere virtual positions per ``datasets/protein/dataset.py:176-205``
computed identically on both sides, no MMD).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

DATA = "/root/repo/data/nbody_parity"
NAME = "5_0_0"  # overridable via --data/--name (e.g. the 3_2_1 composite)
MODEL = "FastEGNN"
HP = dict(sigma=1.5, weight=0.01, batch_size=100, lr=5e-4, wd=1e-12,
          hidden=64, channels=3, layers=4, cutoff=0.5, sample=3,
          test_interval=5, early_stop=100)


def fibonacci_positions(coords: np.ndarray, samples: int) -> np.ndarray:
    """[C, 3] fibonacci-sphere virtual positions, the exact reference recipe
    (``datasets/protein/dataset.py:176-205``: center = coord mean, radius =
    max distance from center, golden-angle sphere)."""
    center = coords.mean(axis=0, keepdims=True)
    radius = np.linalg.norm(coords - center, axis=1).max()
    phi = math.pi * (math.sqrt(5.0) - 1.0)
    pts = []
    for i in range(samples):
        y = 1 - (i / float(samples - 1)) * 2
        r = math.sqrt(1 - y * y)
        theta = phi * i
        pts.append([math.cos(theta) * r, y, math.sin(theta) * r])
    return np.asarray(pts, np.float64) * radius + center


def load_datasets():
    from fastegnn_tpu.data.nbody import NBodyDataset

    class FibNBody(NBodyDataset):
        """Attach per-graph fibonacci virtual positions (VNEGNN)."""

        def collate(self, indices):
            batch = super().collate(indices)
            import jax.numpy as jnp

            fib = np.stack([
                fibonacci_positions(
                    np.asarray(self.graphs[i]["coord"], np.float64),
                    HP["channels"]).T
                for i in indices
            ])  # [B, 3, C]
            return batch.replace(
                virtual_fibonacci=jnp.asarray(fib, jnp.float32))

    cls = FibNBody if MODEL == "VNEGNN" else NBodyDataset
    mk = lambda part: cls(
        DATA, NAME, partition=part, virtual_channels=HP["channels"],
        cutoff_rate=HP["cutoff"], rotation_seed=43,
    )
    return mk("train"), mk("valid"), mk("test")


def run_torch(epochs: int, out_json: str, seed: int = 43):
    import jax

    # keep this process off the (single-tenant) TPU tunnel: the dataset
    # helpers touch jnp only for array staging
    jax.config.update("jax_platform_name", "cpu")
    import torch

    from fastegnn_tpu.utils.torch_ref import load_reference_module

    torch.manual_seed(seed)
    np.random.seed(seed)
    if MODEL == "FastEGNN":
        mod = load_reference_module("models/FastEGNN.py")
        model = mod.FastEGNN(
            node_feat_nf=2, node_attr_nf=0, edge_attr_nf=2,
            hidden_nf=HP["hidden"], virtual_channels=HP["channels"],
            n_layers=HP["layers"], device="cpu")
    elif MODEL == "EGNN":
        # main_nbody.py:106-107
        mod = load_reference_module("models/basic.py")
        model = mod.EGNN(n_layers=HP["layers"], in_node_nf=2, in_edge_nf=2,
                         hidden_nf=HP["hidden"], device="cpu", with_v=True)
    elif MODEL == "VNEGNN":
        # main_protein.py:126-129
        mod = load_reference_module("models/VNEGNN.py")
        model = mod.VNEGNN(
            node_feat_nf=2, node_attr_nf=0, edge_attr_nf=2,
            hidden_nf=HP["hidden"], virtual_channels=HP["channels"],
            n_layers=HP["layers"], device="cpu", residual=True,
            attention=False, normalize=False, tanh=False)
    else:
        raise ValueError(MODEL)
    opt = torch.optim.Adam(model.parameters(), lr=HP["lr"],
                           weight_decay=HP["wd"])
    mse = torch.nn.MSELoss()

    dtr, dva, dte = load_datasets()

    def to_torch_batches(ds, bs):
        """Pre-collate every batch once (deterministic order, drop_last)."""
        batches = []
        n = len(ds)
        for lo in range(0, n - n % bs, bs):
            g = ds.collate(list(range(lo, lo + bs)))
            em = np.asarray(g.edge_mask)
            b = dict(
                feat=torch.tensor(np.asarray(g.node_feat)),
                loc=torch.tensor(np.asarray(g.coord)),
                vel=torch.tensor(np.asarray(g.vel)),
                ei=torch.tensor(np.stack([np.asarray(g.dst)[em],
                                          np.asarray(g.src)[em]])).long(),
                ea=torch.tensor(np.asarray(g.edge_attr)[em]),
                batch=torch.tensor(np.asarray(g.graph_id)).long(),
                loc_mean=torch.tensor(np.asarray(g.loc_mean)),
                target=torch.tensor(np.asarray(g.coord_target)),
            )
            if g.virtual_fibonacci is not None:
                # [B, 3, C] -> reference layout [B, C, 3]
                b["fib"] = torch.tensor(
                    np.asarray(g.virtual_fibonacci)).permute(0, 2, 1)
            batches.append(b)
        return batches

    btr = to_torch_batches(dtr, HP["batch_size"])
    bva = to_torch_batches(dva, HP["batch_size"])
    bte = to_torch_batches(dte, HP["batch_size"])
    print(f"torch: {len(btr)}/{len(bva)}/{len(bte)} batches")

    def kernel(x, y, sigma):  # utils/train.py:17-20 (unsquared distance)
        return torch.exp(-torch.cdist(x, y) / (2 * sigma * sigma))

    C = HP["channels"]

    def epoch(batches, backprop):
        model.train(backprop)
        tot, cnt = 0.0, 0
        for d in batches:
            opt.zero_grad()
            B = int(d["batch"].max()) + 1
            if MODEL == "FastEGNN":
                pred, vloc = model(
                    node_feat=d["feat"], node_loc=d["loc"],
                    node_vel=d["vel"], edge_index=d["ei"],
                    data_batch=d["batch"], loc_mean=d["loc_mean"],
                    edge_attr=d["ea"])
            elif MODEL == "EGNN":
                # utils/train.py:66-68
                out = model(x=d["loc"], h=d["feat"], edge_index=d["ei"],
                            edge_fea=d["ea"], v=d["vel"])
                pred, vloc = out[0], None
            elif MODEL == "VNEGNN":
                # utils/train.py:54-56
                pred, vloc = model(
                    node_loc=d["loc"], node_attr=None, node_feat=d["feat"],
                    edge_index=d["ei"], virtual_node_loc=d["fib"],
                    data_batch=d["batch"], edge_attr=d["ea"])
            l = mse(pred, d["target"])
            tot += float(l) * B
            cnt += B
            if MODEL in ("FastEGNN",):  # MMD: Fast* only, utils/train.py:111
                # fixed-N MMD path (utils/train.py:144-165)
                v = vloc.permute(0, 2, 1)
                nl = pred.reshape(B, -1, 3)
                ns = min(HP["sample"] * C, nl.shape[1])
                idx = torch.randperm(nl.shape[1])[:ns]
                nl = nl[:, idx, :]
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
                best = {"epoch_index": ep, "loss_valid": lv, "loss_test": lte,
                        "loss_train": lt}
            print(f"ep {ep}: train {lt:.6f} valid {lv:.6f} test {lte:.6f} "
                  f"(best test {best['loss_test']:.6f})", flush=True)
            # rewrite the log every eval (reference utils/train.py:220-223
            # does this per epoch) so long CPU runs are inspectable/killable
            best["time_cost"] = time.perf_counter() - t0
            with open(out_json, "w") as f:
                json.dump([best, log], f, indent=2)
            if ep - best["epoch_index"] >= HP["early_stop"]:
                break
    best["time_cost"] = time.perf_counter() - t0
    with open(out_json, "w") as f:
        json.dump([best, log], f, indent=2)
    print("TORCH BEST:", json.dumps(best))


def run_jax(epochs: int, out_json: str, platform=None, seed: int = 43):
    import jax

    if platform:
        jax.config.update("jax_platform_name", platform)
    from fastegnn_tpu.models import MMD_MODELS, get_model
    from fastegnn_tpu.train import TrainState, torch_adam, train

    dtr, dva, dte = load_datasets()
    model = get_model(MODEL, hidden=HP["hidden"],
                      virtual_channels=HP["channels"],
                      n_layers=HP["layers"])
    example = dtr.collate(list(range(HP["batch_size"])))
    params = jax.jit(model.init)(jax.random.key(seed), example)["params"]
    tx = torch_adam(HP["lr"], HP["wd"])
    state = TrainState.create(params, tx)
    # log_directory: the loop rewrites [best, log] each epoch (reference
    # semantics), so an OOM-killed long run still leaves its results —
    # the round-4 100-particle run died at 125 GB RSS (a ~260 MB/epoch
    # host-side leak through the tunnel client) after 483 epochs
    best, log, state = train(
        model, state, tx, dtr, dva, dte, batch_size=HP["batch_size"],
        sigma=HP["sigma"], weight=HP["weight"], sample=HP["sample"],
        use_mmd=MODEL in MMD_MODELS,
        test_interval=HP["test_interval"], early_stop=HP["early_stop"],
        max_epochs=epochs, seed=seed, shuffle=False,
        log_directory=os.path.dirname(out_json) or ".",
        log_name=os.path.basename(out_json).replace(".json", "_live.json"),
        verbose=True,
    )
    with open(out_json, "w") as f:
        json.dump([best, log], f, indent=2)
    print("JAX BEST:", json.dumps(best))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["torch", "jax"], required=True)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--data", type=str, default=None,
                   help="dataset directory (default: the 5_0_0 parity set)")
    p.add_argument("--name", type=str, default=None,
                   help="dataset name, e.g. 3_2_1 for a stick/hinge mix")
    p.add_argument("--model", type=str, default="FastEGNN",
                   choices=["FastEGNN", "EGNN", "VNEGNN"])
    p.add_argument("--seed", type=int, default=43,
                   help="jax-side init seed (torch side is fixed at 43)")
    a = p.parse_args()
    if a.data:
        DATA = a.data
    if a.name:
        NAME = a.name
    MODEL = a.model
    sfx = "" if a.model == "FastEGNN" else f"_{a.model.lower()}"
    out = a.out or f"/root/repo/logs/parity{sfx}_{a.side}.json"

    os.makedirs(os.path.dirname(out), exist_ok=True)
    if a.side == "torch":
        run_torch(a.epochs, out, a.seed)
    else:
        run_jax(a.epochs, out, a.platform, a.seed)
