"""Training engine: epoch loop, eval cadence, early stopping, JSON logs.

Reproduces the reference trainer's control flow (``utils/train.py:181-226``):
validate/test every ``test_interval`` epochs, keep the best-validation
checkpoint, early-stop after ``early_stop`` epochs without improvement, and
rewrite a JSON log ``[best_log_dict, log_dict]`` every epoch.  The logged
per-epoch loss is the pure MSE (the optimized loss additionally carries the
weighted MMD term — reference ``utils/train.py:104-108,163-165``).

New over the reference: orbax checkpoints carry params + optimizer state +
step (not just params), and per-epoch wall-clock/step-rate telemetry.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastegnn_tpu.data.batcher import GraphDataset
from fastegnn_tpu.train.checkpoint import save_checkpoint
from fastegnn_tpu.train.step import TrainState, make_eval_step, make_train_step


def _step_key(seed: int, tag: int, epoch: int, i: int) -> np.ndarray:
    """Raw uint32[2] PRNG key-data derived ON HOST (SeedSequence mixing).

    Passed as numpy so it rides the step call's operand upload and is
    wrapped to a typed key inside the jit (``train.step.ensure_key``) —
    a separate per-step device op (fold_in, or even indexing a stacked
    key array) costs ~3 ms of tunnel dispatch (round-5 measurement)."""
    return np.random.SeedSequence((seed, tag, epoch, i)).generate_state(
        2, np.uint32)


def _run_epoch_train(train_step, state, dataset, batch_size, seed, epoch,
                     rng, batch_iter_fn=None):
    losses = []
    batches = (
        batch_iter_fn(dataset, batch_size, rng=rng)
        if batch_iter_fn is not None
        else dataset.iter_batches(batch_size, rng=rng)
    )
    for i, batch in enumerate(batches):
        state, metrics = train_step(state, batch, _step_key(seed, 0, epoch, i))
        losses.append(metrics["mse"])
    return state, float(np.mean([float(x) for x in losses]))


def _run_epoch_eval(eval_step, params, dataset, batch_size, seed, epoch,
                    batch_iter_fn=None):
    losses = []
    batches = (
        batch_iter_fn(dataset, batch_size, rng=None)
        if batch_iter_fn is not None
        else dataset.iter_batches(batch_size, rng=None)
    )
    for i, batch in enumerate(batches):
        metrics = eval_step(params, batch, _step_key(seed, 1, epoch, i))
        losses.append(metrics["mse"])
    return float(np.mean([float(x) for x in losses]))


def train(
    model,
    state: TrainState,
    tx,
    dataset_train: GraphDataset,
    dataset_valid: GraphDataset,
    dataset_test: GraphDataset,
    *,
    batch_size: int,
    sigma: float,
    weight: float,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    test_interval: int = 5,
    early_stop: float = float("inf"),
    max_epochs: int = 1_000_000,
    seed: int = 43,
    log_directory: Optional[str] = None,
    log_name: str = "train_log.json",
    ckpt_directory: Optional[str] = None,
    resume_from: Optional[str] = None,
    verbose: bool = True,
    apply_fn=None,
    profile_trace_dir: Optional[str] = None,
    train_step_fn=None,
    batch_iter_fn=None,
    eval_step_fn=None,
    eval_batch_iter_fn=None,
    eval_model=None,
    shuffle: bool = True,
):
    """Returns ``(best_log_dict, log_dict, final_state)``.

    ``resume_from``: path of a checkpoint saved by this loop; restores
    params + optimizer state + step + epoch and continues (a capability the
    reference lacks — it only saves best params, ``utils/train.py:197-208``).

    Mesh training (CLI ``--mesh``): pass ``train_step_fn`` (a shard_map-ed
    step from ``parallel.data_parallel`` / ``parallel.owner_graph`` with
    the single-device ``step(state, batch, key)`` signature) plus
    ``batch_iter_fn(dataset, batch_size, rng=...)`` yielding mesh-placed
    stacked batches.  Pass ``eval_step_fn`` + ``eval_batch_iter_fn`` to run
    validation/test under the same mesh (the owner-sharded eval keeps node
    state O(N/G) end-to-end); without them evaluation falls back to
    single-device on the replicated params.  Checkpoints hold the same
    replicated params either way, so they are interchangeable across mesh
    shapes.
    """
    train_step = train_step_fn or make_train_step(
        model, tx, sigma, weight, sample, per_graph_sampling, use_mmd,
        apply_fn=apply_fn,
    )
    eval_step = eval_step_fn or make_eval_step(
        eval_model or model, sigma, weight, sample, per_graph_sampling,
        use_mmd, apply_fn=apply_fn,
    )
    # shuffle=False: fixed batch composition AND order every epoch — the
    # reference N-body/protein loaders never shuffle (main_nbody.py:94).
    # Collated batches are then memoized, which also sidesteps a ~260 MB/
    # epoch device-buffer leak in the tunneled-TPU client when fresh
    # batches are uploaded every epoch (round-4 parity run OOM).
    shuffle_rng = np.random.default_rng(seed) if shuffle else None
    cache_sets = (dataset_valid, dataset_test) + (
        () if shuffle else (dataset_train,))
    for ds in cache_sets:
        if hasattr(ds, "enable_collate_cache"):
            ds.enable_collate_cache()

    log_dict = {"epochs": [], "loss": [], "loss_train": []}
    best = {"epoch_index": 0, "loss_valid": 1e8, "loss_test": 1e8, "loss_train": 1e8}
    start = time.perf_counter()

    start_epoch = 1
    if resume_from is not None:
        from fastegnn_tpu.train.checkpoint import restore_checkpoint

        ck = restore_checkpoint(
            resume_from,
            target={"params": state.params, "opt_state": state.opt_state,
                    "step": state.step, "epoch": 0},
        )
        state = state.with_params(ck["params"]).replace(
            opt_state=ck["opt_state"], step=ck["step"]
        )
        start_epoch = int(ck.get("epoch", 0)) + 1
        if verbose:
            print(f"resumed from {resume_from} at epoch {start_epoch}",
                  flush=True)

    for epoch in range(start_epoch, max_epochs + 1):
        if profile_trace_dir is not None and epoch == start_epoch + 1:
            # trace the SECOND epoch (first one pays jit compilation)
            from fastegnn_tpu.utils.profiling import profile_trace

            with profile_trace(profile_trace_dir):
                state, loss_train = _run_epoch_train(
                    train_step, state, dataset_train, batch_size, seed,
                    epoch, shuffle_rng, batch_iter_fn,
                )
            if verbose:
                print(f"profiler trace written to {profile_trace_dir}",
                      flush=True)
        else:
            state, loss_train = _run_epoch_train(
                train_step, state, dataset_train, batch_size, seed, epoch,
                shuffle_rng, batch_iter_fn,
            )
        log_dict["loss_train"].append(loss_train)
        if verbose:
            print(f"train epoch: {epoch}, avg loss: {loss_train:.5f}", flush=True)

        if epoch % test_interval == 0:
            loss_valid = _run_epoch_eval(
                eval_step, state.params, dataset_valid, batch_size, seed,
                epoch, eval_batch_iter_fn,
            )
            loss_test = _run_epoch_eval(
                eval_step, state.params, dataset_test, batch_size, seed,
                epoch + 10_000_000, eval_batch_iter_fn,
            )
            log_dict["epochs"].append(epoch)
            log_dict["loss"].append(loss_test)
            if verbose:
                print(
                    f"==> valid epoch: {epoch}, avg loss: {loss_valid:.5f}\n"
                    f"==> test epoch: {epoch}, avg loss: {loss_test:.5f}",
                    flush=True,
                )

            if loss_valid < best["loss_valid"]:
                best = {
                    "epoch_index": epoch,
                    "loss_valid": loss_valid,
                    "loss_test": loss_test,
                    "loss_train": loss_train,
                }
                if ckpt_directory is not None:
                    save_checkpoint(
                        os.path.join(ckpt_directory, "best"),
                        {"params": state.params, "opt_state": state.opt_state,
                         "step": state.step, "epoch": epoch},
                    )
            if verbose:
                print(
                    f"*** Best Valid Loss: {best['loss_valid']:.5f} | "
                    f"Best Test Loss: {best['loss_test']:.5f} | "
                    f"Best Epoch Index: {best['epoch_index']}",
                    flush=True,
                )
            if epoch - best["epoch_index"] >= early_stop:
                best["early_stop"] = epoch
                if verbose:
                    print(f"Early stopped! Epoch: {epoch}", flush=True)
                break

        best["time_cost"] = time.perf_counter() - start
        if log_directory is not None:
            os.makedirs(log_directory, exist_ok=True)
            with open(os.path.join(log_directory, log_name), "w") as f:
                json.dump([best, log_dict], f, indent=4)

    return best, log_dict, state
