from fastegnn_tpu.train.loss import masked_mse, mmd_loss, rbf_kernel
from fastegnn_tpu.train.optim import torch_adam
from fastegnn_tpu.train.step import TrainState, make_train_step, make_eval_step
from fastegnn_tpu.train.loop import train

__all__ = [
    "masked_mse",
    "mmd_loss",
    "rbf_kernel",
    "torch_adam",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "train",
]
