"""Optimizers.

``torch_adam`` reproduces ``torch.optim.Adam(lr, weight_decay)`` exactly:
torch's ``weight_decay`` is *coupled* L2 (added to the gradient before the
Adam moments), unlike optax's decoupled ``adamw``.  The reference trains every
model with Adam(lr=5e-4, weight_decay=1e-12) (``main_nbody.py:137``).
"""

from __future__ import annotations

import optax


def torch_adam(
    learning_rate: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    steps.append(optax.scale(-learning_rate))
    return optax.chain(*steps)
