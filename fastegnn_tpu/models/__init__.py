"""Model zoo registry.

Mirrors the reference's CLI dispatch tables (``main_nbody.py:102-131``,
``main_protein.py``, ``main_simulation.py``) as a name -> constructor map.
"""

from fastegnn_tpu.models.fast_egnn import FastEGNN, EGCLVel

MODEL_REGISTRY = {
    "FastEGNN": FastEGNN,
}


def get_model(name: str, **kwargs):
    try:
        cls = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    return cls(**kwargs)


__all__ = ["FastEGNN", "EGCLVel", "MODEL_REGISTRY", "get_model"]
