"""Model registry (reference looks models up by name, main.py:97)."""

from .hplflownet import HPLFlowNet  # noqa: F401
from .hplflownet_shallow import HPLFlowNetShallow  # noqa: F401
from .losses import epe3d_loss  # noqa: F401

MODELS = {
    "HPLFlowNet": HPLFlowNet,
    "HPLFlowNetShallow": HPLFlowNetShallow,
}


def get_model(name: str, **kwargs):
    if name not in MODELS:
        raise KeyError(f"unknown arch {name!r}; available: {sorted(MODELS)}")
    return MODELS[name](**kwargs)
