"""Model assembly: build modules and load converted reference checkpoints.

The reference's eval script hardwires ``./model_weights/...`` paths
(``eval_annotation_method.py:54-74``); here the weights root comes from
``EVAVOS_WEIGHTS_ROOT`` (default ``model_weights/``) and every loader
falls back to random initialization with ``allow_random=True`` so smoke
runs and tests work without checkpoints.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from . import load_report
from .paths import DataPaths
from .weight_convert import (load_torch_state_dict, convert_stcn,
                             convert_fusion, convert_qnet,
                             convert_actor_critic, convert_sam)
from ..models import PropagationNetwork, FusionNet, QualityNet, ActorCritic


def _maybe(path: Path, allow_random: bool, name: str | None = None):
    name = name or path.stem
    if path.exists():
        load_report.record(name, False)
        return load_torch_state_dict(path)
    if allow_random:
        load_report.record(name, True)
        return None
    raise FileNotFoundError(
        f"checkpoint {path} not found; pass allow_random=True for a smoke "
        f"run or set EVAVOS_WEIGHTS_ROOT")


def _tiny() -> bool:
    """EVAVOS_TINY=1 builds resnet18-trunk models — used by CLI smoke tests
    to keep CPU compiles fast; checkpoints cannot load in tiny mode."""
    import os

    return os.environ.get("EVAVOS_TINY") == "1"


def load_stcn(dtype=jnp.float32, top_k: int = 50, allow_random=False,
              weights_root=None):
    root = Path(weights_root or DataPaths.weights_root())
    if _tiny():
        net = PropagationNetwork(top_k=top_k, dtype=dtype,
                                 key_arch="resnet18", value_arch="resnet18")
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((64, 64, 3), dtype),
                             jnp.zeros((1, 64, 64), dtype), method="init_all")
        return net, variables
    net = PropagationNetwork(top_k=top_k, dtype=dtype)
    sd = _maybe(root / "mivos" / "stcn.pth", allow_random)
    if sd is None:
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((64, 64, 3), dtype),
                             jnp.zeros((1, 64, 64), dtype), method="init_all")
    else:
        variables = convert_stcn(sd)
        variables = jax.tree.map(jnp.asarray, variables)
    return net, variables


def load_fusion(dtype=jnp.float32, allow_random=False, weights_root=None):
    root = Path(weights_root or DataPaths.weights_root())
    net = FusionNet(dtype=dtype)
    sd = _maybe(root / "mivos" / "fusion.pth", allow_random)
    if sd is None:
        variables = net.init(jax.random.PRNGKey(1),
                             jnp.zeros((64, 64, 3), dtype),
                             jnp.zeros((64, 64), dtype),
                             jnp.zeros((64, 64), dtype),
                             jnp.zeros((64, 64, 2), dtype),
                             jnp.zeros((2,), dtype))
    else:
        variables = convert_fusion(sd)
        variables = jax.tree.map(jnp.asarray, variables)
    return net, variables


def load_qnet(arch="resnet18", dtype=jnp.float32, allow_random=False,
              weights_root=None):
    root = Path(weights_root or DataPaths.weights_root())
    net = QualityNet(arch=arch, dtype=dtype)
    sd = _maybe(root / "qnet" / "qnet.pth", allow_random)
    if sd is None:
        x = jnp.zeros((1, 224, 224, 3), dtype)
        variables = net.init(jax.random.PRNGKey(2), x, x)
    else:
        variables = jax.tree.map(jnp.asarray, convert_qnet(sd, arch=arch))
    extract = jax.jit(lambda imgs, masks: net.apply(
        variables, imgs, masks, method="extract_features"))
    return net, variables, extract


def load_rl_agent(action_space=2, arch="resnet18", dtype=jnp.float32,
                  allow_random=False, weights_root=None):
    from ..train.ppo.agent import PPOAgent

    root = Path(weights_root or DataPaths.weights_root())
    sd = _maybe(root / "rl_agent" / "model.pth", allow_random)
    if sd is None:
        net = ActorCritic(out_dim=action_space, arch=arch, dropout=0.0,
                          dtype=dtype)
        variables = net.init(jax.random.PRNGKey(3),
                             jnp.zeros((1, 64, 64, 256), dtype),
                             jnp.zeros((1, 224, 224, 3), dtype))
    else:
        variables = jax.tree.map(
            jnp.asarray, convert_actor_critic(sd, arch=arch))
    return PPOAgent(action_space, arch, variables, dtype=dtype)


def load_sam(preset="vit_h", dtype=jnp.float32, allow_random=False,
             weights_root=None, max_points=64):
    """Returns a SAMController. ``preset='fake'`` gives the test simulator."""
    from ..annotator import FakeSAMController

    if preset == "fake":
        return FakeSAMController()

    from ..models.sam import build_sam, SamPredictor, SAMController
    from ..models.sam.build import PRESETS

    root = Path(weights_root or DataPaths.weights_root())
    sd = _maybe(root / "sam" / "sam.pth", allow_random)
    sam, variables = build_sam(preset, dtype=dtype)
    if sd is not None:
        cfg = PRESETS[preset]
        variables = jax.tree.map(
            jnp.asarray, convert_sam(sd, depth=cfg.encoder_depth))
    return SAMController(SamPredictor(sam, variables, max_points=max_points))
