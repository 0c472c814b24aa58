from .stcn import PropagationNetwork, STCNFeatures
from .fusion import FusionNet
from .qnet import QualityNet
from .rl_agent import ActorCritic

__all__ = [
    "PropagationNetwork",
    "STCNFeatures",
    "FusionNet",
    "QualityNet",
    "ActorCritic",
]
