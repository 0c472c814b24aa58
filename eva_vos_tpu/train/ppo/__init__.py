from .env import AnnotationEnv
from .storage import RolloutStorage
from .rollout import rollout, compute_returns, calculate_gaes
from .trainer import PPOTrainer
from .agent import PPOAgent

__all__ = ["AnnotationEnv", "RolloutStorage", "rollout", "compute_returns",
           "calculate_gaes", "PPOTrainer", "PPOAgent"]
