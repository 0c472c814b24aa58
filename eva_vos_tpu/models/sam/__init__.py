from .build import SamConfig, Sam, build_sam
from .predictor import SamPredictor, SAMController

__all__ = ["SamConfig", "Sam", "build_sam", "SamPredictor", "SAMController"]
