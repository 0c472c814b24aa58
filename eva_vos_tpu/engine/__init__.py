from .propagation import InferenceEngine, PropagationState, VideoFeatures

__all__ = ["InferenceEngine", "PropagationState", "VideoFeatures"]
