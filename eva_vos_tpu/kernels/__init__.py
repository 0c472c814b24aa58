from .memory_topk import pallas_memory_topk, pallas_supported

__all__ = ["pallas_memory_topk", "pallas_supported"]
