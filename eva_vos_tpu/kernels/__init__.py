from .config import KernelConfig
from .memory_topk import pallas_memory_topk, pallas_supported
from .memory_readout import pallas_fused_readout, fused_readout_supported

__all__ = ["KernelConfig", "pallas_memory_topk", "pallas_supported",
           "pallas_fused_readout", "fused_readout_supported"]
