"""eva_vos_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the EVA-VOS interactive
video-object-segmentation annotation pipeline (WACV 2024).

Layer map (mirrors the reference's implied layering, re-designed for TPU):

- ``ops``            L0 tensor/VOS primitives (pad/unpad, aggregation, metrics)
- ``kernels``        Pallas TPU kernels (space-time memory attention)
- ``models``         L1 networks in Flax (STCN, FusionNet, QNet, ActorCritic, SAM)
- ``engine``         L2 functional propagation runtime (InferenceCore equivalent)
- ``annotator``      L3 interaction simulation (SAM predictor + click/bbox robots)
- ``interactions``   L4 policies and evaluation loops
- ``train``          L5 trainers (QNet data-parallel, PPO)
- ``data``           L6 datasets and synthetic data
- ``parallel``       device-mesh / sharding utilities
- ``cli``            L7 entry points
"""

__version__ = "0.1.0"
