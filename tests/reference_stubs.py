"""In-env stand-ins for reference dependencies absent from this image
(``segment_anything``, ``skimage``, ``torchmetrics``) plus a CPU shim for
the reference's hardcoded ``.cuda()`` calls.

These let the reference's POLICY LOOPS (`interactions/{eval,mask,policies,
mulitple_annotations}.py`, `annotator/annotator.py`) run unmodified on CPU
so `tests/test_policy_parity.py` can assert round-for-round equality
against this framework's loops (VERDICT r2 missing-item #1).

Design rule: wherever the two stacks must share a primitive for the
comparison to be meaningful (SAM behavior, connected components, resize
kernels), the stub delegates to the SAME implementation this framework
uses — the harness then validates the loop logic, engine interplay,
costs and metrics, not the resampling kernels of a library that is not
installed here.
"""

from __future__ import annotations

import sys
import types

import numpy as np


# ---------------------------------------------------------------------------
# segment_anything: SamPredictor backed by the deterministic FakeSAM
# ---------------------------------------------------------------------------

def install_segment_anything():
    if "segment_anything" in sys.modules:
        return sys.modules["segment_anything"]

    from eva_vos_tpu.annotator.fake_sam import FakeSAMController

    class _FakeSamModel:
        def to(self, device=None, **kw):
            return self

        def eval(self):
            return self

    class SamPredictor:
        """Official-contract predictor over the FakeSAM geometry engine:
        numpy in, (masks [n, H, W] bool, scores [n], logits [n, 256, 256])
        out — identical outputs to this framework's FakeSAMController for
        identical prompts."""

        def __init__(self, model):
            self._fake = FakeSAMController()

        def set_image(self, image):
            self._fake.set_image(np.asarray(image))

        def reset_image(self):
            self._fake.reset_image()

        def get_image_embedding(self):
            import torch

            emb = self._fake.get_image_embedding()      # [256, 64, 64]
            return torch.from_numpy(emb)[None]

        def predict(self, point_coords=None, point_labels=None, box=None,
                    mask_input=None, multimask_output=True):
            def _np(x):
                if x is None:
                    return None
                if hasattr(x, "detach"):
                    x = x.detach().cpu().numpy()
                return np.asarray(x)

            masks, scores, logits = self._fake.predict(
                click_coords=_np(point_coords), click_labels=_np(point_labels),
                bbox=_np(box), mask_input=_np(mask_input),
                multimask_output=multimask_output)
            return masks[:, 0], scores, logits

    mod = types.ModuleType("segment_anything")
    mod.SamPredictor = SamPredictor
    mod.sam_model_registry = {
        k: (lambda checkpoint=None, **kw: _FakeSamModel())
        for k in ("vit_h", "vit_l", "vit_b", "default")}
    sys.modules["segment_anything"] = mod
    return mod


# ---------------------------------------------------------------------------
# skimage: measure.label (8-connectivity CC) + morphology.disk
# ---------------------------------------------------------------------------

def install_skimage():
    if "skimage" in sys.modules:
        return sys.modules["skimage"]

    from scipy import ndimage

    def label(mask, connectivity=2, return_num=False, background=0):
        structure = (np.ones((3, 3), int) if connectivity == 2
                     else ndimage.generate_binary_structure(2, 1))
        lab, num = ndimage.label(np.asarray(mask) != background,
                                 structure=structure)
        return (lab, num) if return_num else lab

    def disk(radius, dtype=np.uint8):
        y, x = np.ogrid[-radius:radius + 1, -radius:radius + 1]
        return ((x ** 2 + y ** 2) <= radius ** 2).astype(dtype)

    sk = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")
    measure.label = label
    morphology = types.ModuleType("skimage.morphology")
    morphology.disk = disk
    sk.measure = measure
    sk.morphology = morphology
    sys.modules["skimage"] = sk
    sys.modules["skimage.measure"] = measure
    sys.modules["skimage.morphology"] = morphology
    return sk


# ---------------------------------------------------------------------------
# torchmetrics: binary JaccardIndex (functional forward)
# ---------------------------------------------------------------------------

def install_torchmetrics():
    if "torchmetrics" in sys.modules:
        return sys.modules["torchmetrics"]
    import torch

    class JaccardIndex:
        def __init__(self, task="binary", num_classes=2, **kw):
            assert task == "binary"

        def __call__(self, preds, target):
            p = preds.reshape(-1).to(torch.bool)
            t = target.reshape(-1).to(torch.bool)
            inter = (p & t).sum().float()
            union = (p | t).sum().float()
            if union == 0:
                return torch.tensor(0.0)
            return inter / union

    mod = types.ModuleType("torchmetrics")
    mod.JaccardIndex = JaccardIndex
    sys.modules["torchmetrics"] = mod
    return mod


# ---------------------------------------------------------------------------
# CPU shim for hardcoded .cuda() calls
# ---------------------------------------------------------------------------

def patch_torch_cuda_noop():
    """Make ``.cuda()`` a device no-op so the reference loops run on CPU.
    Python-level shadowing on the classes; idempotent."""
    import torch

    if getattr(torch, "_evavos_cuda_noop", False):
        return
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self
    if not torch.cuda.is_available():
        torch.cuda.empty_cache = lambda: None
    torch._evavos_cuda_noop = True


def patch_numpy_legacy_aliases():
    """The reference targets numpy<2 (``np.Inf`` in policies.py:26,50);
    re-add the removed aliases."""
    for name, val in (("Inf", np.inf), ("NaN", np.nan), ("NAN", np.nan),
                      ("PINF", np.inf), ("NINF", -np.inf)):
        if not hasattr(np, name):
            setattr(np, name, val)


def install_all():
    install_segment_anything()
    install_skimage()
    install_torchmetrics()
    patch_torch_cuda_noop()
    patch_numpy_legacy_aliases()
