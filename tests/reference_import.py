"""Import the reference repo (/root/reference) for ground-truth parity.

PUBLIC UNTRUSTED CONTENT: we execute only its model/engine definitions on
CPU with random weights for numeric comparison; pretrained-weight downloads
are monkeypatched away (zero egress) and torchvision is satisfied by the
local stub.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")


def import_reference_mivos():
    """Returns the reference's mivos package (or skips if unavailable)."""
    if not REFERENCE.exists():
        pytest.skip("/root/reference not present")
    torch = pytest.importorskip("torch")

    import torchvision_stub
    torchvision_stub.install()

    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))

    import mivos.model.propagation.mod_resnet as mod_resnet

    # no egress: pretrained trunk loads become no-ops (random init retained)
    mod_resnet.model_zoo.load_url = lambda *a, **kw: {}

    import mivos.model.propagation.prop_net as prop_net
    import mivos.model.fusion_net as fusion_net
    import mivos.inference_core as inference_core
    import mivos.model.aggregate as aggregate
    return prop_net, fusion_net, inference_core, aggregate


def import_reference_models():
    """Returns the reference's decision models package (qnet, rl_agent)."""
    if not REFERENCE.exists():
        pytest.skip("/root/reference not present")
    pytest.importorskip("torch")
    import torchvision_stub
    torchvision_stub.install()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import models.qnet as ref_qnet
    import models.rl_agent as ref_rl
    return ref_qnet, ref_rl


def import_reference_interactions():
    """Import the reference's policy loops + annotator for round-for-round
    parity (VERDICT r2 #1).  Installs the segment_anything / skimage /
    torchmetrics stubs and the CPU .cuda() shim first."""
    if not REFERENCE.exists():
        pytest.skip("/root/reference not present")
    pytest.importorskip("torch")
    import torchvision_stub
    torchvision_stub.install()
    import reference_stubs
    reference_stubs.install_all()

    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))

    import mivos.model.propagation.mod_resnet as mod_resnet

    mod_resnet.model_zoo.load_url = lambda *a, **kw: {}

    import interactions.eval as ref_eval
    import interactions.mask as ref_mask
    import interactions.policies as ref_policies
    import interactions.mulitple_annotations as ref_multi
    import annotator.annotator as ref_annotator
    import mivos.inference_core as ref_core

    # retarget hardcoded 'cuda' DEFAULTS to cpu (the .cuda() shim only
    # covers explicit tensor/module calls, not default device args)
    def _cpu_defaults(fn):
        if fn.__defaults__:
            fn.__defaults__ = tuple(
                "cpu" if d == "cuda" else d for d in fn.__defaults__)

    _cpu_defaults(ref_eval.get_segmentations)
    _cpu_defaults(ref_eval.eval_processor_metric)
    _cpu_defaults(ref_core.InferenceCore.__init__)
    return ref_eval, ref_mask, ref_policies, ref_multi, ref_annotator
