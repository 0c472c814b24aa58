"""download_weights --check exercised end-to-end with reference-shaped
checkpoints (VERDICT r1: the converter CLI had never seen a real-layout
.pth).  The mivos/qnet/rl checkpoints come from the actual imported
reference modules' state dicts; the SAM checkpoint is synthesized in the
official segment-anything layout (tiny dims, inferred by the CLI)."""

import os

import numpy as np
import pytest

# reference-module checkpoint synthesis is torch-heavy (~1 min fixture);
# structural converter coverage stays fast in test_weight_convert.py
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

from reference_import import import_reference_mivos, import_reference_models

from eva_vos_tpu.models.sam import build_sam
from eva_vos_tpu.utils.weight_convert import synthesize_sam_checkpoint


@pytest.fixture
def weights_tree(tmp_path, monkeypatch):
    monkeypatch.setenv("EVAVOS_WEIGHTS_ROOT", str(tmp_path))
    prop_net, fusion_net, _, _ = import_reference_mivos()
    ref_qnet, ref_rl = import_reference_models()

    torch.manual_seed(0)
    ckpts = {
        "mivos/stcn.pth": prop_net.PropagationNetwork(top_k=8).state_dict(),
        "mivos/fusion.pth": fusion_net.FusionNet().state_dict(),
        "qnet/qnet.pth": ref_qnet.QualityNet(arch="resnet18").state_dict(),
        "rl_agent/model.pth":
            ref_rl.ActorCritic(out_dim=2, arch="resnet18").state_dict(),
    }
    _, template = build_sam("tiny")
    sam_sd = synthesize_sam_checkpoint(template, depth=2)
    ckpts["sam/sam.pth"] = {k: torch.from_numpy(np.asarray(v))
                            for k, v in sam_sd.items()}
    for rel, sd in ckpts.items():
        path = tmp_path / rel
        os.makedirs(path.parent, exist_ok=True)
        torch.save(sd, path)
    return tmp_path


def test_check_converts_all(weights_tree, capsys):
    from eva_vos_tpu.cli.download_weights import main

    rc = main(["--check"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("[convert ok]") == 5
    assert "[missing]" not in out


def test_missing_reports_and_fails(tmp_path, monkeypatch):
    monkeypatch.setenv("EVAVOS_WEIGHTS_ROOT", str(tmp_path / "empty"))
    from eva_vos_tpu.cli.download_weights import main

    rc = main([])
    assert rc == 1


def test_model_zoo_loads_reference_checkpoints(weights_tree):
    """The full production load path: model_zoo builds every net from the
    converted reference-layout checkpoints and reports non-random loads."""
    import jax.numpy as jnp

    from eva_vos_tpu.utils import load_report, model_zoo

    load_report.reset()
    stcn, sp = model_zoo.load_stcn(top_k=8)
    fusion, fp = model_zoo.load_fusion()
    _, _, extract = model_zoo.load_qnet()
    agent = model_zoo.load_rl_agent()
    assert load_report.weights_marker() == "converted"

    # loaded nets must run
    feats = stcn.apply(sp, jnp.zeros((1, 64, 64, 3)), method="encode_key")
    assert np.isfinite(np.asarray(feats.k16, np.float32)).all()
    f = extract(jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 224, 224, 3)))
    assert np.isfinite(np.asarray(f, np.float32)).all()
