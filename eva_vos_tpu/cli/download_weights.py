"""Model-weight acquisition + conversion.

Behavior parity target: ``download_weights.py`` in the reference (gdown of
model_weights.zip + the SAM ViT-H checkpoint).  This environment has no
egress, so this CLI validates a locally provided weights directory and
eagerly converts every torch checkpoint to this framework's format,
reporting exactly what is missing.

Expected layout under EVAVOS_WEIGHTS_ROOT (default ./model_weights):
    mivos/stcn.pth  mivos/fusion.pth  qnet/qnet.pth
    rl_agent/model.pth  sam/sam.pth

Usage:
    python -m eva_vos_tpu.cli.download_weights --check
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..utils.paths import DataPaths

EXPECTED = ["mivos/stcn.pth", "mivos/fusion.pth", "qnet/qnet.pth",
            "rl_agent/model.pth", "sam/sam.pth"]

SOURCES = {
    "model_weights.zip": "gdown id 1xKMGDdZxJKpGSm6directbK (see reference "
                         "download_weights.py)",
    "sam.pth": "https://dl.fbaipublicfiles.com/segment_anything/"
               "sam_vit_h_4b8939.pth",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify presence and convertibility")
    args = ap.parse_args(argv)

    root = Path(DataPaths.weights_root())
    missing = [p for p in EXPECTED if not (root / p).exists()]
    present = [p for p in EXPECTED if (root / p).exists()]
    for p in present:
        print(f"[ok]      {root / p}")
    for p in missing:
        print(f"[missing] {root / p}")
    if missing:
        print("\nThis environment has no network egress. Obtain the "
              "checkpoints elsewhere:\n"
              "  - model_weights.zip from the reference's download_weights.py"
              " (gdown)\n"
              f"  - SAM ViT-H: {SOURCES['sam.pth']}\n"
              f"and place them under {root}/ as listed above.")
        return 1

    if args.check:
        from ..utils.weight_convert import (load_torch_state_dict,
                                            convert_stcn, convert_fusion,
                                            convert_qnet,
                                            convert_actor_critic, convert_sam,
                                            infer_sam_dims)

        def conv_sam(sd):
            return convert_sam(sd, **infer_sam_dims(sd))

        for name, fn in [("mivos/stcn.pth", convert_stcn),
                         ("mivos/fusion.pth", convert_fusion),
                         ("qnet/qnet.pth", convert_qnet),
                         ("rl_agent/model.pth", convert_actor_critic),
                         ("sam/sam.pth", conv_sam)]:
            sd = load_torch_state_dict(root / name)
            fn(sd)
            print(f"[convert ok] {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
