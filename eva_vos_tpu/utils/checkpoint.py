"""Orbax checkpointing (replaces the reference's torch.save/.load)."""

from __future__ import annotations

from pathlib import Path


def save_checkpoint(path, tree):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()


def restore_checkpoint(path, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target)
