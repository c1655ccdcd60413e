"""Orbax checkpoint save/load + resume discovery.

Replaces the reference's Lightning ModelCheckpoint + `--resume` natsorted
`last*.ckpt` discovery (gcd-model/main.py:215-239, 649-672; ModelCheckpoint
every 1250 steps, train_kubric_max90.yaml:238-242). Checkpoints are sharded
orbax pytrees: {"params", "opt_state", "step", "ema"} plus a config snapshot.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

STEP_RE = re.compile(r"^step_(\d+)$")


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, step: int, tree: Dict[str, Any],
                    wait: bool = True) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckpt = _checkpointer()
    ckpt.save(path, tree, force=True)
    if wait:
        ckpt.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for dn in os.listdir(ckpt_dir):
        m = STEP_RE.match(dn)
        if m and os.path.isdir(os.path.join(ckpt_dir, dn)):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                       target: Optional[Dict] = None) -> Dict[str, Any]:
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckpt = _checkpointer()
    if target is not None:
        return ckpt.restore(path, target)
    return ckpt.restore(path)


def find_resume_logdir(resume: str) -> str:
    """`--resume` accepts a logdir or a checkpoint path (main.py:649-672)."""
    resume = os.path.abspath(resume)
    if os.path.isdir(os.path.join(resume, "checkpoints")):
        return resume
    # .../logdir/checkpoints/step_N given directly
    parts = resume.rstrip("/").split("/")
    if "checkpoints" in parts:
        return "/".join(parts[: parts.index("checkpoints")])
    return resume
