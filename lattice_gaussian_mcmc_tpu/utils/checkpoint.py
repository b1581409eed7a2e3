"""Chain-state checkpoint/resume.

The reference only dumps final sample arrays (np.savez_compressed,
reference experiments/run_all_experiments.py:214-219) with no mid-chain
resume. The TPU equivalent (SURVEY.md section 5): chain state is a tiny
pytree (coeffs, log_w, PRNG key, counters) — checkpoint it with orbax every
K scan segments and resume bit-exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state, step: int) -> str:
    """Write a pytree checkpoint (orbax if available, npz fallback).
    Returns the concrete path written."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        ckpt_dir = os.path.join(os.path.abspath(path), f"step_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(ckpt_dir, state, force=True)
        ckptr.wait_until_finished()
        return ckpt_dir
    except Exception:
        flat, treedef = jax.tree.flatten(state)
        file = os.path.join(path, f"step_{step}.npz")
        np.savez_compressed(
            file, __step=step,
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
        return file


def restore_checkpoint(path: str, template, step: Optional[int] = None):
    """Restore the latest (or given-step) checkpoint into `template`'s
    structure. Returns (state, step) or (None, -1) if nothing found."""
    if not os.path.isdir(path):
        return None, -1
    entries = os.listdir(path)
    steps = []
    for e in entries:
        if e.startswith("step_"):
            s = e[len("step_"):].split(".")[0]
            if s.isdigit():
                steps.append(int(s))
    if not steps:
        return None, -1
    target = step if step is not None else max(steps)
    ckpt_dir = os.path.join(os.path.abspath(path), f"step_{target}")
    if os.path.isdir(ckpt_dir):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(ckpt_dir, template), target
    file = os.path.join(path, f"step_{target}.npz")
    data = np.load(file)
    flat, treedef = jax.tree.flatten(template)
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves), target
