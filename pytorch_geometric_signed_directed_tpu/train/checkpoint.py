"""Checkpoint / resume for training state (orbax-backed).

The reference has no training-state persistence at all (SURVEY.md §5 —
only PyG dataset caches); this provides save/restore of (params,
opt_state, step) so long runs survive preemption, which matters on shared
TPU pools.
"""
import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state, step: Optional[int] = None) -> str:
    """Save a TrainState (or any pytree with .params/.opt_state/.step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step if step is None else step,
    }
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(path, f"step_{payload['step']}")
    ckptr.save(target, payload, force=True)
    ckptr.wait_until_finished()
    return target


def restore_checkpoint(path: str, state):
    """Restore into the (abstract) structure of ``state``; returns a new
    TrainState-like object."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.basename(path).startswith("step_"):
        target = path
    else:
        steps = sorted(
            (d for d in os.listdir(path) if d.startswith("step_")),
            key=lambda d: int(d.split("_")[1]))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        target = os.path.join(path, steps[-1])
    ckptr = ocp.StandardCheckpointer()
    abstract = {
        "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, state.params),
        "opt_state": jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                  state.opt_state),
        "step": state.step,
    }
    restored = ckptr.restore(target, abstract)
    from .trainer import TrainState

    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=int(restored["step"]))
