"""Orbax checkpoint/resume for reconstruction runs.

The reference has no optimizer-state checkpointing — resume is manual via
TIFF dumps and ``initial_guess`` (ref tensorflow_recon/fullfield.py:615-641,
reconstruct_ptycho.py:5-7). Here the full (params, opt_state, mask, epoch)
train state is checkpointed with Orbax, and the human-readable TIFF dumps are
kept alongside.
"""

import os

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint_step"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir, step, state):
    """Save a pytree ``state`` under ``ckpt_dir/step_{N}``."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "step_%08d" % step)
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint_step(ckpt_dir):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir, template, step=None):
    """Restore the latest (or given) step into the structure of ``template``."""
    if step is None:
        step = latest_checkpoint_step(ckpt_dir)
    if step is None:
        return None, None
    path = os.path.join(os.path.abspath(ckpt_dir), "step_%08d" % step)
    ckptr = _checkpointer()
    state = ckptr.restore(path, target=jax.device_get(template))
    return state, step
