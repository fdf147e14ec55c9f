"""Shared reconstruction-engine machinery: optimizers, train step, state.

TPU-native rebuild of the optimizer stack that the reference builds inside
each engine (ref tensorflow_recon/fullfield.py:406-461, cnn_propagator/
util.py:280-291):

* Adam -> optax.adam; the hand-rolled autograd Adam becomes unnecessary.
* Horovod ``DistributedOptimizer`` allreduce -> nothing: the minibatch is
  sharded over the ``data`` mesh axis and the SPMD partitioner reduces the
  gradients of the mean loss automatically.
* gradient accumulation ``n_batch_per_update`` -> optax.MultiSteps
  (ref fullfield.py:413-425).
* dynamic learning-rate modifier ``exp(-epoch)*(n-1)+1`` -> an optax schedule
  (ref fullfield.py:406-409).
* object_type freezing / separate probe optimizer -> optax.multi_transform
  over parameter labels (ref fullfield.py:293-303,442-455).
"""


import numpy as np
import jax
import jax.numpy as jnp
import optax

__all__ = ["make_lr_schedule", "make_optimizer", "param_labels",
           "apply_projection", "shrink_wrap_update"]


def make_lr_schedule(base_lr, n_batch_per_update=1, dynamic_rate=True,
                     steps_per_epoch=1, size=1):
    """LR schedule matching the reference (ref fullfield.py:406-411).

    Base LR is scaled by the data-parallel size (``lr * hvd.size()``); with
    gradient accumulation and ``dynamic_rate`` the modifier
    ``exp(-epoch) * (n_batch_per_update - 1) + 1`` decays to 1 over epochs.
    """
    base = float(base_lr) * size
    if not (dynamic_rate and n_batch_per_update > 1):
        return base

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base * (jnp.exp(-epoch.astype(jnp.float32)) * (n_batch_per_update - 1) + 1.0)

    return schedule


def param_labels(params, object_type="normal", optimize_probe=False):
    """Assign an optimizer label to each parameter leaf."""
    labels = {}
    for key in params:
        if key == "delta":
            labels[key] = "frozen" if object_type == "absorption_only" else "obj"
        elif key == "beta":
            labels[key] = "frozen" if object_type == "phase_only" else "obj"
        elif key in ("probe_real", "probe_imag"):
            labels[key] = "probe" if optimize_probe else "frozen"
        else:
            labels[key] = "obj"
    return labels


def make_optimizer(params, learning_rate, probe_learning_rate=1e-3,
                   object_type="normal", optimize_probe=False,
                   n_batch_per_update=1, dynamic_rate=True,
                   steps_per_epoch=1, size=1):
    """Build the (possibly multi-group, accumulating) optax optimizer."""
    obj_lr = make_lr_schedule(learning_rate, n_batch_per_update, dynamic_rate,
                              steps_per_epoch, size)
    transforms = {
        "obj": optax.adam(obj_lr),
        "probe": optax.adam(float(probe_learning_rate) * size),
        "frozen": optax.set_to_zero(),
    }
    labels = param_labels(params, object_type, optimize_probe)
    tx = optax.multi_transform(transforms, labels)
    if n_batch_per_update > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=n_batch_per_update)
    return tx


def apply_projection(params, mask, epoch, n_epochs_mask_release=None,
                     pupil_function=None, nonneg=True):
    """Post-update projection: finite support, non-negativity, pupil.

    (ref cnn_propagator/fullfield.py:359-362, tensorflow_recon/
    fullfield.py:546-548.) The support mask is released after
    ``n_epochs_mask_release`` epochs when set.
    """
    if n_epochs_mask_release is None:
        eff_mask = mask
    else:
        eff_mask = jnp.where(epoch < n_epochs_mask_release, mask,
                             jnp.ones_like(mask))
    out = dict(params)
    for key in ("delta", "beta"):
        if key in out:
            v = out[key] * eff_mask
            if nonneg:
                v = jnp.clip(v, 0.0, None)
            out[key] = v
    if pupil_function is not None and "probe_real" in out:
        out["probe_real"] = out["probe_real"] * pupil_function
        out["probe_imag"] = out["probe_imag"] * pupil_function
    return out


def shrink_wrap_update(mask, obj_delta, epoch, shrink_cycle, threshold=1e-15):
    """Shrink-wrap the support mask once the object stabilizes.

    ``mask &= (delta > threshold)`` from epoch ``shrink_cycle`` on
    (ref tensorflow_recon/fullfield.py:360-368,
    cnn_propagator/fullfield.py:364-368).
    """
    if shrink_cycle is None:
        return mask
    shrunk = mask * (obj_delta > threshold).astype(mask.dtype)
    return jnp.where(epoch >= shrink_cycle, shrunk, mask)
