"""Regularizers for the AD reconstruction engines.

TPU-native rebuild of the reference regularizer set
(ref: tensorflow_recon/fullfield.py:389-401, util.py:913-923,
cnn_propagator/util.py:61-70).
"""

import jax.numpy as jnp

__all__ = ["l1_norm", "total_variation_2d", "total_variation_3d",
           "total_variation_3d_wrap", "probe_tv", "regularization_term"]


def l1_norm(arr):
    """Entrywise L1 norm (matches ``tf.norm(x, ord=1)`` on any rank)."""
    return jnp.sum(jnp.abs(arr))


def total_variation_2d(img):
    """Anisotropic image TV over the last two axes, summed over leading axes.

    Matches ``tf.image.total_variation``: sum |x[i+1]-x[i]| + |x[:,j+1]-x[:,j]|.
    """
    dy = jnp.abs(img[..., 1:, :] - img[..., :-1, :])
    dx = jnp.abs(img[..., :, 1:] - img[..., :, :-1])
    return jnp.sum(dy) + jnp.sum(dx)


def total_variation_3d(arr):
    """3-axis TV of a (Y, X, Z) volume, reference TF convention.

    Sum of ``tf.image.total_variation`` over three axis permutations, halved
    (each axis is counted twice), ref tensorflow_recon/util.py:913-923.
    """
    res = total_variation_2d(arr)
    res += total_variation_2d(jnp.transpose(arr, (2, 0, 1)))
    res += total_variation_2d(jnp.transpose(arr, (1, 2, 0)))
    return res / 2.0


def total_variation_3d_wrap(arr):
    """Roll-based (periodic) 3D TV, autograd-engine convention.

    ``sum_i |roll(x, 1, i) - x|`` (ref cnn_propagator/util.py:61-70).
    """
    res = jnp.sum(jnp.abs(jnp.roll(arr, 1, axis=0) - arr))
    res += jnp.sum(jnp.abs(jnp.roll(arr, 1, axis=1) - arr))
    res += jnp.sum(jnp.abs(jnp.roll(arr, 1, axis=2) - arr))
    return res


def probe_tv(probe_real, weight=1.0e-10):
    """Probe smoothness regularizer (ref fullfield.py:398-401).

    The reference adds the TV of the probe's real part twice; reproduced.
    """
    tv = total_variation_2d(probe_real)
    return weight * (tv + tv)


def regularization_term(obj_delta, obj_beta, alpha_d, alpha_b, gamma,
                        alpha=None, tv_fn=total_variation_3d):
    """Combined L1 + TV regularizer (ref fullfield.py:389-396).

    If ``alpha_d`` is None, fall back to the legacy single-``alpha`` form
    (which — faithfully to the reference — applies alpha to delta twice).
    """
    if alpha_d is None:
        return alpha * (l1_norm(obj_delta) + l1_norm(obj_delta)) + gamma * tv_fn(obj_delta)
    reg = alpha_d * l1_norm(obj_delta) + alpha_b * l1_norm(obj_beta)
    if gamma != 0:
        reg = reg + gamma * tv_fn(obj_delta)
    return reg
