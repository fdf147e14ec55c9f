"""Pure-projection (absorption tomography) AD engine with TV regularization.

TPU-native rebuild of ``reconstruct_pureproj``
(ref tensorflow_recon/fullfield.py:691-819): the forward model is a plain
line-integral projection of the object at each angle; the object is recovered
by Adam on an MSE + TV loss, cross-validated against the classical FBP
baseline (which replaces the reference's inline gridrec, ref fullfield.py:744).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..constants import PI
from ..ops.tomo import project_volume, fbp
from ..ops.regularizers import total_variation_2d
from ..io import tiff
from ..utils.misc import print_flush

__all__ = ["reconstruct_pureproj"]


def reconstruct_pureproj(prj, theta_st=0, theta_end=PI, n_epochs=200,
                         alpha=1e-4, learning_rate=1.0, output_folder=None,
                         output_name="recon", save_intermediate=False,
                         initial_guess=None, minibatch_size=None,
                         save_outputs=True, verbose=True, seed=None,
                         loss_txt=None):
    """TV-regularized AD tomography from projection data.

    ``prj``: (n_theta, Y, X) attenuation projections (already normalized /
    -log'd — see ops.image.preprocess). Returns (volume (Y, X, X), info).
    Loss = mean over angles of MSE(projection mismatch)/n_theta + alpha * TV
    (ref fullfield.py:765-772).
    """
    _log = print_flush if verbose else (lambda *a, **k: None)
    prj = jnp.asarray(np.asarray(prj, dtype=np.float32))
    n_theta, dim_y, dim_x = prj.shape
    theta = -np.linspace(theta_st, theta_end, n_theta, dtype=np.float32)

    if initial_guess is None:
        obj0 = jnp.full((dim_y, dim_x, dim_x), 0.5, jnp.float32)
    else:
        obj0 = jnp.asarray(initial_guess, jnp.float32)

    # classical reference reconstruction (gridrec stand-in, ref fullfield.py:744)
    rec_fbp = fbp(prj, jnp.asarray(theta))

    if minibatch_size is None:
        minibatch_size = n_theta
    rng = np.random.RandomState(seed)

    tx = optax.adam(learning_rate)
    opt_state = tx.init(obj0)

    def loss_fn(obj, theta_batch, prj_batch):
        def per_angle(th, p):
            return jnp.mean((project_volume(obj, th) - p) ** 2)
        mse = jnp.sum(jax.vmap(per_angle)(theta_batch, prj_batch)) / n_theta
        # tf.image.total_variation over the (X, Z) planes of each Y slice
        tv = total_variation_2d(obj)
        return mse + alpha * tv, (mse, tv)

    @jax.jit
    def step(obj, opt_state, theta_batch, prj_batch):
        (loss, (mse, tv)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            obj, theta_batch, prj_batch)
        updates, opt_state = tx.update(g, opt_state, obj)
        return optax.apply_updates(obj, updates), opt_state, loss, mse, tv

    obj = obj0
    loss_ls = []
    t0 = time.time()
    n_batch = int(np.ceil(n_theta / minibatch_size))
    for epoch in range(n_epochs):
        t00 = time.time()
        order = rng.permutation(n_theta)
        current = None
        for i in range(n_batch):
            idx = order[i * minibatch_size:(i + 1) * minibatch_size]
            if len(idx) == 0:
                continue
            obj, opt_state, loss, mse, tv = step(
                obj, opt_state, jnp.asarray(theta[idx]), prj[idx])
            current = float(loss)
        loss_ls.append(current)
        _log("Iteration {}; loss = {}; time = {} s".format(
            epoch, current, time.time() - t00))
        if save_intermediate and save_outputs and output_folder:
            tiff.write_tiff(np.asarray(obj)[0],
                            os.path.join(output_folder, "intermediate",
                                         "iter_{:03d}".format(epoch)))
    _log("Total time: {}".format(time.time() - t0))

    final_tv = float(total_variation_2d(obj)) * alpha
    final_loss = loss_ls[-1] if loss_ls else float("nan")
    if save_outputs and output_folder:
        os.makedirs(output_folder, exist_ok=True)
        tiff.write_tiff(np.asarray(obj), os.path.join(output_folder, output_name))
        np.save(os.path.join(output_folder, "converge"), np.array(loss_ls))
    if loss_txt is not None:
        # alpha-sweep record (ref fullfield.py:815-818, loss.txt)
        with open(loss_txt, "a") as f:
            f.write("{} {} {} {}\n".format(alpha, final_loss,
                                           final_loss - final_tv, final_tv))

    info = {"loss": loss_ls, "fbp": np.asarray(rec_fbp), "final_tv": final_tv}
    return np.asarray(obj), info
