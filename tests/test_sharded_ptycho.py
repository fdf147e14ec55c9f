"""Y-sharded ptycho train step vs the serial forward (virtual 8-mesh).

The sharded step (recon/sharded_ptycho.py) must reproduce the serial
ptychographic loss and gradients exactly: the halo window-gather, the
per-slab job assignment and weight masking, the psum'd data term, and the
cross-boundary TV must all be invisible to the numerics
(ref tensorflow_recon/ptychography.py:37-97 forward semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from beyond_dof_tpu.parallel.mesh import make_mesh
from beyond_dof_tpu.recon.sharded import shard_state_y
from beyond_dof_tpu.recon.sharded_ptycho import (
    build_job_tables, arrange_data_y, build_step_sharded_y_ptycho)
from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split
from beyond_dof_tpu.ops.rotate import rotate_volume_zfirst_tfgrad
from beyond_dof_tpu.ops.regularizers import l1_norm
from beyond_dof_tpu.models.ptycho import safe_mag

SIZE = 32
PROBE = (8, 8)
ENERGY, PSIZE = 5000.0, 1e-7
ALPHA_D, ALPHA_B, GAMMA = 1e-6, 1e-7, 1e-6


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    gd = (rng.rand(SIZE, SIZE, SIZE) * 1e-7).astype(np.float32)
    gb = gd * 0.1
    mask = np.ones((SIZE, SIZE, SIZE), np.float32)
    probe_pos = np.array([(y, x) for y in range(4, 29, 6)
                          for x in range(4, 29, 6)], dtype=int)
    p_re = rng.rand(*PROBE).astype(np.float32)
    p_im = rng.rand(*PROBE).astype(np.float32) * 0.1
    theta = np.float32(0.37)
    return gd, gb, mask, probe_pos, p_re, p_im, theta


def serial_loss(params, mask, theta, probe_pos, p_re, p_im, mag):
    """Serial oracle: same rotation + zero pad + gather + multislice."""
    half_y, half_x = PROBE[0] // 2, PROBE[1] // 2
    obj_d = params["delta"] * mask
    obj_b = params["beta"] * mask
    d_rot = rotate_volume_zfirst_tfgrad(obj_d, theta)   # (Z, Y, X)
    b_rot = rotate_volume_zfirst_tfgrad(obj_b, theta)
    pad = ((0, 0), (half_y, half_y), (half_x, half_x))
    d_p, b_p = jnp.pad(d_rot, pad), jnp.pad(b_rot, pad)

    def gather(pos):
        sl_d = jax.lax.dynamic_slice(d_p, (0, pos[0], pos[1]),
                                     (SIZE, PROBE[0], PROBE[1]))
        sl_b = jax.lax.dynamic_slice(b_p, (0, pos[0], pos[1]),
                                     (SIZE, PROBE[0], PROBE[1]))
        return (jnp.transpose(sl_d, (1, 2, 0)), jnp.transpose(sl_b, (1, 2, 0)))

    pd, pb = jax.vmap(gather)(jnp.asarray(probe_pos, jnp.int32))
    re, im = multislice_propagate_batch_split(
        pd, pb, p_re, p_im, ENERGY, PSIZE, free_prop_cm="inf", remat=True)
    mags = safe_mag(re, im)
    n_pos = probe_pos.shape[0]
    err = jnp.sum((mags - mag) ** 2) / np.float32(
        n_pos * PROBE[0] * PROBE[1])
    tv = (jnp.sum(jnp.abs(obj_d[1:] - obj_d[:-1]))
          + jnp.sum(jnp.abs(obj_d[:, 1:] - obj_d[:, :-1]))
          + jnp.sum(jnp.abs(obj_d[:, :, 1:] - obj_d[:, :, :-1])))
    reg = ALPHA_D * l1_norm(obj_d) + ALPHA_B * l1_norm(obj_b) + GAMMA * tv
    return err + reg


def _simulate_mags(gd, gb, probe_pos, p_re, p_im, theta):
    params = {"delta": jnp.asarray(gd), "beta": jnp.asarray(gb)}
    half_y, half_x = PROBE[0] // 2, PROBE[1] // 2
    d_rot = rotate_volume_zfirst_tfgrad(params["delta"], theta)
    b_rot = rotate_volume_zfirst_tfgrad(params["beta"], theta)
    pad = ((0, 0), (half_y, half_y), (half_x, half_x))
    d_p, b_p = jnp.pad(d_rot, pad), jnp.pad(b_rot, pad)

    def gather(pos):
        sl_d = jax.lax.dynamic_slice(d_p, (0, pos[0], pos[1]),
                                     (SIZE, PROBE[0], PROBE[1]))
        sl_b = jax.lax.dynamic_slice(b_p, (0, pos[0], pos[1]),
                                     (SIZE, PROBE[0], PROBE[1]))
        return (jnp.transpose(sl_d, (1, 2, 0)), jnp.transpose(sl_b, (1, 2, 0)))

    pd, pb = jax.vmap(gather)(jnp.asarray(probe_pos, jnp.int32))
    re, im = multislice_propagate_batch_split(
        pd, pb, p_re, p_im, ENERGY, PSIZE, free_prop_cm="inf", remat=True)
    return np.asarray(safe_mag(re, im))


@pytest.fixture(scope="module")
def setup():
    gd, gb, mask, probe_pos, p_re, p_im, theta = _setup()
    mag = _simulate_mags(gd, gb, probe_pos, p_re, p_im, theta)
    mesh = make_mesh(n_data=1, tile_yx=(8, 1))
    n_ty = mesh.shape["ty"]
    mag_slabs = arrange_data_y(mag, probe_pos, PROBE, gd.shape, n_ty)
    return gd, gb, mask, probe_pos, p_re, p_im, theta, mag, mag_slabs, mesh


def test_job_tables_cover_all_positions(setup):
    *_, mesh = setup
    _, _, mask, probe_pos, *_ = _setup()
    tables, weights, halo = build_job_tables(probe_pos, PROBE,
                                             (SIZE, SIZE, SIZE),
                                             mesh.shape["ty"])
    assert int(weights.sum()) == len(probe_pos)
    assert halo == PROBE[0] // 2


def test_sharded_loss_matches_serial(setup):
    gd, gb, mask, probe_pos, p_re, p_im, theta, mag, mag_slabs, mesh = setup
    rng = np.random.RandomState(1)
    params = {"delta": jnp.asarray(gd + rng.rand(*gd.shape).astype(np.float32)
                                   * 1e-8),
              "beta": jnp.asarray(gb)}
    tx = optax.adam(1e-7)
    opt_state = tx.init(params)
    step, loss_only = build_step_sharded_y_ptycho(
        tx, opt_state, mesh, gd.shape, p_re, p_im, probe_pos, PROBE,
        ENERGY, PSIZE, alpha_d=ALPHA_D, alpha_b=ALPHA_B, gamma=GAMMA)

    loss_sh, err_sh, reg_sh = loss_only(params, jnp.asarray(mask),
                                        jnp.float32(theta),
                                        jnp.asarray(mag_slabs))
    loss_se = serial_loss(params, jnp.asarray(mask), jnp.float32(theta),
                          probe_pos, p_re, p_im, jnp.asarray(mag))
    np.testing.assert_allclose(float(loss_sh), float(loss_se), rtol=1e-5)


def test_sharded_grads_match_serial(setup):
    gd, gb, mask, probe_pos, p_re, p_im, theta, mag, mag_slabs, mesh = setup
    params = {"delta": jnp.asarray(gd), "beta": jnp.asarray(gb)}
    tx = optax.adam(1e-7)
    opt_state = tx.init(params)
    step, loss_only = build_step_sharded_y_ptycho(
        tx, opt_state, mesh, gd.shape, p_re, p_im, probe_pos, PROBE,
        ENERGY, PSIZE, alpha_d=ALPHA_D, alpha_b=ALPHA_B, gamma=GAMMA)

    g_sh = jax.grad(lambda p: loss_only(p, jnp.asarray(mask),
                                        jnp.float32(theta),
                                        jnp.asarray(mag_slabs))[0])(params)
    g_se = jax.grad(lambda p: serial_loss(p, jnp.asarray(mask),
                                          jnp.float32(theta), probe_pos,
                                          p_re, p_im, jnp.asarray(mag)))(params)
    for k in ("delta", "beta"):
        a, b = np.asarray(g_sh[k]), np.asarray(g_se[k])
        denom = np.abs(b).max() + 1e-30
        assert np.abs(a - b).max() / denom < 1e-4, k


def test_sharded_step_decreases_loss(setup):
    gd, gb, mask, probe_pos, p_re, p_im, theta, mag, mag_slabs, mesh = setup
    rng = np.random.RandomState(2)
    params = {"delta": jnp.asarray(rng.rand(*gd.shape).astype(np.float32)
                                   * 1e-7),
              "beta": jnp.zeros(gd.shape, jnp.float32)}
    tx = optax.adam(1e-8)
    opt_state = tx.init(params)
    step, loss_only = build_step_sharded_y_ptycho(
        tx, opt_state, mesh, gd.shape, p_re, p_im, probe_pos, PROBE,
        ENERGY, PSIZE, alpha_d=0.0, alpha_b=0.0, gamma=0.0)
    params, opt_state, mask_dev = shard_state_y(
        mesh, gd.shape, params, opt_state, jnp.asarray(mask))
    losses = []
    for epoch in range(3):
        params, opt_state, mask_dev, loss, err, reg = step(
            params, opt_state, mask_dev, jnp.float32(theta),
            jnp.asarray(mag_slabs), jnp.int32(epoch))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_needs_x_pad():
    from beyond_dof_tpu.recon.sharded_ptycho import needs_x_pad
    # uniform grid flush with the volume: no overhang
    pos = np.array([(8, 4), (8, 28)])
    assert not needs_x_pad(pos, (8, 8), SIZE)
    # window start below 0
    assert needs_x_pad(np.array([(8, 2)]), (8, 8), SIZE)
    # window end beyond dim_x
    assert needs_x_pad(np.array([(8, 29)]), (8, 8), SIZE)


def test_sharded_loss_matches_serial_with_x_overhang(setup):
    """Positions whose windows overhang the volume in X exercise the
    conditional X-pad branch (the reference's compute_pad_arr X case,
    ref ptychography.py:45-61); overhanging rows must read the analytic
    zero pad on both paths."""
    *_, mesh = setup
    gd, gb, mask, _, p_re, p_im, theta = _setup()
    probe_pos = np.array([(y, x) for y in range(4, 29, 8)
                          for x in (2, 16, 29)], dtype=int)
    mag = _simulate_mags(gd, gb, probe_pos, p_re, p_im, theta)
    n_ty = mesh.shape["ty"]
    mag_slabs = arrange_data_y(mag, probe_pos, PROBE, gd.shape, n_ty)
    params = {"delta": jnp.asarray(gd), "beta": jnp.asarray(gb)}
    tx = optax.adam(1e-7)
    opt_state = tx.init(params)
    from beyond_dof_tpu.recon.sharded_ptycho import needs_x_pad
    assert needs_x_pad(probe_pos, PROBE, SIZE)
    step, loss_only = build_step_sharded_y_ptycho(
        tx, opt_state, mesh, gd.shape, p_re, p_im, probe_pos, PROBE,
        ENERGY, PSIZE, alpha_d=ALPHA_D, alpha_b=ALPHA_B, gamma=GAMMA)
    loss_sh, _, _ = loss_only(params, jnp.asarray(mask),
                              jnp.float32(theta), jnp.asarray(mag_slabs))
    loss_se = serial_loss(params, jnp.asarray(mask), jnp.float32(theta),
                          probe_pos, p_re, p_im, jnp.asarray(mag))
    np.testing.assert_allclose(float(loss_sh), float(loss_se), rtol=1e-5)


def test_sharded_memory_levers_parity(setup):
    """checkpoint_ext only changes WHERE the backward recomputes, so loss
    and grads must match the default exactly; bf16 extended slabs quantize
    the object sampling (~3 decimal digits) so the loss lands within the
    bf16 band."""
    gd, gb, mask, probe_pos, p_re, p_im, theta, mag, mag_slabs, mesh = setup
    params = {"delta": jnp.asarray(gd), "beta": jnp.asarray(gb)}
    tx = optax.adam(1e-7)
    opt_state = tx.init(params)

    def build(**kw):
        return build_step_sharded_y_ptycho(
            tx, opt_state, mesh, gd.shape, p_re, p_im, probe_pos, PROBE,
            ENERGY, PSIZE, alpha_d=ALPHA_D, alpha_b=ALPHA_B, gamma=GAMMA,
            **kw)[1]

    args = (params, jnp.asarray(mask), jnp.float32(theta),
            jnp.asarray(mag_slabs))
    base = build()
    ck = build(checkpoint_ext=True)
    loss0 = float(base(*args)[0])
    loss_ck = float(ck(*args)[0])
    np.testing.assert_allclose(loss_ck, loss0, rtol=1e-6)
    g0 = jax.grad(lambda p: base(p, *args[1:])[0])(params)
    g_ck = jax.grad(lambda p: ck(p, *args[1:])[0])(params)
    for k in ("delta", "beta"):
        a, b = np.asarray(g_ck[k]), np.asarray(g0[k])
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-30) < 1e-5, k
    loss_bf = float(build(ext_dtype="bfloat16")(*args)[0])
    assert abs(loss_bf - loss0) / abs(loss0) < 0.05
