"""Fused Pallas multislice kernels: forward, batched grid, invertible VJP.

Runs in interpreter mode on CPU; the same kernels compile for TPU. The
multi-level radix path (N = base * 2^m) is exercised with a small ``base``
override so the per-level twiddle indexing is covered without 512^2 planes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beyond_dof_tpu.constants import PI
from beyond_dof_tpu.models.phantom import adhesin_phantom
from beyond_dof_tpu.ops.fresnel import get_kernel, ifftshift2
from beyond_dof_tpu.ops.multislice import (multislice_propagate_batch,
                                           multislice_propagate_batch_split)
from beyond_dof_tpu.ops.pallas_kernels import (multislice_pallas_invertible,
                                               pallas_shape_ok)
from beyond_dof_tpu.ops.splitfft import permute_kernel_2d


def _setup(n, n_slice, batch, base=None, seed=0):
    rng = np.random.RandomState(seed)
    delta = rng.rand(n_slice, batch, n, n).astype(np.float32) * 1e-6
    beta = rng.rand(n_slice, batch, n, n).astype(np.float32) * 1e-7
    energy_ev, psize_cm = 5000.0, 1e-7
    voxel_nm = psize_cm * 1e7
    lmbda_nm = 1240.0 / energy_ev
    k = float(2.0 * PI * voxel_nm / lmbda_nm)
    h = get_kernel(voxel_nm, lmbda_nm, [voxel_nm] * 3, (n, n))
    h_p = permute_kernel_2d(ifftshift2(np.asarray(h)), base=base)
    hr = jnp.asarray(np.real(h_p).astype(np.float32))
    hi = jnp.asarray(np.imag(h_p).astype(np.float32))
    w_re = jnp.ones((batch, n, n), jnp.float32)
    w_im = jnp.zeros((batch, n, n), jnp.float32)
    return delta, beta, w_re, w_im, hr, hi, k, energy_ev, psize_cm


def _complex_ref(delta, beta, energy_ev, psize_cm):
    """Reference exit wave via the complex lax.scan path."""
    d = np.transpose(delta, (1, 2, 3, 0))  # (Z,B,Y,X) -> (B,Y,X,Z)
    b = np.transpose(beta, (1, 2, 3, 0))
    probe = np.ones(delta.shape[2:], np.complex64)
    return np.asarray(multislice_propagate_batch(
        d, b, probe, energy_ev, psize_cm, propagate_last=True))


@pytest.mark.parametrize("n,base", [(16, None), (32, 8)])
def test_pallas_forward_batched_matches_complex(n, base):
    """Batched fused forward vs the complex scan — includes a 2-level radix
    case (n=32, base=8) covering the per-level twiddle stacks."""
    delta, beta, w_re, w_im, hr, hi, k, ev, ps = _setup(n, 6, 3, base=base)
    out_re, out_im = multislice_pallas_invertible(
        jnp.asarray(delta), jnp.asarray(beta), w_re, w_im, hr, hi, k,
        True, base)
    ref = _complex_ref(delta, beta, ev, ps)
    out = np.asarray(out_re) + 1j * np.asarray(out_im)
    assert np.abs(out - ref).max() < 1e-5


@pytest.mark.parametrize("n,base", [(16, None), (32, 8)])
def test_pallas_invertible_gradients_match_xla(n, base):
    """Gradient parity: fused Pallas reverse sweep vs the XLA checkpoint
    path, for the object slices AND the probe cotangent."""
    delta, beta, w_re, w_im, hr, hi, k, ev, ps = _setup(n, 5, 2, base=base)
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.rand(2, n, n).astype(np.float32))

    def loss_pallas(d, b, wr, wi):
        re, im = multislice_pallas_invertible(d, b, wr, wi, hr, hi, k,
                                              True, base)
        return jnp.mean((jnp.sqrt(re * re + im * im) - target) ** 2)

    def loss_xla(d, b, wr, wi):
        dt = jnp.transpose(d, (1, 2, 3, 0))
        bt = jnp.transpose(b, (1, 2, 3, 0))
        re, im = multislice_propagate_batch_split(
            dt, bt, wr, wi, ev, ps, propagate_last=True, remat=True,
            use_pallas=False)
        return jnp.mean((jnp.sqrt(re * re + im * im) - target) ** 2)

    args = (jnp.asarray(delta), jnp.asarray(beta), w_re, w_im)
    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for gp, gx, name in zip(g_p, g_x, ("delta", "beta", "probe_re",
                                       "probe_im")):
        gx = np.asarray(gx)
        scale = np.abs(gx).max() + 1e-30
        assert np.abs(np.asarray(gp) - gx).max() / scale < 1e-4, name


def test_split_path_routes_to_pallas():
    """multislice_propagate_batch_split(remat='invertible', use_pallas=True)
    equals the XLA invertible path bit-for-almost."""
    gd, gb = adhesin_phantom(16)
    pr = np.ones((16, 16), np.float32)
    pi = np.zeros((16, 16), np.float32)
    re_p, im_p = multislice_propagate_batch_split(
        gd[None], gb[None], pr, pi, 800, 0.67e-7, remat="invertible",
        use_pallas=True)
    re_x, im_x = multislice_propagate_batch_split(
        gd[None], gb[None], pr, pi, 800, 0.67e-7, remat="invertible",
        use_pallas=False)
    assert np.abs(np.asarray(re_p) - np.asarray(re_x)).max() < 5e-6
    assert np.abs(np.asarray(im_p) - np.asarray(im_x)).max() < 5e-6


def test_pallas_shape_ok():
    assert pallas_shape_ok(128, 128) and pallas_shape_ok(256, 256)
    assert pallas_shape_ok(512, 512) and pallas_shape_ok(1024, 1024)
    assert pallas_shape_ok(64, 64)
    assert not pallas_shape_ok(128, 256)
    assert not pallas_shape_ok(384, 384)  # 3 * 128: not a power-of-two mult
    assert pallas_shape_ok(32, 32, base=8)


@pytest.mark.parametrize("mode,tol", [("high", 2e-3), ("default", 5e-2)])
def test_pallas_precision_modes_track_highest(mode, tol):
    """The manual bf16x3 (HIGH) / bf16x1 (DEFAULT) in-kernel dots — Mosaic
    rejects those as dot precisions, so they are built from hi/lo bfloat16
    splits — stay within the expected error band of the HIGHEST kernel."""
    from beyond_dof_tpu.ops import pallas_kernels as pk
    delta, beta, w_re, w_im, hr, hi, k, ev, ps = _setup(32, 5, 2, base=8)
    args = (jnp.asarray(delta), jnp.asarray(beta), w_re, w_im, hr, hi, k,
            True, 8)
    ref_re, ref_im = multislice_pallas_invertible(*args)
    try:
        pk.set_kernel_precision(mode)
        out_re, out_im = multislice_pallas_invertible(*args)
    finally:
        pk.set_kernel_precision("highest")
    err = max(np.abs(np.asarray(out_re) - np.asarray(ref_re)).max(),
              np.abs(np.asarray(out_im) - np.asarray(ref_im)).max())
    assert 0 < err < tol  # nonzero: the reduced-precision path really ran


def test_pallas_precision_high_gradients_track_highest():
    """The invertible backward re-runs the forward in REVERSE at kernel
    precision, so manual bf16x3 must also keep the gradient in band —
    inverse-propagation error accumulates across slices otherwise."""
    from beyond_dof_tpu.ops import pallas_kernels as pk
    delta, beta, w_re, w_im, hr, hi, k, ev, ps = _setup(32, 5, 2, base=8)
    rng = np.random.RandomState(2)
    target = jnp.asarray(rng.rand(2, 32, 32).astype(np.float32))

    def loss(d, b, wr, wi):
        re, im = multislice_pallas_invertible(d, b, wr, wi, hr, hi, k,
                                              True, 8)
        return jnp.mean((jnp.sqrt(re * re + im * im) - target) ** 2)

    args = (jnp.asarray(delta), jnp.asarray(beta), w_re, w_im)
    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    try:
        pk.set_kernel_precision("high")
        g_hi = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    finally:
        pk.set_kernel_precision("highest")
    for gh, gr, name in zip(g_hi, g_ref, ("delta", "beta", "probe_re",
                                          "probe_im")):
        gr = np.asarray(gr)
        scale = np.abs(gr).max() + 1e-30
        rel = np.abs(np.asarray(gh) - gr).max() / scale
        assert 0 < rel < 5e-3, (name, rel)


def test_blocked_two_pass_matches_fused():
    """The blocked X-pass/Y-pass pipeline == the fully-fused kernel (and
    the complex scan), exercised with multi-level radix panels."""
    from beyond_dof_tpu.ops.pallas_kernels import (
        multislice_pallas_split, multislice_pallas_split_blocked)
    rng = np.random.RandomState(0)
    n, nz = 32, 5
    gd = (rng.rand(n, n, nz) * 1e-6).astype(np.float32)
    gb = (rng.rand(n, n, nz) * 1e-7).astype(np.float32)
    pr = np.ones((n, n), np.float32)
    pi_ = np.zeros((n, n), np.float32)
    re1, im1 = multislice_pallas_split(gd, gb, pr, pi_, 5000, 1e-7)
    re2, im2 = multislice_pallas_split_blocked(gd, gb, pr, pi_, 5000, 1e-7,
                                               py=16, qx=16, base=8)
    assert np.abs(np.asarray(re1) - np.asarray(re2)).max() < 1e-5
    assert np.abs(np.asarray(im1) - np.asarray(im2)).max() < 1e-5


def test_blocked_invertible_gradients_match_xla():
    """The blocked two-pass backward (panel-streamed invertible reverse
    sweep) == the XLA checkpoint path, for object slices AND probe
    cotangent — the AD capability that takes training beyond fused-VMEM
    plane sizes."""
    from beyond_dof_tpu.ops.pallas_kernels import (
        multislice_pallas_split_blocked)
    rng = np.random.RandomState(3)
    n, nz = 32, 5
    gd = jnp.asarray((rng.rand(n, n, nz) * 1e-6).astype(np.float32))
    gb = jnp.asarray((rng.rand(n, n, nz) * 1e-7).astype(np.float32))
    pr = jnp.ones((n, n), jnp.float32)
    pi_ = jnp.zeros((n, n), jnp.float32)
    target = jnp.asarray(rng.rand(n, n).astype(np.float32))

    def loss_blocked(d, b, wr, wi):
        re, im = multislice_pallas_split_blocked(d, b, wr, wi, 5000, 1e-7,
                                                 py=16, qx=16, base=8)
        return jnp.mean((jnp.sqrt(re * re + im * im) - target) ** 2)

    def loss_xla(d, b, wr, wi):
        re, im = multislice_propagate_batch_split(
            d[None], b[None], wr, wi, 5000, 1e-7, propagate_last=True,
            remat=True, use_pallas=False)
        return jnp.mean((jnp.sqrt(re[0] ** 2 + im[0] ** 2) - target) ** 2)

    g_b = jax.grad(loss_blocked, argnums=(0, 1, 2, 3))(gd, gb, pr, pi_)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(gd, gb, pr, pi_)
    for gp, gx, name in zip(g_b, g_x, ("delta", "beta", "probe_re",
                                       "probe_im")):
        gx = np.asarray(gx)
        scale = np.abs(gx).max() + 1e-30
        assert np.abs(np.asarray(gp) - gx).max() / scale < 1e-4, name


def test_split_path_routes_to_blocked():
    """multislice_propagate_batch_split(use_pallas='blocked') — the
    >1024^2 auto-route — matches the XLA invertible path in value and
    gradient, including batch > 1 (lax.map) and propagate_last=False."""
    rng = np.random.RandomState(4)
    n, nz, batch = 16, 4, 2
    gd = jnp.asarray((rng.rand(batch, n, n, nz) * 1e-6).astype(np.float32))
    gb = jnp.asarray((rng.rand(batch, n, n, nz) * 1e-7).astype(np.float32))
    pr = jnp.ones((batch, n, n), jnp.float32)
    pi_ = jnp.zeros((batch, n, n), jnp.float32)
    target = jnp.asarray(rng.rand(batch, n, n).astype(np.float32))

    for plast in (True, False):
        def loss(d, b, wr, wi, route):
            re, im = multislice_propagate_batch_split(
                d, b, wr, wi, 5000, 1e-7, propagate_last=plast,
                remat="invertible", use_pallas=route)
            return jnp.mean((jnp.sqrt(re * re + im * im) - target) ** 2)

        v_b, g_b = jax.value_and_grad(loss, argnums=(0, 1))(
            gd, gb, pr, pi_, "blocked")
        v_x, g_x = jax.value_and_grad(loss, argnums=(0, 1))(
            gd, gb, pr, pi_, False)
        assert abs(float(v_b) - float(v_x)) < 1e-3 * float(v_x)
        for gp, gx in zip(g_b, g_x):
            gx = np.asarray(gx)
            scale = np.abs(gx).max() + 1e-30
            assert np.abs(np.asarray(gp) - gx).max() / scale < 1e-4


def test_blocked_block_sizes_mosaic_legal(monkeypatch):
    """Router panel sizes always satisfy the Mosaic block-shape rules:
    py (sublane) % 8 == 0 and qx (LANE) % 128 == 0 — the r5 regression
    set qx=64 for >=8192 planes and killed every big-plane grad compile."""
    from beyond_dof_tpu.ops.multislice import blocked_block_sizes

    monkeypatch.delenv("BDT_BLOCKED_BLOCK", raising=False)
    for n in (2048, 4096, 8192, 16384):
        py, qx = blocked_block_sizes(n, n)
        assert py % 8 == 0 and n % py == 0
        assert qx % 128 == 0 and n % qx == 0
    assert blocked_block_sizes(4096, 4096)[0] == 128
    assert blocked_block_sizes(8192, 8192)[0] == 64   # VMEM lever
    assert blocked_block_sizes(8192, 8192)[1] == 128  # lane dim pinned

    # env override shrinks py ONLY; qx never drops below 128
    monkeypatch.setenv("BDT_BLOCKED_BLOCK", "64")
    py, qx = blocked_block_sizes(4096, 4096)
    assert (py, qx) == (64, 128)
    monkeypatch.setenv("BDT_BLOCKED_BLOCK", "100")  # not a multiple of 8
    with pytest.raises(ValueError):
        blocked_block_sizes(4096, 4096)


def test_blocked_calls_rejects_illegal_panels():
    """_blocked_calls fast-fails in Python on Mosaic-illegal panels
    (interpret mode would otherwise run shapes TPU lowering rejects)."""
    from beyond_dof_tpu.ops.pallas_kernels import (_blocked_calls,
                                                   _radix_consts)

    consts = _radix_consts(256, None)
    # Mosaic rules only bind when NOT interpreting (interpret=False)
    with pytest.raises(ValueError, match="lane"):
        _blocked_calls(256, 256, 1.0, consts, False, py=128, qx=64)
    with pytest.raises(ValueError, match="multiple of 8"):
        _blocked_calls(256, 256, 1.0, consts, False, py=4, qx=128)
    # non-dividing panels are illegal in ANY mode
    with pytest.raises(ValueError, match="divide"):
        _blocked_calls(256, 256, 1.0, consts, True, py=96, qx=128)
    # legal on TPU: qx == dim_x (full-dim lane) and py == 64
    _blocked_calls(256, 256, 1.0, consts, False, py=64, qx=256)
    # legal in interpret mode: tiny panels for CPU tests
    _blocked_calls(32, 32, 1.0, _radix_consts(32, 8), True, py=16, qx=16)
