"""Host-side phantom generators (replaces the external xdesign dependency).

Provides the reference's analytic shape helpers (ref tensorflow_recon/
util.py:926-972) plus generators for the benchmark workloads: an
adhesin-like blob phantom (64^3, ref reconstruct_fullfield.py:19-47) and the
cone/foam phantom ("tube sample" with spherical voids, ref
simulation/tube_sample_64.py, cone_256_foam workloads).

These run on the host in NumPy — phantom creation is one-off I/O-side work.
"""

import numpy as np
from scipy.ndimage import gaussian_filter

__all__ = ["generate_sphere", "generate_shell", "generate_disk", "generate_ring",
           "cone_foam_phantom", "adhesin_phantom"]


def generate_sphere(shape, radius, anti_aliasing=5):
    """Anti-aliased solid sphere centered in ``shape`` (ref util.py:926-942)."""
    shape = np.array(shape)
    radius = int(radius)
    x = np.linspace(-radius, radius, (radius * 2 + 1) * anti_aliasing)
    xx, yy, zz = np.meshgrid(x, x, x)
    a = (xx ** 2 + yy ** 2 + zz ** 2 <= radius ** 2).astype("float")
    res = np.zeros(shape * anti_aliasing)
    center_res = (np.array(res.shape) / 2).astype("int")
    sl = [slice(c - int(a.shape[0] / 2), c + int(a.shape[0] / 2)) for c in center_res]
    res[tuple(sl)] = a[: sl[0].stop - sl[0].start, : sl[1].stop - sl[1].start, : sl[2].stop - sl[2].start]
    res = gaussian_filter(res, 0.5 * anti_aliasing)
    return res[::anti_aliasing, ::anti_aliasing, ::anti_aliasing]


def generate_shell(shape, radius, anti_aliasing=5):
    """Spherical shell = difference of two spheres (ref util.py:945-949)."""
    return (generate_sphere(shape, radius + 0.5, anti_aliasing)
            - generate_sphere(shape, radius - 0.5, anti_aliasing))


def generate_disk(shape, radius, anti_aliasing=5):
    """Anti-aliased 2D disk (ref util.py:952-965)."""
    shape = np.array(shape)
    radius = int(radius)
    x = np.linspace(-radius, radius, (radius * 2 + 1) * anti_aliasing)
    xx, yy = np.meshgrid(x, x)
    a = (xx ** 2 + yy ** 2 <= radius ** 2).astype("float")
    res = np.zeros(shape * anti_aliasing)
    center_res = (np.array(res.shape) / 2).astype("int")
    sl = [slice(c - int(a.shape[0] / 2), c + int(a.shape[0] / 2)) for c in center_res]
    res[tuple(sl)] = a[: sl[0].stop - sl[0].start, : sl[1].stop - sl[1].start]
    res = gaussian_filter(res, 0.5 * anti_aliasing)
    return res[::anti_aliasing, ::anti_aliasing]


def generate_ring(shape, radius, anti_aliasing=5):
    """2D ring = difference of two disks (ref util.py:968-972)."""
    return (generate_disk(shape, radius + 0.5, anti_aliasing)
            - generate_disk(shape, radius - 0.5, anti_aliasing))


def cone_foam_phantom(size=64, delta=8.7e-7, beta=5.1e-8, n_bubbles=None, seed=0,
                      top_radius_frac=0.18, bottom_radius_frac=0.42, smooth=1.0,
                      z_slab=None):
    """Truncated-cone "foam" phantom with spherical voids.

    Reconstructs the geometry of the reference's cone_256_foam workload
    (xdesign-built truncated cone, ref simulation/tube_sample_64.py) without
    the external xdesign package: a vertical truncated cone (axis = Y) of
    uniform (delta, beta), hollowed by random non-overlapping bubbles.

    Returns ``(grid_delta, grid_beta)`` of shape (size, size, size), float32.

    ``z_slab=(lo, hi)`` rasterizes only z in [lo, hi) (same rng sequence,
    padded for the smoothing support, then cropped) — the flat 2D presets
    need one mid slice of a 1024^3 phantom, and the full-volume build costs
    ~13 min of host time at that size where the slab is seconds.
    """
    rng = np.random.RandomState(seed)
    n = size
    pad = int(np.ceil(4 * smooth)) + 1 if smooth else 0
    if z_slab is None:
        zlo_p, zhi_p, crop = 0, n, 0
    else:
        zlo_p = max(0, z_slab[0] - pad)
        zhi_p = min(n, z_slab[1] + pad)
        crop = z_slab[0] - zlo_p
    nz = zhi_p - zlo_p
    y = np.arange(n)[:, None, None]
    x = np.arange(n)[None, :, None] - (n - 1) / 2.0
    z = (np.arange(zlo_p, zhi_p))[None, None, :] - (n - 1) / 2.0
    frac = y / (n - 1.0)
    radius = (top_radius_frac + (bottom_radius_frac - top_radius_frac) * frac) * n
    body = ((x ** 2 + z ** 2) <= radius ** 2).astype(np.float64)
    # carve vertical margins so rotation stays inside the FOV
    margin = int(0.08 * n)
    body[:margin] = 0
    body[n - margin:] = 0

    if n_bubbles is None:
        n_bubbles = max(4, (n // 8) ** 2)
    voids = np.zeros_like(body)
    # rasterize each bubble only inside its bounding box: identical output
    # to a full-grid test, but O(r^3) per bubble instead of O(n^3) (at
    # n=256 the workload draws (n//8)^2 = 1024 bubbles — full-grid
    # rasterization is minutes of host time, the bboxes are milliseconds)
    ax = np.arange(n, dtype=np.float64)
    for _ in range(n_bubbles):
        r = rng.uniform(0.02, 0.08) * n
        cy = rng.uniform(margin + r, n - margin - r)
        frac_c = cy / (n - 1.0)
        rad_c = (top_radius_frac + (bottom_radius_frac - top_radius_frac) * frac_c) * n
        rho = rng.uniform(0, max(rad_c - r, 0.0))
        ang = rng.uniform(0, 2 * np.pi)
        cx = (n - 1) / 2.0 + rho * np.cos(ang)
        cz = (n - 1) / 2.0 + rho * np.sin(ang)
        y0, y1 = max(0, int(cy - r)), min(n, int(cy + r) + 2)
        x0, x1 = max(0, int(cx - r)), min(n, int(cx + r) + 2)
        z0, z1 = max(zlo_p, int(cz - r)), min(zhi_p, int(cz + r) + 2)
        if z1 <= z0:
            continue
        bub = ((ax[y0:y1, None, None] - cy) ** 2
               + (ax[None, x0:x1, None] - cx) ** 2
               + (ax[None, None, z0:z1] - cz) ** 2 <= r ** 2)
        voids[y0:y1, x0:x1, z0 - zlo_p:z1 - zlo_p] += bub
    body = body * (voids == 0)
    if smooth:
        body = gaussian_filter(body.astype(np.float64), smooth)
    if z_slab is not None:
        body = body[:, :, crop:crop + (z_slab[1] - z_slab[0])]
    return (body * delta).astype(np.float32), (body * beta).astype(np.float32)


def cone_support_mask(size, top_radius_frac=0.18, bottom_radius_frac=0.42,
                      margin_px=4, smooth=1.0):
    """Finite-support mask for the truncated-cone workloads.

    Analytic per-slice circular ramp enclosing :func:`cone_foam_phantom`'s
    envelope with a ``margin_px`` dilation — the same construction the
    reference hand-tunes from a Paganin bootstrap reconstruction
    (ref create_support_mask.py:10-20: per-slice ``tomopy.circ_mask`` with a
    linearly ramped ratio, zeroed end caps, gaussian blur, re-threshold).
    Essential for the far-field (CDI-regime) preset: Fourier magnitudes are
    blind to transverse translation and to the conjugate twin, and a support
    mask is the standard constraint that pins that gauge.
    """
    n = size
    y = np.arange(n)[:, None, None]
    x = np.arange(n)[None, :, None] - (n - 1) / 2.0
    z = np.arange(n)[None, None, :] - (n - 1) / 2.0
    frac = y / (n - 1.0)
    radius = ((top_radius_frac + (bottom_radius_frac - top_radius_frac) * frac)
              * n + margin_px)
    mask = ((x ** 2 + z ** 2) <= radius ** 2).astype(np.float64)
    vmargin = max(0, int(0.08 * n) - margin_px)
    mask[:vmargin] = 0
    mask[n - vmargin:] = 0
    if smooth:
        mask = gaussian_filter(mask, smooth)
        mask = (mask > 1e-8).astype(np.float64)
    return mask.astype(np.float32)


def adhesin_phantom(size=64, delta=8.7e-7, beta=5.1e-8, seed=0, n_lobes=5, smooth=1.5):
    """Adhesin-protein-like blob phantom (64^3 class workload).

    A handful of overlapping soft spheres — a stand-in for the reference's
    ``adhesin/phantom/grid_delta.npy`` blob (the real .npy is one of the
    repository's missing large blobs). Returns ``(grid_delta, grid_beta)``.
    """
    rng = np.random.RandomState(seed)
    n = size
    grid = np.zeros((n, n, n))
    yy, xx, zz = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    c = (n - 1) / 2.0
    for _ in range(n_lobes):
        r = rng.uniform(0.10, 0.18) * n
        off = rng.uniform(-0.15, 0.15, size=3) * n
        grid += ((yy - c - off[0]) ** 2 + (xx - c - off[1]) ** 2
                 + (zz - c - off[2]) ** 2 <= r ** 2)
    grid = gaussian_filter((grid > 0).astype(np.float64), smooth)
    return (grid * delta).astype(np.float32), (grid * beta).astype(np.float32)
