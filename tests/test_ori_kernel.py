"""Pallas orientation-moments kernel vs the XLA path (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from sift3d_tpu.params import DetectorParams
from sift3d_tpu.pyramid import make_plan


def test_moments_kernel_matches_xla_path():
    from sift3d_tpu.orientation import assign_orientations
    from sift3d_tpu.ops.ori_kernel import ori_moments_pallas
    from sift3d_tpu.orientation import _window_moments
    from sift3d_tpu.windows import window_extent

    p = DetectorParams()
    plan = make_plan((48, 48, 48), (1.0, 1.0, 1.0), p)
    rng = np.random.default_rng(3)
    L = 2
    levels = jnp.asarray(rng.normal(size=(L, 48, 48, 48)).astype(np.float32))
    K = 16
    coords = jnp.asarray(rng.integers(2, 46, (K, 3)), jnp.int32)
    lvl = jnp.asarray(rng.integers(0, L, (K,)), jnp.int32)
    sd_vals = np.asarray([plan.scales[0][1], plan.scales[0][2]], np.float32)
    sd_arr = jnp.asarray(sd_vals)[lvl]
    sd_max = float(sd_vals.max())

    rad = p.ori_sig_fctr * sd_max * p.ori_rad_fctr
    extents = tuple(window_extent(rad / 1.0, 48) for _ in range(3))
    centers = coords.astype(jnp.float32)

    # XLA reference moments
    A_ref, vd_ref = jax.vmap(
        lambda co, ce, s, lv: _window_moments(
            levels, co, ce, s, (1.0, 1.0, 1.0), extents, p, lvl=lv))(
        coords, centers, sd_arr, lvl)

    fp = jnp.concatenate([centers, sd_arr[:, None]], axis=-1)
    A, vd = ori_moments_pallas(levels, lvl, coords, fp, extents,
                               (1.0, 1.0, 1.0), p, interpret=True)

    # f32 reduction order differs between the kernel's jnp.sum and the XLA
    # einsum; both sit within the same tolerance of the C f64 accumulation.
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vd_ref),
                               rtol=2e-4, atol=2e-5)


def test_moments_kernel_z_view_matches_xla():
    """VERDICT r3 #6: the moments kernel under the z_view contract (a
    local z-slab with global coordinates — the shard_map orientation
    body) must match BOTH the XLA z_view path and the full-volume
    kernel for keypoints owned by the slab."""
    from sift3d_tpu.orientation import _window_moments
    from sift3d_tpu.ops.ori_kernel import ori_moments_pallas
    from sift3d_tpu.windows import window_extent

    p = DetectorParams()
    plan = make_plan((48, 48, 96), (1.0, 1.0, 1.0), p)
    rng = np.random.default_rng(11)
    level = jnp.asarray(rng.normal(size=(48, 48, 96)).astype(np.float32))
    sd = float(plan.scales[0][1])
    rad = p.ori_sig_fctr * sd * p.ori_rad_fctr
    extents = tuple(window_extent(rad / 1.0, n) for n in (48, 48, 96))
    Gz = extents[2]

    # slab owning global z in [32, 64), halo-extended by Gz each side
    zlo = 32
    origin = zlo - Gz
    slab = jax.lax.dynamic_slice(
        jnp.pad(level, ((0, 0), (0, 0), (Gz, Gz))),
        (0, 0, zlo), (48, 48, 32 + 2 * Gz))

    K = 8
    coords = np.stack([rng.integers(2, 46, K), rng.integers(2, 46, K),
                       rng.integers(zlo, zlo + 32, K)],
                      axis=1).astype(np.int32)
    coords = jnp.asarray(coords)
    centers = coords.astype(jnp.float32)
    sd_arr = jnp.full((K,), jnp.float32(sd))
    fp = jnp.concatenate([centers, sd_arr[:, None]], axis=-1)
    lvl = jnp.zeros((K,), jnp.int32)

    A_full, vd_full = ori_moments_pallas(
        level[None], lvl, coords, fp, extents, (1.0, 1.0, 1.0), p,
        interpret=True)
    A_zv, vd_zv = ori_moments_pallas(
        slab[None], lvl, coords, fp, extents, (1.0, 1.0, 1.0), p,
        interpret=True, z_origin=jnp.int32(origin), global_nz=96)
    np.testing.assert_allclose(np.asarray(A_zv), np.asarray(A_full),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vd_zv), np.asarray(vd_full),
                               rtol=2e-4, atol=2e-5)

    A_ref, vd_ref = jax.vmap(
        lambda co, ce, s: _window_moments(
            slab, co, ce, s, (1.0, 1.0, 1.0), extents, p,
            z_view=(origin, 96)))(coords, centers, sd_arr)
    np.testing.assert_allclose(np.asarray(A_zv), np.asarray(A_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vd_zv), np.asarray(vd_ref),
                               rtol=2e-4, atol=2e-5)


def test_moments_kernel_odd_shape():
    """Non-multiple-of-8 y / non-multiple-of-128 z exercise the pad and
    y-start-alignment paths."""
    from sift3d_tpu.ops.ori_kernel import ori_moments_pallas
    from sift3d_tpu.orientation import _window_moments
    from sift3d_tpu.windows import window_extent

    p = DetectorParams()
    rng = np.random.default_rng(7)
    n = (41, 45, 51)
    levels = jnp.asarray(rng.normal(size=(1,) + n).astype(np.float32))
    K = 8
    coords = jnp.stack([jnp.asarray(rng.integers(2, d - 2, (K,)), jnp.int32)
                        for d in n], axis=-1)
    lvl = jnp.zeros((K,), jnp.int32)
    sd = 2.0
    sd_arr = jnp.full((K,), jnp.float32(sd))
    rad = p.ori_sig_fctr * sd * p.ori_rad_fctr
    extents = tuple(window_extent(rad / 1.0, d) for d in n)
    centers = coords.astype(jnp.float32)

    A_ref, vd_ref = jax.vmap(
        lambda co, ce, s: _window_moments(
            levels[0], co, ce, s, (1.0, 1.0, 1.0), extents, p))(
        coords, centers, sd_arr)

    fp = jnp.concatenate([centers, sd_arr[:, None]], axis=-1)
    A, vd = ori_moments_pallas(levels, lvl, coords, fp, extents,
                               (1.0, 1.0, 1.0), p, interpret=True)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vd_ref),
                               rtol=2e-4, atol=2e-5)


def test_assign_orientations_pallas_path_interpret(monkeypatch):
    """assign_orientations with the kernel path forced (interpret via CPU
    backend happens through use_pallas plumbed from the backend check; here
    we compare results by calling the moments kernel path indirectly)."""
    from sift3d_tpu import orientation as ori_mod
    from sift3d_tpu.ops import ori_kernel

    p = DetectorParams()
    rng = np.random.default_rng(4)
    level = jnp.asarray(rng.normal(size=(40, 40, 40)).astype(np.float32))
    K = 8
    coords = jnp.asarray(rng.integers(5, 35, (K, 3)), jnp.int32)
    valid = jnp.ones(K, bool)
    sd = 2.0

    ref = ori_mod.assign_orientations(level, coords, valid, sd,
                                      (1.0, 1.0, 1.0), p, use_pallas=False)

    real = ori_kernel.ori_moments_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(ori_kernel, "ori_moments_pallas", interp)
    got = ori_mod.assign_orientations(level, coords, valid, sd,
                                      (1.0, 1.0, 1.0), p, use_pallas=True)

    assert np.array_equal(np.asarray(got.accepted), np.asarray(ref.accepted))
    acc = np.asarray(ref.accepted)
    np.testing.assert_allclose(np.asarray(got.R)[acc],
                               np.asarray(ref.R)[acc], rtol=1e-3, atol=1e-4)
