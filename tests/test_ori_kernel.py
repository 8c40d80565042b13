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
