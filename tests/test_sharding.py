"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_phantom

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_blur_matches_single_device():
    from sift3d_tpu.filters import conv_matrix, gauss_kernel
    from sift3d_tpu.parallel import make_mesh, sharded_blur_z

    n = 64
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    W = conv_matrix(n, gauss_kernel(2.45), 1.0)  # widest default kernel

    ref = jnp.einsum("ab,xyb->xya", jnp.asarray(W), vol,
                     precision=jax.lax.Precision.HIGHEST)

    mesh = make_mesh({"z": 4}, jax.devices()[:4])
    got = sharded_blur_z(vol, W, mesh, "z")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_blur_halo_too_large():
    from sift3d_tpu.filters import conv_matrix, gauss_kernel
    from sift3d_tpu.parallel import make_mesh, sharded_blur_z

    W = conv_matrix(32, gauss_kernel(2.45), 1.0)  # halo 9 > 32/8
    mesh = make_mesh({"z": 8})
    vol = jnp.zeros((32, 32, 32), jnp.float32)
    with pytest.raises(ValueError):
        sharded_blur_z(vol, W, mesh, "z")


def test_batched_detect_counts_match_unsharded():
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.parallel import detect_batch_counts, make_mesh
    from sift3d_tpu.pyramid import make_plan

    p = DetectorParams()
    plan = make_plan((32, 32, 32), (1.0, 1.0, 1.0), p)
    vols = np.stack([make_phantom(32, seed=s) for s in range(8)])

    mesh = make_mesh({"b": 8})
    counts = np.asarray(detect_batch_counts(vols, plan, mesh))
    assert counts.shape == (8, 3 * plan.num_octaves)

    # single-volume reference
    from sift3d_tpu.parallel.batch import _batch_fn
    one = jax.jit(_batch_fn(plan, 1024))
    for b in range(8):
        ref = np.asarray(one(jnp.asarray(vols[b])))
        np.testing.assert_array_equal(counts[b], ref)


def test_mesh_validation():
    from sift3d_tpu.parallel import make_mesh
    with pytest.raises(ValueError):
        make_mesh({"b": 3}, jax.devices()[:8])
    m = make_mesh({"b": 2, "z": 4}, jax.devices()[:8])
    assert m.shape == {"b": 2, "z": 4}
