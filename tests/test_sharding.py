"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_phantom

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """jaxlib's persistent-cache serialize/deserialize of the 8-device
    GSPMD CPU executables in this module segfaults intermittently (the
    cpu_aot_loader machine-feature path); skip the on-disk cache for these
    tests — in-memory jit caching still applies within the run.

    config.update alone is NOT enough: compilation_cache holds a global
    initialized on first use, so it must be reset to pick up the change
    (and reset again on teardown to re-enable the suite's cache dir)."""
    from jax._src import compilation_cache as cc
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    cc.reset_cache()


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


def test_sharded_extrema_pallas_kernel_matches_xla():
    """VERDICT r3 #6 proof: the Pallas extrema kernel runs INSIDE the
    shard_map body (interpret mode on the CPU mesh — no TPU pod here)
    and produces the exact same per-shard candidate stores as the XLA
    shifted-slice form; a spy asserts the kernel path was taken."""
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.spatial import detect_extrema_level_sharded
    from sift3d_tpu.pyramid import (build_dog, build_gpyr_incremental,
                                    make_plan, scale_to_unit)
    import sift3d_tpu.ops.extrema_kernel as ek

    params = DetectorParams()
    vol = scale_to_unit(jnp.asarray(make_phantom(64)))
    plan = make_plan((64, 64, 64), (1.0, 1.0, 1.0), params)
    dog = build_dog(build_gpyr_incremental(vol, plan))[0]
    mesh = make_mesh({"z": 4}, jax.devices()[:4])

    calls = []
    orig = ek.extrema_mask_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ek.extrema_mask_pallas = spy
    try:
        a = detect_extrema_level_sharded(
            dog[0], dog[1], dog[2], params, 128, mesh, "z",
            use_pallas=True, interpret=True)
    finally:
        ek.extrema_mask_pallas = orig
    assert calls, "Pallas kernel path not taken inside the shard body"
    b = detect_extrema_level_sharded(
        dog[0], dog[1], dog[2], params, 128, mesh, "z", use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.coords),
                                  np.asarray(b.coords))
    np.testing.assert_array_equal(np.asarray(a.strength),
                                  np.asarray(b.strength))
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    assert int(np.asarray(a.count).sum()) > 0


def test_mesh_validation():
    from sift3d_tpu.parallel import make_mesh
    with pytest.raises(ValueError):
        make_mesh({"b": 3}, jax.devices()[:8])
    m = make_mesh({"b": 2, "z": 4}, jax.devices()[:8])
    assert m.shape == {"b": 2, "z": 4}


def test_sharded_detector_matches_single_device():
    """Full z-sharded detection (halo-exchange pyramid, per-shard candidate
    compaction) must reproduce the single-device detector exactly: same
    keypoints in the same (reference) order.

    Runs ISOLATED in a fresh process: jaxlib's XLA:CPU compile of this
    GSPMD program segfaults intermittently when it happens late in a
    long-running suite process (observed 2/2 in-suite with a concurrent
    JAX process on the box, 0/2 standalone; same compiler crash class as
    the persistent-cache issue this module already works around)."""
    import os
    import subprocess
    import sys

    if os.environ.get("_S3D_SHARDING_ISOLATED") != "1":
        env = dict(os.environ)
        env["_S3D_SHARDING_ISOLATED"] = "1"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{os.path.abspath(__file__)}"
             "::test_sharded_detector_matches_single_device"],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
        return

    import sift3d_tpu as s3d
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.spatial import ShardedSIFT3D

    vol = make_phantom(64)
    kp1 = s3d.SIFT3D().detect_keypoints(vol)

    mesh = make_mesh({"z": 4}, jax.devices()[:4])
    det2 = ShardedSIFT3D(mesh=mesh)
    kp2 = det2.detect_keypoints(vol)

    assert len(kp1) == len(kp2)
    assert np.array_equal(kp1.coords, kp2.coords)
    assert np.array_equal(kp1.octave, kp2.octave)
    assert np.abs(kp1.strength - kp2.strength).max() < 1e-6
    assert np.abs(kp1.R - kp2.R).max() < 1e-4

    d1 = s3d.SIFT3D()
    # reuse the unsharded detector for descriptor reference
    kp1b = d1.detect_keypoints(vol)
    ref = d1.extract_descriptors(kp1b)
    got = det2.extract_descriptors(kp2)
    assert np.abs(ref.data - got.data).max() < 1e-4


def test_sharded_octave_fallback():
    """Octaves too small for the blur halo fall back to replicated compute."""
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.parallel.spatial import octave_is_sharded

    from sift3d_tpu.parallel.spatial import max_blur_halo

    plan = make_plan((64, 64, 64), (1.0, 1.0, 1.0), DetectorParams())
    # octave 0: halo 9 (widest kernel half-width 8 + boundary lerp)
    assert max_blur_halo(plan, 0) == 9
    assert not octave_is_sharded(plan, 0, 8)   # 64/8 = 8 < 9
    assert octave_is_sharded(plan, 0, 4)       # 16 >= 9
    # deeper octaves: the same kernels apply with tap spacing 1/2^o voxels,
    # so the band shrinks with the octave
    assert max_blur_halo(plan, 1) < max_blur_halo(plan, 0)
    # the last octave (8 voxels, halo 2) cannot be sharded over 8 devices
    assert not octave_is_sharded(plan, plan.num_octaves - 1, 8)


def test_sharded_detector_extensions_match_single_device():
    """Extension configs (subvoxel refinement + edge rejection) run the
    exact single-device algorithm under GSPMD on the z-sharded input; the
    keypoints and descriptors must match the unsharded detector exactly.

    Runs in a fresh subprocess: XLA:CPU intermittently segfaults
    compiling/(de)serializing THIS test's GSPMD programs late in a
    long-lived suite process (observed at compile, serialize, AND
    deserialize across runs), while a fresh process passes every time.
    """
    import os
    import subprocess
    import sys
    if os.environ.get("_S3D_SHARDING_ISOLATED") != "1":
        env = dict(os.environ)
        env["_S3D_SHARDING_ISOLATED"] = "1"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{os.path.abspath(__file__)}"
             "::test_sharded_detector_extensions_match_single_device"],
            env=env, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
        return

    import sift3d_tpu as s3d
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.spatial import ShardedSIFT3D
    from sift3d_tpu.params import DetectorParams

    params = DetectorParams(refine_subvoxel=True, edge_thresh=10.0)
    vol = make_phantom(64)
    det1 = s3d.SIFT3D(params)
    kp1 = det1.detect_keypoints(vol)
    assert len(kp1) > 0

    mesh = make_mesh({"z": 4}, jax.devices()[:4])
    det2 = ShardedSIFT3D(params, mesh=mesh)
    kp2 = det2.detect_keypoints(vol)

    # The z-sharded pyramid matmuls accumulate in a different order, so
    # refined (fractional) coordinates drift at float precision — well
    # below any meaningful fraction of a voxel.
    assert len(kp1) == len(kp2)
    np.testing.assert_allclose(kp1.coords, kp2.coords, atol=1e-3)
    assert np.array_equal(kp1.octave, kp2.octave)
    np.testing.assert_allclose(kp1.strength, kp2.strength, atol=1e-5)
    np.testing.assert_allclose(kp1.R, kp2.R, atol=1e-3)

    ref = det1.extract_descriptors(kp1)
    got = det2.extract_descriptors(kp2)
    assert np.abs(ref.data - got.data).max() < 1e-4


def test_shard_map_batch_matches_unsharded(monkeypatch):
    """The mesh-sharded hinted batch path (shard_map whose body is the
    UNROLLED single-volume fused program) must produce exactly the
    outputs of the single-device detect_keypoints_batch path.

    Isolated in a fresh process (XLA:CPU GSPMD compile segfault class —
    observed once in-suite at 55% with a concurrent JAX process)."""
    import os
    import subprocess
    import sys

    if os.environ.get("_S3D_SHARDING_ISOLATED") != "1":
        env = dict(os.environ)
        env["_S3D_SHARDING_ISOLATED"] = "1"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{os.path.abspath(__file__)}"
             "::test_shard_map_batch_matches_unsharded"],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
        return

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import sift3d_tpu.pipeline as plmod
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.pipeline import SIFT3D

    B = 8
    vols = np.stack([make_phantom(32, nblobs=8, seed=100 + b)
                     for b in range(B)]).astype(np.float32)

    det_ref = SIFT3D()
    det_ref.detect_keypoints_batch(vols)          # learn the hint
    kps_ref = det_ref.detect_keypoints_batch(vols)   # hinted unrolled path
    ds_ref = det_ref.extract_descriptors_batch(kps_ref)
    assert sum(len(k) for k in kps_ref) > 0

    mesh = make_mesh({"b": 8})
    sharding = NamedSharding(mesh, P("b"))
    vols_sh = jax.device_put(jnp.asarray(vols), sharding)

    det = SIFT3D()
    det.detect_keypoints_batch(vols_sh)           # learn the hint
    called = {}
    orig = plmod._detect_full_shardmap_fn

    def spy(*args):
        called["used"] = True
        return orig(*args)

    monkeypatch.setattr(plmod, "_detect_full_shardmap_fn", spy)
    kps = det.detect_keypoints_batch(vols_sh)     # hinted shard_map path
    ds = det.extract_descriptors_batch(kps)
    assert called.get("used"), "shard_map batch path was not taken"

    for b in range(B):
        np.testing.assert_array_equal(kps[b].coords, kps_ref[b].coords)
        np.testing.assert_array_equal(kps[b].octave, kps_ref[b].octave)
        np.testing.assert_array_equal(kps[b].level, kps_ref[b].level)
        np.testing.assert_array_equal(kps[b].strength, kps_ref[b].strength)
        np.testing.assert_array_equal(kps[b].R, kps_ref[b].R)
        np.testing.assert_array_equal(ds[b].data, ds_ref[b].data)
        np.testing.assert_array_equal(ds[b].xyz, ds_ref[b].xyz)


def test_sharded_descriptors_reshard_keypoints(monkeypatch):
    """The sharded-octave descriptor stage must (a) route through the
    keypoint-resharding shard_map, (b) communicate via collective-permute
    halo slabs only — no all-gather of full levels — and (c) match the
    single-device descriptors.

    Isolated in a fresh process for the same jaxlib XLA:CPU GSPMD
    compile segfault as test_sharded_detector_matches_single_device."""
    import os
    import subprocess
    import sys

    if os.environ.get("_S3D_SHARDING_ISOLATED") != "1":
        env = dict(os.environ)
        env["_S3D_SHARDING_ISOLATED"] = "1"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{os.path.abspath(__file__)}"
             "::test_sharded_descriptors_reshard_keypoints"],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
        return

    import sift3d_tpu as s3d
    import sift3d_tpu.parallel.spatial as sp
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.spatial import ShardedSIFT3D

    vol = make_phantom(64)
    det1 = s3d.SIFT3D()
    kp1 = det1.detect_keypoints(vol)
    ref = det1.extract_descriptors(kp1)

    mesh = make_mesh({"z": 4}, jax.devices()[:4])
    det2 = ShardedSIFT3D(mesh=mesh)
    kp2 = det2.detect_keypoints(vol)
    assert len(kp2) == len(kp1)
    assert any(det2._shard_flags), "no octave sharded; test is vacuous"

    used = {}
    orig = sp._desc_shard_fn

    def spy(*args):
        fn = orig(*args)
        used["fn"] = (fn, args)
        return fn

    monkeypatch.setattr(sp, "_desc_shard_fn", spy)
    got = det2.extract_descriptors(kp2)
    assert "fn" in used, "keypoint-resharding path was not taken"
    # z-sharded pyramid rounding differs at float precision
    assert np.abs(ref.data - got.data).max() < 1e-4
    np.testing.assert_allclose(ref.xyz, got.xyz, atol=1e-3)
    np.testing.assert_allclose(ref.sd, got.sd, atol=1e-5)

    # The communication pattern must be halo ppermutes, not full-level
    # all-gathers: check the compiled HLO of the shard_map program.
    fn, args = used["fn"]
    plan, octave = args[0], args[1]
    import jax.numpy as jnp
    L = plan.params.num_gpyr_levels
    nx, ny, nz = plan.octave_dims[octave]
    bucket, cap = args[5], args[4]
    shapes = (jnp.zeros((L, nx, ny, nz), jnp.float32),
              jnp.zeros((bucket, 3), jnp.int32),
              jnp.zeros((bucket, 3, 3), jnp.float32),
              jnp.zeros((bucket,), jnp.int32),
              jnp.zeros((bucket,), jnp.float32),
              jnp.zeros((bucket,), bool))
    hlo = fn.lower(*shapes).compile().as_text()
    assert "all-gather" not in hlo, "descriptor stage all-gathers"


def test_sharded_detector_hinted_second_pass():
    """The second detection on a plan runs the fused hinted sharded
    program (one dispatch: pyramid + extrema + orientation at hinted
    slots) and must reproduce the first (cold-path) detection exactly."""
    import os
    import subprocess
    import sys

    if os.environ.get("_S3D_SHARDING_ISOLATED") != "1":
        env = dict(os.environ)
        env["_S3D_SHARDING_ISOLATED"] = "1"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{os.path.abspath(__file__)}"
             "::test_sharded_detector_hinted_second_pass"],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
        return

    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.spatial import ShardedSIFT3D

    vol = make_phantom(64)
    mesh = make_mesh({"z": 4}, jax.devices()[:4])
    det = ShardedSIFT3D(mesh=mesh)
    kp1 = det.detect_keypoints(vol)
    assert det._sh_hint is not None
    kp2 = det.detect_keypoints(vol)       # fused hinted program
    assert len(kp1) == len(kp2) > 0
    np.testing.assert_array_equal(kp1.coords, kp2.coords)
    np.testing.assert_array_equal(kp1.octave, kp2.octave)
    np.testing.assert_array_equal(kp1.level, kp2.level)
    np.testing.assert_allclose(kp1.strength, kp2.strength, rtol=0, atol=0)
    np.testing.assert_allclose(kp1.R, kp2.R, rtol=0, atol=0)

    # Speculative descriptors: the hinted detection cached every
    # keypoint's descriptor, so extract must be served with NO further
    # device dispatch (spy: the device extractors raise if touched) —
    # sharded detect+extract is one dispatch + one get (VERDICT r3 #5).
    assert det._spec_desc_cache
    import sift3d_tpu.parallel.spatial as spatial_mod
    import sift3d_tpu.pipeline as pipeline_mod

    def _boom(*a, **k):
        raise AssertionError("device descriptor path dispatched")

    orig = (spatial_mod._desc_shard_fn, pipeline_mod._extract_oct_fn)
    spatial_mod._desc_shard_fn = _boom
    pipeline_mod._extract_oct_fn = _boom
    try:
        d1 = det.extract_descriptors(kp2)
    finally:
        spatial_mod._desc_shard_fn, pipeline_mod._extract_oct_fn = orig
    assert np.isfinite(d1.data).all() and d1.data.shape[0] == len(kp2)

    # ... and the cached values must match the device path (12-bit
    # transport bound).
    det._spec_desc_cache = None
    d2 = det.extract_descriptors(kp2)
    np.testing.assert_allclose(d1.data, d2.data, atol=2e-4)
    np.testing.assert_allclose(d1.xyz, d2.xyz, atol=1e-5)
    np.testing.assert_allclose(d1.sd, d2.sd, atol=1e-6)


def test_512_sharded_memory_budget():
    """SURVEY section 5's multi-GB pyramid story: a 512^3 plan's early
    octaves shard over the mesh, and the compiled per-device footprint of
    sharded detection stays far under one v5e chip's 16 GB HBM — and far
    under the single-device program's footprint (compile-time memory
    analysis; per-device sizes verified against the input shard size).

    Isolated in a fresh process (XLA:CPU GSPMD compile segfault class)."""
    import os
    import subprocess
    import sys

    if os.environ.get("_S3D_SHARDING_ISOLATED") != "1":
        env = dict(os.environ)
        env["_S3D_SHARDING_ISOLATED"] = "1"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{os.path.abspath(__file__)}"
             "::test_512_sharded_memory_budget"],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
        return

    from jax.sharding import NamedSharding, PartitionSpec as P

    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.spatial import (_sharded_detect_fn,
                                             octave_is_sharded)
    from sift3d_tpu.pipeline import _detect_fn
    from sift3d_tpu.pyramid import make_plan

    params = DetectorParams()
    plan = make_plan((512, 512, 512), (1.0, 1.0, 1.0), params)
    mesh = make_mesh({"z": 8})
    assert octave_is_sharded(plan, 0, 8)
    assert octave_is_sharded(plan, 1, 8)

    run, keys, caps = _sharded_detect_fn(plan, mesh, "z")
    sds = jax.ShapeDtypeStruct(
        (512, 512, 512), jnp.float32,
        sharding=NamedSharding(mesh, P(None, None, "z")))
    ma = run.lower(sds).compile().memory_analysis()
    per_dev = (ma.argument_size_in_bytes + ma.output_size_in_bytes
               + ma.temp_size_in_bytes)

    run1, _ = _detect_fn(plan)
    ma1 = run1.lower(
        jax.ShapeDtypeStruct((512, 512, 512), jnp.float32)).compile() \
        .memory_analysis()
    single = (ma1.argument_size_in_bytes + ma1.output_size_in_bytes
              + ma1.temp_size_in_bytes)

    hbm = 16 * 1024 ** 3
    assert per_dev < hbm // 4, per_dev       # big margin under one chip
    assert per_dev * 3 < single, (per_dev, single)  # sharding earns >3x


def test_composed_sharded_octave_matches_and_single_exchange():
    """The composed sharded octave builder (one halo exchange + batched
    einsums) matches the replicated composed build within f32 rounding,
    and its compiled HLO carries exactly ONE ppermute pair (2
    collective-permutes) for the octave — vs L-1 pairs for the
    sequential per-level form it replaces."""
    import jax
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.spatial import (_build_octave_composed_sharded,
                                             composed_halo)
    from sift3d_tpu.pyramid import make_plan, scale_to_unit

    params = DetectorParams()
    plan = make_plan((48, 48, 128), (1.0, 1.0, 1.0), params)
    assert composed_halo(plan, 0) <= 128 // 4
    rng = np.random.default_rng(2)
    vol = scale_to_unit(jnp.asarray(
        rng.normal(size=(48, 48, 128)).astype(np.float32)))

    from sift3d_tpu.pyramid import _build_octave_composed
    hi = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)
    ref = _build_octave_composed(vol, plan, 0,
                                 [(0, plan.num_gpyr_levels, hi)])

    mesh = make_mesh({"z": 4}, jax.devices()[:4])
    fn = jax.jit(lambda v: _build_octave_composed_sharded(
        v, plan, 0, mesh, "z"))
    got = fn(vol)
    scale = float(np.abs(np.asarray(ref)).max())
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() / scale < 1e-6

    hlo = fn.lower(vol).compile().as_text()
    n_cp = hlo.count("collective-permute-start")
    if n_cp == 0:
        n_cp = hlo.count("collective-permute(")
    assert n_cp == 2, f"expected one ppermute pair, HLO has {n_cp}"
