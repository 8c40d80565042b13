"""Golden parity tests: every pipeline stage vs the C reference oracle.

These run the compiled reference (tests/oracle) and the TPU implementation on
the same phantom and compare per-stage intermediates: Gaussian pyramid levels,
DoG levels, extrema candidate sets, final keypoints (rows, R matrices, the
stale-strength quirk), and descriptors.
"""

import numpy as np
import pytest

from conftest import make_phantom
from oracle import oracle_available, run_oracle

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="C oracle unavailable")

N = 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import sift3d_tpu as s3d
    from sift3d_tpu.pyramid import make_plan

    vol = make_phantom(N)
    res = run_oracle(vol, tmp_path_factory.mktemp("oracle64"))
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)
    plan = make_plan(vol.shape, (1.0, 1.0, 1.0), det.params)
    return vol, res, det, kp, plan


def test_pyramid_parity(setup):
    vol, res, det, kp, plan = setup
    gpyr = det._gpyr
    from sift3d_tpu.pyramid import build_dog
    dog = build_dog(gpyr)
    for o in range(plan.num_octaves):
        for i in range(plan.num_gpyr_levels):
            ref = res.gpyr_level(o, i, plan.octave_dims[o])
            got = np.asarray(gpyr[o][i])
            scale = np.max(np.abs(ref)) + 1e-30
            assert np.max(np.abs(ref - got)) / scale < 1e-5, (o, i)
        for i in range(plan.num_dog_levels):
            ref = res.dog_level(o, i, plan.octave_dims[o])
            got = np.asarray(dog[o][i])
            scale = np.max(np.abs(ref)) + 1e-30
            assert np.max(np.abs(ref - got)) / scale < 1e-4, (o, i)


def test_keypoint_parity(setup):
    """Keypoint rows must match the oracle exactly: coordinates, octave,
    scale, R (to f32 tolerance), and the stale strength values."""
    vol, res, det, kp, plan = setup
    ref = res.keypoints
    assert len(kp) == len(ref)
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.array_equal(kp.octave, ref[:, 4].astype(np.int32))
    assert np.allclose(kp.sd, ref[:, 6], rtol=1e-12)
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
    assert np.max(np.abs(kp.R.reshape(-1, 9) - ref[:, 7:16])) < 1e-3


def test_true_strength_mode(setup):
    """With stale_strength_compat=False, each keypoint's strength equals
    |DoG| at its (octave, level, coords) — the value the reference stores
    at detection before copy_Keypoint drops it (sift.c:372-384) —
    checked against the oracle's own DoG dumps (dog_o*_l*.bin)."""
    import sift3d_tpu as s3d
    vol, res, det_c, kp_compat, plan = setup
    det = s3d.SIFT3D(stale_strength_compat=False)
    kp = det.detect_keypoints(vol)
    assert np.array_equal(kp.coords, kp_compat.coords)
    assert len(kp) > 0
    dogs = {}
    for j in range(len(kp)):
        o, li = int(kp.octave[j]), int(kp.level[j])
        key = (o, li + 1)   # keypoint level s -> center DoG index s+1
        if key not in dogs:
            dogs[key] = res.dog_level(o, li + 1, plan.octave_dims[o])
        x, y, z = (int(v) for v in kp.coords[j])
        ref = abs(float(dogs[key][x, y, z]))
        scale = float(np.max(np.abs(dogs[key])))
        assert abs(float(kp.strength[j]) - ref) <= 1e-4 * scale, \
            (j, o, li, kp.strength[j], ref)


def _tie_phantom(n=96, cell=24, seed=3):
    """One random multi-blob cell tiled periodically: interior cells see
    identical neighborhoods (the banded-matmul conv is exactly
    translation-invariant away from the mirror borders), so their
    candidates carry EXACTLY equal strengths — ties that straddle a
    top-K cut. Measured: 121 keypoints, every strength duplicated
    across 8 tie groups."""
    rng = np.random.default_rng(seed)
    x, y, z = np.meshgrid(*([np.arange(cell)] * 3), indexing="ij")
    c = np.zeros((cell,) * 3, np.float64)
    for _ in range(6):
        ctr = rng.uniform(4, cell - 4, 3)
        s = rng.uniform(1.5, 3.5, 3)
        amp = rng.uniform(0.4, 1.0) * rng.choice([-1, 1])
        c += amp * np.exp(-(((x - ctr[0]) / s[0]) ** 2
                            + ((y - ctr[1]) / s[1]) ** 2
                            + ((z - ctr[2]) / s[2]) ** 2))
    return np.tile(c.astype(np.float32), (n // cell,) * 3)


def test_top_k_tie_break_strength_multiset(tmp_path):
    """Top-K selection at a strength tie (VERDICT r3 #7): the reference
    CLI sorts with qsort (unstable, sift.c:1885-1900; top-100 cut at
    cli/kpSift3D.c:122), so WHICH tied keypoint survives the cut is
    unspecified there. The qsort-invariant property is the multiset of
    selected strengths — pinned here against the oracle's keypoints —
    and OUR tie-break is pinned deterministic: sort_by_strength uses a
    stable descending argsort, so ties keep candidate order."""
    import sift3d_tpu as s3d

    vol = _tie_phantom()
    res = run_oracle(vol, tmp_path / "oracle_tie")
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)
    ref_kp = res.keypoints
    assert len(kp) == len(ref_kp)
    np.testing.assert_allclose(np.sort(kp.strength),
                               np.sort(ref_kp[:, 0]), atol=1e-6)

    s_desc = np.sort(kp.strength)[::-1]
    ties = np.nonzero(s_desc[:-1] == s_desc[1:])[0]
    assert len(ties) > 0, "phantom produced no exact strength ties"
    K = int(ties[len(ties) // 2]) + 1   # cut right inside a tie group
    assert s_desc[K - 1] == s_desc[K]

    top = kp.sort_by_strength(K)
    # multiset equality with the oracle's own top-K strengths (the only
    # property C's unstable qsort guarantees)
    ref_desc = np.sort(ref_kp[:, 0])[::-1]
    np.testing.assert_allclose(np.sort(np.asarray(top.strength))[::-1],
                               ref_desc[:K], atol=1e-6)
    # our deterministic tie-break: stable argsort == candidate order
    order = np.argsort(-kp.strength, kind="stable")
    np.testing.assert_array_equal(np.asarray(top.coords),
                                  np.asarray(kp.coords)[order[:K]])


def test_descriptor_parity(setup):
    vol, res, det, kp, plan = setup
    desc = det.extract_descriptors(kp)
    ref = res.descriptors
    assert desc.data.shape == (len(ref), 768)
    assert np.array_equal(desc.xyz, ref[:, :3])
    assert np.allclose(desc.sd, ref[:, 3], rtol=1e-6)
    # >= 99% of descriptors within 1% relative L2 error
    num = np.linalg.norm(ref[:, 4:] - desc.data, axis=1)
    den = np.linalg.norm(ref[:, 4:], axis=1) + 1e-30
    rel = num / den
    assert np.mean(rel < 0.01) >= 0.99, rel
    # and tight elementwise agreement on the vast majority of elements
    assert np.mean(np.abs(ref[:, 4:] - desc.data) < 1e-5) > 0.999


def test_csv_format_parity(setup, tmp_path):
    """Our CSV writers produce the reference's exact column layout."""
    vol, res, det, kp, plan = setup
    kp_path = tmp_path / "keys.csv"
    kp.save(str(kp_path))
    ref_rows = np.loadtxt(res.outdir / "keys.csv", delimiter=",")
    got_rows = np.loadtxt(kp_path, delimiter=",")
    assert ref_rows.shape == got_rows.shape
    # columns: strength x y z o sd exactly; R to f32 tolerance (value parity
    # is covered by test_keypoint_parity — this test checks the format)
    assert np.allclose(ref_rows[:, :6], got_rows[:, :6], atol=1e-6)
    assert np.allclose(ref_rows[:, 6:], got_rows[:, 6:], atol=1e-3)

    desc = det.extract_descriptors(kp)
    d_path = tmp_path / "desc.csv.gz"
    desc.save(str(d_path))
    ref_d = np.loadtxt(res.outdir / "desc.csv", delimiter=",")
    got_d = np.loadtxt(d_path, delimiter=",")
    assert ref_d.shape == got_d.shape
    assert np.allclose(ref_d[:, :3], got_d[:, :3], atol=1e-5)
    assert np.mean(np.abs(ref_d[:, 3:] - got_d[:, 3:]) < 1e-4) > 0.999
