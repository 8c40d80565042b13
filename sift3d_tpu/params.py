"""Detector configuration.

One frozen, hashable dataclass holds every tunable of the pipeline: the five
runtime parameters the reference exposes through setters (peak_thresh,
corner_thresh, num_kp_levels, sigma_n, sigma0 — defaults at
/root/reference/sift3d/sift.c:31-35), the compile-time switches it hides
behind #defines (CUBOID_EXTREMA at sift.c:24, SIFT3D_GAUSS_WIDTH_FCTR at
imutil.c:1264-1266), and the internal constants (sift.c:38-45).

Being hashable, a DetectorParams value participates directly in jit caching:
every distinct configuration compiles its own specialized pipeline.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

# float32 machine epsilon, used for the barycentric stability threshold
# (reference: bary_eps = FLT_EPSILON * 1E1, sift.c:40).
_FLT_EPSILON = 1.1920928955078125e-07

# Descriptor geometry (reference: imtypes_private.h:38-58). These are fixed
# architectural constants of the descriptor, not tunables.
NHIST_PER_DIM = 4
ICOS_NVERT = 12
ICOS_NFACES = 20
HIST_NUMEL = ICOS_NVERT
DESC_NUM_TOTAL_HIST = NHIST_PER_DIM ** 3  # 64
DESC_NUMEL = DESC_NUM_TOTAL_HIST * HIST_NUMEL  # 768
IM_NDIMS = 3


@dataclasses.dataclass(frozen=True)
class DetectorParams:
    """All SIFT3D detector/descriptor parameters. Hashable and immutable."""

    # --- runtime parameters (reference setters, sift.c:499-565) ---
    peak_thresh: float = 0.1       # relative DoG peak threshold, in (0, 1]
    corner_thresh: float = 0.4     # minimum corner score, in [0, 1]
    num_kp_levels: int = 3         # keypoint levels per octave
    sigma_n: float = 1.15          # nominal scale of the input data
    sigma0: float = 1.6            # scale of the base pyramid level

    # --- compile-time switches of the reference ---
    cuboid_extrema: bool = False   # full 80-neighbor extrema test (sift.c:24)
    gauss_width_fctr: float = 3.0  # kernel half-width = ceil(fctr * sigma)

    # --- internal constants (sift.c:38-45); exposed for experimentation ---
    max_eig_ratio: float = 0.90
    ori_grad_thresh: float = 1e-10
    bary_eps: float = _FLT_EPSILON * 1e1
    ori_sig_fctr: float = 1.5
    ori_rad_fctr: float = 3.0
    desc_sig_fctr: float = 7.071067812   # 5 * sqrt(2)
    desc_rad_fctr: float = 2.0
    trunc_thresh: float = 0.2 * 128.0 / DESC_NUMEL

    # --- opt-in extensions (removed from the reference fork; see
    #     CHANGES.md:56 and the dead Hessian macro immacros.h:113-150) ---
    # Subvoxel refinement: quadratic fit of the DoG around each extremum.
    refine_subvoxel: bool = False
    # Hessian edge rejection: reject candidates whose spatial-Hessian
    # eigenvalue magnitudes differ by more than this ratio. None = off.
    edge_thresh: Optional[float] = None

    # --- TPU execution knobs (no reference equivalent) ---
    # Max keypoint candidates retained per pyramid level. None = auto
    # (scales with the level's voxel count). Overflow is reported.
    kp_per_level: Optional[int] = None
    # Matmul precision of the gpyr blur contractions. "highest" = true
    # f32 (6-pass bf16) on all three axes; "high_xy" (default) = bf16x3
    # on the x/y passes with z kept at f32 — measured at 256^3: 100%
    # keypoint-set parity and 100% of descriptors within 1% rel-L2 of
    # "highest" (max 4.2e-3; tools/prec_split.py), ~8% faster end to end.
    # "high" = bf16x3 everywhere (100% keypoint parity but descriptors
    # only 98.8% within the 1% bar — kept opt-in); "default" = one bf16
    # pass (FAILS keypoint parity at 256^3; see CLAUDE.md).
    conv_precision: str = "high_xy"
    # Precision of the descriptor histogram contraction (one MXU pass of
    # the Pallas kernel): "default" = bf16 weight products with f32
    # accumulation — the historical behavior every parity number was
    # verified against (TPU descriptors within 0.05% of the C oracle);
    # "highest" forces the 6-pass f32 MXU mode (~1.6x slower kernel,
    # <= 3e-4 rel-L2 from "default", measured in tools/desc_bf16.py).
    desc_precision: str = "default"
    # Matmul precision of the gpyr "tail" levels — stacked level 0 and
    # levels above the keypoint levels (for the default layout: 0, 4, 5).
    # Their values feed ONLY the DoG strict neighbor comparisons of the
    # extrema stencil (sift.c:797-810): they are never read by orientation
    # or descriptor windows (levels 1..num_kp_levels), never the searched
    # DoG level whose max sets the relative threshold (sift.c:821-829),
    # and never the next octave's downsample source (level L-3). "high"
    # (bf16x3, ~1e-6 rel error) keeps the 256^3 keypoint set identical to
    # "highest" (even conv_precision="high" for ALL levels did); bf16x3 on
    # these three levels halves their MXU passes, ~25% of the gpyr cost.
    conv_tail_precision: str = "high"
    # Octave index from which the gpyr blurs run at full f32 ("highest")
    # regardless of conv_precision / conv_tail_precision. Octave o costs
    # ~8^-o of octave 0, so exact small octaves are nearly free (~2% of
    # gpyr MXU time for the default 2) while removing the bf16x3 noise
    # that can flip near-threshold DoG extrema there: at 256^3 the dense
    # bench's single high-octave keypoint flip (849/850 vs the C oracle
    # under "high_xy") disappears with this default, restoring EXACT
    # keypoint-set parity on both bench workloads. Large values disable.
    conv_exact_from_octave: int = 2
    # Gaussian pyramid implementation: "composed" = per-octave composed
    # operators as batched MXU matmuls (one matmul chain per octave);
    # "incremental" = the reference's sequential per-level chain with each
    # pass in band-sparse diagonal form on the VPU (always f32-exact; the
    # precision knobs above do not apply to it; ~6x slower than composed
    # at 256^3 — XLA materializes the shifted reads — kept as the
    # semantic reference); "chain" = the chained aliased Pallas builder
    # (ops/blur_kernel.chain_octave: every level + DoG written straight
    # into two threaded HBM buffers, f32-exact, one volume read+write per
    # level) for eligible octaves, exact-composed below (a superseded
    # per-level stacked variant measured 10.3 vs 7.5 ms and was removed);
    # "auto" = "chain" on a TPU backend once hardware parity is pinned,
    # composed meanwhile (see pyramid.build_gpyr_and_dog).
    gpyr_impl: str = "auto"
    # --- hinted-pipeline execution policy (no reference equivalent;
    #     see pipeline._hint_cfg / _chunk_plan / _detect_split_packed_fn).
    #     Hashable fields of the params mean every distinct policy
    #     compiles + caches its own programs (the lru_cached program
    #     builders key on the plan, which carries the params). ---
    # Hinted per-octave counts at which orientation + descriptor
    # extraction split per level inside the fused program: each level's
    # windows are then sized by ITS scale (level-0 windows hold ~4x
    # fewer voxels than the octave-max window) — measured -35% on the
    # dense descriptor stage at ~1000 keypoints. Below the thresholds
    # the extra launches and slot padding outweigh it.
    dense_octave_acc: int = 64
    dense_octave_cand: int = 512
    # Sparse octaves split their speculative descriptor extraction into
    # per-level window groups, each sized by its own largest scale
    # (window volume ~ sd^3). False = one octave-max mixed window group
    # (A/B; measured slower on the sparse bench).
    sparse_desc_groups: bool = True
    # Upper bound on separately-dispatched descriptor programs in the
    # SPLIT hinted pipeline: the keypoint payload transfer overlaps
    # descriptor device time and finished chunks stream while later
    # chunks compute. 0 = fully fused single program (the round-3 form).
    split_desc_chunks: int = 4
    # Don't split below this per-chunk window-voxel cost: tiny chunks
    # pay ~0.3-0.5 ms host dispatch overhead without hiding anything.
    min_chunk_cost: int = 3_500_000
    # Hinted capacities are sized to the per-octave elementwise MAX over
    # the last hint_history detections (the envelope), and tight mode
    # engages when the envelope is stable — so a stream of DIFFERENT
    # similar volumes converges to one compiled configuration sized to
    # its recent peak. 1 = size to the last volume only (per-volume
    # equality gating, the round-4 behavior).
    hint_history: int = 4
    # Spatial-bin coordinates fed to the Pallas descriptor kernel:
    # "affine" = prep ships 12 affine coefficients per keypoint (SMEM)
    # plus ONE call-shared [3, N] window-coordinate array, and the kernel
    # rebuilds vb = a + b . (x, y, z) per voxel — skipping the flatten
    # relayout of three [N] f32 arrays per keypoint (the single largest
    # prep cost, tools/prep_micro.py) and half the kernel's HBM input.
    # Masking/bin-assignment decisions still come from the original
    # formula in prep (they zero grot), so only interpolation weights
    # move, by ~ulps. "packed" = flatten vbins like grot (the historical
    # layout; the A/B reference). Measured (tools/vbins_ab.py, 256^3
    # level windows, prep+kernel): affine 89.7/169.3/328.2 us/kp vs
    # packed 97.6/184.0/348.1 at 49^3/61^3/75^3 — a 6-8% stage win with
    # rel max|diff| <= 6e-5, far inside the 1% parity bar.
    desc_vbins: str = "affine"
    # Extrema stencil implementation: "auto" = the Pallas mask kernel
    # (ops/extrema_kernel.py) on TPU for octaves with nz % 128 == 0 and
    # nx % 8 == 0, the XLA shifted-slice stencil otherwise; "xla" forces
    # the XLA path; "pallas" forces the kernel wherever shapes allow;
    # "interpret" runs the kernel in Pallas interpret mode (CPU testing).
    # Both paths produce the exact same candidate set, order, strengths
    # and counts (tests/test_detect.py).
    extrema_impl: str = "auto"

    def __post_init__(self):
        # Mirror the reference setters' range checks (sift.c:499-565).
        if not (0.0 < self.peak_thresh <= 1.0):
            raise ValueError(
                f"peak_thresh must be in (0, 1], got {self.peak_thresh}")
        if not (0.0 <= self.corner_thresh <= 1.0):
            raise ValueError(
                f"corner_thresh must be in [0, 1], got {self.corner_thresh}")
        if self.num_kp_levels < 1:
            raise ValueError(
                f"num_kp_levels must be >= 1, got {self.num_kp_levels}")
        if self.sigma_n < 0.0:
            raise ValueError(f"sigma_n must be >= 0, got {self.sigma_n}")
        if self.sigma0 < 0.0:
            raise ValueError(f"sigma0 must be >= 0, got {self.sigma0}")
        # sigma_n may not exceed the scale of the first pyramid level
        # (set_scales_Pyramid check, imutil.c:1582-1588).
        if self.sigma_n > self.first_level_scale:
            raise ValueError(
                f"sigma_n ({self.sigma_n}) exceeds the scale of the first "
                f"pyramid level ({self.first_level_scale})")
        if self.edge_thresh is not None and self.edge_thresh < 1.0:
            raise ValueError(
                f"edge_thresh must be >= 1 (eigenvalue magnitude ratio), "
                f"got {self.edge_thresh}")
        if self.conv_precision not in ("highest", "high_xy", "high",
                                       "default"):
            raise ValueError(
                f"conv_precision must be 'highest', 'high_xy', 'high' or "
                f"'default', got {self.conv_precision!r}")
        if self.desc_precision not in ("highest", "default"):
            raise ValueError(
                f"desc_precision must be 'highest' or 'default', "
                f"got {self.desc_precision!r}")
        if self.conv_tail_precision not in ("highest", "high", "default"):
            raise ValueError(
                f"conv_tail_precision must be 'highest', 'high' or "
                f"'default', got {self.conv_tail_precision!r}")
        if self.conv_exact_from_octave < 0:
            raise ValueError(
                f"conv_exact_from_octave must be >= 0, "
                f"got {self.conv_exact_from_octave}")
        if self.dense_octave_acc < 1 or self.dense_octave_cand < 1:
            raise ValueError(
                f"dense_octave_acc/cand must be >= 1, got "
                f"{self.dense_octave_acc}/{self.dense_octave_cand}")
        if self.split_desc_chunks < 0:
            raise ValueError(
                f"split_desc_chunks must be >= 0, "
                f"got {self.split_desc_chunks}")
        if self.min_chunk_cost < 0:
            raise ValueError(
                f"min_chunk_cost must be >= 0, got {self.min_chunk_cost}")
        if self.hint_history < 1:
            raise ValueError(
                f"hint_history must be >= 1, got {self.hint_history}")
        if self.desc_vbins not in ("packed", "affine"):
            raise ValueError(
                f"desc_vbins must be 'packed' or 'affine', "
                f"got {self.desc_vbins!r}")
        if self.extrema_impl not in ("auto", "xla", "pallas", "interpret"):
            raise ValueError(
                f"extrema_impl must be 'auto', 'xla', 'pallas' or "
                f"'interpret', got {self.extrema_impl!r}")
        if self.gpyr_impl not in ("auto", "composed", "incremental",
                                  "chain"):
            raise ValueError(
                f"gpyr_impl must be 'auto', 'composed', 'incremental' or "
                f"'chain', got {self.gpyr_impl!r}")

    # --- derived pyramid structure (resize_SIFT3D, sift.c:434-435) ---

    @property
    def first_level(self) -> int:
        return -1  # sift.c:437

    @property
    def num_dog_levels(self) -> int:
        return self.num_kp_levels + 2

    @property
    def num_gpyr_levels(self) -> int:
        return self.num_dog_levels + 1

    def level_scale(self, octave: int, level: int) -> float:
        """Absolute scale of pyramid level (octave, level).

        sigma(o, s) = sigma0 * 2^(o + s/num_kp_levels)
        (set_scales_Pyramid, imutil.c:1578-1579).
        """
        return self.sigma0 * 2.0 ** (octave + level / self.num_kp_levels)

    @property
    def first_level_scale(self) -> float:
        return self.level_scale(0, self.first_level)

    def num_octaves(self, dims: tuple[int, int, int]) -> int:
        """Octave count for an input of the given dimensions.

        last_octave = floor(log2(min dim)) - 3, i.e. the smallest pyramid
        level has >= 8 voxels per dimension (resize_SIFT3D, sift.c:441-454).
        """
        min_dim = min(dims)
        last_octave = int(math.log2(float(min_dim))) - 3
        if last_octave < 0:
            raise ValueError(
                f"input too small: must have at least 8 voxels per "
                f"dimension, got {dims}")
        return last_octave + 1
