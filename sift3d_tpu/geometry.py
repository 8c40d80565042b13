"""Icosahedral histogram geometry.

Replicates init_geometry (/root/reference/sift3d/sift.c:148-259): a regular
icosahedron inscribed in the unit sphere; 12 vertices are the histogram bins,
20 faces define the barycentric interpolation. Each face's vertices are
reordered (v0 <-> v1) if the face normal points inward — note the reference
swaps only the vertex *positions*, not the stored bin indices (sift.c:237-247
swaps tri->v but never tri->idx), so for swapped faces barycentric weight j
accumulates into the bin of the *unswapped* index order. We replicate that
exactly.

The Moller-Trumbore ray/triangle intersection (cart2bary, sift.c:268-327;
icos_hist_bin, sift.c:1254-1291) is reformulated for TPU: for gradient g and
face f,
    det  = g . (e2 x e1)
    bary_y = g . (e2 x (-v0)) / det        (= t.p / det with t = -v0)
    bary_z = g . ((-v0) x e1) / det        (= g.q / det)
    bary_x = 1 - bary_y - bary_z
    k    = (e2 . ((-v0) x e1)) / det       (face constant / det)
so the per-voxel work for all 20 faces is one [3] x [3, 60] matmul plus
elementwise ops. A face is hit iff |det| >= bary_eps, all bary >= -bary_eps,
and k >= 0; the first hit in face order wins (sift.c:1277-1286).
"""

from __future__ import annotations

import numpy as np

from .params import ICOS_NFACES, ICOS_NVERT

_GR = 1.6180339887  # golden ratio (sift.c:48)

_VERTS = np.array([
    [0, 1, _GR], [0, -1, _GR], [0, 1, -_GR], [0, -1, -_GR],
    [1, _GR, 0], [-1, _GR, 0], [1, -_GR, 0], [-1, -_GR, 0],
    [_GR, 0, 1], [-_GR, 0, 1], [_GR, 0, -1], [-_GR, 0, -1],
], dtype=np.float32)

_FACES = np.array([
    [0, 1, 8], [0, 8, 4], [0, 4, 5], [0, 5, 9], [0, 9, 1],
    [1, 6, 8], [8, 6, 10], [8, 10, 4], [4, 10, 2], [4, 2, 5],
    [5, 2, 11], [5, 11, 9], [9, 11, 7], [9, 7, 1], [1, 7, 6],
    [3, 6, 7], [3, 7, 11], [3, 11, 2], [3, 2, 10], [3, 10, 6],
], dtype=np.int32)


def _build():
    # Normalize vertices to unit length in float32 (sift.c:226-228).
    verts = _VERTS / np.sqrt(
        np.sum(_VERTS * _VERTS, axis=1, keepdims=True)).astype(np.float32)

    tri_v = verts[_FACES]  # [20, 3(vertex), 3(xyz)], pre-swap
    # Outward-normal check and v0<->v1 swap (sift.c:231-247).
    n = np.cross(tri_v[:, 2] - tri_v[:, 1], tri_v[:, 1] - tri_v[:, 0])
    inward = np.einsum("fi,fi->f", n, tri_v[:, 0]) < 0
    tri_v[inward] = tri_v[inward][:, [1, 0, 2]]
    return verts.astype(np.float32), tri_v.astype(np.float32)


VERTS, TRI_V = _build()

# Precomputed Moller-Trumbore constants, float32.
_E1 = TRI_V[:, 1] - TRI_V[:, 0]              # [20, 3]
_E2 = TRI_V[:, 2] - TRI_V[:, 0]
_T = -TRI_V[:, 0]
_Q = np.cross(_T, _E1)                       # [20, 3]
# det = g . DET_VEC ; bary_y = g . Y_VEC / det ; bary_z = g . Z_VEC / det
DET_VEC = np.cross(_E2, _E1).astype(np.float32)
Y_VEC = np.cross(_E2, _T).astype(np.float32)
Z_VEC = _Q.astype(np.float32)
# k = K_CONST / det (sign of k is all the hit test uses)
K_CONST = np.einsum("fi,fi->f", _E2, _Q).astype(np.float32)

# One [3, 60] matrix: columns f, 20+f, 40+f give det_f, ynum_f, znum_f.
MT_MATRIX = np.concatenate([DET_VEC.T, Y_VEC.T, Z_VEC.T],
                           axis=1).astype(np.float32)  # [3, 60]

# Bary -> vertex-bin scatter matrix, honoring the reference's unswapped
# indices: weight j of face f goes to bin _FACES[f, j].
E_BARY = np.zeros((ICOS_NFACES, 3, ICOS_NVERT), dtype=np.float32)
for f in range(ICOS_NFACES):
    for j in range(3):
        E_BARY[f, j, _FACES[f, j]] = 1.0
E_BARY_2D = E_BARY.reshape(ICOS_NFACES * 3, ICOS_NVERT)  # [60, 12]

FACE_IDX = _FACES


def _paired_layout():
    """Antipodal-pair face layout for the descriptor kernels, or None.

    The icosahedron is centrally symmetric: its 20 faces form 10 antipodal
    pairs whose Moller-Trumbore rows are EXACT f32 negations of each other
    (negating every vertex coordinate negates each product in the cross/
    dot chains exactly). A gradient ray can hit at most one face of a pair
    (det >= bary_eps and -det >= bary_eps are mutually exclusive), so the
    per-voxel face-selection chain can run on 10 pair rows instead of 20
    face rows, with the candidate face of each pair picked by the det
    sign. This also uses K_CONST > 0 (all outward-oriented faces): the
    reference's k-sign test (sift.c:1277-1286, k = K_CONST / det >= 0)
    then reduces to det >= 0 — already implied by det >= bary_eps.

    Exactness of every relation is VERIFIED bitwise here against the
    f32 constants; returns None (callers keep the generic 20-face path)
    if the geometry ever stops satisfying them.

    Returns dict with:
      mt40      [40, 3] rows: [0:10] det of the pair's first face;
                [10:20] the "shared" numerator (Y for pairs whose Y rows
                negate across the pair, else Z); [20:30] the first face's
                other numerator; [30:40] the second face's other numerator.
      ta        [10] bool: True where the shared numerator is Y.
      pri       [10, 2] f32: face-order priorities (first, second) —
                first-hit-wins runs on these (sift.c:1277).
      eb_paired [36, 20] vertex-slot one-hots with columns in
                [firsts..., seconds...] order.
    """
    if not (K_CONST > 0).all():
        return None
    pairs = []
    used = set()
    for f in range(ICOS_NFACES):
        if f in used:
            continue
        mates = [f2 for f2 in range(ICOS_NFACES)
                 if f2 != f and np.array_equal(DET_VEC[f2], -DET_VEC[f])]
        if len(mates) != 1 or mates[0] in used:
            return None
        used.update((f, mates[0]))
        pairs.append((f, mates[0]))
    if len(pairs) != 10:
        return None

    mt40 = np.zeros((40, 3), np.float32)
    ta = np.zeros(10, bool)
    pri = np.zeros((10, 2), np.float32)
    order = []
    for p, (f, f2) in enumerate(pairs):
        mt40[p] = DET_VEC[f]
        if np.array_equal(Y_VEC[f2], -Y_VEC[f]):
            ta[p] = True
            mt40[10 + p] = Y_VEC[f]
            mt40[20 + p] = Z_VEC[f]
            mt40[30 + p] = Z_VEC[f2]
        elif np.array_equal(Z_VEC[f2], -Z_VEC[f]):
            mt40[10 + p] = Z_VEC[f]
            mt40[20 + p] = Y_VEC[f]
            mt40[30 + p] = Y_VEC[f2]
        else:
            return None
        pri[p] = (f, f2)
    order = [f for f, _ in pairs] + [f2 for _, f2 in pairs]

    eb = np.concatenate([E_BARY[:, j, :].T for j in range(3)])  # [36, 20]
    return {"mt40": mt40, "ta": ta, "pri": pri,
            "eb_paired": np.ascontiguousarray(eb[:, order])}


PAIRED_LAYOUT = _paired_layout()
