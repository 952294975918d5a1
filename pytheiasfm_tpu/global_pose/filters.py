"""View-graph filtering between global-SfM stages.

Re-design of `/root/reference/src/theia/sfm/`:
`filter_view_pairs_from_orientation.h:59`,
`filter_view_graph_cycles_by_rotation.h:47` (triplet loop consistency) and
`filter_view_pairs_from_relative_translation.cc:165-278` (1DSfM, Wilson &
Snavely ECCV'14). The per-edge math (loop rotations, axis projections) is
batched on device; graph surgery stays on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..math import graph as graphops
from ..ops import rotation as rotops

__all__ = [
    "filter_view_pairs_from_orientation",
    "filter_view_graph_cycles_by_rotation",
    "filter_view_pairs_from_relative_translation",
    "extract_maximally_parallel_rigid_subgraph",
]


@jax.jit
def _orientation_edge_angles(orient_i, orient_j, rel_aa):
    """Angle of R_ij · (R_j R_iᵀ)ᵀ per edge, degrees."""
    Ri = jax.vmap(rotops.angle_axis_to_rotation_matrix)(orient_i)
    Rj = jax.vmap(rotops.angle_axis_to_rotation_matrix)(orient_j)
    Rrel = jax.vmap(rotops.angle_axis_to_rotation_matrix)(rel_aa)
    loop = jnp.einsum("eab,ebc,edc->ead", Rrel, Ri, Rj)  # R_rel · R_i · R_jᵀ
    aa = jax.vmap(rotops.rotation_matrix_to_angle_axis)(loop)
    return jnp.degrees(jnp.linalg.norm(aa, axis=-1))


def filter_view_pairs_from_orientation(
    view_graph, orientations: dict, max_relative_rotation_difference_degrees: float = 5.0
):
    """Remove edges whose relative rotation disagrees with the global
    orientations. Parity: `theia::FilterViewPairsFromOrientation`
    (`filter_view_pairs_from_orientation.h:59`). Returns #removed."""
    if not view_graph.edges:
        return 0
    v1, v2, rel_rot, _, _ = view_graph.edge_arrays()
    oi = np.stack([orientations[v] for v in v1])
    oj = np.stack([orientations[v] for v in v2])
    angles = np.asarray(
        _orientation_edge_angles(jnp.asarray(oi), jnp.asarray(oj), jnp.asarray(rel_rot))
    )
    bad = angles > max_relative_rotation_difference_degrees
    for k in np.flatnonzero(bad):
        view_graph.remove_edge(int(v1[k]), int(v2[k]))
    return int(bad.sum())


@jax.jit
def _triplet_loop_angles(rot_ij, rot_jk, rot_ik):
    """Angle of R_ikᵀ · R_jk · R_ij per triplet, degrees."""
    Rij = jax.vmap(rotops.angle_axis_to_rotation_matrix)(rot_ij)
    Rjk = jax.vmap(rotops.angle_axis_to_rotation_matrix)(rot_jk)
    Rik = jax.vmap(rotops.angle_axis_to_rotation_matrix)(rot_ik)
    loop = jnp.einsum("tba,tbc,tcd->tad", Rik, Rjk, Rij)
    aa = jax.vmap(rotops.rotation_matrix_to_angle_axis)(loop)
    return jnp.degrees(jnp.linalg.norm(aa, axis=-1))


def filter_view_graph_cycles_by_rotation(
    view_graph, max_loop_error_degrees: float = 3.0
):
    """Keep only edges participating in at least one rotation-consistent
    triplet. Parity: `theia::FilterViewGraphCyclesByRotation`
    (`filter_view_graph_cycles_by_rotation.h:47`). Returns #removed."""
    v1, v2, rel_rot, _, _ = view_graph.edge_arrays()
    E = len(v1)
    if E == 0:
        return 0
    edges = np.stack([v1, v2], -1)
    triplets = graphops.extract_triplets(edges)
    keep = np.zeros(E, bool)
    if len(triplets):
        angles = np.asarray(
            _triplet_loop_angles(
                jnp.asarray(rel_rot[triplets[:, 0]]),
                jnp.asarray(rel_rot[triplets[:, 1]]),
                jnp.asarray(rel_rot[triplets[:, 2]]),
            )
        )
        good = triplets[angles < max_loop_error_degrees]
        keep[np.unique(good)] = True
    removed = np.flatnonzero(~keep)
    for k in removed:
        view_graph.remove_edge(int(v1[k]), int(v2[k]))
    return int(len(removed))


def filter_view_pairs_from_relative_translation(
    view_graph,
    orientations: dict,
    num_iterations: int = 48,
    translation_projection_tolerance: float = 0.08,
    rng: np.random.Generator | None = None,
):
    """1DSfM outlier filtering of relative translations.

    Parity: `theia::FilterViewPairsFromRelativeTranslation`
    (`filter_view_pairs_from_relative_translation.cc:165-278`): project the
    world-frame pairwise directions onto `num_iterations` random unit axes
    (the reference fans these out over a ThreadPool; here one vmapped
    batch), order the views per axis with the greedy MFAS heuristic, and
    accumulate how badly each edge violates each ordering. Edges with mean
    violation above tolerance are removed. Returns #removed.
    """
    if not view_graph.edges:
        return 0
    rng = rng or np.random.default_rng(0)
    view_ids = view_graph.view_ids()
    index = {v: i for i, v in enumerate(view_ids)}
    V = len(view_ids)
    v1, v2, _, rel_pos, _ = view_graph.edge_arrays()
    E = len(v1)
    ei = np.asarray([index[v] for v in v1], np.int32)
    ej = np.asarray([index[v] for v in v2], np.int32)
    orient = np.stack([orientations[v] for v in v1])

    from .position_estimator import relative_translations_to_world

    # note: relative_translations_to_world expects per-view orientations
    # indexed by edge; pass edge-aligned orientations with identity gather.
    t_world = np.asarray(
        relative_translations_to_world(
            jnp.asarray(orient),
            jnp.arange(E, dtype=np.int32),
            jnp.asarray(rel_pos),
        )
    )

    axes = rng.normal(size=(num_iterations, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    proj = t_world @ axes.T  # [E, A] signed projections

    bad_weight = np.zeros(E)
    for a in range(num_iterations):
        w = proj[:, a]
        # Orient each edge along its positive projection for the ordering.
        src = np.where(w >= 0, ei, ej)
        dst = np.where(w >= 0, ej, ei)
        order = graphops.mfas_ordering(
            np.stack([src, dst], -1), np.abs(w), V
        )
        # Violation: edge direction says src before dst; penalty when the
        # ordering disagrees, weighted by projection magnitude.
        disagree = order[src] > order[dst]
        bad_weight += np.abs(w) * disagree
    bad = bad_weight / num_iterations > translation_projection_tolerance
    for k in np.flatnonzero(bad):
        view_graph.remove_edge(int(v1[k]), int(v2[k]))
    return int(bad.sum())


@jax.jit
def _parallel_components(null_space):
    """Membership scan for the maximally parallel rigid component.

    null_space [N, 3, K]: per-view 3-row blocks of the translation-constraint
    null space. For each candidate fixed view f, subtract its block from all
    blocks (fixing f at the origin); views whose residual block is ~zero or
    whose normalized block is parallel (per-dimension) to another candidate's
    belong to the same rigid component (the parallel-ness test of
    `extract_maximally_parallel_rigid_subgraph.cc:100-165`). Returns
    membership [N, N]: member[f] is the component when fixing view f.
    """
    kMaxCos = 1e-5
    kMaxNorm = 1e-8
    N = null_space.shape[0]

    def one(f):
        M = null_space - null_space[f]  # [N, 3, K]
        norms = jnp.linalg.norm(M, axis=-1)  # [N, 3]
        row_ok = norms > kMaxNorm
        zero = jnp.all(~row_ok, axis=-1)
        Mn = M / jnp.maximum(norms, 1e-300)[..., None]
        dots = jnp.abs(jnp.einsum("idk,jdk->ijd", Mn, Mn))
        # Per dimension, two blocks are compatible when both rows are
        # near-zero (no constraint difference) or both carry signal and are
        # parallel. A zero-vs-signal mismatch means different rigidity — the
        # reference gets this via Eigen's normalize leaving exact zero rows
        # zero (dot 0 -> cos distance 1); the explicit norm test here is
        # robust to 1e-15 noise rows as well.
        both_ok = row_ok[:, None, :] & row_ok[None, :, :]
        both_zero = (~row_ok)[:, None, :] & (~row_ok)[None, :, :]
        dim_parallel = (both_ok & (1.0 - dots < kMaxCos)) | both_zero
        eligible = (~zero) & (jnp.arange(N) != f)
        pair = (
            jnp.all(dim_parallel, axis=-1)
            & eligible[:, None]
            & eligible[None, :]
            & (jnp.arange(N)[:, None] != jnp.arange(N)[None, :])
        )
        member = zero | jnp.any(pair, axis=1)
        return member.at[f].set(True)

    return jax.vmap(one)(jnp.arange(N))


def extract_maximally_parallel_rigid_subgraph(orientations: dict, view_graph):
    """Keep only the views in the maximal parallel-rigid component.

    Parity: `theia::ExtractMaximallyParallelRigidSubgraph`
    (`extract_maximally_parallel_rigid_subgraph.h:63`, algorithm
    `extract_maximally_parallel_rigid_subgraph.cc:167-225`): build the
    constraint matrix t_ij x (c_j - c_i) = 0 over all edges (with t_ij
    rotated into the world frame), take the null space of its normal matrix,
    and find the largest set of views whose null-space blocks are parallel
    after fixing one view — those positions are determined up to a global
    scale, i.e. the parallel-rigid subgraph. Views outside it are removed
    from the graph. Returns the number of removed views.
    """
    view_ids = [v for v in view_graph.view_ids() if v in orientations]
    N = len(view_ids)
    if N < 2 or not view_graph.edges:
        return 0
    index = {v: i for i, v in enumerate(view_ids)}
    v1, v2, _rel_rot, rel_pos, _ = view_graph.edge_arrays()
    keep_edges = [
        k for k in range(len(v1)) if v1[k] in index and v2[k] in index
    ]
    E = len(keep_edges)
    if E == 0:
        return 0

    A = np.zeros((3 * E, 3 * N))
    for row, k in enumerate(keep_edges):
        R1 = np.asarray(
            rotops.angle_axis_to_rotation_matrix(
                jnp.asarray(orientations[v1[k]])
            )
        )
        t = R1.T @ rel_pos[k]
        cx = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
        )
        i, j = index[v1[k]], index[v2[k]]
        A[3 * row : 3 * row + 3, 3 * i : 3 * i + 3] = -cx
        A[3 * row : 3 * row + 3, 3 * j : 3 * j + 3] = cx

    # Null space of A via SVD (the reference LU-kernels A^T A).
    _, s, vt = np.linalg.svd(A, full_matrices=True)
    tol = max(A.shape) * np.finfo(float).eps * (s[0] if len(s) else 1.0)
    rank = int((s > max(tol, 1e-10)).sum())
    ns = vt[rank:].T  # [3N, K]
    if ns.shape[1] == 0:
        return 0

    member = np.asarray(
        _parallel_components(jnp.asarray(ns.reshape(N, 3, -1)))
    )
    best = member[np.argmax(member.sum(axis=1))]
    removed = 0
    for i, v in enumerate(view_ids):
        if not best[i]:
            if view_graph.has_view(v):
                # Dropping a view's last edge may implicitly remove its
                # neighbors too; count every view excluded from the component.
                view_graph.remove_view(v)
            removed += 1
    return removed
