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
