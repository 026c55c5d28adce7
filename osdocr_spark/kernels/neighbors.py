"""Directional geometric semi-joins between blocks of one document.

Vectorized re-implementations of the reference's O(N²) Python nested loops
(``O/ocr_tree_module/ocr_tree.py:813-951``): for a target block, select
blocks intersecting its infinite strip extension in a direction, then prune
non-nearest neighbors with a pairwise dominance anti-join.  N is the number
of blocks in one document (tens), so the (k,k) broadcasts are trivial.

These feed both the classifier (``boxes_directly_above`` in
``categorize_box``, ``ocr_tree_analyser.py:1120-1165``) and the reading-order
graph (``topologic_graph``, ``ocr_tree_analyser.py:1283-1310``).
"""

from __future__ import annotations

import numpy as np

from . import geometry as g

__all__ = ["directly_below", "directly_right", "directly_above",
           "below", "right", "above", "left", "neighbor_tables",
           "neighbor_matrices"]


def _strip_extended_vertical(bb: np.ndarray, i: int, all_bottom: int) -> np.ndarray:
    """Target box extended to a vertical strip top=0..max bottom
    (``ocr_tree.py:818-821``)."""
    eb = bb[i].copy()
    eb[g.T] = 0
    eb[g.B] = all_bottom
    return eb


def below(bb: np.ndarray, i: int, cand: np.ndarray) -> np.ndarray:
    """``boxes_below`` (``ocr_tree.py:813-824``): candidates with
    ``top > target.top`` intersecting the vertical strip extension."""
    if len(cand) == 0:
        return cand
    eb = _strip_extended_vertical(bb, i, int(bb[cand, g.B].max()))
    hit = (bb[cand, g.T] > bb[i, g.T]) & g.intersects(bb[cand], eb[None, :])
    return cand[hit]


def right(bb: np.ndarray, i: int, cand: np.ndarray) -> np.ndarray:
    """``boxes_right`` (``ocr_tree.py:826-837``)."""
    if len(cand) == 0:
        return cand
    eb = bb[i].copy()
    eb[g.L] = 0
    eb[g.R] = int(bb[cand, g.R].max())
    hit = (bb[cand, g.L] > bb[i, g.L]) & g.intersects(bb[cand], eb[None, :])
    return cand[hit]


def above(bb: np.ndarray, i: int, cand: np.ndarray) -> np.ndarray:
    """``boxes_above`` (``ocr_tree.py:839-850``): candidates with
    ``bottom < target.bottom`` intersecting the vertical strip extension."""
    if len(cand) == 0:
        return cand
    eb = _strip_extended_vertical(bb, i, int(bb[cand, g.B].max()))
    hit = (bb[cand, g.B] < bb[i, g.B]) & g.intersects(bb[cand], eb[None, :])
    return cand[hit]


def left(bb: np.ndarray, i: int, cand: np.ndarray) -> np.ndarray:
    """``boxes_left`` (``ocr_tree.py:852-863``)."""
    if len(cand) == 0:
        return cand
    eb = bb[i].copy()
    eb[g.L] = 0
    eb[g.R] = int(bb[cand, g.R].max())
    hit = (bb[cand, g.R] < bb[i, g.R]) & g.intersects(bb[cand], eb[None, :])
    return cand[hit]


def _dominance_prune(bb: np.ndarray, picked: np.ndarray, axis_top: int,
                     later: str) -> np.ndarray:
    """Drop b1 if some other picked b2 overlaps it on the extension axis and
    b1 starts strictly *later* than b2 (``ocr_tree.py:879-894`` et al.)."""
    k = len(picked)
    if k <= 1:
        return picked
    boxes = bb[picked]
    if later == "top_greater":       # directly_below: b1.top > b2.top invalid
        pair = g.intersects(boxes[:, None, :], boxes[None, :, :], extend_vertical=True, inside=True)
        worse = boxes[:, None, g.T] > boxes[None, :, g.T]
    elif later == "left_greater":    # directly_right: b1.left > b2.left invalid
        pair = g.intersects(boxes[:, None, :], boxes[None, :, :], extend_horizontal=True, inside=True)
        worse = boxes[:, None, g.L] > boxes[None, :, g.L]
    else:                             # directly_above: b1.bottom < b2.bottom invalid
        pair = g.intersects(boxes[:, None, :], boxes[None, :, :], extend_vertical=True, inside=True)
        worse = boxes[:, None, g.B] < boxes[None, :, g.B]
    same = np.eye(k, dtype=bool)
    invalid = ((pair & worse) & ~same).any(axis=1)
    return picked[~invalid]


def neighbor_tables(bb: np.ndarray, idxs: np.ndarray,
                    kinds: tuple = ("below", "right", "above")) -> dict:
    """All-pairs ``directly_below``/``directly_right``/``directly_above``
    for one block set in ONE vectorized pass — the ordering path asks for
    every block's neighbors, so n separate strip+prune calls redo the same
    pairwise overlap tests n times.

    Exactness notes (A/B-verified against the per-call functions):

    - the vertical strip's ``all_bottom`` bound is vacuous for candidates
      drawn from the same set (every candidate's top ≤ its bottom ≤ the
      max), so the strip test reduces to pairwise x-overlap;
    - ``inside=True`` in the dominance pair test is redundant (containment
      implies axis overlap for well-formed boxes).

    Returns ``{"below"|"right"|"above": {i: [j, ...]}}`` with neighbor lists
    in ``idxs`` order (matching the per-call candidate order
    ``idxs[idxs != i]``); ``kinds`` restricts which directions are computed
    (callers like the classifier only need one).
    """
    k = len(idxs)
    out: dict[str, dict[int, list[int]]] = {kd: {} for kd in kinds}
    if k == 0:
        return out
    mats = neighbor_matrices(bb, idxs, kinds)
    for kind in kinds:
        direct = mats[kind]
        tbl = out[kind]
        for a in range(k):
            tbl[int(idxs[a])] = [int(idxs[b]) for b in np.nonzero(direct[a])[0]]
    return out


def neighbor_matrices(bb: np.ndarray, idxs: np.ndarray,
                      kinds: tuple = ("below", "right", "above")) -> dict:
    """The matrix form of :func:`neighbor_tables`: ``direct[a, b]`` = block
    ``idxs[b]`` is a direct neighbor of ``idxs[a]`` in the given direction.
    Same math; vectorized consumers (the classifier) index the rows
    directly instead of paying the per-block Python list build."""
    k = len(idxs)
    if k == 0:
        return {kd: np.zeros((0, 0), dtype=bool) for kd in kinds}
    bx = bb[idxs]
    L_, R_, T_, B_ = bx[:, g.L], bx[:, g.R], bx[:, g.T], bx[:, g.B]
    xov = (L_[:, None] <= R_[None, :]) & (R_[:, None] >= L_[None, :])
    yov = ((T_[:, None] <= T_[None, :]) & (B_[:, None] >= T_[None, :])) \
        | ((T_[None, :] <= T_[:, None]) & (B_[None, :] >= T_[:, None]))
    # inside[j, i]: box j fully inside box i
    inside = (L_[:, None] >= L_[None, :]) & (R_[:, None] <= R_[None, :]) \
        & (T_[:, None] >= T_[None, :]) & (B_[:, None] <= B_[None, :])
    not_inside = ~inside.T  # [i, j]: j not inside i
    eye = np.eye(k, dtype=bool)

    # hit matrices + dominance anti-joins per direction:
    # invalid[i, j] = ∃k∈hit[i]: pair(j,k) & j later
    spec = {
        "below": lambda: ((T_[None, :] > T_[:, None]) & not_inside & xov,
                          xov & (T_[:, None] > T_[None, :]) & ~eye),
        "right": lambda: ((R_[None, :] > R_[:, None]) & not_inside & yov & ~xov,
                          yov & (L_[:, None] > L_[None, :]) & ~eye),
        "above": lambda: ((B_[None, :] < B_[:, None]) & not_inside & xov,
                          xov & (B_[:, None] < B_[None, :]) & ~eye),
    }
    out = {}
    for kind in kinds:
        hit, m = spec[kind]()
        # float32 accumulation via BLAS sgemm (r5: numpy integer matmul has
        # no BLAS path — the int32 product was the dense-page hot spot).
        # Exactness: summands are 0/1 and a row sum is ≤ k ≪ 2²⁴, so every
        # partial sum is exactly representable in float32 regardless of
        # BLAS accumulation order; the r2 int8-wrap hazard (>127 matching
        # entries) cannot recur (pinned by the >255-block composed family).
        out[kind] = hit & ~(
            hit.astype(np.float32) @ m.T.astype(np.float32) > 0.5)
    return out


def directly_below(bb: np.ndarray, i: int, cand: np.ndarray) -> np.ndarray:
    """``boxes_directly_below`` (``ocr_tree.py:867-894``): strip semi-join +
    not-inside filter + nearest-neighbor dominance anti-join."""
    if len(cand) == 0:
        return cand
    eb = _strip_extended_vertical(bb, i, int(bb[cand, g.B].max()))
    hit = (
        (bb[cand, g.T] > bb[i, g.T])
        & ~g.is_inside(bb[cand], bb[i][None, :])
        & g.intersects(bb[cand], eb[None, :])
    )
    return _dominance_prune(bb, cand[hit], g.T, "top_greater")


def directly_right(bb: np.ndarray, i: int, cand: np.ndarray) -> np.ndarray:
    """``boxes_directly_right`` (``ocr_tree.py:897-925``): right of target's
    right edge, horizontally-extended intersect, and *not* intersecting the
    vertically-extended target (i.e. no x-overlap)."""
    if len(cand) == 0:
        return cand
    hit = (
        (bb[cand, g.R] > bb[i, g.R])
        & ~g.is_inside(bb[cand], bb[i][None, :])
        & g.intersects(bb[cand], bb[i][None, :], extend_horizontal=True)
        & ~g.intersects(bb[cand], bb[i][None, :], extend_vertical=True)
    )
    return _dominance_prune(bb, cand[hit], g.L, "left_greater")


def directly_above(bb: np.ndarray, i: int, cand: np.ndarray) -> np.ndarray:
    """``boxes_directly_above`` (``ocr_tree.py:928-951``)."""
    if len(cand) == 0:
        return cand
    eb = _strip_extended_vertical(bb, i, int(bb[cand, g.B].max()))
    hit = (
        (bb[cand, g.B] < bb[i, g.B])
        & ~g.is_inside(bb[cand], bb[i][None, :])
        & g.intersects(bb[cand], eb[None, :])
    )
    return _dominance_prune(bb, cand[hit], g.B, "bottom_less")
