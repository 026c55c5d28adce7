"""Vectorized axis-aligned box operations over ``(N, 4)`` int64 arrays.

Re-expresses the reference's scalar ``Box`` predicates
(``O/aux_utils/box.py:10-423``) as numpy kernels operating on arrays of
boxes laid out as columns ``[left, right, top, bottom]`` (width/height are
derived, never stored — ``box.py:30-35``).  All functions broadcast:
``a`` may be ``(4,)`` or ``(N,4)``, ``b`` likewise; comparisons are closed
intervals exactly as the reference's ``<=`` / ``>=`` chains.

Known reference quirk deliberately not ported: ``Box.distance_to`` with
``border='closest'`` passes an unsupported ``range_type=`` kwarg into
``within_*_boxes`` (``box.py:382,388``) and would raise ``TypeError``; no
in-repo caller reaches it (SURVEY.md §2.3), so only the reachable border
modes are implemented.
"""

from __future__ import annotations

import numpy as np

L, R, T, B = 0, 1, 2, 3

__all__ = [
    "L", "R", "T", "B", "box", "width", "height", "area", "center",
    "is_inside", "intersects", "intersect_area_box", "within_vertical",
    "within_horizontal", "same_level", "distance_to", "remove_box_area",
]


def box(left, right, top, bottom) -> np.ndarray:
    """Build an int64 box array (coordinates coerced to int, ``box.py:30-35``)."""
    return np.array([int(left), int(right), int(top), int(bottom)], dtype=np.int64)


def width(b: np.ndarray) -> np.ndarray:
    return b[..., R] - b[..., L]


def height(b: np.ndarray) -> np.ndarray:
    return b[..., B] - b[..., T]


def area(b: np.ndarray) -> np.ndarray:
    """``Box.area`` (``box.py:127-128``) — width·height, no clamping."""
    return width(b) * height(b)


def center(b: np.ndarray) -> np.ndarray:
    """Center points ``(x, y)`` as float64 (``box.py:405-407``)."""
    return np.stack([(b[..., L] + b[..., R]) / 2.0, (b[..., T] + b[..., B]) / 2.0], axis=-1)


def is_inside(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``a`` fully inside ``b`` (closed; ``Box.is_inside_box``, ``box.py:166-170``)."""
    if a.ndim == 1 and getattr(b, "ndim", 1) == 1:  # scalar fast path
        return (a[L] >= b[L]) and (a[R] <= b[R]) and (a[T] >= b[T]) and (a[B] <= b[B])
    return (
        (a[..., L] >= b[..., L]) & (a[..., R] <= b[..., R])
        & (a[..., T] >= b[..., T]) & (a[..., B] <= b[..., B])
    )


def intersects(a: np.ndarray, b: np.ndarray,
               extend_vertical: bool = False, extend_horizontal: bool = False,
               inside: bool = False) -> np.ndarray:
    """Interval-overlap theta-join predicate (``Box.intersects_box``,
    ``box.py:173-196``).

    ``extend_vertical`` projects ``a`` to an infinite vertical strip
    (overlap on y always true); ``extend_horizontal`` likewise for x.
    ``inside=True`` additionally accepts containment either way (redundant
    with plain overlap but kept for signature parity).
    """
    if a.ndim == 1 and getattr(b, "ndim", 1) == 1:  # scalar fast path
        siv = extend_vertical or (
            (a[T] <= b[T] and a[B] >= b[T]) or (b[T] <= a[T] and b[B] >= a[T]))
        sih = extend_horizontal or (a[L] <= b[R] and a[R] >= b[L])
        shit = siv and sih
        if inside and not shit:
            shit = bool(is_inside(a, b)) or bool(is_inside(b, a))
        return shit
    iv = extend_vertical | (
        ((a[..., T] <= b[..., T]) & (a[..., B] >= b[..., T]))
        | ((b[..., T] <= a[..., T]) & (b[..., B] >= a[..., T]))
    )
    ih = extend_horizontal | ((a[..., L] <= b[..., R]) & (a[..., R] >= b[..., L]))
    hit = iv & ih
    if inside:
        hit = hit | is_inside(a, b) | is_inside(b, a)
    return hit


def intersect_area_box(a: np.ndarray, b: np.ndarray,
                       extend_vertical: bool = False,
                       extend_horizontal: bool = False) -> np.ndarray:
    """Overlap rectangle (``Box.intersect_area_box``, ``box.py:198-246``).

    Returns boxes clipped to the mutual overlap; where the boxes are
    disjoint the result has non-positive width/height and ``area() <= 0``
    — callers test the area like the reference does.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 1 and b.ndim == 1:  # scalar fast path (hot in ordering/fix)
        al, ar, at, ab = (int(a[L]), int(a[R]), int(a[T]), int(a[B]))
        bl, br, bt, bb = (int(b[L]), int(b[R]), int(b[T]), int(b[B]))
        if extend_vertical:
            at = min(at, bt)
            ab = max(ab, bb)
        if extend_horizontal:
            al = min(al, bl)
            ar = max(ar, br)
        out = np.empty(4, dtype=np.int64)
        out[L] = max(al, bl)
        out[R] = min(ar, br)
        out[T] = max(at, bt)
        out[B] = min(ab, bb)
        return out
    aa = a.astype(np.int64, copy=True)
    if extend_vertical:
        aa = aa.copy()
        aa[..., T] = np.minimum(aa[..., T], b[..., T])
        aa[..., B] = np.maximum(aa[..., B], b[..., B])
    if extend_horizontal:
        aa = aa.copy()
        aa[..., L] = np.minimum(aa[..., L], b[..., L])
        aa[..., R] = np.maximum(aa[..., R], b[..., R])
    out = np.empty(np.broadcast(aa, b).shape, dtype=np.int64)
    out[..., L] = np.maximum(aa[..., L], b[..., L])
    out[..., R] = np.minimum(aa[..., R], b[..., R])
    out[..., T] = np.maximum(aa[..., T], b[..., T])
    out[..., B] = np.minimum(aa[..., B], b[..., B])
    return out


def overlap_area(a: np.ndarray, b: np.ndarray,
                 extend_vertical: bool = False,
                 extend_horizontal: bool = False) -> np.ndarray:
    """Clamped overlap area (≥0) of :func:`intersect_area_box` results."""
    ib = intersect_area_box(a, b, extend_vertical, extend_horizontal)
    return np.maximum(width(ib), 0) * np.maximum(height(ib), 0)


def within_vertical(a: np.ndarray, b: np.ndarray, rng: float = 0.0,
                    only_self: bool = False) -> np.ndarray:
    """Tolerance-banded 1-D vertical containment
    (``Box.within_vertical_boxes``, ``box.py:130-142``): ``b`` within ``a``
    grown by ``rng·height(a)``, or (unless ``only_self``) ``a`` within ``b``
    grown by ``rng·height(b)``."""
    if a.ndim == 1 and getattr(b, "ndim", 1) == 1:  # scalar fast path
        ha = (a[B] - a[T]) * rng
        hit = (a[T] - ha <= b[T]) and (a[B] + ha >= b[B])
        if not only_self and not hit:
            hb = (b[B] - b[T]) * rng
            hit = (b[T] - hb <= a[T]) and (b[B] + hb >= a[B])
        return hit
    ha = height(a) * rng
    hit = (a[..., T] - ha <= b[..., T]) & (a[..., B] + ha >= b[..., B])
    if not only_self:
        hb = height(b) * rng
        hit = hit | ((b[..., T] - hb <= a[..., T]) & (b[..., B] + hb >= a[..., B]))
    return hit


def within_horizontal(a: np.ndarray, b: np.ndarray, rng: float = 0.0,
                      only_self: bool = False) -> np.ndarray:
    """Horizontal counterpart (``box.py:145-156``)."""
    if a.ndim == 1 and getattr(b, "ndim", 1) == 1:  # scalar fast path
        wa = (a[R] - a[L]) * rng
        hit = (a[L] - wa <= b[L]) and (a[R] + wa >= b[R])
        if not only_self and not hit:
            wb = (b[R] - b[L]) * rng
            hit = (b[L] - wb <= a[L]) and (b[R] + wb >= a[R])
        return hit
    wa = width(a) * rng
    hit = (a[..., L] - wa <= b[..., L]) & (a[..., R] + wa >= b[..., R])
    if not only_self:
        wb = width(b) * rng
        hit = hit | ((b[..., L] - wb <= a[..., L]) & (b[..., R] + wb >= a[..., R]))
    return hit


def same_level(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Either-axis alignment (``Box.same_level_box``, ``box.py:159-163``)."""
    return within_horizontal(a, b) | within_vertical(a, b)


_BORDER_POINTS = {"left", "right", "top", "bottom"}


def _mid_point(b: np.ndarray, which: str) -> np.ndarray:
    cx = (b[..., L] + b[..., R]) / 2.0
    cy = (b[..., T] + b[..., B]) / 2.0
    if which == "center":
        return np.stack([cx, cy], axis=-1)
    if which == "left":
        return np.stack([b[..., L].astype(np.float64), cy], axis=-1)
    if which == "right":
        return np.stack([b[..., R].astype(np.float64), cy], axis=-1)
    if which == "top":
        return np.stack([cx, b[..., T].astype(np.float64)], axis=-1)
    return np.stack([cx, b[..., B].astype(np.float64)], axis=-1)


_OPPOSITE = {"left": "right", "right": "left", "top": "bottom", "bottom": "top"}


def distance_to(a: np.ndarray, b: np.ndarray, border: str | None = None) -> np.ndarray:
    """Euclidean distance between boxes (``Box.distance_to``, ``box.py:346-402``).

    ``border=None`` → center–center; ``border∈{left,right,top,bottom}`` →
    between that border's midpoint of ``a`` and the opposite border's
    midpoint of ``b`` (reference pairs e.g. ``a.left ↔ b.right``).
    """
    if getattr(a, "ndim", 0) == 1 and getattr(b, "ndim", 0) == 1:  # scalar path
        import math
        def pt(bx, which):
            cx = (bx[L] + bx[R]) / 2.0
            cy = (bx[T] + bx[B]) / 2.0
            if which == "left":
                return bx[L], cy
            if which == "right":
                return bx[R], cy
            if which == "top":
                return cx, bx[T]
            if which == "bottom":
                return cx, bx[B]
            return cx, cy
        if border in _BORDER_POINTS:
            xa, ya = pt(a, border)
            xb, yb = pt(b, _OPPOSITE[border])
        else:
            xa, ya = pt(a, "center")
            xb, yb = pt(b, "center")
        return math.hypot(xa - xb, ya - yb)
    if border in _BORDER_POINTS:
        pa = _mid_point(np.asarray(a), border)
        pb = _mid_point(np.asarray(b), _OPPOSITE[border])
    else:
        pa = _mid_point(np.asarray(a), "center")
        pb = _mid_point(np.asarray(b), "center")
    d = pa - pb
    return np.hypot(d[..., 0], d[..., 1])


def distance_to_point(b: np.ndarray, x: float, y: float) -> float:
    """Point-to-box distance, 0 inside (``Box.distance_to_point``,
    ``box.py:425-430``)."""
    import math
    cx = (b[L] + b[R]) / 2.0
    cy = (b[T] + b[B]) / 2.0
    dx = abs(cx - x) - (b[R] - b[L]) * 0.5
    dy = abs(cy - y) - (b[B] - b[T]) * 0.5
    return math.hypot(dx if dx > 0 else 0.0, dy if dy > 0 else 0.0)


def closest_edge_point(b: np.ndarray, x: float, y: float) -> tuple[float, float]:
    """Nearest point on the box border to (x, y) (``Box.closest_edge_point``,
    ``box.py:443-480`` — clamp to the box, then project interior points to
    the nearest edge)."""
    px = min(max(float(x), float(b[L])), float(b[R]))
    py = min(max(float(y), float(b[T])), float(b[B]))
    if b[L] < px < b[R] and b[T] < py < b[B]:
        # inside: snap to the nearest of the four edges
        d = [(px - b[L], (float(b[L]), py)), (b[R] - px, (float(b[R]), py)),
             (py - b[T], (px, float(b[T]))), (b[B] - py, (px, float(b[B])))]
        return min(d, key=lambda t: t[0])[1]
    return px, py


def remove_box_area(b: np.ndarray, cut: np.ndarray) -> np.ndarray:
    """Shrink ``b`` until disjoint from ``cut``, repeatedly trimming the side
    that loses the least area (``Box.remove_box_area``, ``box.py:248-297``).

    Scalar loop (≤4 iterations) — used by the overlap-fix suite on single
    boxes, not in hot vectorized paths.
    """
    out = np.asarray(b, dtype=np.int64).copy()
    for _ in range(4):
        ib = intersect_area_box(out, cut)
        if min(width(ib), height(ib)) <= 0 or area(ib) <= 0:
            break
        w = int(width(out))
        h = int(height(out))
        # candidate trims: (lost_area, new_box)
        cands = []
        if cut[B] >= out[B] and cut[T] > out[T]:  # cut hugs bottom → trim bottom
            cands.append(((out[B] - cut[T]) * w, (B, int(cut[T]))))
        if cut[T] <= out[T] and cut[B] < out[B]:  # cut hugs top → trim top
            cands.append(((cut[B] - out[T]) * w, (T, int(cut[B]))))
        if cut[R] >= out[R] and cut[L] > out[L]:  # trim right
            cands.append(((out[R] - cut[L]) * h, (R, int(cut[L]))))
        if cut[L] <= out[L] and cut[R] < out[R]:  # trim left
            cands.append(((cut[R] - out[L]) * h, (L, int(cut[R]))))
        if not cands:
            break
        cands.sort(key=lambda c: c[0])
        side, val = cands[0][1]
        out[side] = val
    return out
