"""Reading-order graph construction, attraction weighting, deterministic
topological sort, and article isolation.

Re-implements ``O/ocr_tree_module/ocr_tree_analyser.py:1235-1829`` and the
graph container ``O/aux_utils/graph.py`` over block indices of one
:class:`~osdocr_spark.kernels.doc.Document`.  The per-document graph never
crosses a partition boundary (SURVEY.md §1.1) — it is tens of nodes, kept as
plain dict/list adjacency here.

Documented deviations from the reference (behavioral bug-fixes, see
SURVEY.md §4.1 "anti-patterns"):

- ``Node.is_connected`` / ``connection_points`` use a *shared mutable default*
  ``visited=[]`` (``graph.py:230,276``) that poisons reachability results
  across calls, and ``sort_topologic_order``'s validity check passes a Node
  where an id is expected (``ocr_tree_analyser.py:1415``), making it vacuous.
  We implement the *intended* reachability (fresh visited set per call,
  id-keyed), which yields the documented newspaper order deterministically.
- list-mutation-during-iteration in ``topologic_graph``'s ancestor cleaning
  (``:1297-1301``) is replaced by a filter with identical intended semantics.
"""

from __future__ import annotations

import math

import numpy as np

from . import geometry as g
from . import neighbors as nb
from .doc import Document

__all__ = [
    "DGraph", "next_top_block", "topologic_graph", "topologic_order_context",
    "calculate_block_attraction", "sort_topologic_order", "graph_isolate_articles",
]


class DGraph:
    """Weighted digraph over block indices; insertion order preserved
    (replaces ``Graph``/``Node``/``Edge``, ``graph.py:5-416``).

    ``cw[(s,t)]`` is the child-edge weight, ``pw[(s,t)]`` the parent-edge
    weight (the reference stores the same connection twice with separately
    computed attractions, ``ocr_tree_analyser.py:1480-1488``).
    """

    def __init__(self):
        self.order: list[int] = []
        self.children: dict[int, list[int]] = {}
        self.parents: dict[int, list[int]] = {}
        self.cw: dict[tuple[int, int], float] = {}
        self.pw: dict[tuple[int, int], float] = {}

    def add_node(self, i: int):
        if i not in self.children:
            self.order.append(i)
            self.children[i] = []
            self.parents[i] = []

    def add_edge(self, s: int, t: int, w: float = 0.0):
        if t not in self.children[s]:
            self.children[s].append(t)
            self.parents[t].append(s)
            self.cw[(s, t)] = w
            self.pw[(s, t)] = w

    def remove_edge(self, s: int, t: int):
        if t in self.children[s]:
            self.children[s].remove(t)
            self.parents[t].remove(s)
            self.cw.pop((s, t), None)
            self.pw.pop((s, t), None)

    def reaches(self, src: int, tgt: int) -> bool:
        """True if ``tgt`` is reachable from ``src`` via child edges."""
        stack = [src]
        seen = set()
        while stack:
            n = stack.pop()
            if n == tgt:
                return True
            if n in seen:
                continue
            seen.add(n)
            stack.extend(self.children[n])
        return False

    def transitive_reduction(self, visit_order: list[int] | None = None):
        """Remove edges implied by longer child paths (``Graph.clean_graph``,
        ``graph.py:91-109``, implemented as a standard reduction)."""
        for s in (visit_order or list(self.order)):
            for t in list(self.children[s]):
                # reachable without the direct edge?
                self.remove_edge(s, t)
                if not self.reaches(s, t):
                    self.add_edge(s, t)

    def narrow_parents(self):
        """Keep each node's strongest parent connection; drop parents whose
        total (child+parent) weight ratio vs the strongest is < 0.5
        (``Graph.narrow_parents``, ``graph.py:111-146``)."""
        connections: list[tuple[float, int, int]] = []
        for s in self.order:
            for t in self.children[s]:
                total = self.cw[(s, t)] + self.pw.get((s, t), 0.0)
                connections.append((total, s, t))
        connections.sort(key=lambda c: c[0], reverse=True)
        visited: set[int] = set()
        alive = {(s, t) for _, s, t in connections}
        for weight, s, t in connections:
            if (s, t) not in alive or s in visited:
                continue
            visited.add(s)
            for o_weight, os_, ot in connections:
                if (os_, ot) == (s, t) or ot != t or (os_, ot) not in alive:
                    continue
                # replicate the <0.5 ratio rule; guard non-positive weights
                if o_weight < weight and (weight <= 0 or o_weight / weight < 0.5):
                    self.remove_edge(os_, ot)
                    alive.discard((os_, ot))
                elif o_weight > weight and (o_weight <= 0 or weight / o_weight < 0.5):
                    self.remove_edge(s, t)
                    alive.discard((s, t))


def next_top_block(doc: Document, cand: list[int], origin: tuple[float, float] = (0.0, 0.0)) -> int | None:
    """Choose the visually-first block (``next_top_block``,
    ``ocr_tree_analyser.py:649-726``): top-band → leftmost-band → top, vs
    left-band → top; tie-break by euclidean distance to ``origin``
    (left-candidate wins only when strictly closer)."""
    if not cand:
        return None
    bb = doc.b_box
    arr = np.array(cand, dtype=np.int64)

    # --- top route (pair loops vectorized; candidate order — top_blocks
    # first, then arr order — preserved so first-minimum tie-breaks match
    # the reference's stable sorts)
    tops = bb[arr, g.T]
    min_top = tops.min()
    top_blocks = arr[tops == min_top]
    band = g.within_vertical(bb[arr][:, None, :], bb[top_blocks][None, :, :], rng=0.05).any(axis=1)
    pot_arr = np.concatenate([top_blocks, arr[band]])
    lefts = bb[pot_arr, g.L]
    leftmost = int(pot_arr[int(np.argmin(lefts))])  # stable: first minimum
    band2 = g.within_horizontal(bb[arr], bb[leftmost][None, :], rng=0.05)
    potential_top = None
    if band2.any():
        p2 = arr[band2]
        potential_top = int(p2[int(np.argmin(bb[p2, g.T]))])

    # --- left route
    min_left = bb[arr, g.L].min()
    leftmost_blocks = arr[bb[arr, g.L] == min_left]
    band3 = g.within_horizontal(bb[arr][:, None, :], bb[leftmost_blocks][None, :, :], rng=0.05).any(axis=1)
    potential_left = None
    if band3.any():
        p3 = arr[band3]
        potential_left = int(p3[int(np.argmin(bb[p3, g.T]))])

    if potential_left is not None and potential_top is not None:
        dl = math.hypot(origin[0] - bb[potential_left, g.L], origin[1] - bb[potential_left, g.T])
        dt = math.hypot(origin[0] - bb[potential_top, g.L], origin[1] - bb[potential_top, g.T])
        return potential_left if dl < dt else potential_top
    if potential_left is not None:
        return potential_left
    if potential_top is not None:
        return potential_top
    return int(arr[int(np.argmin(bb[arr, g.T]))])


def topologic_graph(doc: Document, block_idx: list[int]) -> DGraph | None:
    """Build the reading-order digraph over non-delimiter blocks
    (``topologic_graph``, ``ocr_tree_analyser.py:1235-1344``): traverse from
    the visually-first block; each visited block gets child edges to its
    directly-right and directly-below neighbors (skipping targets already
    reachable); next node is the visually-first unvisited below-neighbor,
    else the global visually-first unvisited (linked if no below-neighbors).
    """
    non_delims = [i for i in block_idx if doc.b_type[i] != "delimiter"]
    if not non_delims:
        return None
    bb = doc.b_box
    first = next_top_block(doc, non_delims)
    graph = DGraph()
    graph.add_node(first)
    for i in non_delims:
        if i != first:
            graph.add_node(i)

    nd_arr = np.array(non_delims, dtype=np.int64)
    # one all-pairs pass replaces the per-node strip+prune semi-join calls
    tables = nb.neighbor_tables(bb, nd_arr)
    visited: list[int] = []
    current = first
    while current is not None:
        visited.append(current)
        right_blocks = tables["right"][current]
        below_blocks = tables["below"][current]
        potential = right_blocks + below_blocks
        # skip targets the current node already reaches (ancestor check,
        # ``:1295-1301`` — implemented as a filter, see module docstring)
        potential = [p for p in potential if not graph.reaches(current, p)]
        for p in potential:
            graph.add_edge(current, p)

        nxt = next_top_block(doc, [b for b in below_blocks if b not in visited],
                             origin=(float(bb[current, g.L]), float(bb[current, g.T])))
        if nxt is None:
            unvisited = [b for b in non_delims if b not in visited]
            nxt = next_top_block(doc, unvisited)
            if nxt is not None and not below_blocks:
                graph.add_edge(current, nxt)
        current = nxt
    return graph


class _AttractionCache:
    """Per-(document, block-set) memo for the directional semi-joins and the
    distance normalization reused across every edge weighting call."""

    def __init__(self, doc: Document, blocks: list[int]):
        self.doc = doc
        self.barr = np.array(blocks, dtype=np.int64)
        self._tables: dict | None = None
        self._dist: dict[int, tuple[float, float]] = {}

    def neighbors(self, kind: str, i: int) -> list[int]:
        if self._tables is None:
            self._tables = nb.neighbor_tables(self.doc.b_box, self.barr)
        hit = self._tables[kind].get(i)
        if hit is None:  # i outside the block set: per-call fallback
            fn = {"below": nb.directly_below, "right": nb.directly_right,
                  "above": nb.directly_above}[kind]
            hit = [int(x) for x in fn(self.doc.b_box, i, self.barr[self.barr != i])]
            self._tables[kind][i] = hit
        return hit

    def dist_range(self, i: int) -> tuple[float, float]:
        hit = self._dist.get(i)
        if hit is None:
            others = self.barr[self.barr != i]
            if len(others):
                d = g.distance_to(self.doc.b_box[i][None, :], self.doc.b_box[others])
                hit = (float(d.max()), float(d.min()))
            else:
                hit = (0.0, 0.0)
            self._dist[i] = hit
        return hit


def calculate_block_attraction(doc: Document, block: int, target: int,
                               blocks: list[int], direction: str | None = None,
                               child: bool = True,
                               cache: "_AttractionCache | None" = None) -> int:
    """Attraction score between two blocks (``calculate_block_attraction``,
    ``ocr_tree_analyser.py:1496-1789``): direction bonus, delimiter
    crossing penalty/bonus (±30·overlap ratio), normalized proximity
    (+20·(1−d)), strip-overlap ratio (+20·ratio), below-target (+20),
    no-below bonuses (+40/+20), encompassing below/above (+20, shared
    parent/child +20), and the type rules for title/image/text blocks."""
    bb = doc.b_box
    if cache is None:
        cache = _AttractionCache(doc, blocks)
    barr = cache.barr
    max_d, min_d = cache.dist_range(block)

    attraction = 0

    if direction is None:
        if g.intersects(bb[block], bb[target], extend_vertical=True):
            direction = "above" if bb[block, g.T] > bb[target, g.T] else "below"
        elif g.intersects(bb[block], bb[target], extend_horizontal=True):
            direction = "right" if bb[block, g.L] < bb[target, g.L] else "left"
        elif g.is_inside(bb[target], bb[block]):
            direction = "below"
        elif g.is_inside(bb[block], bb[target]):
            direction = "above"
        elif bb[target, g.T] < bb[block, g.T]:
            direction = "above"
        else:
            direction = "below"

    below_blocks = cache.neighbors("below", block)
    right_blocks = cache.neighbors("right", block)
    top_blocks = cache.neighbors("above", block)

    # unconditional direction bonus (the reference's disjunction covers all
    # four directions, ``:1558-1562``)
    attraction += 20

    border = {"above": "top", "below": "bottom", "left": "left", "right": "right"}[direction]
    distance = float(g.distance_to(bb[block], bb[target], border=border))
    rng = max_d - min_d
    distance = abs((distance - min_d) / rng) if rng > 0 else 0.0

    block_area = int(g.area(bb[block]))
    if below_blocks:
        ba = np.array(below_blocks)
        leftmost = int(ba[int(np.argmin(bb[ba, g.L]))])
        if leftmost == target:
            attraction += 10
        below_delims = [b for b in below_blocks if doc.b_type[b] == "delimiter"]
        if below_delims and block_area > 0:
            widest = max(below_delims, key=lambda b: int(g.width(bb[b])))
            inter = g.intersect_area_box(bb[widest], bb[block], extend_vertical=True)
            inter_area = int(g.area(inter))
            if direction == "below" and inter_area > 0:
                attraction -= (inter_area / block_area) * 30
            elif direction != "below" and inter_area > 0:
                attraction += (inter_area / block_area) * 30

    if right_blocks:
        right_delims = [b for b in right_blocks if doc.b_type[b] == "delimiter"]
        if right_delims and block_area > 0:
            tallest = max(right_delims, key=lambda b: int(g.height(bb[b])))
            inter = g.intersect_area_box(bb[tallest], bb[block], extend_horizontal=True)
            inter_area = int(g.area(inter))
            if direction == "right" and inter_area > 0:
                attraction -= (inter_area / block_area) * 30
            elif direction != "right" and inter_area > 0:
                attraction += (inter_area / block_area) * 30

    if below_blocks:
        attraction += round(20 * (1 - distance))

    # strip overlap ratio (``:1634-1650``)
    if direction in ("above", "below"):
        inter = g.intersect_area_box(bb[target], bb[block], extend_vertical=True)
    else:
        inter = g.intersect_area_box(bb[target], bb[block], extend_horizontal=True)
    target_area = int(g.area(bb[target]))
    if target_area > 0:
        inter_area = int(g.area(inter))
        ratio = 1.0 if inter_area >= target_area else inter_area / target_area
        attraction += round(20 * ratio)

    if below_blocks:
        if target in below_blocks:
            attraction += 20
    else:
        if direction in ("right", "above"):
            attraction += 40
            if len(cache.neighbors("above", target)) == 0:
                attraction += 20

    if direction in ("below", "right"):
        if below_blocks:
            for bbk in below_blocks:
                if bbk != target and \
                        g.within_horizontal(bb[bbk], bb[block], rng=0.3, only_self=True) and \
                        g.within_horizontal(bb[bbk], bb[target], rng=0.3, only_self=True):
                    attraction += 20
                    above_enc = cache.neighbors("above", bbk)
                    if above_enc and len([b for b in above_enc if b in (block, target)]) == 2:
                        attraction += 20
                    break
        if top_blocks:
            for tbk in top_blocks:
                if tbk != target and \
                        g.within_horizontal(bb[tbk], bb[block], rng=0.3, only_self=True) and \
                        g.within_horizontal(bb[tbk], bb[target], rng=0.3, only_self=True):
                    attraction += 20
                    below_enc = cache.neighbors("below", tbk)
                    if below_enc and len([b for b in below_enc if b in (block, target)]) == 2:
                        attraction += 20
                    break

    btype = doc.b_type[block]
    ttype = doc.b_type[target]
    if btype == "title":
        if direction == "below":
            attraction += 20
        if ttype != "title":
            attraction += 20
            if ttype == "text" and direction == "below" and doc.b_start_text[target] is True:
                attraction += 10
    elif btype == "image":
        if ttype == "caption":
            attraction += 50
    elif btype == "text":
        keys, _, _ = doc.line_table(block)
        n_lines = len(keys)
        if ttype == "text":
            if n_lines > 1 and doc.b_end_text[block] is False and doc.b_start_text[target] is False:
                attraction += 50
            elif n_lines > 1 and doc.b_end_text[block] is True and doc.b_start_text[target] is True:
                attraction += 10
            if direction == "below":
                attraction += 20
            else:
                if below_blocks and not [b for b in below_blocks if doc.b_type[b] == "text"]:
                    attraction += 10
        elif n_lines > 1 and doc.b_end_text[block] is False and \
                (ttype != "text" or doc.b_start_text[target] is True):
            attraction -= 20
    return attraction


def topologic_order_context(doc: Document, block_idx: list[int],
                            ignore_delimiters: bool = False) -> DGraph | None:
    """Graph + attraction weights on every child and parent edge
    (``topologic_order_context``, ``ocr_tree_analyser.py:1458-1492``)."""
    blocks = [i for i in block_idx
              if not (ignore_delimiters and doc.b_type[i] == "delimiter")]
    graph = topologic_graph(doc, block_idx)
    if graph is None:
        return None
    cache = _AttractionCache(doc, blocks)
    for s in graph.order:
        for t in graph.children[s]:
            graph.cw[(s, t)] = calculate_block_attraction(doc, s, t, blocks, cache=cache)
            graph.pw[(s, t)] = calculate_block_attraction(doc, s, t, blocks, child=False, cache=cache)
    return graph


def sort_topologic_order(doc: Document, graph: DGraph, sort_weight: bool = False) -> list[int]:
    """Deterministic topological ordering (``sort_topologic_order``,
    ``ocr_tree_analyser.py:1347-1454``): candidates are the last node's
    unvisited children, else all unvisited; a candidate is valid when no
    other unvisited candidate reaches it; ties resolve by max edge weight
    (when ``sort_weight``) then by :func:`next_top_block`."""
    if sort_weight:
        graph.narrow_parents()

    order: list[int] = []
    in_order: set[int] = set()
    last: int | None = None
    n = len(graph.order)
    while len(order) < n:
        potential = []
        if last is not None:
            potential = [t for t in graph.children[last] if t not in in_order]
        if not potential:
            potential = [i for i in graph.order if i not in in_order]

        valid: list[int] = []
        for cand in potential:
            ok = True
            for other in potential:
                if other == cand or other in in_order:
                    continue
                if graph.reaches(other, cand):
                    ok = False
                    break
            if ok:
                valid.append(cand)

        if len(valid) > 1:
            chosen = None
            if sort_weight and last is not None:
                edges = [(graph.cw[(last, t)], t) for t in graph.children[last] if t in valid]
                if edges:
                    maxw = max(w for w, _ in edges)
                    tied = [t for w, t in edges if w == maxw]
                    chosen = tied[0] if len(tied) == 1 else next_top_block(doc, tied)
            if chosen is None:
                chosen = next_top_block(doc, valid)
        elif len(valid) == 1:
            chosen = valid[0]
        else:
            chosen = next_top_block(doc, potential)
        order.append(chosen)
        in_order.add(chosen)
        last = chosen
    return order


def graph_isolate_articles(doc: Document, order: list[int]) -> list[list[int]]:
    """Split the ordered block list into articles at title boundaries;
    consecutive titles stay together (``graph_isolate_articles``,
    ``ocr_tree_analyser.py:1793-1829``)."""
    articles: list[list[int]] = []
    current: list[int] = []
    has_title = False
    for i in order:
        if doc.b_type[i] == "title":
            if current and has_title:
                if doc.b_type[current[-1]] != "title":
                    articles.append(current)
                    current = []
                    has_title = True
            else:
                has_title = True
        current.append(i)
    if current:
        articles.append(current)
    return articles
