"""General polygon overlay (Greiner–Hormann) for simple, hole-free rings.

Lifts the convex-only limitation of the Sutherland–Hodgman path in
geom_ops: intersection / union / difference of two possibly-CONCAVE simple
polygons. Degenerate configurations (vertex-on-edge contact, collinear
overlapping edges) are detected and raise ``OverlayDegeneracyError`` — the
caller keeps its NotImplementedError contract instead of returning a wrong
polygon. Holes remain out of scope (the containment fast paths in geom_ops
cover the common holed cases).

Clean-room implementation of the published algorithm (Greiner & Hormann,
"Efficient clipping of arbitrary polygons", ACM TOG 17(2), 1998).
"""

from __future__ import annotations

EPS = 1e-12
ALPHA_EPS = 1e-9


class OverlayDegeneracyError(Exception):
    pass


class _V:
    __slots__ = (
        "x", "y", "nxt", "prv", "neighbour", "intersect", "entry", "alpha",
        "visited",
    )

    def __init__(self, x: float, y: float, alpha: float = 0.0, intersect: bool = False):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.neighbour = None
        self.intersect = intersect
        self.entry = True
        self.alpha = alpha
        self.visited = False


def _build_list(ring):
    """Circular doubly-linked list from ring coords (closing point dropped)."""
    pts = ring[:-1] if ring[0] == ring[-1] else list(ring)
    first = None
    prev = None
    for x, y in pts:
        v = _V(float(x), float(y))
        if first is None:
            first = v
            v.nxt = v
            v.prv = v
        else:
            v.prv = prev
            v.nxt = first
            prev.nxt = v
            first.prv = v
        prev = v
    return first


def _iter_ring(first):
    v = first
    while True:
        yield v
        v = v.nxt
        if v is first:
            return


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _point_in_ring(pt, ring_pts) -> bool:
    """Strict ray-casting inside test on a coord list (no boundary logic —
    degeneracies are rejected before this is consulted)."""
    x, y = pt
    inside = False
    n = len(ring_pts)
    for i in range(n):
        ax, ay = ring_pts[i]
        bx, by = ring_pts[(i + 1) % n]
        if (ay > y) != (by > y):
            xi = ax + (y - ay) * (bx - ax) / (by - ay)
            if x < xi:
                inside = not inside
    return inside


def _seg_isect(p1, p2, q1, q2):
    """Proper intersection params (t, u) in (0,1)×(0,1), None otherwise;
    raises on degenerate (collinear / endpoint-touching) contact."""
    dx1, dy1 = p2[0] - p1[0], p2[1] - p1[1]
    dx2, dy2 = q2[0] - q1[0], q2[1] - q1[1]
    den = dx1 * dy2 - dy1 * dx2
    if abs(den) <= EPS:
        # parallel; collinear overlap is degenerate
        if abs(_orient(*p1, *p2, *q1)) <= EPS and (
            min(p1[0], p2[0]) - EPS <= max(q1[0], q2[0])
            and min(q1[0], q2[0]) - EPS <= max(p1[0], p2[0])
            and min(p1[1], p2[1]) - EPS <= max(q1[1], q2[1])
            and min(q1[1], q2[1]) - EPS <= max(p1[1], p2[1])
        ):
            raise OverlayDegeneracyError("collinear edge overlap")
        return None
    t = ((q1[0] - p1[0]) * dy2 - (q1[1] - p1[1]) * dx2) / den
    u = ((q1[0] - p1[0]) * dy1 - (q1[1] - p1[1]) * dx1) / den
    if -ALPHA_EPS < t < ALPHA_EPS or 1 - ALPHA_EPS < t < 1 + ALPHA_EPS:
        if -ALPHA_EPS <= u <= 1 + ALPHA_EPS:
            raise OverlayDegeneracyError("vertex-on-edge contact")
        return None
    if -ALPHA_EPS < u < ALPHA_EPS or 1 - ALPHA_EPS < u < 1 + ALPHA_EPS:
        if -ALPHA_EPS <= t <= 1 + ALPHA_EPS:
            raise OverlayDegeneracyError("vertex-on-edge contact")
        return None
    if 0 < t < 1 and 0 < u < 1:
        return t, u
    return None


def _insert_between(v, start, end):
    """Insert intersection vertex v between start and end ordered by alpha."""
    cur = start
    nxt = start.nxt
    while nxt is not end and nxt.intersect and nxt.alpha < v.alpha:
        cur = nxt
        nxt = nxt.nxt
    # walk forward over existing intersections with smaller alpha
    cur = start
    while cur.nxt is not end and cur.nxt.intersect and cur.nxt.alpha <= v.alpha:
        cur = cur.nxt
    after = cur.nxt
    v.prv = cur
    v.nxt = after
    cur.nxt = v
    after.prv = v


def _ring_pts(first):
    return [(v.x, v.y) for v in _iter_ring(first)]


def overlay(ring_a, ring_b, op: str):
    """Overlay two simple rings. op: 'intersection' | 'union' | 'difference'
    (a minus b). Returns a list of result rings (closed coord lists).
    Raises OverlayDegeneracyError on non-general-position input; callers
    should have handled containment/disjoint fast paths first."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(op)
    A = _build_list(ring_a)
    B = _build_list(ring_b)
    a_orig = [v for v in _iter_ring(A)]
    b_orig = [v for v in _iter_ring(B)]
    a_pts = [(v.x, v.y) for v in a_orig]
    b_pts = [(v.x, v.y) for v in b_orig]

    # phase 1: find + insert intersections
    found = False
    for i, va in enumerate(a_orig):
        va2 = a_orig[(i + 1) % len(a_orig)]
        p1, p2 = (va.x, va.y), (va2.x, va2.y)
        for j, vb in enumerate(b_orig):
            vb2 = b_orig[(j + 1) % len(b_orig)]
            q1, q2 = (vb.x, vb.y), (vb2.x, vb2.y)
            r = _seg_isect(p1, p2, q1, q2)
            if r is None:
                continue
            t, u = r
            found = True
            ix = p1[0] + t * (p2[0] - p1[0])
            iy = p1[1] + t * (p2[1] - p1[1])
            ia = _V(ix, iy, alpha=t, intersect=True)
            ib = _V(ix, iy, alpha=u, intersect=True)
            ia.neighbour = ib
            ib.neighbour = ia
            # insert within the original segment (alpha-ordered among any
            # previously inserted intersections)
            _insert_between(ia, va, va2)
            _insert_between(ib, vb, vb2)
    if not found:
        raise OverlayDegeneracyError(
            "no proper intersections (use containment/disjoint fast paths)"
        )

    # phase 2: entry/exit marking
    def mark(first, other_pts, invert):
        status_inside = _point_in_ring((first.x, first.y), other_pts)
        # entry=True means: crossing this intersection we ENTER the other
        entry = not status_inside
        if invert:
            entry = not entry
        for v in _iter_ring(first):
            if v.intersect:
                v.entry = entry
                entry = not entry

    if op == "intersection":
        mark(A, b_pts, invert=False)
        mark(B, a_pts, invert=False)
    elif op == "union":
        mark(A, b_pts, invert=True)
        mark(B, a_pts, invert=True)
    else:  # difference: A forward-out, B inverted
        mark(A, b_pts, invert=True)
        mark(B, a_pts, invert=False)

    # phase 3: trace
    results = []
    unvisited = [v for v in _iter_ring(A) if v.intersect]
    for start in unvisited:
        if start.visited:
            continue
        ring = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbour is not None:
                cur.neighbour.visited = True
            if cur.entry:
                while True:
                    cur = cur.nxt
                    ring.append((cur.x, cur.y))
                    if cur.intersect:
                        break
            else:
                while True:
                    cur = cur.prv
                    ring.append((cur.x, cur.y))
                    if cur.intersect:
                        break
            cur = cur.neighbour
            if cur is start or cur.neighbour is start or (cur.x, cur.y) == (start.x, start.y):
                break
            if len(ring) > 4 * (len(a_pts) + len(b_pts)):
                raise OverlayDegeneracyError("tracing did not converge")
        if len(ring) >= 3:
            ring = ring + [ring[0]]
            results.append(ring)
    return _assemble(results)


def _ring_area2(ring):
    s = 0.0
    for i in range(len(ring) - 1):
        s += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return s


def _assemble(rings):
    """Group traced rings into polygons: a ring strictly inside another
    result ring is that ring's hole (e.g. a union enclosing a pocket).
    Returns [[shell, hole, ...], ...]."""
    if len(rings) <= 1:
        return [[r] for r in rings]
    order = sorted(range(len(rings)), key=lambda i: -abs(_ring_area2(rings[i])))
    polys = []  # (shell_idx, [holes])
    assigned = {}
    for i in order:
        probe = rings[i][0]
        # average a couple of vertices for a robust interior-ish probe
        px = sum(p[0] for p in rings[i][:-1]) / (len(rings[i]) - 1)
        py = sum(p[1] for p in rings[i][:-1]) / (len(rings[i]) - 1)
        parent = None
        for j, (shell_idx, _holes) in enumerate(polys):
            if _point_in_ring((px, py), rings[shell_idx][:-1]) or _point_in_ring(
                (probe[0], probe[1]), rings[shell_idx][:-1]
            ):
                parent = j
                break
        if parent is None:
            polys.append((i, []))
        else:
            polys[parent][1].append(i)
    return [[rings[s]] + [rings[h] for h in holes] for s, holes in polys]
