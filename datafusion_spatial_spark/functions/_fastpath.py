"""Vectorized batch fast paths for uniform WKB columns.

The generic WKB kernels decode per row through the Python codec
(wkb.loads) inside Arrow-batched pandas UDFs. For the single most common
100 TB shape — a column of plain 2-D points (standard GeoParquet WKB
encoding: 21 bytes, little-endian byte order, geometry type 1) — the
whole batch can be decoded with one numpy reshape + view instead of a
Python loop, ~30-60× faster. A batch with ANY non-conforming value falls
back to the generic path (the check is two byte comparisons per value,
negligible against a full parse).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# accepted little-endian point type words by record length: 2-D (21 B),
# Z or M (29 B: ISO 1001/2001, EWKB 0x80000001/0x40000001), ZM (37 B:
# ISO 3001, EWKB 0xC0000001). x,y sit at bytes 5..21 in every variant.
_POINT_TYPES = {
    21: {b"\x01\x00\x00\x00"},
    29: {b"\xe9\x03\x00\x00", b"\xd1\x07\x00\x00",
         b"\x01\x00\x00\x80", b"\x01\x00\x00\x40"},
    37: {b"\xb9\x0b\x00\x00", b"\x01\x00\x00\xc0"},
}


def point_xy_batch(s: pd.Series):
    """Decode a batch of little-endian WKB points (2-D, Z, M, or ZM — all
    records in the batch must share one length) vectorized.

    Returns ``(x, y, valid)`` — float64 arrays plus a bool mask (False for
    null rows and NaN empty-points) — or ``None`` if any non-null value is
    not a conforming LE point (caller falls back to the per-row codec).
    """
    n = len(s)
    isna = s.isna().to_numpy()
    ii = np.flatnonzero(~isna)
    if ii.size == 0:
        return None
    vals = s.to_numpy(dtype=object)[ii]
    m = ii.size
    # one concatenation + vectorized conformance checks over the raw
    # bytes, instead of per-row slicing and set lookups in Python
    try:
        lens = np.fromiter((len(v) for v in vals), np.int64, count=m)
        reclen = int(lens[0])
        if reclen not in _POINT_TYPES or not (lens == reclen).all():
            return None
        joined = b"".join(vals)
    except TypeError:
        return None  # non-bytes value in the column
    arr = np.frombuffer(joined, np.uint8).reshape(-1, reclen)
    if (arr[:, 0] != 1).any():
        return None  # big-endian (or junk) byte-order flag
    words = arr[:, 1:5].copy().view(np.uint32).ravel()
    allowed = np.array(
        [np.frombuffer(t, np.uint32)[0] for t in _POINT_TYPES[reclen]],
        np.uint32,
    )
    if not np.isin(words, allowed).all():
        return None
    px = arr[:, 5:13].copy().view(np.float64).ravel()
    py = arr[:, 13:21].copy().view(np.float64).ravel()
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    x[ii] = px
    y[ii] = py
    valid = np.zeros(n, dtype=bool)
    valid[ii] = ~(np.isnan(px) | np.isnan(py))  # NaN point = POINT EMPTY
    return x, y, valid


def _multi_arange(starts, lengths):
    """Concatenated [start, start+len) ranges, fully vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    out_start = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_start, lengths)
        + np.repeat(starts, lengths)
    )


def flat_coords_batch(s: pd.Series):
    """Vectorized coordinate extraction for a batch of uniform-type 2-D
    little-endian WKB **LineString (2), Polygon (3), or MultiPoint (4)**
    records — the VERDICT-r6 #7 extension of the point fast path: the
    per-row Python ``wkb.loads`` parse is the dominant cost of
    geometry-heavy pandas-UDF stages, and coordinate-fold kernels (bbox /
    extent / grid keys) only need the flat vertex stream, not a Geom tree.

    Returns ``(xs, ys, counts)`` — the concatenated vertex doubles of all
    non-null rows in row order, plus an int64 per-row vertex count aligned
    with the full batch (0 for null AND empty rows) — or ``None`` when the
    batch isn't a uniform conforming shape (caller falls back to the
    per-row codec). Decode is one byte-gather per header level: record
    payloads are sliced out with a vectorized multi-arange, and Polygon's
    nested per-ring headers are walked ring-ordinal-at-a-time (vectorized
    across records each step, so cost scales with max ring count, not
    vertex count).
    """
    n = len(s)
    isna = s.isna().to_numpy()
    ii = np.flatnonzero(~isna)
    if ii.size == 0:
        return None
    vals = s.to_numpy(dtype=object)[ii]
    m = ii.size
    try:
        lens = np.fromiter((len(v) for v in vals), np.int64, count=m)
        joined = b"".join(vals)
    except TypeError:
        return None
    arr = np.frombuffer(joined, np.uint8)
    rec_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    if (lens < 9).any():
        return None
    if (arr[rec_starts] != 1).any():
        return None  # big-endian record present
    words = (
        arr[(rec_starts[:, None] + np.arange(1, 5)[None, :]).ravel()]
        .copy()
        .view(np.uint32)
    )
    gtype = int(words[0])
    if gtype not in (2, 3, 4) or not (words == gtype).all():
        return None
    nitems = (
        arr[(rec_starts[:, None] + np.arange(5, 9)[None, :]).ravel()]
        .copy()
        .view(np.uint32)
        .astype(np.int64)
    )
    counts = np.zeros(n, np.int64)
    if gtype == 2:  # LineString: 9-byte header + npts×16
        if ((lens - 9) != nitems * 16).any():
            return None
        coord_starts, coord_counts = rec_starts + 9, nitems
        row_counts = nitems
    elif gtype == 4:  # MultiPoint: parts are full 21-byte 2-D WKB points
        if ((lens - 9) != nitems * 21).any():
            return None
        # part p of record r starts at rec_start + 9 + 21*p
        first = np.repeat(rec_starts + 9, nitems)
        within = _multi_arange(np.zeros(len(nitems), np.int64), nitems)
        part_starts = first + 21 * within
        if part_starts.size and (
            (arr[part_starts] != 1).any()
            or (
                arr[(part_starts[:, None] + np.arange(1, 5)[None, :]).ravel()]
                .copy()
                .view(np.uint32)
                != 1
            ).any()
        ):
            return None
        coord_starts, coord_counts = part_starts + 5, np.ones(
            part_starts.size, np.int64
        )
        row_counts = nitems
    else:  # Polygon: nrings, then per ring npts + npts×16
        max_rings = int(nitems.max()) if m else 0
        cur = rec_starts + 9
        ring_starts_l, ring_counts_l = [], []
        for r in range(max_rings):
            live = nitems > r
            if not live.any():
                break
            cs = cur[live]
            if ((cs + 4) > (rec_starts + lens)[live]).any():
                return None
            npts = (
                arr[(cs[:, None] + np.arange(4)[None, :]).ravel()]
                .copy()
                .view(np.uint32)
                .astype(np.int64)
            )
            if ((cs + 4 + npts * 16) > (rec_starts + lens)[live]).any():
                return None
            ring_starts_l.append(cs + 4)
            ring_counts_l.append(npts)
            nxt = cur.copy()
            nxt[live] = cs + 4 + npts * 16
            cur = nxt
        if ((cur - rec_starts) != lens).any():
            return None  # trailing bytes (Z/M or corrupt)
        if ring_starts_l:
            # interleave back into record order: each append above is one
            # ring ordinal across records — reassemble with argsort on
            # (record, ordinal) via stable concatenation order
            order_rec = np.concatenate(
                [np.flatnonzero(nitems > r) for r in range(len(ring_starts_l))]
            )
            order_ord = np.concatenate(
                [
                    np.full(int((nitems > r).sum()), r, np.int64)
                    for r in range(len(ring_starts_l))
                ]
            )
            perm = np.lexsort((order_ord, order_rec))
            coord_starts = np.concatenate(ring_starts_l)[perm]
            coord_counts = np.concatenate(ring_counts_l)[perm]
        else:
            coord_starts = np.empty(0, np.int64)
            coord_counts = np.empty(0, np.int64)
        # per-row vertex totals (all rings)
        row_counts = np.zeros(m, np.int64)
        for r, cnts in enumerate(ring_counts_l):
            row_counts[nitems > r] += cnts
    # vertex-level gather: byte offset of each vertex's x word, then two
    # phase-view gathers — never a byte-granularity index (16× smaller
    # working set than gathering the raw coordinate bytes)
    total_v = int(coord_counts.sum())
    if total_v:
        out_start = np.concatenate(([0], np.cumsum(coord_counts)[:-1]))
        rel = (
            np.arange(total_v, dtype=np.int64)
            - np.repeat(out_start, coord_counts)
        )
        vx = np.repeat(coord_starts, coord_counts) + 16 * rel
        xs = _gather_f8(joined, vx)
        ys = _gather_f8(joined, vx + 8)
    else:
        xs = np.empty(0, np.float64)
        ys = np.empty(0, np.float64)
    counts[ii] = row_counts
    return xs, ys, counts


def _gather_f8(buf: bytes, off: np.ndarray) -> np.ndarray:
    """Gather little-endian float64 words at arbitrary byte offsets of
    ``buf`` without materializing a byte-level index: eight zero-copy
    phase-shifted f8 views over the same memory cover every possible
    alignment, so each gather is a single fancy index at word granularity
    (a batch of identically-shaped records usually hits one phase)."""
    out = np.empty(off.size, np.float64)
    phase = off & 7
    for p in range(8):
        m = phase == p
        if m.any():
            view = np.frombuffer(
                buf, "<f8", count=(len(buf) - p) // 8, offset=p
            )
            out[m] = view[(off[m] - p) >> 3]
    return out
