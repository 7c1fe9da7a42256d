"""Pure-numpy packed STR R-tree.

The per-partition spatial index of the engine: built once per actor (broadcast
small side) or once per cell group (map_groups), queried per batch.  Mirrors
the role of GEOS STRtree in the reference (layer algebra prepared-geometry
loop ``ogrlayer.cpp:5510-5517``; vector sort STRtree ``apps/gdalalg_vector_sort.cpp:404``)
without the GEOS dependency.

Bulk-loaded Sort-Tile-Recursive packing with fixed fanout; all bounds live in
flat numpy arrays per level, so envelope queries descend with vectorized
overlap tests and kNN runs best-first over node mindists.
"""

from __future__ import annotations

import heapq

import numpy as np

FANOUT = 16


class STRtree:
    def __init__(self, boxes: np.ndarray):
        """boxes: (N, 4) float64 (minx, miny, maxx, maxy)."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.boxes = boxes
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        # STR packing: sort by center-x, tile into vertical slices, sort each
        # slice by center-y.
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        nleaf = int(np.ceil(self.n / FANOUT))
        nslices = int(np.ceil(np.sqrt(nleaf)))
        slice_cap = nslices * FANOUT
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        pos = 0
        for s in range(0, self.n, slice_cap):
            chunk = by_x[s : s + slice_cap]
            chunk = chunk[np.argsort(cy[chunk], kind="stable")]
            order[pos : pos + len(chunk)] = chunk
            pos += len(chunk)
        self.order = order  # leaf slot -> original box index
        # build levels bottom-up: level[0] = leaf-node bounds over packed boxes
        sorted_boxes = boxes[order]
        self.levels: list[np.ndarray] = []
        cur = sorted_boxes
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / FANOUT))
            pad = m * FANOUT - len(cur)
            if pad:
                pad_lo = np.full((pad, 2), np.inf)
                pad_hi = np.full((pad, 2), -np.inf)
                padded = np.vstack([cur, np.hstack([pad_lo[:, :1], pad_lo[:, 1:], pad_hi[:, :1], pad_hi[:, 1:]])])
            else:
                padded = cur
            g = padded.reshape(m, FANOUT, 4)
            nodes = np.empty((m, 4))
            nodes[:, 0] = g[:, :, 0].min(axis=1)
            nodes[:, 1] = g[:, :, 1].min(axis=1)
            nodes[:, 2] = g[:, :, 2].max(axis=1)
            nodes[:, 3] = g[:, :, 3].max(axis=1)
            self.levels.append(nodes)
            cur = nodes
        # levels[0] = nodes over leaves ... levels[-1] = root level

    # -- envelope query ------------------------------------------------------

    def query_box(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Original indices of boxes whose envelope overlaps the query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            b = self.boxes
            hit = (b[:, 0] <= maxx) & (b[:, 2] >= minx) & (b[:, 1] <= maxy) & (b[:, 3] >= miny)
            return np.nonzero(hit)[0]
        cand = np.arange(len(self.levels[-1]), dtype=np.int64)
        for lvl in range(len(self.levels) - 1, -1, -1):
            b = self.levels[lvl][cand]
            keep = (b[:, 0] <= maxx) & (b[:, 2] >= minx) & (b[:, 1] <= maxy) & (b[:, 3] >= miny)
            cand = cand[keep]
            if cand.size == 0:
                return np.empty(0, dtype=np.int64)
            if lvl > 0:
                cand = (cand[:, None] * FANOUT + np.arange(FANOUT)[None, :]).ravel()
                cand = cand[cand < len(self.levels[lvl - 1])]
        # cand are node ids at level 0 -> expand to leaf slots
        slots = (cand[:, None] * FANOUT + np.arange(FANOUT)[None, :]).ravel()
        slots = slots[slots < self.n]
        b = self.boxes[self.order[slots]]
        keep = (b[:, 0] <= maxx) & (b[:, 2] >= minx) & (b[:, 1] <= maxy) & (b[:, 3] >= miny)
        return self.order[slots[keep]]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch point probe: returns (point_row, box_index) candidate pairs
        where the point lies inside the box envelope.

        Strategy: group the probe points by leaf-level relevance via a single
        vectorized pass per tree level over ALL points at once (points x nodes
        overlap matrix per level, kept sparse by candidate pruning).
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        npts = px.size
        if self.n == 0 or npts == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        # candidate (point, node) pairs, starting at root level
        if not self.levels:
            m = (
                (px[:, None] >= self.boxes[None, :, 0])
                & (px[:, None] <= self.boxes[None, :, 2])
                & (py[:, None] >= self.boxes[None, :, 1])
                & (py[:, None] <= self.boxes[None, :, 3])
            )
            r, c = np.nonzero(m)
            return r, c
        pr = np.repeat(np.arange(npts, dtype=np.int64), len(self.levels[-1]))
        pn = np.tile(np.arange(len(self.levels[-1]), dtype=np.int64), npts)
        for lvl in range(len(self.levels) - 1, -1, -1):
            b = self.levels[lvl][pn]
            keep = (px[pr] >= b[:, 0]) & (px[pr] <= b[:, 2]) & (py[pr] >= b[:, 1]) & (py[pr] <= b[:, 3])
            pr, pn = pr[keep], pn[keep]
            if pr.size == 0:
                return pr, pn
            if lvl > 0:
                nchild = len(self.levels[lvl - 1])
            else:
                nchild = self.n
            pr = np.repeat(pr, FANOUT)
            pn = (pn[:, None] * FANOUT + np.arange(FANOUT)[None, :]).ravel()
            ok = pn < nchild
            pr, pn = pr[ok], pn[ok]
        # pn are leaf slots
        box_idx = self.order[pn]
        b = self.boxes[box_idx]
        keep = (px[pr] >= b[:, 0]) & (px[pr] <= b[:, 2]) & (py[pr] >= b[:, 1]) & (py[pr] <= b[:, 3])
        return pr[keep], box_idx[keep]

    # -- nearest neighbors ---------------------------------------------------

    def _mindist2(self, bounds: np.ndarray, x: float, y: float) -> np.ndarray:
        dx = np.maximum(np.maximum(bounds[:, 0] - x, x - bounds[:, 2]), 0.0)
        dy = np.maximum(np.maximum(bounds[:, 1] - y, y - bounds[:, 3]), 0.0)
        return dx * dx + dy * dy

    def nearest(self, x: float, y: float, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """Best-first kNN by box mindist (exact for point boxes).  Returns
        (indices, squared distances) sorted ascending, ties by index.
        Reference role: kNN via best-first STRtree traversal (north star)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        heap: list[tuple[float, int, int, int]] = []  # (dist2, tiebreak, level, node)
        # level = len(levels) -> virtual root children at top level; level -1 = leaf box
        top = len(self.levels) - 1
        if top < 0:
            d2 = self._mindist2(self.boxes, x, y)
            idx = np.lexsort((np.arange(self.n), d2))[:k]
            return idx, d2[idx]
        for i, d in enumerate(self._mindist2(self.levels[top], x, y)):
            heapq.heappush(heap, (float(d), 0, top, i))
        out_idx: list[int] = []
        out_d: list[float] = []
        while heap and len(out_idx) < k:
            d, tb, lvl, node = heapq.heappop(heap)
            if lvl == -1:
                out_idx.append(node)
                out_d.append(d)
                continue
            if lvl == 0:
                slots = np.arange(node * FANOUT, min((node + 1) * FANOUT, self.n))
                idxs = self.order[slots]
                d2 = self._mindist2(self.boxes[idxs], x, y)
                for i, dd in zip(idxs, d2):
                    heapq.heappush(heap, (float(dd), int(i), -1, int(i)))
            else:
                lo = node * FANOUT
                hi = min((node + 1) * FANOUT, len(self.levels[lvl - 1]))
                ch = np.arange(lo, hi)
                d2 = self._mindist2(self.levels[lvl - 1][ch], x, y)
                for i, dd in zip(ch, d2):
                    heapq.heappush(heap, (float(dd), 0, lvl - 1, int(i)))
        return np.asarray(out_idx, dtype=np.int64), np.asarray(out_d)
