"""Lucene-exact sloppy-phrase frequency (VERDICT r2 missing #2).

Implements the published SloppyPhraseScorer semantics (Lucene's
``phraseFreq``, public source): each phrase term's positions are
OFFSET-ADJUSTED (pos - phrase_offset), a min-heap repeatedly advances
the smallest adjusted position, and every time the advancing term
overtakes the next-smallest one a match is scored with slop factor
``1 / (1 + matchLength)`` where matchLength = max(adjusted) -
min(adjusted) minimized over the advance run. Order-tolerant: a
transposed pair ("b a" for query "a b") has matchLength 2 and scores
1/3 when slop >= 2. The result is a FRACTIONAL freq, exactly what
Lucene feeds into the BM25 tf normalization.

Phrases with REPEATED terms ("new york new york") go through
``lucene_sloppy_freq_rpt`` — the repeat-group disambiguation pass of
the same published semantics: slots holding the same term must bind
DISTINCT document positions, so the j-th slot of a repeat group starts
at the term's (j+1)-th occurrence, and whenever an advance lands two
group members on the same document position the lesser one is advanced
until the collision clears (Lucene's initComplex/advanceRpts flow for
single-term repeat groups; our tokenizer emits one term per position,
so the multi-term-repeat machinery has no input shape here).

Ref: the reference's only sloppy consumer is autocomplete
(auto_complete.go:63, match_phrase slop 5); its fused 50-expansion
plan keeps the greedy-window expression for plan-shape reasons and
pins the divergence in tests/test_sloppy.py.
"""

from __future__ import annotations

import heapq

import numpy as np


def lucene_sloppy_freq(pos_lists: list[np.ndarray], slop: int) -> float:
    """Sloppy freq of ONE document.

    ``pos_lists[i]`` = sorted positions of phrase term i (the i-th word
    of the query phrase). Terms must be distinct (no repeats).
    """
    k = len(pos_lists)
    adj: list[np.ndarray] = []
    for i in range(k):
        a = np.asarray(pos_lists[i], dtype=np.int64) - i
        if a.size == 0:
            return 0.0
        adj.append(a)
    iters = [0] * k
    heap = [(int(a[0]), i) for i, a in enumerate(adj)]
    heapq.heapify(heap)
    end = max(int(a[0]) for a in adj)
    freq = 0.0
    pos, i = heapq.heappop(heap)
    match_len = end - pos
    nxt = heap[0][0] if heap else pos
    while True:
        iters[i] += 1
        if iters[i] >= adj[i].size:
            break
        newpos = int(adj[i][iters[i]])
        if newpos > end:
            end = newpos
        if newpos > nxt:
            # done minimizing the current match window — score it
            if match_len <= slop:
                freq += 1.0 / (1 + match_len)
            heapq.heappush(heap, (newpos, i))
            pos, i = heapq.heappop(heap)
            nxt = heap[0][0] if heap else pos
            match_len = end - pos
        else:
            match_len = min(match_len, end - newpos)
    if match_len <= slop:
        freq += 1.0 / (1 + match_len)
    return freq


class _PP:
    """One phrase slot: a cursor over its term's (offset-adjusted)
    positions plus its repeat-group tag."""

    __slots__ = ("arr", "idx", "off", "pos", "grp")

    def __init__(self, arr: np.ndarray, off: int):
        self.arr = arr
        self.idx = 0
        self.off = off
        self.pos = int(arr[0]) - off
        self.grp = -1

    def next_position(self) -> bool:
        self.idx += 1
        if self.idx >= self.arr.size:
            return False
        self.pos = int(self.arr[self.idx]) - self.off
        return True

    @property
    def raw(self) -> int:  # the actual document position bound
        return self.pos + self.off


def lucene_sloppy_freq_rpt(
    pos_lists: list[np.ndarray], slop: int, group_ids: list
) -> float:
    """Sloppy freq of ONE document for a phrase that MAY repeat terms.

    ``group_ids[i]`` identifies which slots hold the same term (pass
    the term strings themselves). Slots sharing a group must bind
    DISTINCT document positions — the disambiguation Lucene's
    SloppyPhraseScorer adds for repeating phrase terms:

    - init: within each repeat group (slot order) the j-th member is
      advanced j extra positions, so members start on distinct
      occurrences;
    - during the heap advance, whenever a group member lands on the
      same document position as another, the LESSER of the two
      (adjusted position, then offset) advances until the collision
      clears; exhausting any cursor ends the scan.

    With no repeated group this reduces exactly to
    ``lucene_sloppy_freq`` (pinned by tests); scoring is the same
    fractional ``1/(1+matchLength)`` accumulation.
    """
    k = len(pos_lists)
    pps: list[_PP] = []
    for i in range(k):
        a = np.asarray(pos_lists[i], dtype=np.int64)
        if a.size == 0:
            return 0.0
        pps.append(_PP(a, i))

    from collections import defaultdict

    byg: dict = defaultdict(list)
    for i, g in enumerate(group_ids):
        byg[g].append(i)
    groups: list[list[_PP]] = []
    for idxs in byg.values():
        if len(idxs) > 1:
            members = [pps[i] for i in idxs]  # slot (offset) order
            for pp in members:
                pp.grp = len(groups)
            groups.append(members)
            # j-th member starts on the term's (j+1)-th occurrence
            for j in range(1, len(members)):
                for _ in range(j):
                    if not members[j].next_position():
                        return 0.0

    end = max(pp.pos for pp in pps)
    queued = list(range(k))

    def pop_min() -> int:
        j = min(
            range(len(queued)),
            key=lambda x: (pps[queued[x]].pos, pps[queued[x]].off),
        )
        return queued.pop(j)

    def advance_pp(pp: _PP) -> bool:
        nonlocal end
        if not pp.next_position():
            return False
        if pp.pos > end:
            end = pp.pos
        return True

    def advance_rpts(pp: _PP) -> bool:
        if pp.grp < 0:
            return True
        cur = pp
        while True:
            other = None
            for pp2 in groups[cur.grp]:
                if pp2 is not cur and pp2.raw == cur.raw:
                    other = pp2
                    break
            if other is None:
                return True
            lo = cur if (cur.pos, cur.off) < (other.pos, other.off) else other
            if not advance_pp(lo):
                return False
            cur = lo  # re-check the advanced one for fresh collisions

    freq = 0.0
    ci = pop_min()
    pp = pps[ci]
    match_len = end - pp.pos
    next_pos = min(pps[i].pos for i in queued) if queued else pp.pos
    while True:
        if not advance_pp(pp):
            break
        if groups and not advance_rpts(pp):
            break
        if pp.pos > next_pos:
            if match_len <= slop:
                freq += 1.0 / (1 + match_len)
            queued.append(ci)
            ci = pop_min()
            pp = pps[ci]
            next_pos = min(pps[i].pos for i in queued) if queued else pp.pos
            match_len = end - pp.pos
        else:
            match_len = min(match_len, end - pp.pos)
    if match_len <= slop:
        freq += 1.0 / (1 + match_len)
    return freq


def greedy_window_freq(pos_lists: list[np.ndarray], slop: int) -> int:
    """Pure-Python twin of the greedy ordered-window HOF expression in
    search.phrase / autocomplete._freq_expr: anchored at each position
    of term 0, each next term must appear in (prev, prev + slop + 1].
    Integer count, order-SENSITIVE — the documented simplification the
    fused autocomplete plan uses."""
    k = len(pos_lists)
    if any(np.asarray(p).size == 0 for p in pos_lists):
        return 0

    def chain(i: int, prev: int) -> bool:
        if i == k:
            return True
        arr = np.asarray(pos_lists[i])
        for x in arr[(arr > prev) & (arr <= prev + slop + 1)]:
            if chain(i + 1, int(x)):
                return True
        return False

    return sum(1 for x0 in np.asarray(pos_lists[0]) if chain(1, int(x0)))
