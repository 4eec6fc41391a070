"""Self-checks for the driver-window rotation (queries/__init__.py).

The driver evidences only the first 50 registry entries per round, so
the rotation IS the evidence pipeline. These tests pin its invariants
so a typo in a per-round green set or a future edit to _window_order
cannot silently waste window slots on already-evidenced queries.
"""

from __future__ import annotations

from big_datatrader_spark import queries as Q

REG = Q.load_registry()


def test_green_sets_name_real_queries():
    """Every name in every per-round green set must exist in the
    registry — a typo here would silently re-queue an evidenced query
    and starve the backlog."""
    for rnd, s in enumerate(Q._ROUND_GREENS, start=1):
        ghosts = {n for n in s if n not in REG}
        assert not ghosts, f"round-{rnd} green set has ghosts: {ghosts}"
    assert all(n in REG for n in Q._R5_CHANGED)


def test_window_head_is_changed_then_backlog():
    """The 50-slot head must be: changed-this-round queries (in order),
    then ONLY never-driver-evidenced queries, alphabetical."""
    names = list(REG)
    head = names[:Q._WINDOW]
    n_changed = len(Q._R5_CHANGED)
    assert tuple(head[:n_changed]) == Q._R5_CHANGED
    rest = head[n_changed:]
    for n in rest:
        assert n not in Q._DRIVER_VERIFIED, (
            f"window slot wasted on already-evidenced {n}")
    assert rest == sorted(rest)
    # and the rest really are the alphabetically-first backlog entries
    backlog = sorted(n for n in REG if n not in Q._DRIVER_VERIFIED
                     and n not in Q._R5_CHANGED)
    assert rest == backlog[:len(rest)]


def test_tail_orders_stalest_evidence_first():
    """After the backlog, greens must appear oldest-round-first so
    every query keeps accumulating recent driver rows."""
    names = list(REG)

    def last_round(n):
        rounds = [i + 1 for i, s in enumerate(Q._ROUND_GREENS)
                  if n in s]
        return max(rounds) if rounds else 0

    tail = [n for n in names if n not in Q._R5_CHANGED
            and last_round(n) > 0]
    rounds = [last_round(n) for n in tail]
    assert rounds == sorted(rounds)


def test_rotation_is_deterministic():
    assert list(Q._window_order(REG)) == list(Q._window_order(REG))
