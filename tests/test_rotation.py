"""Self-checks for the driver-window rotation (queries/__init__.py).

The driver evidences only the first 50 registry entries per round, so
the rotation IS the evidence pipeline. These tests pin its invariants
against an INDEPENDENT reimplementation of the tier policy (changed ->
backlog -> rows-only-due -> stalest greens) computed from the recorded
per-round evidence sets — so a typo in a green set, a phantom name in
the changed set, or an edit to _window_order cannot silently waste
window slots (the exact failure modes of rounds 5-6: a changed-set
entry that was never registered, and tests pinned to an obsolete
backlog-only head shape). Everything references the round-agnostic
``Q._CHANGED`` alias so a round bump cannot strand them.
"""

from __future__ import annotations

from big_datatrader_spark import queries as Q

REG = Q.load_registry()


def _last_green_round(n):
    rounds = [i + 1 for i, s in enumerate(Q._ROUND_GREENS) if n in s]
    return max(rounds) if rounds else 0  # 0 = never driver-evidenced


def _rows_only_due():
    last = {}
    for rnd, s in Q._ROWS_ONLY_ROUNDS.items():
        for n in s:
            last[n] = max(rnd, last.get(n, 0))
    return frozenset(n for n, rnd in last.items()
                     if rnd <= Q._CURRENT_ROUND - 2)


def _expected_order():
    """Independent restatement of the rotation policy, computed only
    from the recorded evidence sets (never by calling _window_order)."""
    changed = {n: i for i, n in enumerate(Q._CHANGED)}
    due = _rows_only_due()
    companions = {Q._ROWS_ONLY_COMPANIONS[n] for n in due}

    def tier(n):
        last = _last_green_round(n)
        if last == 0:
            return 0                    # backlog: never evidenced
        if n in due or n in companions:
            return 1                    # rows-only re-evidence due,
                                        # plus its hash-exact companion
        return 1 + last                 # greens, stalest first

    return sorted(REG, key=lambda n: (changed.get(n, len(Q._CHANGED)),
                                      tier(n), n))


def test_no_ghost_names_anywhere():
    """Every name in every per-round evidence set AND in the changed
    set must exist in the registry — a ghost in a green set silently
    re-queues an evidenced query; a ghost in the changed set silently
    wastes the head slot (round 6 shipped exactly that)."""
    for rnd, s in enumerate(Q._ROUND_GREENS, start=1):
        ghosts = {n for n in s if n not in REG}
        assert not ghosts, f"round-{rnd} green set has ghosts: {ghosts}"
    for rnd, s in Q._ROWS_ONLY_ROUNDS.items():
        ghosts = {n for n in s if n not in REG}
        assert not ghosts, (
            f"rows-only round-{rnd} set has ghosts: {ghosts}")
    ghosts = {n for n in Q._CHANGED if n not in REG}
    assert not ghosts, f"_CHANGED has ghosts: {ghosts}"


def test_registry_order_matches_tier_policy():
    """The full registry order (not just the head) must equal the
    independently-computed tier order: changed queries first in their
    declared order, then never-evidenced backlog, then rows-only
    queries due on the 2-round cadence, then greens stalest-round
    first, alphabetical within each tier."""
    assert list(REG) == _expected_order()


def test_window_head_spends_slots_by_staleness():
    """No window slot may go to a query strictly fresher than one left
    outside: the max evidence round inside the head (changed and due
    rows-only excluded — they outrank greens by policy) must not
    exceed the min evidence round outside it."""
    names = list(REG)
    head, tail = names[:Q._WINDOW], names[Q._WINDOW:]
    due = _rows_only_due()
    special = (set(Q._CHANGED) | due
               | {Q._ROWS_ONLY_COMPANIONS[n] for n in due})
    head_rounds = [_last_green_round(n) for n in head
                   if n not in special]
    tail_rounds = [_last_green_round(n) for n in tail
                   if n not in special]
    # backlog (round 0) must never be stranded in the tail
    assert 0 not in tail_rounds, "never-evidenced query outside window"
    if head_rounds and tail_rounds:
        assert max(head_rounds) <= min(tail_rounds)


def test_changed_and_due_rows_only_lead_the_window():
    """Changed queries occupy the first slots in declared order;
    every rows-only query whose last clean run is >= 2 rounds old
    must be inside the window (its re-evidence cadence)."""
    names = list(REG)
    head = names[:Q._WINDOW]
    assert tuple(head[:len(Q._CHANGED)]) == Q._CHANGED
    for n in _rows_only_due():
        assert n in head, f"rows-only due {n} missed the window"


def test_rows_only_companions_are_structural():
    """VERDICT r12 ask #2: every rows-only-by-design query must declare
    a hash-exact companion (a registered full-oracle query proving the
    same machinery), and whenever the rows-only member is due for its
    2-round re-evidence, its companion must ride the same window — so
    the pairing guarantee is enforced by the rotation, not incidental
    scheduling."""
    rows_only = set()
    for s in Q._ROWS_ONLY_ROUNDS.values():
        rows_only |= s
    missing = rows_only - Q._ROWS_ONLY_COMPANIONS.keys()
    assert not missing, f"rows-only queries without a companion: {missing}"
    for member, companion in Q._ROWS_ONLY_COMPANIONS.items():
        assert member in REG, f"companion map names ghost member {member}"
        assert companion in REG, (
            f"companion {companion} of {member} is not registered")
        # the companion itself must be full-oracle (hash-exact capable)
        assert REG[companion].oracle is not None, (
            f"companion {companion} has no oracle — it cannot provide "
            f"hash-exact evidence for {member}")
        # and the member must genuinely be rows-only-by-design
        assert REG[member].oracle is None, (
            f"{member} has a full oracle; it does not need a companion")
    head = set(list(REG)[:Q._WINDOW])
    for member in _rows_only_due():
        companion = Q._ROWS_ONLY_COMPANIONS[member]
        assert companion in head, (
            f"{member} is due for rows-only re-evidence but its "
            f"companion {companion} missed the window")


def test_current_round_covers_recorded_evidence():
    """_CURRENT_ROUND must be strictly ahead of every recorded round
    (greens and rows-only): recording round N's evidence without
    bumping the round constant would silently freeze the due cadence."""
    assert Q._CURRENT_ROUND == len(Q._ROUND_GREENS) + 1
    assert all(rnd < Q._CURRENT_ROUND for rnd in Q._ROWS_ONLY_ROUNDS)


def test_rotation_is_deterministic():
    assert list(Q._window_order(REG)) == list(Q._window_order(REG))


def test_r9_window_drains_the_r2_staleness_tail():
    """VERDICT r8 ask #2 commitment, pinned: every query whose latest
    driver evidence is round 2 — the oldest evidence in the registry —
    must sit inside the round-9 window head, so after this round no
    query's evidence is older than r3. Adding or replanning one more
    query than the head budget allows (18 changed + 1 rows-only-due
    + 31 remaining stale = 50; two changed entries are themselves
    r2-stale, so all 33 r2 queries stay in) breaks this test, which
    is the point. Round-9-specific by design: it self-disables once
    the round constant moves on."""
    if Q._CURRENT_ROUND != 9:
        return
    head = set(list(REG)[:Q._WINDOW])
    stale = {n for n in REG if _last_green_round(n) == 2}
    stranded = stale - head
    assert not stranded, f"r2-stale greens evicted from window: {stranded}"


def test_registered_fn_is_the_query_it_claims_to_be():
    """Decorator misbinding guard (round-12 incident: a helper def
    landed between a @query block and its query fn, so the decorator
    registered the HELPER — spark_fn then received (spark, sf_dir)
    and threw at gate time). Every registered spark_fn must be the
    function named after the query (the `_q` suffix is the one
    sanctioned alias, used where a module exposes both a query
    wrapper and a library fn of the same name)."""
    bad = {n: q.spark_fn.__name__ for n, q in REG.items()
           if q.spark_fn.__name__ not in (n, n + "_q")}
    assert not bad, f"decorator registered the wrong function: {bad}"
