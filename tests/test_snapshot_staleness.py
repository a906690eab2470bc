"""Standing guard: no registry entry may go >= 2 driver rounds without a
CORRECTNESS row unless the current queries() ordering schedules it for
the next snapshot (VERDICT r4 item 3). Rounds 3 and 4 each discovered a
hand-counted backlog of never-driver-checked entries; this test makes
that discovery automatic and blocking."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import snapshot_staleness  # noqa: E402

from webcollector_spark.plans.queries import Q, SQL, _snapshot_ordered  # noqa: E402


def test_stale_entries_are_scheduled_for_next_snapshot():
    latest, entries = snapshot_staleness.audit(list(_snapshot_ordered(Q)))
    assert latest >= 4  # the repo ships r01-r04 snapshots
    violations = [e for e in entries if e.stale and not e.scheduled]
    assert not violations, (
        f"{len(violations)} registry entries have gone >= "
        f"{snapshot_staleness.MAX_STALENESS} rounds without a driver "
        f"CORRECTNESS row and are NOT in the next snapshot's top-"
        f"{snapshot_staleness.SNAPSHOT_CAP}: "
        + ", ".join(f"{e.name}(last r{e.last_round})" for e in violations[:10])
    )


def test_snapshot_cap_not_overcommitted():
    """More stale entries than snapshot slots can never all rotate in —
    catch the registration-outpaces-rotation failure mode directly."""
    _, entries = snapshot_staleness.audit(list(_snapshot_ordered(Q)))
    stale = [e for e in entries if e.stale]
    assert len(stale) <= snapshot_staleness.SNAPSHOT_CAP, (
        f"{len(stale)} stale entries > {snapshot_staleness.SNAPSHOT_CAP} "
        "snapshot slots: freeze registrations and rotate across rounds"
    )


def test_oracle_ordering_matches_queries_ordering():
    """The driver zips queries() and oracle_sql() by enumeration; the
    rotation is only effective if both orderings agree on the shared
    prefix."""
    qk = list(_snapshot_ordered(Q))
    sk = list(_snapshot_ordered(SQL))
    shared = [k for k in qk if k in SQL]
    assert sk == shared
