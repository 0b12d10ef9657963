"""P15 — snapshot build ordering (reference: postgres/config.go:56-87).

The reference topo-sorts tables so parents are indexed before the tables
that inline into them (scripted updates must land on existing docs). Our
batch engine has the same need when a build spans multiple tables whose
documents embed one another: stages must run parent-first.
"""

from __future__ import annotations


class CycleError(ValueError):
    pass


def topo_order(deps: dict[str, set[str] | list[str]]) -> list[str]:
    """Parent-first order. ``deps[t]`` = tables t inlines FROM (its parents
    must come first). Deterministic (lexicographic among ready nodes);
    raises CycleError on cycles, mirroring the reference's iterative
    ready-set sweep (config.go:64-86)."""
    pending = {t: set(ps) for t, ps in deps.items()}
    for ps in list(pending.values()):
        for p in ps:
            pending.setdefault(p, set())
    out: list[str] = []
    while pending:
        ready = sorted(t for t, ps in pending.items() if not ps)
        if not ready:
            raise CycleError(f"dependency cycle among {sorted(pending)}")
        for t in ready:
            out.append(t)
            del pending[t]
        for ps in pending.values():
            ps.difference_update(ready)
    return out
