"""Driver-contract registry invariants.

The grading driver checks only the first 50 ``queries()`` entries, so any
entry past 50 silently escapes the correctness gate; and every oracle must
name a registered query or it is dead SQL. These are process invariants —
they exist so adding a query can never silently shrink coverage.
"""

import __spark_entry__ as entry

DRIVER_QUERY_WINDOW = 50


def test_registry_fits_driver_window():
    qs = entry.queries()
    assert len(qs) <= DRIVER_QUERY_WINDOW, (
        f"queries() has {len(qs)} entries; the driver checks only the first "
        f"{DRIVER_QUERY_WINDOW} — consolidate before adding more"
    )


def test_every_oracle_names_a_registered_query():
    qs = set(entry.queries())
    orphans = set(entry.oracle_sql()) - qs
    assert not orphans, f"oracle_sql() entries with no queries() entry: {sorted(orphans)}"


def test_registry_entries_are_callable_and_named():
    for name, fn in entry.queries().items():
        assert callable(fn), name
        assert name.replace("_", "").isalnum(), f"non-kebab name: {name}"


def test_parity_doc_names_only_live_queries():
    """Every underscored token in docs/PARITY.md's Query column must name a
    registered query — the audit trail from checklist to driver row broke
    twice (rounds 3 and 4) from stale names after registry consolidations."""
    import os
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PARITY.md")
    qs = set(entry.queries())
    stale = set()
    for line in open(path):
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 6 or cells[1] in ("#", "Component", "---"):
            continue
        query_cell = cells[4] if cells[1].isdigit() else cells[3]
        for tok in re.findall(r"\b[a-z][a-z0-9]*(?:_[a-z0-9]+)+\b", query_cell):
            if tok not in qs:
                stale.add(tok)
    assert not stale, f"PARITY.md Query cells name unregistered queries: {sorted(stale)}"
