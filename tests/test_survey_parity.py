"""SURVEY.md §2 ↔ registry parity: every query id the survey declares
must be implemented ("do not declare ids you don't implement"), and
every oracle-paired registry entry must have runnable SQL."""

from __future__ import annotations

import re
from pathlib import Path

from etl_caltopo_spark.queries import REGISTRY

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def test_all_declared_ids_are_registered():
    text = SURVEY.read_text().split("## 8. Implementation ledger")[0]
    declared = set(re.findall(r"`(q_[a-z0-9_]+)`", text))
    missing = declared - set(REGISTRY)
    assert not missing, f"SURVEY declares unimplemented ids: {sorted(missing)}"


def test_oracle_sql_is_nonempty_for_paired_ids():
    for name, spec in REGISTRY.items():
        if spec.oracle is not None:
            assert spec.oracle.strip(), f"{name} has empty oracle SQL"
        else:
            assert spec.note, f"{name} rows-only without a reason"


def test_ledger_is_current():
    """§8 lists exactly the registered ids (regenerate with
    tools/gen_ledger.py after adding queries)."""
    ledger = SURVEY.read_text().split("## 8. Implementation ledger")[1]
    listed = set(re.findall(r"\| `(q_[a-z0-9_]+)`", ledger))
    assert listed == set(REGISTRY), (
        f"ledger drift: missing={sorted(set(REGISTRY) - listed)} "
        f"stale={sorted(listed - set(REGISTRY))}"
    )
