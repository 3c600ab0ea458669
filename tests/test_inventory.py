"""INVENTORY.md currency check (VERDICT r14 #6): the committed table
must be exactly what tools/gen_inventory.py generates from the
committed artifacts - a hand-edited or forgotten-after-a-query-landed
inventory fails here. Across the artifact boundary (the driver lands a
new CORRECTNESS_r*.json AFTER the inventory was committed) the check
SKIPS with instructions instead of going red: unlike the witness-window
rotation (which must be forced), a stale-by-new-artifacts inventory
carries no correctness risk and is regenerated first thing next round.
"""

import os
import re
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))


def test_inventory_is_current():
    from gen_inventory import _artifact_fingerprint, generate

    path = os.path.join(HERE, "INVENTORY.md")
    assert os.path.exists(path), "INVENTORY.md missing - run tools/gen_inventory.py"
    with open(path) as f:
        committed = f.read()
    m = re.search(r"<!-- inputs: ([0-9a-f]{12}) -->", committed)
    assert m, "INVENTORY.md has no input fingerprint footer"
    if m.group(1) != _artifact_fingerprint():
        pytest.skip(
            "INVENTORY.md predates newly-landed CORRECTNESS artifacts; "
            "regenerate with `python tools/gen_inventory.py`"
        )
    assert committed == generate(), (
        "INVENTORY.md is stale for the current declared-query set; "
        "regenerate with `python tools/gen_inventory.py`"
    )


def test_inventory_covers_every_declared_query():
    import __spark_entry__ as entry_mod

    path = os.path.join(HERE, "INVENTORY.md")
    with open(path) as f:
        committed = f.read()
    rows = set(re.findall(r"^\| (\w+) \| `", committed, flags=re.M))
    declared = set(entry_mod.queries())
    assert rows == declared, (
        f"missing: {sorted(declared - rows)[:5]}, "
        f"extra: {sorted(rows - declared)[:5]}"
    )
