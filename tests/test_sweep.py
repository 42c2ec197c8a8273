"""Full oracle sweep as a first-class repo gate (VERDICT r4 item 8).

The driver's correctness gate samples a PREFIX of queries(); the entries
outside that prefix were previously re-verified only by the judge running
``tools/check_oracles.py`` by hand. This marks the same sweep as a pytest
target so the repo can re-verify ALL registry entries itself:

    python -m pytest -m sweep -q            # the full sweep (slow)
    python -m pytest tests/ -x -q           # default run skips it (addopts)

Runs at sf0.001 so the whole registry finishes in minutes; the driver's
own gate plus the rotation slate covers sf0.01.
"""

import pytest


@pytest.mark.sweep
def test_full_oracle_sweep(spark):
    from tools.check_oracles import run_sweep

    failures = run_sweep(spark, "/root/testdata/sf0.001")
    assert failures == 0
