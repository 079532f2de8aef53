"""The staged DuckDB twins (tools/verify_staged.py) must compute the
SAME relation as the naive declared oracles — staging only changes
where intermediates materialize. Pinned at fixture scale, where the
naive oracles still run: staged(oracle) == naive(oracle) row for row.
At 10x+ the naive twins spill (the documented oracle-resource rows)
and the staged twins are the value-parity evidence, so this agreement
pin is what ties that evidence back to the declared oracle SQL."""

from __future__ import annotations

import pandas as pd
import pytest

from data_engineering_1_spark.plans import registry
from tools.check_parity import compare, duck_connection
from tools.verify_staged import STAGED


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_twin_equals_naive_oracle(sf_dir, name):
    oracles = registry.get_oracles()
    con = duck_connection(sf_dir)
    try:
        naive = con.execute(oracles[name]).df()
        staged = STAGED[name](con)
    finally:
        con.close()
    problems = [
        p for p in compare(name, staged, naive)
        if not p.startswith("dtype-diff")
    ]
    assert not problems, problems
    assert isinstance(naive, pd.DataFrame)
    # golden_record legitimately finds no >=2-member fuzzy clusters at
    # the tiny test fixture; every other twin must produce rows
    if name != "golden_record_fusion":
        assert len(naive) > 0
