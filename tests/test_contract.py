"""Driver-contract smoke + fast oracle parity at sf0.001.

The full-strength parity sweep (sf0.01, the driver's correctness SF) runs
via ``python tools/check_parity.py``; this pytest twin keeps every declared
pair green during development at the smallest fixture.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from data_engineering_1_spark.io import TABLES
from tools.check_parity import compare, duck_connection


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "source", "chunk_number", "chunk_text"}


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(qs) >= 40
    assert set(os_) <= set(qs)
    # every oracle references only pre-registered views
    for name, sql in os_.items():
        assert sql.strip(), name


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_oracle_parity_sf0001(spark, sf_dir, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, sf_dir).toPandas()
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # rows-only contract
        return
    ddf = duck.execute(oracle).df()
    problems = [
        p for p in compare(name, sdf, ddf) if not p.startswith("dtype-diff")
    ]
    assert not problems, problems


def test_sampler_priority_names_are_declared():
    """Every name in the sampler priority list must be a real declared
    query — a typo would silently leave that query unprioritized."""
    declared = set(entry_mod.queries())
    missing = [n for n in entry_mod._SAMPLER_PRIORITY if n not in declared]
    assert not missing, f"priority names not in queries(): {missing}"


def test_priority_queries_lead_the_ordering():
    names = list(entry_mod.queries())
    k = len(entry_mod._SAMPLER_PRIORITY)
    assert names[:k] == list(entry_mod._SAMPLER_PRIORITY)


def test_query_index_in_sync():
    """QUERY_INDEX.md is generated; a registry change without
    regeneration would hand the reader a stale coverage map."""
    import os
    import re

    from data_engineering_1_spark.plans import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, "QUERY_INDEX.md")).read()
    listed = set(re.findall(r"^\| (\w+) \| `", text, re.M))
    declared = set(registry.get_queries())
    assert listed == declared, (
        "QUERY_INDEX.md out of sync; run python tools/gen_query_index.py "
        f"(missing={sorted(declared - listed)}, stale={sorted(listed - declared)})"
    )
