"""Fleet-wide signed-zero contract: no oracle-paired query may emit
``-0.0`` in a float column on EITHER engine.

Why this exists: the driver's value hash stringifies floats, and
``-0.0`` != ``0.0`` as text. Spark's BigDecimal-based ``round``
normalizes a tiny negative value to ``+0.0`` while DuckDB's ``ROUND``
keeps the sign — so any emitted ``round(x, n)`` double whose argument
can be tiny-and-negative (sampling keys, z-scores, PMI, slopes, PSI
terms ...) can hash-mismatch on exactly the rows that round to zero
(the r5 ``weighted_sample_orders`` failure, one row at sf0.01). The
invariant enforced here is stronger than "both engines agree": neither
side may produce a signed zero at all, so the asymmetry cannot arise.
Fix pattern when this fails: canonicalize with ``+ 0.0`` after the
round on BOTH sides (IEEE ``-0.0 + 0.0`` is ``+0.0``).

Runs every oracle-paired query at sf0.001 on both engines — a
registry-wide regression net in the spirit of test_plan_audit.py, so a
newly declared rounded-key query cannot reintroduce the bug class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_engineering_1_spark.io import TABLES
from data_engineering_1_spark.plans import registry

SF_DIR = "/root/testdata/sf0.001"


def _neg_zero_columns(df: pd.DataFrame) -> list[str]:
    bad = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind != "f":
            continue
        v = s.to_numpy()
        mask = np.signbit(v) & (v == 0.0)
        if mask.any():
            bad.append(col)
    return bad


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracle_names() -> list[str]:
    return sorted(registry.get_oracles())


@pytest.mark.parametrize("name", _oracle_names())
def test_no_negative_zero(spark, duck, name):
    fn = registry.get_queries()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    bad = _neg_zero_columns(spark_pdf)
    assert not bad, f"{name}: Spark emits -0.0 in {bad}"
    duck_pdf = duck.execute(registry.get_oracles()[name]).df()
    bad = _neg_zero_columns(duck_pdf)
    assert not bad, f"{name}: oracle emits -0.0 in {bad}"
