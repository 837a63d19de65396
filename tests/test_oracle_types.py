"""Regression gate for the driver's pandas/Arrow oracle fetch path.

DuckDB types SUM(BIGINT) as HUGEINT and decimal-literal arithmetic as
DECIMAL; both survive ``fetchall()`` (which the local checker uses) but
degrade to float64 through a pandas/Arrow fetch, stringifying ``1.0``
where Spark says ``1`` and silently breaking the driver's value hash
(root cause of the three round-2 hash failures). Every oracle must
therefore emit only narrow types: we DESCRIBE each oracle body and fail
on any HUGEINT/DECIMAL/UHUGEINT output column — the fix at the SQL site
is a ``::BIGINT`` / ``::DOUBLE`` cast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from teste_carga_avro_vs_json_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
WIDE = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(registry.oracle_sql()))
def test_oracle_emits_no_wide_types(con, name):
    sql = registry.oracle_sql()[name]
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    wide = [
        (col, typ)
        for col, typ, *_ in desc
        if any(w in typ for w in WIDE)
    ]
    assert not wide, (
        f"{name} oracle emits pandas-degrading wide types {wide}; "
        "cast to ::BIGINT / ::DOUBLE at the SQL site"
    )
