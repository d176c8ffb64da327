"""Local mirror of the driver's correctness gate: every query in
``__spark_entry__.oracle_sql()`` must match its Spark twin exactly
(row count + schema-sorted, row-sorted values) on the same parquet.

Runs at sf0.001 for speed; the driver runs the same comparison at
sf0.01.  Exact equality here — not approx — because the driver
compares value *hashes*.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import TESTDATA

SF_DIR = f"{TESTDATA}/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


ORACLE_KEYS = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name: str, spark, duck):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    left, right = _normalize(sdf), _normalize(odf)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=True)


def test_rows_only_queries_run(spark):
    """Queries without oracles still must run and return stable schemas."""
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"doc_id", "seq", "subject", "predicate", "object", "subject_hash"} <= set(df.columns)
