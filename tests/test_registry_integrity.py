"""Registry integrity: every oracle key has a query; names are sane."""

from __future__ import annotations


def test_registry_shapes():
    import __spark_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 48
    assert set(oracles) <= set(qs)
    # at most a handful of rows-only checks (xxhash64-based ops)
    assert len(set(qs) - set(oracles)) <= 3
    for name in qs:
        assert name.replace("_", "").isalnum()


def test_oracles_parse_in_duckdb():
    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in m.oracle_sql().items():
        con.execute(f"SELECT * FROM ({sql}) LIMIT 0")  # parse + bind only
