"""Driver-contract style checks: every queries() entry with an oracle must
match DuckDB on row count, column names, and order-insensitive values."""

import math

import pytest


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if isinstance(r, dict) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def _spark_rows(df):
    cols = sorted(df.columns)
    rows = [{c: row[c] for c in cols} for row in df.collect()]
    return cols, _normalize(rows, cols)


def _duck_rows(duck, sql):
    res = duck.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    raw = res.fetchall()
    sorted_cols = [cols[i] for i in order]
    rows = [tuple(r[i] for i in order) for r in raw]
    return sorted_cols, _normalize(
        [dict(zip(sorted_cols, r)) for r in rows], sorted_cols
    )


def _query_names():
    from tippecanoe_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    from tippecanoe_spark.queries import ORACLES, QUERIES

    df = QUERIES[name](spark, sf_dir)
    s_cols, s_rows = _spark_rows(df)
    if name not in ORACLES:
        assert len(s_rows) >= 0  # rows-only check for non-SQL ops
        return
    d_cols, d_rows = _duck_rows(duck, ORACLES[name])
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
