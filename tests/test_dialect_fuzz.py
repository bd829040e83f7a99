"""Differential dialect fuzz (SURVEY.md §5) — Hypothesis-generated scalar
expression trees evaluated by BOTH engines over the same inline relation,
results compared as an order-insensitive multiset (the driver's comparison
shape). This guards the repo's #1 recurring incident class — Spark/DuckDB
parity drift — as a PROPERTY over the expression grammar instead of only
at the 527 fixed oracle points.

The grammar is deliberately restricted to the dialect-identical integer
core the oracles rely on: +, -, * (one factor always a leaf, so magnitudes
stay ≤ 100^(depth+1) ≪ 2⁶³ — the int64 power-sum governor lesson),
comparisons, 3-valued boolean logic, CASE/coalesce/nullif/abs/
least/greatest, IS NULL. Division and modulo over signed values, floats
(round-half divergence), and decimals are EXCLUDED by design — the known
divergence classes the house rules already ban from oracled outputs
(documented in tools/selfcheck.py and the parity-pitfall notes); numeric
leaf literals are emitted as CAST(n AS BIGINT) so no intermediate ever
narrows to INT32 in either engine.

Example counts are small: each example is a real Spark job.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 12 fixed rows: zeros, sign mixes, NULLs, ties, the ±100 extremes.
_ROWS = [
    (0, 0, None),
    (1, -1, 3),
    (-7, 13, None),
    (100, -100, 0),
    (42, 42, 42),
    (-100, 99, -5),
    (17, 0, 1),
    (-3, -3, None),
    (55, 7, -100),
    (2, 64, 100),
    (-50, 50, 2),
    (8, -9, -1),
]
_VALUES = ", ".join(
    f"({a}, {b}, {'NULL' if c is None else c})" for a, b, c in _ROWS
)
# Both dialects accept the same inline-VALUES derived table; the BIGINT
# casts keep every downstream operation in int64 on both sides.
TABLE = (
    "(SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
    f" CAST(c AS BIGINT) AS c FROM (VALUES {_VALUES}) AS v(a, b, c)) t"
)

_NUM_LEAVES = [
    "a",
    "b",
    "c",
    "CAST(0 AS BIGINT)",
    "CAST(1 AS BIGINT)",
    "CAST(-1 AS BIGINT)",
    "CAST(7 AS BIGINT)",
    "CAST(100 AS BIGINT)",
    "CAST(-100 AS BIGINT)",
    "CAST(NULL AS BIGINT)",
]
_CMP_OPS = ["<", "<=", "=", "<>", ">", ">="]


@st.composite
def num_expr(draw, depth: int = 4) -> str:
    if depth <= 0 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(_NUM_LEAVES))
    op = draw(
        st.sampled_from(
            [
                "add", "sub", "mul", "abs", "least", "greatest",
                "coalesce", "nullif", "case",
            ]
        )
    )
    d = depth - 1
    if op == "add":
        return f"({draw(num_expr(d))} + {draw(num_expr(d))})"
    if op == "sub":
        return f"({draw(num_expr(d))} - {draw(num_expr(d))})"
    if op == "mul":
        # One factor is always a leaf: bounds growth to x100 per level.
        return f"({draw(st.sampled_from(_NUM_LEAVES))} * {draw(num_expr(d))})"
    if op == "abs":
        return f"abs({draw(num_expr(d))})"
    if op in ("least", "greatest", "coalesce", "nullif"):
        return f"{op}({draw(num_expr(d))}, {draw(num_expr(d))})"
    return (
        f"(CASE WHEN {draw(bool_expr(d))} THEN {draw(num_expr(d))}"
        f" ELSE {draw(num_expr(d))} END)"
    )


@st.composite
def bool_expr(draw, depth: int = 3) -> str:
    if depth <= 0 or draw(st.integers(0, 2)) == 0:
        op = draw(st.sampled_from(_CMP_OPS))
        return (
            f"({draw(st.sampled_from(_NUM_LEAVES))} {op}"
            f" {draw(st.sampled_from(_NUM_LEAVES))})"
        )
    kind = draw(st.sampled_from(["cmp", "and", "or", "not", "isnull"]))
    d = depth - 1
    if kind == "cmp":
        op = draw(st.sampled_from(_CMP_OPS))
        return f"({draw(num_expr(d))} {op} {draw(num_expr(d))})"
    if kind == "and":
        return f"({draw(bool_expr(d))} AND {draw(bool_expr(d))})"
    if kind == "or":
        return f"({draw(bool_expr(d))} OR {draw(bool_expr(d))})"
    if kind == "not":
        return f"(NOT {draw(bool_expr(d))})"
    return f"({draw(num_expr(d))} IS NULL)"


def _cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return int(v)
    return int(v)


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_cell(v) for v in row)
        for row in df[cols].itertuples(index=False)
    ]
    rows.sort(key=repr)
    return rows


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _both(spark, duck, query: str) -> tuple[list[tuple], list[tuple]]:
    return _canon(spark.sql(query).toPandas()), _canon(duck.execute(query).df())


@given(
    exprs=st.lists(
        st.one_of(
            num_expr(),
            bool_expr().map(lambda e: f"CAST({e} AS INT)"),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_scalar_expression_parity(spark, duck, exprs):
    """Row-level parity: every generated expression evaluates identically
    (as a sorted multiset over the 12-row relation) in both engines."""
    sel = ", ".join(
        f"CAST({e} AS BIGINT) AS x{i}" for i, e in enumerate(exprs)
    )
    q = f"SELECT {sel} FROM {TABLE}"
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


@given(expr=num_expr())
@settings(**SETTINGS)
def test_aggregate_parity(spark, duck, expr):
    """Aggregate parity: SUM/MIN/MAX/COUNT of a generated expression,
    grouped by a dialect-identical non-negative modulus key, match
    cross-engine (SUM is cast back to BIGINT — DuckDB widens it)."""
    q = (
        "SELECT g, CAST(sum(x) AS BIGINT) AS s, CAST(min(x) AS BIGINT)"
        " AS lo, CAST(max(x) AS BIGINT) AS hi, count(x) AS n FROM"
        f" (SELECT abs(a) % 3 AS g, CAST({expr} AS BIGINT) AS x"
        f" FROM {TABLE}) u GROUP BY g"
    )
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"
