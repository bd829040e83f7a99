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
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# DIALECT_FUZZ_EXAMPLES=150 pytest tests/test_dialect_fuzz.py  ← offline
# hunt budget (each example is a real Spark job; CI keeps the small default)
SETTINGS = dict(
    max_examples=int(os.environ.get("DIALECT_FUZZ_EXAMPLES", "15")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 12 fixed rows: zeros, sign mixes, NULLs, ties, the ±100 extremes; the
# string column covers empties, NULL, case variants, repeats, and
# leading/trailing spaces (ASCII only — binary collation on both sides);
# the date column covers a leap day, ISO-week-53 year boundaries
# (2021-01-01, 2016-01-03), the epoch, month ends, and NULL (each leaf
# probe-verified identical cross-engine before admission).
_ROWS = [
    (0, 0, None, "a", "2020-02-29"),
    (1, -1, 3, "ab", "2021-01-01"),
    (-7, 13, None, "", "1970-01-01"),
    (100, -100, 0, None, None),
    (42, 42, 42, "b c", "2020-12-31"),
    (-100, 99, -5, "aa", "2016-01-03"),
    (17, 0, 1, "AB", "1999-12-31"),
    (-3, -3, None, "xyz", "2024-12-30"),
    (55, 7, -100, " a", "2020-01-31"),
    (2, 64, 100, "a ", "2020-03-01"),
    (-50, 50, 2, "bb", None),
    (8, -9, -1, "cab", "2021-06-15"),
]
_VALUES = ", ".join(
    f"({a}, {b}, {'NULL' if c is None else c},"
    f" {'NULL' if s is None else repr(s)},"
    f" {'NULL' if d is None else repr(d)})"
    for a, b, c, s, d in _ROWS
)
# Both dialects accept the same inline-VALUES derived table; the BIGINT
# casts keep every downstream operation in int64 on both sides, and the
# date column arrives as an ISO string cast identically by both.
TABLE = (
    "(SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
    " CAST(c AS BIGINT) AS c, CAST(s AS STRING) AS s,"
    " CAST(d AS DATE) AS d"
    f" FROM (VALUES {_VALUES}) AS v(a, b, c, s, d)) t"
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
    kind = draw(
        st.sampled_from(
            ["cmp", "and", "or", "not", "isnull", "between", "inlist"]
        )
    )
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
    if kind == "between":
        # r10 probe: BETWEEN's 3VL (NULL operand or bound), empty
        # ranges, and NOT BETWEEN agree cross-engine
        neg = draw(st.sampled_from(["", "NOT "]))
        return (
            f"({draw(num_expr(d))} {neg}BETWEEN"
            f" {draw(st.sampled_from(_NUM_LEAVES))}"
            f" AND {draw(st.sampled_from(_NUM_LEAVES))})"
        )
    if kind == "inlist":
        # r10 probe: literal IN lists with NULL members follow the same
        # 3VL collapse in both engines (x NOT IN (…, NULL) is never TRUE)
        neg = draw(st.sampled_from(["", "NOT "]))
        items = ", ".join(
            draw(st.lists(st.sampled_from(_NUM_LEAVES), min_size=1,
                          max_size=3))
        )
        return f"({draw(num_expr(d))} {neg}IN ({items}))"
    return f"({draw(num_expr(d))} IS NULL)"


_STR_LITS = ["'a'", "'ab'", "''", "'xy'", "'b'", "CAST(NULL AS STRING)"]


@st.composite
def str_expr(draw, depth: int = 3) -> str:
    """Dialect-identical string core. Probed exclusions (divergent or
    unparseable): the ``||`` operator (Spark default dialect rejects it),
    bare ``concat`` (DuckDB ignores NULL args, Spark null-propagates —
    bridged via coalesce), ``substr`` start 0 (Spark reads it as 1 with
    the length budget consumed, DuckDB clamps), negative left/right
    lengths (DuckDB counts from the other end)."""
    if depth <= 0 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(["s", *_STR_LITS]))
    op = draw(
        st.sampled_from(
            [
                "upper", "lower", "trim", "reverse", "substr", "replace",
                "left", "right", "lpad", "rpad", "concat", "coalesce",
                "nullif", "case", "least", "greatest",
            ]
        )
    )
    d = depth - 1
    if op in ("upper", "lower", "trim", "reverse"):
        return f"{op}({draw(str_expr(d))})"
    if op == "substr":
        i = draw(st.integers(1, 4))
        j = draw(st.integers(0, 4))
        return f"substr({draw(str_expr(d))}, {i}, {j})"
    if op == "replace":
        frm = draw(st.sampled_from(["'a'", "'b'", "'ab'", "'x'"]))
        to = draw(st.sampled_from(["'xy'", "''", "'b'"]))
        return f"replace({draw(str_expr(d))}, {frm}, {to})"
    if op in ("left", "right"):
        return f"{op}({draw(str_expr(d))}, {draw(st.integers(0, 5))})"
    if op in ("lpad", "rpad"):
        pad = draw(st.sampled_from(["'x'", "'xy'", "'ab'"]))
        return f"{op}({draw(str_expr(d))}, {draw(st.integers(0, 8))}, {pad})"
    if op == "concat":
        x, y = draw(str_expr(d)), draw(str_expr(d))
        return f"concat(coalesce({x}, ''), coalesce({y}, ''))"
    if op in ("coalesce", "nullif", "least", "greatest"):
        return f"{op}({draw(str_expr(d))}, {draw(str_expr(d))})"
    return (
        f"(CASE WHEN {draw(bool_expr(d))} THEN {draw(str_expr(d))}"
        f" ELSE {draw(str_expr(d))} END)"
    )


_DATE_LITS = [
    "DATE '2020-02-29'",
    "DATE '2021-01-01'",
    "DATE '1999-12-31'",
    "DATE '1970-01-01'",
    "CAST(NULL AS DATE)",
]
# Probe-verified identical cross-engine: year/month/day, quarter,
# weekofyear (ISO on both, checked on week-53 boundaries), dayofyear,
# date_part('day'/'year'). Probed EXCLUSIONS: dayofweek (Spark Sunday=7,
# DuckDB Saturday=6 on the same date), date ± INTERVAL MONTH (DuckDB
# returns TIMESTAMP), d1 - d2 (Spark yields an INTERVAL type, DuckDB an
# integer), 2-arg datediff and months_between (no DuckDB counterpart),
# date_trunc (timestamp vs date result type).
_DATE_FIELD_FNS = ["year", "month", "day", "quarter", "weekofyear",
                   "dayofyear"]


@st.composite
def date_expr(draw, depth: int = 3) -> str:
    """Dialect-identical date core: the d column and probe-verified
    literals under ±day arithmetic, last_day, and the generic NULL/order
    combinators. Day offsets stay within ±400 so no expression leaves
    the four-digit-year domain either engine formats identically."""
    if depth <= 0 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(["d", "d", *_DATE_LITS]))
    op = draw(
        st.sampled_from(
            [
                "plus_days", "minus_days", "last_day", "coalesce",
                "nullif", "least", "greatest", "case", "trunc",
            ]
        )
    )
    dd = depth - 1
    if op == "plus_days":
        return f"({draw(date_expr(dd))} + {draw(st.integers(0, 400))})"
    if op == "minus_days":
        return f"({draw(date_expr(dd))} - {draw(st.integers(0, 400))})"
    if op == "last_day":
        return f"last_day({draw(date_expr(dd))})"
    if op == "trunc":
        # r10 probe: date_trunc anchors agree at week (Monday), month,
        # quarter and year; the shared CAST AS DATE collapses Spark's
        # TIMESTAMP return to DuckDB's DATE. extract(DOW) stays OUT —
        # the Sunday-base divergence (3 vs 2 on the same Tuesday), and
        # extract(EPOCH) is Spark-unparseable.
        unit = draw(st.sampled_from(["week", "month", "quarter", "year"]))
        return f"CAST(date_trunc('{unit}', {draw(date_expr(dd))}) AS DATE)"
    if op in ("coalesce", "nullif", "least", "greatest"):
        return f"{op}({draw(date_expr(dd))}, {draw(date_expr(dd))})"
    return (
        f"(CASE WHEN {draw(bool_expr(dd))} THEN {draw(date_expr(dd))}"
        f" ELSE {draw(date_expr(dd))} END)"
    )


_WIN_PARTS = [
    "",
    "PARTITION BY abs(a) % 2 ",
    "PARTITION BY abs(a) % 3 ",
    "PARTITION BY abs(b) % 2 ",
]
# Explicit direction AND null placement on every generated order key:
# the probe that motivated this core found the engines' DEFAULTS diverge
# (Spark orders ASC NULLS FIRST, DuckDB ASC NULLS LAST — rank() over a
# nullable key silently differs). The trailing ", a" tiebreak totalizes
# the order (a is unique in the relation), so positional functions are
# deterministic in both engines.
_WIN_DIRS = [
    "ASC NULLS FIRST", "ASC NULLS LAST", "DESC NULLS FIRST",
    "DESC NULLS LAST",
]
_ROWS_FRAMES = [
    "",
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    " ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING",
    " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    # r10 probes: frames that exclude the current row entirely —
    # backward-only, forward-only, and their UNBOUNDED edges. Rows with
    # an EMPTY frame agree cross-engine (NULL for sum/first_value, 0 for
    # count). Probed exclusions: EXCLUDE clauses (Spark 4 does not parse
    # them) and GROUPS mode (unimplemented in BOTH engines).
    " ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING",
    " ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING",
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
    " ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING",
]


@st.composite
def window_expr(draw) -> str:
    """Dialect-identical window core. Probed exclusions: default null
    ordering (see _WIN_DIRS), avg (float-division divergence class),
    RANGE over multi-key orders (invalid in both engines — the RANGE
    variant here orders by a single coalesced key, where value-frame
    aggregates are tie-insensitive)."""
    part = draw(st.sampled_from(_WIN_PARTS))
    key = draw(st.sampled_from(_NUM_LEAVES))
    direction = draw(st.sampled_from(_WIN_DIRS))
    order = f"ORDER BY {key} {direction}, a"
    kind = draw(
        st.sampled_from(
            ["pos", "ntile", "lag", "lead", "valpos", "agg", "range_agg",
             "dist"]
        )
    )
    if kind == "pos":
        fn = draw(st.sampled_from(["row_number()", "rank()", "dense_rank()"]))
        return f"{fn} OVER ({part}{order})"
    if kind == "dist":
        # r09 probe: percent_rank/cume_dist rationals agree through the
        # floor(×1e6) quantization (CAST would hit the truncate-vs-round
        # narrowing trap) with the explicit NULLS placement _WIN_DIRS
        # already enforces (defaults differ: Spark NULLS FIRST asc,
        # DuckDB NULLS LAST)
        fn = draw(st.sampled_from(["percent_rank()", "cume_dist()"]))
        return (
            f"CAST(floor({fn} OVER ({part}{order}) * 1000000) AS BIGINT)"
        )
    if kind == "ntile":
        return f"ntile({draw(st.integers(2, 4))}) OVER ({part}{order})"
    if kind in ("lag", "lead"):
        x = draw(st.sampled_from(_NUM_LEAVES))
        # r10 probe: NEGATIVE offsets mirror (lag(x,-1) ≡ lead(x,1))
        # identically in both engines
        n = draw(st.integers(-3, 3))
        dflt = draw(st.sampled_from(["", f", {draw(st.integers(-5, 5))}"]))
        return f"CAST({kind}({x}, {n}{dflt}) OVER ({part}{order}) AS BIGINT)"
    if kind == "valpos":
        x = draw(st.sampled_from(_NUM_LEAVES))
        fn = draw(
            st.sampled_from(
                [f"first_value({x})", f"last_value({x})",
                 f"nth_value({x}, {draw(st.integers(1, 3))})"]
            )
        )
        frame = draw(st.sampled_from(_ROWS_FRAMES))
        return f"CAST({fn} OVER ({part}{order}{frame}) AS BIGINT)"
    if kind == "agg":
        x = draw(num_expr(1))
        fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
        frame = draw(st.sampled_from(_ROWS_FRAMES))
        return f"CAST({fn}({x}) OVER ({part}{order}{frame}) AS BIGINT)"
    # range_agg: single numeric order key, value frame. r08 probes extend
    # the admitted grammar: a NULLABLE raw key with explicit NULLS
    # placement agrees cross-engine (NULL rows form their own frame
    # peer-group in both), as do DESC direction, 0-width and
    # UNBOUNDED-edge value frames.
    x = draw(st.sampled_from(_NUM_LEAVES))
    fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
    rkey = draw(
        st.sampled_from(
            ["coalesce(c, 0)", "c NULLS FIRST", "c NULLS LAST",
             "a DESC", "abs(b) % 3"]
        )
    )
    # r10 probes extend further: value frames strictly BEHIND or strictly
    # AHEAD of the current row's peer group (hi = m PRECEDING / lo =
    # n FOLLOWING, empty-frame rows included) agree in both directions
    # and under NULLS placement. Bound pairs are drawn so lo ≤ hi stays
    # valid in both engines.
    shape = draw(st.sampled_from(["span", "span", "behind", "ahead"]))
    if shape == "behind":
        m = draw(st.integers(1, 5))
        lo = draw(
            st.sampled_from(
                ["UNBOUNDED PRECEDING", f"{m + draw(st.integers(0, 15))} PRECEDING"]
            )
        )
        hi = f"{m} PRECEDING"
    elif shape == "ahead":
        n = draw(st.integers(1, 5))
        lo = f"{n} FOLLOWING"
        hi = draw(
            st.sampled_from(
                ["UNBOUNDED FOLLOWING", f"{n + draw(st.integers(0, 15))} FOLLOWING"]
            )
        )
    else:
        lo = draw(
            st.sampled_from(
                ["UNBOUNDED PRECEDING", "0 PRECEDING",
                 f"{draw(st.integers(1, 20))} PRECEDING"]
            )
        )
        hi = draw(
            st.sampled_from(
                ["CURRENT ROW", "0 FOLLOWING", "5 FOLLOWING",
                 "UNBOUNDED FOLLOWING"]
            )
        )
    return (
        f"CAST({fn}({x}) OVER ({part}ORDER BY {rkey}"
        f" RANGE BETWEEN {lo} AND {hi}) AS BIGINT)"
    )


def _cell(v):
    if v is None:
        return None
    if isinstance(v, str):
        return v
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


@given(
    exprs=st.lists(
        st.one_of(
            str_expr(),
            str_expr().map(lambda e: f"length({e})"),
            st.tuples(str_expr(), str_expr()).map(
                lambda t: f"CAST(({t[0]} < {t[1]}) AS INT)"
            ),
            st.tuples(
                str_expr(),
                st.sampled_from(["'a'", "'b'", "'ab'", "'xy'"]),
            ).map(lambda t: f"instr({t[0]}, {t[1]})"),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_string_expression_parity(spark, duck, exprs):
    """String-core parity: generated string pipelines plus their numeric
    bridges (length, instr, ordering) evaluate identically."""
    sel = ", ".join(f"{e} AS x{i}" for i, e in enumerate(exprs))
    q = f"SELECT {sel} FROM {TABLE}"
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


@given(
    exprs=st.lists(
        st.one_of(
            date_expr().map(lambda e: f"CAST({e} AS STRING)"),
            st.tuples(
                date_expr(), st.sampled_from(_DATE_FIELD_FNS)
            ).map(lambda t: f"CAST({t[1]}({t[0]}) AS BIGINT)"),
            st.tuples(date_expr(), date_expr()).map(
                lambda t: f"CAST(({t[0]} < {t[1]}) AS INT)"
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_date_expression_parity(spark, duck, exprs):
    """Date-core parity: generated date pipelines surfaced through their
    dialect-identical bridges (ISO string form, calendar field
    extraction, ordering) evaluate identically."""
    sel = ", ".join(f"{e} AS x{i}" for i, e in enumerate(exprs))
    q = f"SELECT {sel} FROM {TABLE}"
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


@given(exprs=st.lists(window_expr(), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_window_expression_parity(spark, duck, exprs):
    """Window-core parity: generated window functions over explicit
    direction/null-placement orders with a totalizing tiebreak evaluate
    identically — guarding the engine's largest operator family (the
    e_win keys) as a property."""
    sel = ", ".join(f"{e} AS x{i}" for i, e in enumerate(exprs))
    q = f"SELECT a, {sel} FROM {TABLE}"
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


_SETOPS = [
    "UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT",
    "EXCEPT ALL",
]


@given(
    le=num_expr(2),
    re=num_expr(2),
    op1=st.sampled_from(_SETOPS),
    op2=st.sampled_from(_SETOPS),
)
@settings(**SETTINGS)
def test_setop_parity(spark, duck, le, re, op1, op2):
    """Set-operation parity: generated projections under chained
    UNION/INTERSECT/EXCEPT (DISTINCT and ALL forms, probe-verified
    including NULL grouping semantics) produce identical multisets."""
    l_q = f"SELECT CAST({le} AS BIGINT) AS x, abs(a) % 3 AS y FROM {TABLE}"
    r_q = f"SELECT CAST({re} AS BIGINT) AS x, abs(b) % 3 AS y FROM {TABLE}"
    m_q = f"SELECT c AS x, abs(a) % 2 AS y FROM {TABLE}"
    q = f"SELECT * FROM (({l_q}) {op1} ({r_q}) {op2} ({m_q})) u"
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


_T2 = TABLE.replace(") t", ") t2")


@given(
    inner=num_expr(2),
    outer=num_expr(1),
    form=st.sampled_from(
        ["IN", "NOT IN", "EXISTS", "NOT EXISTS", "SCALAR",
         "IN_CORR", "NOT_IN_CORR", "EXISTS_AGG", "IN_LIMIT"]
    ),
    corr=st.sampled_from(["t2.b = t.a", "t2.a < t.a", "t2.c = t.c"]),
)
@settings(**SETTINGS)
def test_subquery_parity(spark, duck, inner, outer, form, corr):
    """Subquery-predicate parity: generated [NOT] IN (including the
    three-valued NOT-IN-over-NULLs trap — the inner projection can be
    NULL), correlated [NOT] EXISTS, correlated [NOT] IN (r10: the inner
    set varies PER OUTER ROW, so the NULL-in-set 3VL collapse hits some
    rows and not others — subquery 3VL, not just the join-shape kind),
    and correlated scalar aggregates evaluate identically. Probed
    exclusion: quantified ANY/ALL comparisons — Spark 4 does not parse
    them (DuckDB does). Hunt-found (150-example r10 run, minimal repro
    kept): correlated NOT IN with a NULLABLE inner projection is a REAL
    divergence — when the correlation filter leaves an outer row's
    inner set EMPTY, NOT IN must be TRUE and Spark keeps the row, but
    DuckDB's decorrelation drops it whenever the inner expression can
    be NULL (a NOT IN (SELECT NULL FROM t2 WHERE t2.b = t.a): Spark
    returns the unmatched rows, DuckDB returns zero rows). The
    correlated-NOT-IN grammar therefore coalesces its inner projection
    NOT-NULL; every registry oracle's NOT IN (SELECT …) is
    uncorrelated over non-null keys (audited r10). Further r10 probes:
    EXISTS over a bare-aggregate subquery is TRUE even when the filter
    matches nothing (the aggregate still emits one row — both engines),
    IN over an ORDER-BY-LIMIT subquery and zero-row scalar subqueries
    (→ NULL) agree; fenced: a MULTI-ROW scalar subquery RAISES in Spark
    (ANSI) but DuckDB silently takes the first row — oracle SQL must
    never rely on that."""
    if form in ("IN", "NOT IN"):
        q = (
            f"SELECT a, b FROM {TABLE} WHERE CAST({outer} AS BIGINT)"
            f" {form} (SELECT CAST({inner} AS BIGINT) FROM {_T2})"
        )
    elif form in ("IN_CORR", "NOT_IN_CORR"):
        kw = "IN" if form == "IN_CORR" else "NOT IN"
        proj = (
            f"coalesce(CAST({inner} AS BIGINT), 0)"
            if form == "NOT_IN_CORR"
            else f"CAST({inner} AS BIGINT)"
        )
        q = (
            f"SELECT a, b FROM {TABLE} WHERE CAST({outer} AS BIGINT)"
            f" {kw} (SELECT {proj} FROM {_T2}"
            f" WHERE {corr})"
        )
    elif form in ("EXISTS", "NOT EXISTS"):
        q = (
            f"SELECT a, b FROM {TABLE} WHERE {form}"
            f" (SELECT 1 FROM {_T2} WHERE {corr}"
            f" AND CAST({inner} AS BIGINT) IS NOT NULL)"
        )
    elif form == "EXISTS_AGG":
        # a bare aggregate emits one row even over zero input rows, so
        # EXISTS is TRUE regardless of the correlation filter
        q = (
            f"SELECT a, b FROM {TABLE} WHERE EXISTS"
            f" (SELECT max(CAST({inner} AS BIGINT)) FROM {_T2}"
            f" WHERE {corr})"
        )
    elif form == "IN_LIMIT":
        q = (
            f"SELECT a, b FROM {TABLE} WHERE CAST({outer} AS BIGINT) IN"
            f" (SELECT CAST({inner} AS BIGINT) FROM {_T2}"
            f" ORDER BY 1 NULLS LAST, t2.a LIMIT 3)"
        )
    else:
        q = (
            f"SELECT a, (SELECT CAST(max({inner}) AS BIGINT) FROM {_T2}"
            f" WHERE {corr}) AS m FROM {TABLE}"
        )
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


@given(
    se=str_expr(2),
    de=date_expr(2),
    g=st.sampled_from(["abs(a) % 2", "abs(a) % 3", "abs(b) % 2"]),
    having=st.sampled_from(["", " HAVING count(*) > 1", " HAVING count(*) >= 3"]),
)
@settings(**SETTINGS)
def test_typed_aggregate_parity(spark, duck, se, de, g, having):
    """Typed-aggregate parity: MIN/MAX/COUNT/COUNT DISTINCT over
    generated STRING and DATE expressions (dates bridged to ISO strings)
    plus DISTINCT integer sums, under generated HAVING gates. Probed
    exclusion: multi-column count(DISTINCT a, b) — no DuckDB form."""
    q = (
        "SELECT g, min(sv) AS s_lo, max(sv) AS s_hi,"
        " count(sv) AS s_n, count(DISTINCT sv) AS s_d,"
        " CAST(min(dv) AS STRING) AS d_lo, CAST(max(dv) AS STRING)"
        " AS d_hi, count(DISTINCT dv) AS d_d,"
        " CAST(sum(DISTINCT abs(a) % 5) AS BIGINT) AS i_sd"
        f" FROM (SELECT {g} AS g, a, ({se}) AS sv, ({de}) AS dv"
        f" FROM {TABLE}) u GROUP BY g{having}"
    )
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


# ---------------------------------------------------------------------------
# Float/quantization core (round-8). Probe-verified admissions (2026-08-15):
# IEEE +/-/*, nullif-guarded /, abs, sqrt(abs(.)), power(., 2), least/
# greatest, coalesce and CASE over DOUBLE are bit-identical cross-engine
# (same written order -> same bits; neither engine reassociates FP), so any
# bridge that only depends on the BITS — floor/ceil with an explicit BIGINT
# cast, comparisons, sign — is divergence-free. Probe-verified EXCLUSIONS:
#   - round(x, d): Spark rounds the shortest-decimal repr HALF_UP via
#     BigDecimal, DuckDB rounds the binary double — diverges exactly on
#     half-grid values (the documented house rule: floor-quantize instead).
#   - exp/ln/log10: libm last-ulp differences (exp/ln caught DIFF in the
#     admission probe on this very relation).
#   - CAST(double AS BIGINT): Spark TRUNCATES (2.7 -> 2), DuckDB ROUNDS
#     (2.7 -> 3) — a silent off-by-one on every non-integer value; all
#     narrowing goes through floor()/ceil() explicitly.
#   - bare floor/ceil/sign without a cast: value-identical but Spark types
#     floor/ceil as BIGINT and sign as DOUBLE while DuckDB keeps DOUBLE /
#     INT — the BIGINT cast is part of the bridge, not decoration.
#   - signed zero: round/products can yield -0.0 in one engine and 0.0 in
#     the other; the house `+ 0.0` normalization is fuzzed as its own
#     bridge below.
#   - CAST(non-finite AS STRING): 'NaN'/'Infinity'/'-Infinity' in Spark vs
#     'nan'/'inf'/'-inf' in DuckDB (r09 probe). The EQUALITY-CLASS
#     semantics, by contrast, are probe-identical and need no fence:
#     both engines normalize -0.0 = 0.0 and NaN = NaN in GROUP BY,
#     DISTINCT, equi-joins, =, IS DISTINCT FROM, and sort NaN above
#     +inf — so float grouping keys are safe, only their non-finite
#     TEXT rendering is not.
# Float literals are written CAST(x AS DOUBLE): a bare 0.5 is DECIMAL in
# Spark and the decimal lattice is the r04 pitfall class.

_FLT_LEAVES = [
    "CAST(a AS DOUBLE)",
    "CAST(b AS DOUBLE)",
    "CAST(c AS DOUBLE)",
    "CAST(0.5 AS DOUBLE)",
    "CAST(-0.25 AS DOUBLE)",
    "CAST(1 AS DOUBLE)",
    "CAST(0 AS DOUBLE)",
    "CAST(100 AS DOUBLE)",
    "CAST(NULL AS DOUBLE)",
]


@st.composite
def float_expr(draw, depth: int = 3) -> str:
    if depth <= 0 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(_FLT_LEAVES))
    kind = draw(
        st.sampled_from(
            ["add", "sub", "mul", "div", "abs", "sqrt", "pow2",
             "least", "greatest", "coalesce", "case"]
        )
    )
    d = depth - 1
    if kind in ("add", "sub", "mul"):
        op = {"add": "+", "sub": "-", "mul": "*"}[kind]
        # one factor always a leaf: magnitudes stay far from overflow and
        # from the 2^53 integer ceiling the floor-quantize bridge needs
        return f"({draw(float_expr(d))} {op} {draw(st.sampled_from(_FLT_LEAVES))})"
    if kind == "div":
        return (
            f"({draw(float_expr(d))} /"
            f" nullif({draw(st.sampled_from(_FLT_LEAVES))}, CAST(0 AS DOUBLE)))"
        )
    if kind == "abs":
        return f"abs({draw(float_expr(d))})"
    if kind == "sqrt":
        return f"sqrt(abs({draw(float_expr(d))}))"
    if kind == "pow2":
        x = draw(st.sampled_from(_FLT_LEAVES))
        return f"({x} * {x})"
    if kind in ("least", "greatest"):
        return f"{kind}({draw(float_expr(d))}, {draw(float_expr(d))})"
    if kind == "coalesce":
        return f"coalesce({draw(float_expr(d))}, {draw(st.sampled_from(_FLT_LEAVES))})"
    op = draw(st.sampled_from(_CMP_OPS))
    cond = f"{draw(st.sampled_from(_FLT_LEAVES))} {op} {draw(st.sampled_from(_FLT_LEAVES))}"
    return f"(CASE WHEN {cond} THEN {draw(float_expr(d))} ELSE {draw(float_expr(d))} END)"


@given(
    exprs=st.lists(
        st.one_of(
            # the house floor-quantize bridge (exact int grid, both sides)
            float_expr().map(
                lambda e: "CAST(floor(({}) * CAST(10000 AS DOUBLE))"
                " AS BIGINT)".format(e)
            ),
            float_expr().map(lambda e: f"CAST(ceil({e}) AS BIGINT)"),
            float_expr().map(lambda e: f"CAST(sign({e}) AS BIGINT)"),
            # signed-zero normalization: emitted as the raw DOUBLE
            float_expr().map(lambda e: f"(({e}) * CAST(0 AS DOUBLE)) + CAST(0 AS DOUBLE)"),
            st.tuples(float_expr(), float_expr()).map(
                lambda t: f"CAST(({t[0]} < {t[1]}) AS INT)"
            ),
            st.tuples(float_expr(), float_expr()).map(
                lambda t: f"CAST(({t[0]} IS NOT DISTINCT FROM {t[1]}) AS INT)"
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_float_quantization_parity(spark, duck, exprs):
    """Float-core parity: generated DOUBLE pipelines surfaced through the
    house quantization bridges (floor-quantize to an exact BIGINT grid,
    explicit-cast ceil/sign, +0.0 signed-zero normalization, ordering and
    null-safe equality) evaluate identically — the property behind every
    round-to-grid output convention in the registry."""
    sel = ", ".join(f"{e} AS x{i}" for i, e in enumerate(exprs))
    q = f"SELECT {sel} FROM {TABLE}"
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


# ---------------------------------------------------------------------------
# Join-shape/3VL core (round-8). Probe-verified admissions (2026-08-15):
# INNER/LEFT/RIGHT/FULL with arbitrary residual conditions, bare
# SEMI JOIN / ANTI JOIN (the spelling BOTH dialects parse — LEFT SEMI/LEFT
# ANTI are Spark-only, plain SEMI/ANTI is shared), IS NOT DISTINCT FROM
# null-safe equality, coalesce-bridged keys, inequality-only FULL joins and
# CROSS JOIN + WHERE all agree over relations carrying NULL keys, duplicate
# keys and NULL payloads. The NULL-key rows are the point: a 3VL bug in
# either engine's join filter (NULL = NULL matching, NULL residuals
# dropping outer rows) would surface as a multiset diff here.

_JOIN_L = (
    "(SELECT CAST(k AS BIGINT) AS lk, CAST(v AS BIGINT) AS lv FROM (VALUES"
    " (0,0),(1,10),(1,11),(2,20),(NULL,30),(NULL,31),(3,NULL),(4,40))"
    " AS l(k, v))"
)
_JOIN_R = (
    "(SELECT CAST(k AS BIGINT) AS rk, CAST(w AS BIGINT) AS rw FROM (VALUES"
    " (1,100),(1,101),(2,200),(NULL,300),(5,NULL),(4,400),(4,401))"
    " AS r(k, w))"
)
_JOIN_KEY_FORMS = [
    "x.lk = y.rk",
    "x.lk IS NOT DISTINCT FROM y.rk",
    "coalesce(x.lk, -1) = coalesce(y.rk, -1)",
    "x.lk < y.rk",
]
_JOIN_RESIDUALS = [
    "",
    " AND x.lv < y.rw",
    " AND (x.lv + y.rw) > 100",
    " AND x.lv IS NOT NULL",
    " AND (x.lv > y.rw OR x.lv IS NULL)",
    " OR (x.lv IS NULL AND y.rw IS NULL)",
]


@given(
    jt=st.sampled_from(
        ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN",
         "SEMI JOIN", "ANTI JOIN"]
    ),
    key=st.sampled_from(_JOIN_KEY_FORMS),
    residual=st.sampled_from(_JOIN_RESIDUALS),
    agg=st.booleans(),
)
@settings(**SETTINGS)
def test_join_shape_parity(spark, duck, jt, key, residual, agg):
    """Join-core parity: every join shape × key form × 3VL residual
    produces the same multiset (or the same per-key counts when
    aggregated) over NULL-and-duplicate-key relations — the property
    behind the c_join_* family's outer/semi/anti semantics."""
    cond = f"({key}{residual})"
    if jt in ("SEMI JOIN", "ANTI JOIN"):
        cols = "x.lk, x.lv"
    else:
        cols = "x.lk, x.lv, y.rk, y.rw"
    q = f"SELECT {cols} FROM {_JOIN_L} x {jt} {_JOIN_R} y ON {cond}"
    if agg:
        q = (
            f"SELECT lk, count(*) AS n FROM ({q}) j GROUP BY lk"
            if jt in ("SEMI JOIN", "ANTI JOIN")
            else f"SELECT lk, rk, count(*) AS n FROM ({q}) j GROUP BY lk, rk"
        )
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


# ---------------------------------------------------------------------------
# Grouped-multiset core (round-8): ROLLUP / CUBE / GROUPING SETS ×
# aggregate FILTER × grouping()/grouping_id(). Probe-verified admissions
# (2026-08-15): both dialects parse the same ROLLUP/CUBE/GROUPING SETS
# syntax, agree on super-aggregate NULL rows (including over a NULLable
# group expression — the 3VL corner where a data NULL and a rollup NULL
# coexist), on FILTER (WHERE ...) under rollups, on count(DISTINCT) per
# grouping set, and on grouping()/grouping_id() when called on the full
# GROUP BY EXPRESSION. Probe-verified exclusion: grouping()/grouping_id()
# on a SELECT ALIAS of the expression — Spark resolves the lateral alias
# reference and errors (GROUPING_COLUMN_MISMATCH) where DuckDB accepts
# it; the grammar always repeats the expression.

_GRP_EXPRS = ["abs(a) % 2", "abs(b) % 3", "c % 2", "abs(a + b) % 4"]
_AGG_FILTERS = ["", " FILTER (WHERE b > 0)", " FILTER (WHERE c IS NOT NULL)"]


@st.composite
def grouping_query(draw) -> str:
    g1 = draw(st.sampled_from(_GRP_EXPRS))
    g2 = draw(st.sampled_from([e for e in _GRP_EXPRS if e != g1]))
    shape = draw(
        st.sampled_from(
            [
                f"ROLLUP({g1})",
                f"ROLLUP({g1}, {g2})",
                f"CUBE({g1})",
                f"CUBE({g1}, {g2})",
                f"GROUPING SETS (({g1}), ({g2}), ())",
                f"GROUPING SETS (({g1}, {g2}), ({g1}), ())",
            ]
        )
    )
    two = "," in shape.split("(", 1)[1] or "GROUPING SETS" in shape
    aggs = [
        f"count(*){draw(st.sampled_from(_AGG_FILTERS))} AS n",
        f"CAST(sum({draw(st.sampled_from(['a', 'b', 'a + b']))})"
        f"{draw(st.sampled_from(_AGG_FILTERS))} AS BIGINT) AS s",
        f"count(DISTINCT {draw(st.sampled_from(_GRP_EXPRS))}) AS nd",
        f"grouping({g1}) AS gf",
    ]
    if two and "GROUPING SETS" not in shape:
        aggs.append(f"grouping_id({g1}, {g2}) AS gid")
    cols = f"{g1} AS g1" + (f", {g2} AS g2" if two else "")
    having = draw(st.sampled_from(["", " HAVING count(*) > 2"]))
    if draw(st.integers(0, 5)) == 0:
        # GROUP BY ALL (r09 probe: inference agrees on aliased
        # expressions, CASE keys, agg-only selects, and aggs inside
        # arithmetic) — grouping()/grouping_id() markers don't apply
        sel = ", ".join(
            [cols] + [a for a in aggs if not a.startswith("grouping")]
        )
        return f"SELECT {sel} FROM {TABLE} GROUP BY ALL{having}"
    sel = ", ".join([cols] + draw(st.permutations(aggs)))
    return f"SELECT {sel} FROM {TABLE} GROUP BY {shape}{having}"


@given(q=grouping_query())
@settings(**SETTINGS)
def test_grouped_multiset_parity(spark, duck, q):
    """Grouped-multiset parity: every ROLLUP/CUBE/GROUPING SETS shape ×
    FILTERed aggregate × grouping()/grouping_id() marker evaluates to the
    same multiset — the property behind the d_agg_rollup / d_agg_cube /
    d_agg_grouping_sets / d_agg_conditional family."""
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


# ---------------------------------------------------------------------------
# Try-cast core (round-8): string→{BIGINT, DOUBLE, DATE, BOOLEAN} casts
# over messy inputs — the h_cast surface as a property. Probe-verified
# admissions (2026-08-15): both engines agree on integer-grammar strings
# (sign, surrounding whitespace), garbage → NULL, int64-boundary
# overflow → NULL, the full DOUBLE grammar including '.5' / '5.' /
# scientific notation / NaN / ±inf ('1e400' → inf in both), ISO dates
# incl. whitespace-trimmed and invalid-month rejects, and the unpadded
# boolean lexicon {true,false,t,f,1,0} case-insensitively. Probe-verified
# EXCLUSIONS (DuckDB's string→BIGINT grammar is a superset that also
# ROUNDS): '3.9'→4, '1e2'→100, '0x1A'→26, '.5'→1, '5.'→5, '1_000'→1000 —
# all None in Spark; '1_000' also parses as DOUBLE only in DuckDB;
# BOOLEAN: Spark trims (' true '→true) and accepts yes/no — DuckDB does
# neither. These are exactly the forms the registry's h_cast RLIKE
# plausibility guard exists to fence.
#
# Temporal targets (r09 probe): the shared DATE/TIMESTAMP grammar is
# broad — single-digit month/day ('2020-1-5'), surrounding whitespace,
# 'T'-separated datetimes, datetime→DATE truncation, case-insensitive
# 'epoch', 7-digit fractions truncating to µs, invalid
# month/day/hour → NULL, years 0001–9999, pre-1970 — all identical.
# Temporal EXCLUSIONS (fenced out of _TEMPORAL_POOL): slash dates
# ('2020/01/05') and lowercase-'t' datetime separators — DuckDB accepts
# where Spark NULLs; leading '+', bare year '2020', and minute-precision
# timestamps ('2020-01-05 10:11') — Spark accepts where DuckDB NULLs;
# 'now' (nondeterministic and DuckDB-rejected as DATE anyway); 5-digit
# years — both parse but Spark renders '+99999-…' where DuckDB omits
# the plus. The pool also skips the upper/lower wraps of castable_str:
# the 'T' separator is case-sensitive in Spark only.

_CASTABLE = [
    "'1'", "'  42  '", "'-7'", "'+3'", "''", "'abc'", "'12abc'",
    "CAST(NULL AS STRING)", "' -0 '", "'9223372036854775807'",
    "'9223372036854775808'", "'2020-02-29'", "'2020-13-01'",
    "' 2020-02-29 '", "'true'", "'FALSE'", "'t'", "'0'",
]
_DOUBLE_ONLY = ["'3.9'", "'.5'", "'5.'", "'1e2'", "'NaN'", "'inf'",
                "'-inf'", "'1e400'"]
# every entry probe-verified identical under BOTH try_cast(… AS DATE)
# and try_cast(… AS TIMESTAMP) (2026-08-16)
_TEMPORAL_POOL = [
    "'2020-01-05'", "'2020-1-5'", "' 2020-01-05'",
    "'2020-01-05T10:11:12'", "'2020-01-05 10:11:12'",
    "' 2020-01-05 10:11:12 '",
    "'2020-01-05 10:11:12.5'", "'2020-01-05 10:11:12.1234567'",
    "'2020-02-30'", "'2020-13-01'", "'20200105'", "'05-01-2020'",
    "'2020.01.05'", "'2020-01-05 25:00:00'", "'epoch'", "'Epoch'",
    "''", "'abc'", "CAST(NULL AS STRING)", "'0001-01-01'",
    "'9999-12-31 23:59:59.999999'", "'1969-12-31 23:59:59'",
]
# hunt-found (first 400-example run): a TRAILING space after a DATE-ONLY
# string diverges under the TIMESTAMP target — DuckDB reads it as an
# empty time part and NULLs (' 2020-01-05 ' → NULL) where Spark trims;
# both engines accept it as DATE, and a trailing space after a FULL
# datetime is fine in both — so these forms are date-target-only.
_TEMPORAL_DATE_ONLY = ["' 2020-01-05 '", "'2020-01-05 '"]


@st.composite
def castable_str(draw, pool) -> str:
    base = draw(st.sampled_from(pool))
    wrap = draw(st.sampled_from(["", "trim", "upper", "lower"]))
    return f"{wrap}({base})" if wrap else base


@given(
    exprs=st.lists(
        st.one_of(
            castable_str(_CASTABLE).map(
                lambda e: f"try_cast({e} AS BIGINT)"
            ),
            castable_str(_CASTABLE + _DOUBLE_ONLY).map(
                lambda e: f"(try_cast({e} AS DOUBLE) IS NULL)"
            ),
            castable_str(_CASTABLE + _DOUBLE_ONLY).map(
                lambda e: f"isnan(coalesce(try_cast({e} AS DOUBLE),"
                " CAST(0 AS DOUBLE)))"
            ),
            # finite numeric grammar → exact value on the 1e4 grid
            castable_str(
                ["'1'", "'  42  '", "'-7'", "'3.9'", "'.5'", "'5.'",
                 "'1e2'", "'abc'", "''", "CAST(NULL AS STRING)"]
            ).map(
                lambda e: "CAST(floor(try_cast({} AS DOUBLE)"
                " * CAST(10000 AS DOUBLE)) AS BIGINT)".format(e)
            ),
            castable_str(_CASTABLE).map(
                lambda e: f"CAST(try_cast({e} AS DATE) AS STRING)"
            ),
            st.sampled_from(_TEMPORAL_POOL + _TEMPORAL_DATE_ONLY).map(
                lambda e: f"CAST(try_cast({e} AS DATE) AS STRING)"
            ),
            st.sampled_from(_TEMPORAL_POOL).map(
                lambda e: f"CAST(try_cast({e} AS TIMESTAMP) AS STRING)"
            ),
            st.sampled_from(
                ["'true'", "'FALSE'", "'t'", "'f'", "'1'", "'0'", "'abc'",
                 "CAST(NULL AS STRING)"]
            ).map(lambda e: f"try_cast({e} AS BOOLEAN)"),
            # r10 probe: string→DECIMAL rounds HALF_UP in BOTH engines
            # (unlike the fenced decimal→decimal DOWN-rescale, which
            # truncates in DuckDB), overflow NULLs in both, and
            # exponent/sign/bare-point grammars agree. Fenced: an
            # UNDERSCORE separator string ('1_0') casts in DuckDB but
            # NULLs in Spark — the r09 numeric-literal trap extended to
            # the cast grammar.
            castable_str(
                ["'3.999'", "'3.994'", "'-3.995'", "'0.005'", "'1e2'",
                 "'  2.5 '", "'abc'", "'99999.99'", "'100000'",
                 "'+7.25'", "'.5'", "'5.'", "CAST(NULL AS STRING)"]
            ).map(
                lambda e: f"CAST(try_cast({e} AS DECIMAL(7,2)) AS STRING)"
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_try_cast_parity(spark, duck, exprs):
    """Try-cast parity: every generated cast pipeline over the shared
    grammar (integer strings for BIGINT, the full double grammar incl.
    NaN/inf via null/isnan/quantize bridges, ISO dates, the unpadded
    boolean lexicon) evaluates identically — the property behind the
    h_cast family and every try_cast ingestion guard in the registry."""
    sel = ", ".join(f"{e} AS x{i}" for i, e in enumerate(exprs))
    q = f"SELECT {sel} FROM (SELECT 1 AS one) o"
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


# ---------------------------------------------------------------------------
# Translated-pair core (round-8): unlike the 12 shared-text cores, this one
# renders each generated expression TWICE — Spark spelling and DuckDB
# spelling — and compares the multisets. It fuzzes the TRANSLATION IDIOMS
# the hand-written oracles rely on for the array/explode family:
#     split ↔ string_split        sequence ↔ generate_series
#     transform ↔ list_transform  filter ↔ list_filter
#     array_distinct ↔ list_distinct    array_sort ↔ list_sort
#     size ↔ len                  try_element_at ↔ list[i]
#     array_contains ↔ list_contains    array_join ↔ array_to_string
#     aggregate(+, 0L) ↔ list_sum array_max/min ↔ list_max/min
#     slice(a, i, n) ↔ a[i : i+n-1]     explode ↔ unnest
# Probe-verified identical (2026-08-15) including out-of-bounds and
# NEGATIVE indexing (both count from the end), NULL/empty source strings,
# stepped sequences, and column-dependent sequence bounds under explode.
# Probe-verified exclusions: index literal 0 — Spark rejects it at
# compile time (INVALID_INDEX_OF_ZERO) where DuckDB returns NULL — and a
# REAL trap this core's first 150-example hunt caught: Spark
# array_join(EMPTY, d) → '' but DuckDB array_to_string(EMPTY, d) → NULL
# (list_aggregate string_agg too) — every oracle translating array_join
# must coalesce the DuckDB side to '' — but only under a NOT NULL
# guard, since a NULL array joins to NULL in both engines (the two-step
# bridge the grammar now carries). Second catch: Spark array_distinct
# keeps first-occurrence order, DuckDB list_distinct is UNORDERED — any
# ordered bridge (element_at/slice/join) after a distinct needs the
# sort-after-distinct convention both sides.


@st.composite
def paired_int_array(draw, depth: int = 2):
    """Returns (spark_sql, duck_sql) for an integer-array expression."""
    if depth <= 0 or draw(st.integers(0, 1)) == 0:
        mode = draw(st.sampled_from(["asc", "fenced", "signed"]))
        if mode == "asc":
            lo = draw(st.integers(1, 4))
            hi = lo + draw(st.integers(0, 5))
            step = draw(st.sampled_from(["", ", 2", ", 3"]))
            return (f"sequence({lo}, {hi}{step})",
                    f"generate_series({lo}, {hi}{step})")
        if mode == "fenced":
            # The DIVERGENCE ZONE (r11 probe): no-step sequence(a, b) with
            # a > b AUTO-STEPS DOWN in Spark ([4,3,2,1]) where DuckDB's
            # generate_series is EMPTY — the ADVICE-r2 trap class every
            # n-gram builder fences by hand. The correct Spark spelling of
            # generate_series(a, b) over an arbitrary range is the bounds
            # filter below.
            lo = draw(st.integers(1, 4))
            hi = lo + draw(st.integers(-4, 4))
            return (
                f"filter(sequence({lo}, {hi}),"
                f" x -> x >= {lo} AND x <= {hi})",
                f"generate_series({lo}, {hi})",
            )
        # signed: explicit step whose sign may CONTRADICT the range —
        # Spark sequence THROWS (Illegal sequence boundaries) where DuckDB
        # returns empty; the lazy CASE sign-guard is the translation.
        # Equal bounds agree under any step sign (probed: both [a]).
        a = draw(st.integers(1, 6))
        b = draw(st.integers(1, 6))
        stp = draw(st.sampled_from([-3, -2, -1, 1, 2, 3]))
        return (
            f"CASE WHEN ({a} <= {b} AND {stp} > 0)"
            f" OR ({a} >= {b} AND {stp} < 0)"
            f" THEN sequence({a}, {b}, {stp})"
            f" ELSE CAST(array() AS ARRAY<INT>) END",
            f"generate_series({a}, {b}, {stp})",
        )
    s, d = draw(paired_int_array(depth - 1))
    kind = draw(
        st.sampled_from(
            ["transform", "filter", "distinct", "sort",
             "intersect", "union", "except_"]
        )
    )
    if kind in ("intersect", "union", "except_"):
        # r09 probe: the set-op family agrees through the
        # sort-after-set-op convention (Spark keeps first-occurrence
        # order, DuckDB's list ops are unordered — same class as the
        # list_distinct catch above). DuckDB spells union/except as
        # distinct-concat / filtered-distinct; arrays here are NULL-free
        # by construction so list_contains 3VL never bites.
        s2, d2 = draw(paired_int_array(depth - 1))
        if kind == "intersect":
            return (f"array_sort(array_intersect({s}, {s2}))",
                    f"list_sort(list_intersect({d}, {d2}))")
        if kind == "union":
            return (f"array_sort(array_union({s}, {s2}))",
                    f"list_sort(list_distinct(list_concat({d}, {d2})))")
        return (
            f"array_sort(array_except({s}, {s2}))",
            f"list_sort(list_filter(list_distinct({d}),"
            f" x -> NOT list_contains({d2}, x)))",
        )
    if kind == "transform":
        lam = draw(st.sampled_from(["x + 1", "x * x", "x - 3", "x * -1"]))
        return (f"transform({s}, x -> {lam})",
                f"list_transform({d}, x -> {lam})")
    if kind == "filter":
        pred = draw(st.sampled_from(["x % 2 = 0", "x > 3", "x <= 5"]))
        return (f"filter({s}, x -> {pred})", f"list_filter({d}, x -> {pred})")
    if kind == "distinct":
        # ordered-bridge safety: Spark array_distinct preserves
        # first-occurrence order, DuckDB list_distinct returns ARBITRARY
        # order (probed: [3,1,2,1] -> [3,1,2] vs [2,1,3]) — the sort
        # wrapper is the house collect_set/array_sort convention, not
        # decoration
        return (f"array_sort(array_distinct({s}))",
                f"list_sort(list_distinct({d}))")
    return (f"array_sort({s})", f"list_sort({d})")


@st.composite
def paired_str_array(draw):
    base = draw(
        st.sampled_from(
            ["'a b c ab b'", "'c a b'", "'x'", "''", "'a  b'",
             "CAST(NULL AS STRING)"]
        )
    )
    if draw(st.booleans()):
        # r09 probe: Spark's split() is REGEX-based; the DuckDB twin for
        # a regex separator is regexp_split_to_array (string_split is
        # literal-only). Trailing-empty-element conventions agree.
        pat = draw(st.sampled_from(["' '", "'[0-9]+'", "' +'", "'b'"]))
        return (
            f"split({base}, {pat})",
            f"regexp_split_to_array({base}, {pat})",
        )
    return (f"split({base}, ' ')", f"string_split({base}, ' ')")


@st.composite
def paired_scalar(draw):
    """(spark_sql, duck_sql) scalar bridges over a paired array."""
    typ = draw(st.sampled_from(["int", "str"]))
    s, d = draw(paired_int_array() if typ == "int" else paired_str_array())
    # sortnull's nullif-injection grammar is int-only; drawing it for str
    # would silently fall through to the slice tail and misreport which
    # kind ran in shrunk examples, so condition the kind list on typ.
    kinds = ["size", "elem", "contains", "join_or_sum", "maxmin", "slice"]
    if typ == "int":
        kinds.append("sortnull")
    kind = draw(st.sampled_from(kinds))
    if kind == "sortnull":
        # r09 probe: NULL PLACEMENT in sorts is cross-engine identical —
        # array_sort ↔ list_sort both default NULLS LAST; sort_array's
        # NULLS-FIRST default pairs with the explicit DuckDB modifier;
        # descending sort_array(…, false) ↔ 'DESC', 'NULLS LAST'. Read
        # back positionally so the placement (not just the multiset) is
        # pinned; nullif injects the NULLs the base grammar never makes.
        k = draw(st.integers(1, 6))
        i = draw(st.sampled_from([1, 2, -1]))
        s_fn, d_args = draw(
            st.sampled_from(
                [("array_sort", "'ASC', 'NULLS LAST'"),
                 ("sort_array", "'ASC', 'NULLS FIRST'")]
            )
        )
        return (
            f"try_element_at({s_fn}(transform({s},"
            f" x -> nullif(x, {k}))), {i})",
            f"(list_sort(list_transform({d}, x -> nullif(x, {k})),"
            f" {d_args}))[{i}]",
        )
    if kind == "size":
        return (f"size({s})", f"len({d})")
    if kind == "elem":
        i = draw(st.sampled_from([1, 2, 3, 9, -1, -2]))
        return (f"try_element_at({s}, {i})", f"({d})[{i}]")
    if kind == "contains":
        if typ == "int":
            return (f"array_contains({s}, 4)", f"list_contains({d}, 4)")
        return (f"array_contains({s}, 'b')", f"list_contains({d}, 'b')")
    if kind == "join_or_sum":
        if typ == "int":
            return (
                f"aggregate({s}, 0L, (a, x) -> a + x)",
                f"coalesce(list_sum({d}), 0)",
            )
        return (
            f"array_join(array_sort({s}), ',')",
            f"(CASE WHEN {d} IS NOT NULL THEN"
            f" coalesce(array_to_string(list_sort({d}), ','), '') END)",
        )
    if kind == "maxmin":
        fn = draw(st.sampled_from(["max", "min"]))
        if typ == "int":
            return (f"array_{fn}({s})", f"list_{fn}({d})")
        return (f"array_{fn}({s})", f"list_{fn}({d})")
    i = draw(st.integers(1, 3))
    n = draw(st.integers(1, 3))
    if typ == "int":
        return (
            f"size(slice({s}, {i}, {n}))",
            f"len(({d})[{i}:{i + n - 1}])",
        )
    return (
        f"array_join(slice({s}, {i}, {n}), ',')",
        f"(CASE WHEN {d} IS NOT NULL THEN coalesce("
        f"array_to_string(({d})[{i}:{i + n - 1}], ','), '') END)",
    )


@given(pairs=st.lists(paired_scalar(), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_translated_pair_parity(spark, duck, pairs):
    """Translated-pair parity: each generated array pipeline rendered in
    BOTH dialect spellings evaluates to the same multiset — the property
    behind every split/sequence/explode translation the oracle corpus
    hand-writes."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    s_rows = _canon(spark.sql(f"SELECT {s_sel}").toPandas())
    o_rows = _canon(duck.execute(f"SELECT {d_sel}").df())
    assert s_rows == o_rows, f"divergence for: {s_sel}  VS  {d_sel}"


@given(
    arr=paired_int_array(),
    rng=st.tuples(st.integers(0, 5), st.integers(0, 12), st.integers(1, 4)),
)
@settings(**SETTINGS)
def test_translated_explode_parity(spark, duck, arr, rng):
    """explode ↔ unnest parity: the flattened rows of any paired array
    agree, including through a downstream aggregate; posexplode's
    0-based ordinality bridges as generate_subscripts(…) − 1 (r09
    probe — DuckDB's generate_series can't lateral-join on the array
    length, so subscripts is THE ordinality spelling); the range()
    TABLE function is shared except its output column NAME (Spark
    `id`, DuckDB `range` — the alias is the bridge), r09-probed over
    bounds, steps, negative steps, empties, and self-joins."""
    s, d = arr
    sq = (
        "SELECT CAST(sum(x) AS BIGINT) AS s, count(*) AS n"
        f" FROM (SELECT explode({s}) AS x) e"
    )
    dq = (
        "SELECT CAST(sum(x) AS BIGINT) AS s, count(*) AS n"
        f" FROM (SELECT unnest({d}) AS x) e"
    )
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"
    # ordinality: position-weighted sum pins order, not just multiset
    sq2 = (
        "SELECT CAST(sum((pos + 1) * x) AS BIGINT) AS ws"
        f" FROM (SELECT posexplode({s}) AS (pos, x)) e"
    )
    dq2 = (
        "SELECT CAST(sum(pos1 * x) AS BIGINT) AS ws FROM"
        f" (SELECT generate_subscripts({d}, 1) AS pos1,"
        f" unnest({d}) AS x) e"
    )
    s2 = _canon(spark.sql(sq2).toPandas())
    o2 = _canon(duck.execute(dq2).df())
    assert s2 == o2, f"divergence for: {sq2}  VS  {dq2}"
    lo, span, step = rng
    sq3 = (f"SELECT CAST(sum(id) AS BIGINT) AS s, count(*) AS n"
           f" FROM range({lo}, {lo + span}, {step})")
    dq3 = (f"SELECT CAST(sum(range) AS BIGINT) AS s, count(*) AS n"
           f" FROM range({lo}, {lo + span}, {step})")
    s3 = _canon(spark.sql(sq3).toPandas())
    o3 = _canon(duck.execute(dq3).df())
    assert s3 == o3, f"divergence for: {sq3}  VS  {dq3}"


# Aggregate translation pairs (round-8, same paired-rendering harness).
# Probe-verified identical: the md5-bucket splice (Spark
# pmod(conv(substring(md5 …,16,10)), m) ↔ DuckDB ('0x'||…)::BIGINT % m —
# the corpus' deterministic-split convention), collect_set ↔
# string_agg(DISTINCT … ORDER BY) and collect_list ↔ string_agg under the
# sort-before-join convention, percentile ↔ quantile_cont,
# percentile_approx(…, 2^31-1) ↔ quantile_disc, median. Probe-verified
# exclusion: mode() — tie-breaking differs (probed: {a×2, ab×2} → Spark
# 'ab', DuckDB 'a').

_AGG_GROUPS = ["", " GROUP BY g"]


@st.composite
def paired_aggregate(draw):
    kind = draw(
        st.sampled_from(["md5_bucket", "set_join", "list_join", "pctl",
                         "pctl_array", "pctl_disc", "median"])
    )
    if kind == "md5_bucket":
        w = draw(st.sampled_from([4, 8, 15]))
        m = draw(st.integers(2, 12))
        return (
            f"count(DISTINCT pmod(conv(substring(md5(s), 1, {w}), 16, 10),"
            f" {m}))",
            f"count(DISTINCT ('0x' || substring(md5(s), 1, {w}))::BIGINT"
            f" % {m})",
        )
    if kind == "set_join":
        return (
            "array_join(array_sort(collect_set(s)), ',')",
            "string_agg(DISTINCT s, ',' ORDER BY s)",
        )
    if kind == "list_join":
        return (
            "array_join(array_sort(collect_list(s)), ',')",
            "string_agg(s, ',' ORDER BY s)",
        )
    if kind == "pctl":
        q = draw(st.sampled_from(["0.1", "0.25", "0.5", "0.75", "0.9"]))
        return (
            f"CAST(round(percentile(a, {q}), 6) + 0.0 AS DOUBLE)",
            f"CAST(round(quantile_cont(a, {q}), 6) + 0.0 AS DOUBLE)",
        )
    if kind == "pctl_array":
        # r09 probe: the ARRAY form matches element-wise too
        qs = draw(
            st.lists(st.sampled_from(["0.1", "0.25", "0.5", "0.75", "0.9"]),
                     min_size=1, max_size=3, unique=True)
        )
        s_qs = ", ".join(qs)
        return (
            f"array_join(transform(percentile(a, array({s_qs})),"
            " x -> format_string('%.6e', x)), ';')",
            f"array_to_string(list_transform(quantile_cont(a, [{s_qs}]),"
            " x -> printf('%.6e', x)), ';')",
        )
    if kind == "pctl_disc":
        q = draw(st.sampled_from(["0.25", "0.5", "0.75"]))
        return (
            f"percentile_approx(a, {q}, 2147483647)",
            f"quantile_disc(a, {q})",
        )
    return ("CAST(median(a) AS DOUBLE)", "CAST(median(a) AS DOUBLE)")


@given(
    pairs=st.lists(paired_aggregate(), min_size=1, max_size=4),
    grp=st.sampled_from(_AGG_GROUPS),
)
@settings(**SETTINGS)
def test_translated_aggregate_parity(spark, duck, pairs, grp):
    """Aggregate-pair parity: the corpus' deterministic-split md5 splice,
    the sort-before-join collect conventions and the percentile family
    rendered in both dialect spellings agree, grouped and global."""
    src = (
        "(SELECT abs(a) % 3 AS g, a, s FROM"
        f" (SELECT a, b, c, s FROM {TABLE}) u) v"
    )
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    gcol = "g, " if grp else ""
    sq = f"SELECT {gcol}{s_sel} FROM {src}{grp}"
    dq = f"SELECT {gcol}{d_sel} FROM {src}{grp}"

    # the module _cell truncates floats to ints (fine for the BIGINT
    # cores); the percentile pairs need EXACT double comparison or a
    # 0.1-sized interpolation divergence would be masked
    def strong(df):
        cols = sorted(df.columns)
        rows = [
            tuple(
                repr(v) if isinstance(v, float) and v == v else _cell(v)
                for v in row
            )
            for row in df[cols].itertuples(index=False)
        ]
        rows.sort(key=repr)
        return rows

    s_rows = strong(spark.sql(sq).toPandas())
    o_rows = strong(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Timestamp translation pairs (round-8, paired-rendering harness): the
# idioms every events-table oracle hand-writes. Probe-verified identical
# (2026-08-15) including pre-1970 (negative-epoch) values, fractional
# seconds, and NULLs: unix_micros ↔ epoch_us; timestampdiff(MICROSECOND)
# ↔ date_diff('microseconds') (the SECOND-granularity form is the
# documented crossing-vs-elapsed divergence — micros stay exact);
# date_trunc at subday units (shared text; day-or-coarser units are a
# TYPE divergence this core's first run caught: DuckDB returns DATE
# where Spark keeps TIMESTAMP — re-timestamped on the DuckDB side,
# extending the r07 date-core finding to timestamp inputs);
# hour/minute/second extraction (second floor-bridged: DuckDB's returns
# the fractional type); timestamp_micros ↔ make_timestamp(µs);
# epoch-bucketing with DIV ↔ // — BOTH truncate toward zero, probed on
# negative epochs (-7 DIV 2 = -3 = -7 // 2).

_TS_ROWS = (
    "(SELECT CAST(t AS TIMESTAMP) AS ts FROM (VALUES"
    " ('2026-01-15 10:30:45.123456'), ('1999-12-31 23:59:59.999999'),"
    " ('1970-01-01 00:00:00'), ('1969-12-31 22:45:01.5'),"
    " ('2020-02-29 12:00:00.5'), ('2024-12-30 00:00:01'), (NULL))"
    " AS v(t)) tt"
)
_TS_EPOCH = ("unix_micros(ts)", "epoch_us(ts)")


@st.composite
def paired_ts_scalar(draw):
    kind = draw(
        st.sampled_from(
            ["epoch", "diff_us", "trunc", "extract", "bucket", "roundtrip"]
        )
    )
    se, de = _TS_EPOCH
    if kind == "epoch":
        return (se, de)
    if kind == "diff_us":
        anchor = draw(
            st.sampled_from(
                ["TIMESTAMP '2020-01-01 00:00:00'",
                 "TIMESTAMP '1969-06-01 12:00:00'"]
            )
        )
        return (
            f"timestampdiff(MICROSECOND, {anchor}, ts)",
            f"date_diff('microseconds', {anchor}, ts)",
        )
    if kind == "trunc":
        unit = draw(
            st.sampled_from(["hour", "minute", "second", "day", "month",
                             "year", "quarter", "week"])
        )
        s = f"CAST(date_trunc('{unit}', ts) AS STRING)"
        if unit in ("hour", "minute", "second"):
            return (s, s)  # subday: TIMESTAMP in both
        # day-or-coarser: DuckDB returns DATE where Spark keeps
        # TIMESTAMP (found by this core's first run) — re-timestamp the
        # DuckDB side before the string bridge
        return (
            s,
            f"CAST(CAST(date_trunc('{unit}', ts) AS TIMESTAMP)"
            " AS STRING)",
        )
    if kind == "extract":
        fld = draw(st.sampled_from(["hour", "minute", "second"]))
        if fld == "second":
            return ("second(ts)", "CAST(floor(second(ts)) AS BIGINT)")
        return (f"{fld}(ts)", f"{fld}(ts)")
    if kind == "bucket":
        m = draw(
            st.sampled_from(["3600000000", "60000000", "86400000000"])
        )
        return (f"({se}) DIV {m}", f"({de}) // {m}")
    off = draw(st.integers(-3, 3))
    return (
        f"CAST(timestamp_micros(({se}) + {off}) AS STRING)",
        f"CAST(make_timestamp(({de}) + {off}) AS STRING)",
    )


@given(pairs=st.lists(paired_ts_scalar(), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_translated_timestamp_parity(spark, duck, pairs):
    """Timestamp-pair parity: the epoch/diff/trunc/extract/bucket
    translation idioms of the events oracles agree in both dialect
    spellings, including negative epochs and NULLs."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    s_rows = _canon(spark.sql(f"SELECT {s_sel} FROM {_TS_ROWS}").toPandas())
    o_rows = _canon(duck.execute(f"SELECT {d_sel} FROM {_TS_ROWS}").df())
    assert s_rows == o_rows, f"divergence for: {s_sel}  VS  {d_sel}"


# Regex translation pairs (round-8, paired-rendering harness). The TWO
# traps this family's probes caught:
#   1. DEFAULT SCOPE: Spark regexp_replace replaces ALL matches, DuckDB
#      only the FIRST — every DuckDB-side replace needs the 'g' flag
#      (the corpus convention, scalars.py:75, audited already-universal).
#   2. STRING-LITERAL ESCAPES: the same SQL text '\\d' is regex \d in
#      Spark (its parser processes backslash escapes inside literals)
#      but the LITERAL two chars \\+d in DuckDB (no escape processing) —
#      a silently different pattern in any shared-text SQL. Shared
#      grammars must use bracket classes ([0-9], [a-z]); backslash
#      classes require per-dialect rendering ('\\d' Spark ↔ '\d' Duck),
#      which this core exercises explicitly.
# Probe-verified identical otherwise: regexp_extract with group index
# (both return '' on no-match and NULL on NULL input — no coalesce),
# grouped regexp_extract_all under the array bridges, RLIKE ↔
# regexp_matches, LIKE shared.

_RX_ROWS = (
    "(SELECT CAST(s AS STRING) AS s FROM (VALUES ('abc123def'),"
    " ('  x  '), ('a-b_c.d'), (''), ('AA bb CC'), ('12.34'),"
    " ('a1b2c3'), (NULL), ('aa11bb22')) AS v(s)) rx"
)
_RX_CLASSES = ["[0-9]+", "[a-z]+", "[A-Z]", "[0-9]", "[a-zA-Z]+", "[.]"]


@st.composite
def paired_regex(draw):
    kind = draw(
        st.sampled_from(
            ["extract", "extract_all", "replace", "rlike", "backslash"]
        )
    )
    pat = draw(st.sampled_from(_RX_CLASSES))
    if kind == "extract":
        both = f"regexp_extract(s, '({pat})', 1)"
        return (both, both)
    if kind == "extract_all":
        return (
            f"array_join(regexp_extract_all(s, '({pat})', 1), ',')",
            f"(CASE WHEN s IS NOT NULL THEN coalesce(array_to_string("
            f"regexp_extract_all(s, '({pat})', 1), ','), '') END)",
        )
    if kind == "replace":
        rep = draw(st.sampled_from(["'#'", "''", "'XY'"]))
        return (
            f"regexp_replace(s, '{pat}', {rep})",
            f"regexp_replace(s, '{pat}', {rep}, 'g')",
        )
    if kind == "rlike":
        anchored = draw(st.booleans())
        p = f"^{pat}$" if anchored else pat
        return (f"(s RLIKE '{p}')", f"regexp_matches(s, '{p}')")
    cls = draw(st.sampled_from(["d", "w", "s"]))
    return (
        f"regexp_replace(s, '\\\\{cls}', '_')",
        f"regexp_replace(s, '\\{cls}', '_', 'g')",
    )


@given(pairs=st.lists(paired_regex(), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_translated_regex_parity(spark, duck, pairs):
    """Regex-pair parity: extraction, global replacement (the 'g'
    bridge), matching and per-dialect backslash classes agree over messy
    strings including no-match and NULL rows."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    s_rows = _canon(spark.sql(f"SELECT {s_sel} FROM {_RX_ROWS}").toPandas())
    o_rows = _canon(duck.execute(f"SELECT {d_sel} FROM {_RX_ROWS}").df())
    assert s_rows == o_rows, f"divergence for: {s_sel}  VS  {d_sel}"


# Linear-algebra translation pairs (round-8): the dot-product fold the
# ENTIRE embedding family's oracles stand on — Spark
# aggregate(zip_with(a, b, x*y), 0D, acc+x) ↔ DuckDB
# list_inner_product(a, b) — is claimed bitwise-identical (both compute
# a sequential left fold, llm.py module docstring). This core fuzzes
# that claim where it would break first: MIXED-MAGNITUDE arrays where
# the association order of the additions changes the double result (a
# pairwise/SIMD reduction on either side would diverge in the last
# ulp). Probed adversarial case (±1e17 cancellation against unit-scale
# terms) agrees exactly; compared via repr (exact bits), not the
# truncating module canon. Probe exclusion: list_cosine_distance does
# not exist in this DuckDB — cosine stays the explicit dot/norm fold.

_VEC_VALS = ["1.5", "-2.25", "3.0", "1e8", "-1e8", "1e-8", "7.5",
             "1e16", "-1e16", "0.125"]


@st.composite
def paired_vec(draw):
    n = draw(st.integers(2, 8))
    vals = [draw(st.sampled_from(_VEC_VALS)) for _ in range(n)]
    return (
        "CAST(array({}) AS ARRAY<DOUBLE>)".format(", ".join(vals)),
        "[{}]::DOUBLE[]".format(", ".join(vals)),
        n,
    )


@given(a=paired_vec(), b=paired_vec(), kind=st.sampled_from(
    ["dot", "l2sq", "diffsq"]))
@settings(**SETTINGS)
def test_translated_linalg_parity(spark, duck, a, b, kind):
    """Linalg-pair parity: dot products, squared norms and squared
    distances over mixed-magnitude double arrays agree BITWISE in both
    dialect spellings — the fold order underneath every embedding
    oracle."""
    sa, da, na = a
    sb, db, nb = b
    if kind == "dot" or kind == "diffsq":
        # zip length semantics differ on unequal lengths; pin equal
        if na != nb:
            sb, db = sa, da
    if kind == "dot":
        sq = (
            f"SELECT aggregate(zip_with({sa}, {sb}, (x, y) -> x * y),"
            " CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS d"
        )
        dq = f"SELECT list_inner_product({da}, {db}) AS d"
    elif kind == "l2sq":
        sq = (
            f"SELECT aggregate({sa}, CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + x * x) AS d"
        )
        dq = f"SELECT list_sum(list_transform({da}, x -> x * x)) AS d"
    else:
        sq = (
            f"SELECT aggregate(zip_with({sa}, {sb},"
            " (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + x) AS d"
        )
        dq = (
            f"SELECT list_sum(list_transform(list_zip({da}, {db}),"
            " p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d"
        )
    sv = spark.sql(sq).collect()[0][0]
    dv = duck.execute(dq).fetchone()[0]
    assert repr(sv) == repr(dv), f"bitwise divergence: {sq} VS {dq}: {sv!r} != {dv!r}"


# JSON translation pairs (round-8): Spark get_json_object ↔ DuckDB
# json_extract_string / json_extract — the payload-decode idiom behind
# the Kafka pipeline and h_map_json. Probe finding: DuckDB's extractors
# ERROR on malformed JSON where Spark returns NULL — every DuckDB-side
# extraction needs a json_valid() guard (the bridge this grammar
# carries). Under it, scalar/nested/array-index/missing-key paths,
# null-valued keys and raw object/array extraction (both render compact)
# agree exactly.

_JSON_ROWS = (
    """(SELECT CAST(j AS STRING) AS j FROM (VALUES"""
    """ ('{"a": 1, "b": "x", "c": [1,2,3], "d": {"e": 2.5}}'),"""
    """ ('{"a": null}'), ('{}'), ('not json'), (NULL),"""
    """ ('{"a": -7, "b": "", "c": []}'),"""
    """ ('{"d": {"e": null}, "c": [7]}')) AS v(j)) jt"""
)
_JSON_PATHS = ["$.a", "$.b", "$.d.e", "$.c[0]", "$.c[1]", "$.zzz"]


@st.composite
def paired_json(draw):
    path = draw(st.sampled_from(_JSON_PATHS))
    kind = draw(
        st.sampled_from(["string", "raw", "int_bridge", "build", "variant"])
    )
    if kind == "variant":
        # r09 probe: Spark 4's VARIANT bridges to DuckDB's JSON type —
        # parse_json renders the same canonical text, and
        # variant_get(…, '$.p', 'bigint') ↔ json_extract text. Guarded
        # to VALID documents: parse_json raises on malformed where the
        # extraction grammar (above) NULLs.
        ipath = draw(st.sampled_from(["$.a", "$.c[0]", "$.c[1]"]))
        doc = "'{\"a\": 7, \"c\": [1, 2]}'"
        return (
            f"CAST(variant_get(parse_json({doc}), '{ipath}',"
            f" 'bigint') AS BIGINT)",
            f"CAST(json_extract({doc}, '{ipath}') AS BIGINT)",
        )
    if kind == "build":
        # r09 probe: to_json CONSTRUCTION is byte-identical (key order,
        # string escapes, doubles, nested objects/arrays, top-level
        # arrays, json_object) — EXCEPT NULL struct fields, which Spark
        # OMITS and DuckDB emits as "k":null, so generated fields are
        # non-null expressions only.
        n_fields = draw(st.integers(1, 3))
        fields = []
        for i in range(n_fields):
            v = draw(
                st.sampled_from(
                    ["length(coalesce(j, ''))",
                     "CAST(length(coalesce(j, '')) % 5 AS BIGINT)",
                     "'lit'", "CAST(1.5 AS DOUBLE)", "CAST(-7 AS BIGINT)"]
                )
            )
            fields.append((f"f{i}", v))
        s_args = ", ".join(f"'{k}', {v}" for k, v in fields)
        d_args = ", ".join(f"'{k}': {v}" for k, v in fields)
        return (
            f"to_json(named_struct({s_args}))",
            f"CAST(to_json({{{d_args}}}) AS VARCHAR)",
        )
    if kind == "string":
        return (
            f"get_json_object(j, '{path}')",
            f"(CASE WHEN json_valid(j) THEN"
            f" json_extract_string(j, '{path}') END)",
        )
    if kind == "raw":
        rawpath = draw(st.sampled_from(["$.c", "$.d"]))
        return (
            f"get_json_object(j, '{rawpath}')",
            f"(CASE WHEN json_valid(j) THEN"
            f" CAST(json_extract(j, '{rawpath}') AS STRING) END)",
        )
    # integer-valued paths only: the extracted TEXT of $.d.e is '2.5',
    # and string->BIGINT try_cast is itself a documented divergence
    # (DuckDB rounds, Spark rejects — see the try-cast core)
    ipath = draw(st.sampled_from(["$.a", "$.c[0]", "$.c[1]", "$.zzz"]))
    return (
        f"try_cast(get_json_object(j, '{ipath}') AS BIGINT)",
        f"try_cast((CASE WHEN json_valid(j) THEN"
        f" json_extract_string(j, '{ipath}') END) AS BIGINT)",
    )


@given(pairs=st.lists(paired_json(), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_translated_json_parity(spark, duck, pairs):
    """JSON-pair parity: payload extraction in both dialect spellings
    agrees over valid, empty, malformed and NULL documents — the decode
    path every semi-structured oracle translation uses."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    s_rows = _canon(spark.sql(f"SELECT {s_sel} FROM {_JSON_ROWS}").toPandas())
    o_rows = _canon(duck.execute(f"SELECT {d_sel} FROM {_JSON_ROWS}").df())
    assert s_rows == o_rows, f"divergence for: {s_sel}  VS  {d_sel}"


# from_json/to_json ROUND-TRIP pairs (round-10): parse a generated JSON
# document against a generated nested schema (struct/array over
# bigint/double/boolean/string, depth ≤ 3) and re-render — Spark
# from_json+to_json vs DuckDB json_transform+to_json. The admitted
# grammar is the intersection the r10 probes proved byte-identical:
# type-correct scalar values (DuckDB COERCES "7"→7 where Spark nulls the
# field — fenced by construction), ignoreNullFields=false on the Spark
# side (Spark otherwise OMITS null fields where DuckDB emits "k":null),
# omitted/extra object fields, null array elements, whole-null nested
# structs, unicode strings WITHOUT backslash escapes (the r09
# literal-syntax trap: the same quoted doc reaches the two parsers with
# different text), int-valued doubles (both render 3.0), and int64-edge
# bigints. Fenced malformed-document asymmetries (probe-documented):
# a STRUCT-root malformed doc is PERMISSIVE struct-of-nulls in Spark vs
# NULL under the DuckDB json_valid guard, and Spark accepts trailing
# garbage after a valid object; only the probed ARRAY-root malformed
# shape (both engines → NULL) is generated.

_JSON_LEAF_VALS = {
    "bigint": ["1", "-7", "0", "9007199254740993", "null"],
    "double": ["2.5", "0.1", "-3.25", "3", "null"],
    "boolean": ["true", "false", "null"],
    "string": ['"a"', '"héé"', '""', '"q z"', "null"],
}
_DUCK_LEAF = {
    "bigint": "BIGINT", "double": "DOUBLE",
    "boolean": "BOOLEAN", "string": "VARCHAR",
}


def _json_schema(draw, depth: int):
    if depth <= 0 or draw(st.integers(0, 2)) == 0:
        return ("leaf", draw(st.sampled_from(list(_JSON_LEAF_VALS))))
    if draw(st.booleans()):
        return ("array", _json_schema(draw, depth - 1))
    n = draw(st.integers(1, 3))
    return (
        "struct",
        [(f"f{i}", _json_schema(draw, depth - 1)) for i in range(n)],
    )


def _json_doc(draw, node, root: bool = False) -> str:
    kind, payload = node
    if kind == "leaf":
        return draw(st.sampled_from(_JSON_LEAF_VALS[payload]))
    if kind == "array":
        return (
            "[" + ",".join(
                _json_doc(draw, payload)
                for _ in range(draw(st.integers(0, 3)))
            ) + "]"
        )
    if not root and draw(st.integers(0, 5)) == 0:
        # whole-null NESTED struct (probed: both render null). At the
        # ROOT this is a fenced trap the hunt itself found: Spark
        # from_json('null') is PERMISSIVE struct-of-nulls
        # ('{"f0":null}') while DuckDB json_transform('null') is SQL
        # NULL — so the root document is never the literal null.
        return "null"
    fields = []
    for name, sub in payload:
        if draw(st.integers(0, 3)) == 0:
            continue  # omitted field → null on both sides (probed)
        fields.append(f'"{name}":{_json_doc(draw, sub)}')
    if draw(st.integers(0, 5)) == 0:
        fields.append('"zz":1')  # extra field: both engines drop it (probed)
    return "{" + ",".join(fields) + "}"


def _spark_ddl(node) -> str:
    kind, payload = node
    if kind == "leaf":
        return payload
    if kind == "array":
        return f"array<{_spark_ddl(payload)}>"
    return (
        "struct<"
        + ",".join(f"{n}:{_spark_ddl(s)}" for n, s in payload)
        + ">"
    )


def _duck_structure(node) -> str:
    kind, payload = node
    if kind == "leaf":
        return f'"{_DUCK_LEAF[payload]}"'
    if kind == "array":
        return "[" + _duck_structure(payload) + "]"
    return (
        "{"
        + ",".join(f'"{n}":{_duck_structure(s)}' for n, s in payload)
        + "}"
    )


def _json_extract_pair(draw, node, s_base: str, d_base: str):
    """Walk a random path to a leaf: typed post-parse ACCESS (struct dot
    fields, array indexing via the 0-vs-1-base bridge try_element_at ↔
    [k], out-of-bounds and missing/null nodes → NULL on both — all
    probe-verified r10)."""
    kind, payload = node
    if kind == "leaf":
        return s_base, d_base
    if kind == "array":
        k = draw(st.integers(1, 3))
        return _json_extract_pair(
            draw, payload,
            f"try_element_at({s_base}, {k})", f"({d_base})[{k}]",
        )
    name, sub = draw(st.sampled_from(payload))
    return _json_extract_pair(
        draw, sub, f"({s_base}).{name}", f"({d_base}).{name}"
    )


@st.composite
def paired_json_roundtrip(draw):
    if draw(st.integers(0, 9)) == 0:
        # the one admitted malformed shape: ARRAY root (both → NULL)
        doc = draw(st.sampled_from(["[1,2", '[{"x":']))
        node = ("array", ("struct", [("x", ("leaf", "bigint"))]))
    else:
        # JSON documents are objects or arrays at the root
        if draw(st.booleans()):
            node = ("struct", [(f"f{i}", _json_schema(draw, 2))
                               for i in range(draw(st.integers(1, 3)))])
        else:
            node = ("array", _json_schema(draw, 2))
        doc = _json_doc(draw, node, root=True)
        if draw(st.integers(0, 2)) == 0:
            # typed extraction instead of re-render (valid docs only)
            return _json_extract_pair(
                draw, node,
                f"from_json('{doc}', '{_spark_ddl(node)}')",
                f"(json_transform('{doc}', '{_duck_structure(node)}'))",
            )
    return (
        f"to_json(from_json('{doc}', '{_spark_ddl(node)}'),"
        f" map('ignoreNullFields', 'false'))",
        f"(CASE WHEN json_valid('{doc}') THEN"
        f" to_json(json_transform('{doc}', '{_duck_structure(node)}'))"
        f" END)",
    )


@given(pairs=st.lists(paired_json_roundtrip(), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_translated_json_roundtrip_parity(spark, duck, pairs):
    """Nested parse→re-render parity: generated documents against
    generated array-of-struct schemas survive the from_json/to_json ↔
    json_transform/to_json round trip byte-identically within the
    probe-fenced grammar (see the block comment above)."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    s_rows = _canon(spark.sql(f"SELECT {s_sel}").toPandas())
    o_rows = _canon(duck.execute(f"SELECT {d_sel}").df())
    assert s_rows == o_rows, f"divergence for: {s_sel}  VS  {d_sel}"


# QUALIFY translation pairs (round-8): Spark has no QUALIFY (probed
# r02, still true in 4.1.2); every oracle that uses DuckDB's QUALIFY is
# hand-rewritten Spark-side as subquery + WHERE on the window column.
# This family fuzzes that rewrite equivalence across window function
# classes (row_number/rank/dense_rank top-k, windowed-aggregate gates,
# lag gates with their 3VL NULL first-row handling), explicit
# deterministic orders throughout (the r07 NULL-ordering rule).


@st.composite
def paired_qualify(draw):
    part = draw(
        st.sampled_from(["", "PARTITION BY abs(a) % 2 ",
                         "PARTITION BY abs(a) % 3 "])
    )
    kind = draw(st.sampled_from(["topk", "agg_gate", "lag_gate"]))
    if kind == "topk":
        fn = draw(
            st.sampled_from(["row_number()", "rank()", "dense_rank()"])
        )
        key = draw(st.sampled_from(["b", "coalesce(c, -999)", "a + b"]))
        k = draw(st.integers(1, 5))
        win = f"{fn} OVER ({part}ORDER BY {key}, a)"
        return (
            f"SELECT a, b FROM (SELECT a, b, {win} AS rn FROM"
            f" {TABLE}) s WHERE rn <= {k}",
            f"SELECT a, b FROM {TABLE} QUALIFY {win} <= {k}",
        )
    if kind == "agg_gate":
        agg = draw(st.sampled_from(["sum(b)", "min(a)", "count(c)"]))
        op = draw(st.sampled_from(["> 0", "< 50", ">= 2"]))
        win = f"{agg} OVER ({part.rstrip()})"
        return (
            f"SELECT a FROM (SELECT a, {win} AS w FROM {TABLE}) s"
            f" WHERE w {op}",
            f"SELECT a FROM {TABLE} QUALIFY {win} {op}",
        )
    win = f"lag(b, 1) OVER ({part}ORDER BY a)"
    cond = draw(
        st.sampled_from(
            ["IS NOT NULL", "IS NULL", "< b", "IS NOT NULL AND {w} < b"]
        )
    )
    if cond == "IS NOT NULL AND {w} < b":
        s_where = "pb IS NOT NULL AND pb < b"
        d_where = f"{win} IS NOT NULL AND {win} < b"
    else:
        s_where = f"pb {cond}"
        d_where = f"{win} {cond}"
    return (
        f"SELECT a, b FROM (SELECT a, b, {win} AS pb FROM {TABLE}) s"
        f" WHERE {s_where}",
        f"SELECT a, b FROM {TABLE} QUALIFY {d_where}",
    )


@given(q=paired_qualify())
@settings(**SETTINGS)
def test_translated_qualify_parity(spark, duck, q):
    """QUALIFY-pair parity: the subquery+WHERE rewrite Spark oracles use
    for DuckDB's QUALIFY selects exactly the same rows across top-k,
    windowed-aggregate and lag-gate shapes (3VL: a NULL window predicate
    drops the row in both forms)."""
    sq, dq = q
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Unpivot translation pairs (round-8): the single-scan counter-fold
# convention (r05 — Spark folds N counters into ONE aggregate and
# unpivots with stack(); DuckDB oracles may keep UNION ALL because it
# materializes multi-referenced CTEs). Probe-verified: stack() ↔ UNION
# ALL agree (stack KEEPS NULL-valued rows, exactly like the UNION), and
# the UNPIVOT keyword is SHARED SYNTAX with identical semantics in both
# engines — NULL cells dropped by default, kept under INCLUDE NULLS.

_UNPIVOT_COLS = ["a", "b", "coalesce(c, -1)", "c", "a + b"]


@st.composite
def paired_unpivot(draw):
    cols = draw(
        st.lists(
            st.sampled_from(_UNPIVOT_COLS), min_size=2, max_size=4,
            unique=True,
        )
    )
    names = [f"m{i}" for i in range(len(cols))]
    proj = ", ".join(f"{c} AS {n}" for c, n in zip(cols, names))
    kind = draw(st.sampled_from(["stack_union", "unpivot_shared"]))
    if kind == "stack_union":
        lbls = ", ".join(f"'{n}', {n}" for n in names)
        branches = " UNION ALL ".join(
            f"SELECT '{n}' AS m, {n} AS v FROM p" for n in names
        )
        return (
            f"SELECT m, v FROM (SELECT {proj} FROM {TABLE}) p"
            f" LATERAL VIEW stack({len(cols)}, {lbls}) u AS m, v",
            f"WITH p AS (SELECT {proj} FROM {TABLE}) {branches}",
        )
    nulls = draw(st.sampled_from(["", " INCLUDE NULLS"]))
    shared = (
        f"SELECT m, v FROM (SELECT {proj} FROM {TABLE}) p"
        f" UNPIVOT{nulls} (v FOR m IN ({', '.join(names)}))"
    )
    return (shared, shared)


@given(q=paired_unpivot())
@settings(**SETTINGS)
def test_translated_unpivot_parity(spark, duck, q):
    """Unpivot-pair parity: stack() against its UNION ALL translation
    (NULL rows kept by both) and the shared UNPIVOT syntax (NULL cells
    dropped by default, kept under INCLUDE NULLS) produce identical
    multisets."""
    sq, dq = q
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Map/struct translation pairs (round-9, same paired-rendering harness —
# the one §2 type class that had no dedicated core). Probe-verified
# bridges (2026-08-15, Spark 4.1.2 / DuckDB 1.x): Spark
# element_at(m, k) ↔ DuckDB map_extract(m, k)[1] — DuckDB map extraction
# returns a LIST ([1] on hit, [] on miss), so the [1] de-listing IS the
# bridge, exact on missing keys, NULL values, and NULL maps;
# size ↔ cardinality; map_keys/map_entries/map_from_entries shared;
# map_contains_key ↔ list_contains(map_keys(…)); map_filter /
# transform_values / map_zip_with bridge through the entries list; struct
# field access, nesting, ordering over NON-NULL fields, and
# IS [NOT] DISTINCT FROM all agree. Probe-verified EXCLUSIONS (fenced
# out of the grammar): map equality — analysis error in Spark
# (INVALID_ORDERING_TYPE) vs supported order-insensitive equality in
# DuckDB; map_concat with OVERLAPPING keys — Spark raises
# DUPLICATED_MAP_KEY (EXCEPTION dedup policy) where DuckDB last-wins, so
# generated concats use disjoint key sets only; struct =/< where the
# comparison must read a NULL field — Spark compares null-safely
# (struct('x', NULL) = struct('x', NULL) → TRUE) where DuckDB yields
# 3VL NULL, so =/< operands are built from non-null leaves and
# null-bearing structs only meet IS [NOT] DISTINCT FROM; CAST(struct AS
# STRING) — '{1, a}' vs "{'x': 1, 'y': a}" rendering; duplicate literal
# map keys — both engines raise, but with different error classes.

_MAP_KEYS = ["ka", "kb", "kc", "kd"]
# a and b are non-null in every row; c carries NULLs (see _ROWS)
_MAP_VALS = ["a", "b", "c", "CAST(7 AS BIGINT)", "CAST(-1 AS BIGINT)",
             "CAST(NULL AS BIGINT)"]
_NONNULL_VALS = ["a", "b", "CAST(7 AS BIGINT)", "CAST(-1 AS BIGINT)"]


def _render_map(pairs):
    s = "map(" + ", ".join(f"'{k}', {v}" for k, v in pairs) + ")"
    d = "map {" + ", ".join(f"'{k}': {v}" for k, v in pairs) + "}"
    return s, d


@st.composite
def paired_map(draw, depth: int = 2):
    """(spark_sql, duck_sql) for a BIGINT-valued map expression."""
    keys = draw(
        st.lists(st.sampled_from(_MAP_KEYS), min_size=1, max_size=3,
                 unique=True)
    )
    vals = [draw(st.sampled_from(_MAP_VALS)) for _ in keys]
    s, d = _render_map(list(zip(keys, vals)))
    concat_pool = ["zx", "zy"]
    for _ in range(draw(st.integers(0, depth))):
        kind = draw(st.sampled_from(["filter", "xform", "concat"]))
        if kind == "filter":
            sp, dp = draw(
                st.sampled_from(
                    [
                        ("v > 1", "e.value > 1"),
                        ("v % 2 = 0", "e.value % 2 = 0"),
                        ("v IS NOT NULL", "e.value IS NOT NULL"),
                        ("k < 'kc'", "e.key < 'kc'"),
                    ]
                )
            )
            s = f"map_filter({s}, (k, v) -> {sp})"
            d = f"map_from_entries(list_filter(map_entries({d}), e -> {dp}))"
        elif kind == "xform":
            sl, dl = draw(
                st.sampled_from(
                    [
                        ("v * 2", "e.value * 2"),
                        ("v + 1", "e.value + 1"),
                        ("coalesce(v, 0) - 3", "coalesce(e.value, 0) - 3"),
                    ]
                )
            )
            s = f"transform_values({s}, (k, v) -> {sl})"
            d = (
                f"map_from_entries(list_transform(map_entries({d}),"
                f" e -> {{'key': e.key, 'value': {dl}}}))"
            )
        else:
            # disjoint-keys-only concat: overlapping keys RAISE in Spark
            # (DUPLICATED_MAP_KEY) but last-win in DuckDB — fenced by
            # construction with a DRAINED key pool disjoint from
            # _MAP_KEYS (each concat key is used at most once, so nested
            # concats stay disjoint too)
            if not concat_pool:
                continue
            k2 = concat_pool.pop(draw(st.integers(0, len(concat_pool) - 1)))
            v2 = draw(st.sampled_from(_MAP_VALS))
            s2, d2 = _render_map([(k2, v2)])
            s = f"map_concat({s}, {s2})"
            d = f"map_concat({d}, {d2})"
    return s, d


@st.composite
def paired_map_scalar(draw):
    """Scalar bridges over a paired map."""
    sm, dm = draw(paired_map())
    kind = draw(
        st.sampled_from(["elem", "size", "contains", "keys", "vals"])
    )
    if kind == "elem":
        k = draw(st.sampled_from(_MAP_KEYS + ["zz", "zx"]))
        return (
            f"element_at({sm}, '{k}')",
            f"map_extract({dm}, '{k}')[1]",
        )
    if kind == "size":
        return f"size({sm})", f"cardinality({dm})"
    if kind == "contains":
        k = draw(st.sampled_from(_MAP_KEYS + ["zz"]))
        return (
            f"map_contains_key({sm}, '{k}')",
            f"list_contains(map_keys({dm}), '{k}')",
        )
    if kind == "keys":
        # a filter can empty the map, and the r08 array trap applies:
        # Spark array_join(EMPTY) → '' but DuckDB array_to_string(EMPTY)
        # → NULL (re-probed through map_keys). The generated maps are
        # never NULL, so a bare coalesce is the exact bridge.
        return (
            f"array_join(array_sort(map_keys({sm})), ',')",
            f"coalesce(array_to_string(list_sort(map_keys({dm})), ','), '')",
        )
    # values surfaced through an explicit NULL sentinel: array_join
    # SKIPS NULL elements in Spark (and DuckDB list_sum IGNORES NULLs),
    # so raw value joins/sums are not bridges — the coalesce is load-
    # bearing, not decoration
    return (
        f"array_join(array_sort(transform(map_values({sm}),"
        f" x -> cast(coalesce(x, -99999) as string))), ',')",
        f"coalesce(array_to_string(list_sort(list_transform("
        f"map_values({dm}), x -> cast(coalesce(x, -99999) as varchar))),"
        f" ','), '')",
    )


@st.composite
def paired_struct_scalar(draw):
    """Scalar bridges over paired two-field structs."""
    kind = draw(st.sampled_from(["field", "nested", "cmp", "distinct"]))
    if kind == "field":
        v1 = draw(st.sampled_from(_MAP_VALS))
        v2 = draw(st.sampled_from(_MAP_VALS))
        f = draw(st.sampled_from(["x", "y"]))
        return (
            f"(named_struct('x', {v1}, 'y', {v2})).{f}",
            f"({{'x': {v1}, 'y': {v2}}}).{f}",
        )
    if kind == "nested":
        v = draw(st.sampled_from(_MAP_VALS))
        return (
            f"(named_struct('p', named_struct('q', {v}))).p.q",
            f"({{'p': {{'q': {v}}}}}).p.q",
        )
    if kind == "cmp":
        # non-null leaves ONLY: Spark struct ordering is null-safe
        # (NULL = NULL inside a struct → TRUE) where DuckDB goes 3VL
        vs = [draw(st.sampled_from(_NONNULL_VALS)) for _ in range(4)]
        op = draw(st.sampled_from(["=", "<", "<=", "<>"]))
        return (
            f"CAST((named_struct('x', {vs[0]}, 'y', {vs[1]}) {op}"
            f" named_struct('x', {vs[2]}, 'y', {vs[3]})) AS INT)",
            f"CAST(({{'x': {vs[0]}, 'y': {vs[1]}}} {op}"
            f" {{'x': {vs[2]}, 'y': {vs[3]}}}) AS INT)",
        )
    # null-bearing structs may ONLY meet IS [NOT] DISTINCT FROM — the
    # one comparison the probe showed agrees across NULL fields
    vs = [draw(st.sampled_from(_MAP_VALS)) for _ in range(4)]
    neg = draw(st.sampled_from(["", " NOT"]))
    return (
        f"CAST((named_struct('x', {vs[0]}, 'y', {vs[1]}) IS{neg}"
        f" DISTINCT FROM named_struct('x', {vs[2]}, 'y', {vs[3]})) AS INT)",
        f"CAST(({{'x': {vs[0]}, 'y': {vs[1]}}} IS{neg}"
        f" DISTINCT FROM {{'x': {vs[2]}, 'y': {vs[3]}}}) AS INT)",
    )


@given(
    pairs=st.lists(
        st.one_of(paired_map_scalar(), paired_struct_scalar()),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_translated_map_struct_parity(spark, duck, pairs):
    """Map/struct-pair parity: every generated map pipeline (build →
    filter/transform-values/disjoint-concat → scalar bridge) and struct
    bridge (field access, nesting, non-null ordering, IS DISTINCT FROM)
    rendered in both dialect spellings evaluates to the same multiset
    over the shared relation."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    sq = f"SELECT {s_sel} FROM {TABLE}"
    dq = f"SELECT {d_sel} FROM {TABLE}"
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


@given(mp=paired_map(), pairs=st.integers(0, 1))
@settings(**SETTINGS)
def test_translated_map_explode_parity(spark, duck, mp, pairs):
    """Map/struct ROW GENERATION parity (r09 probe): Spark's
    explode(map) → (key, value) rows pairs with DuckDB's parallel
    unnest over map_keys/map_values (positionally aligned by unnest's
    zip behavior); inline(array(named_struct…)) pairs with unnest of a
    struct list (recursive := false keeps one level)."""
    s_map, d_map = mp
    sq = (f"SELECT key, value FROM (SELECT explode({s_map}) FROM"
          f" {TABLE}) e")
    dq = (f"SELECT unnest(map_keys({d_map})) AS key,"
          f" unnest(map_values({d_map})) AS value FROM {TABLE}")
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"
    if pairs:
        sq2 = ("SELECT k, v FROM (SELECT inline(array("
               "named_struct('k', a, 'v', s),"
               f" named_struct('k', b, 'v', 'z'))) FROM {TABLE}) e")
        dq2 = ("SELECT u.k AS k, u.v AS v FROM (SELECT unnest("
               "[{'k': a, 'v': s}, {'k': b, 'v': 'z'}],"
               f" recursive := false) AS u FROM {TABLE}) t")
        s2 = _canon(spark.sql(sq2).toPandas())
        o2 = _canon(duck.execute(dq2).df())
        assert s2 == o2, f"divergence for: {sq2}  VS  {dq2}"


# Interval-arithmetic pairs (round-9). Probe-verified (2026-08-15):
# date ± INTERVAL 'n' DAY/WEEK/MONTH/YEAR in the shared quoted-literal
# spelling agrees EXACTLY under a terminal CAST(… AS DATE) — month-end
# clamping (Jan 31 + 1 month → Feb 29), leap-day year hops, negative
# and zero counts, k * INTERVAL '1' UNIT multiplication, mixed
# month+day chains in both application orders, and NULL propagation all
# match. add_months ↔ CAST(d + to_months(n) AS DATE); date_add/
# date_sub ↔ d ± n; Spark date_diff(DAY, …) ↔ DuckDB
# date_diff('day', …); whole-month distance bridges as
# (year(x)-year(y))*12 + month(x)-month(y) ↔ date_diff('month', y, x)
# (month-boundary crossings ≡ month-index delta, verified both signs).
# Probe-verified EXCLUSIONS: the UNCAST result type — Spark keeps DATE
# under date+interval where DuckDB widens to TIMESTAMP for EVERY unit
# (even DAY), so the terminal DATE cast is mandatory, not cosmetic;
# months_between — fractional 31-day-month semantics with a last-day
# rule exist only in Spark (DuckDB's date_diff('month') counts
# crossings: months_between(Mar 15, Jan 31) = 1.48… has no DuckDB
# twin); INTERVAL-typed output columns (second-class in both pandas
# bridges).

_IV_DATE_LITS = [
    "DATE '2020-01-31'", "DATE '2020-02-29'", "DATE '2019-12-31'",
    "DATE '2021-06-15'", "DATE '2016-01-03'",
]
_IV_UNITS = ["DAY", "WEEK", "MONTH", "YEAR"]


@st.composite
def paired_interval_date(draw, depth: int = 3):
    """(spark_sql, duck_sql) for a date expression built from ±interval
    chains; Spark side stays DATE-typed throughout, DuckDB side may pass
    through TIMESTAMP intermediates (re-dated at each paired step and at
    the terminal bridge)."""
    leaf = draw(st.sampled_from(_IV_DATE_LITS + ["d", "d"]))
    s = d = leaf
    for _ in range(draw(st.integers(0, depth))):
        kind = draw(
            st.sampled_from(["shared_iv", "mult_iv", "add_months", "add_days"])
        )
        if kind == "shared_iv":
            unit = draw(st.sampled_from(_IV_UNITS))
            n = draw(st.integers(0, 30 if unit in ("DAY", "WEEK") else 14))
            sign = draw(st.sampled_from(["+", "-"]))
            s = f"({s} {sign} INTERVAL '{n}' {unit})"
            d = f"({d} {sign} INTERVAL '{n}' {unit})"
        elif kind == "mult_iv":
            unit = draw(st.sampled_from(_IV_UNITS))
            k = draw(st.integers(-12, 12))
            s = f"({s} + {k} * INTERVAL '1' {unit})"
            d = f"({d} + {k} * INTERVAL '1' {unit})"
        elif kind == "add_months":
            n = draw(st.integers(-24, 24))
            s = f"add_months({s}, {n})"
            d = f"CAST(CAST({d} AS DATE) + to_months({n}) AS DATE)"
        else:
            n = draw(st.integers(0, 400))
            fn = draw(st.sampled_from(["date_add", "date_sub"]))
            op = "+" if fn == "date_add" else "-"
            s = f"{fn}({s}, {n})"
            d = f"(CAST({d} AS DATE) {op} {n})"
    return s, d


# Date-sequence pairs (r09 probe): sequence(d1, d2, INTERVAL) ↔
# generate_series(d1, d2, INTERVAL) agree for DAY/WEEK steps in both
# directions — but MONTH steps diverge on month-END anchors: Spark
# re-clamps every step against the ORIGINAL day-of-month (Jan 31 →
# Feb 29 → Mar 31) where DuckDB sticks at the clamped day (Jan 31 →
# Feb 29 → Mar 29 …), so month-stepped anchors stay at day ≤ 28.
_SEQ_TRIPLES = [
    ("DATE '2020-02-27'", "DATE '2020-03-02'", "INTERVAL '1' DAY"),
    ("DATE '2020-03-02'", "DATE '2020-02-27'", "INTERVAL '-1' DAY"),
    ("DATE '2021-01-01'", "DATE '2021-02-01'", "INTERVAL '1' WEEK"),
    ("DATE '2020-01-15'", "DATE '2020-06-15'", "INTERVAL '1' MONTH"),
    ("DATE '2019-12-01'", "DATE '2020-03-01'", "INTERVAL '1' MONTH"),
    ("DATE '2020-06-15'", "DATE '2020-01-15'", "INTERVAL '-1' MONTH"),
    # TIMESTAMP steps (r09 probe: hour/minute/second chains agree,
    # including midnight crossings; rendered without the DATE recast)
    ("TIMESTAMP '2020-01-05 00:00:00'", "TIMESTAMP '2020-01-05 06:00:00'",
     "INTERVAL '2' HOUR"),
    ("TIMESTAMP '2020-01-05 23:58:00'", "TIMESTAMP '2020-01-06 00:02:00'",
     "INTERVAL '1' MINUTE"),
    ("TIMESTAMP '2020-01-05 00:00:02'", "TIMESTAMP '2020-01-05 00:00:00'",
     "INTERVAL '-1' SECOND"),
]


@st.composite
def paired_interval_scalar(draw):
    """Scalar bridges over paired interval-date expressions."""
    kind = draw(
        st.sampled_from(
            ["iso", "day_diff", "month_diff", "cmp", "seq", "ts_chain"]
        )
    )
    if kind == "ts_chain":
        # r09 probe: TIMESTAMP ± INTERVAL is SHARED text (unlike the
        # DATE case above, where DuckDB widens to TIMESTAMP): hour/
        # minute/fractional-second/day arithmetic and month-end
        # clamping all agree under the string bridge in UTC
        ts = draw(
            st.sampled_from(
                ["TIMESTAMP '2020-01-31 10:00:00'",
                 "TIMESTAMP '2020-01-05 23:30:00'",
                 "TIMESTAMP '1999-12-31 23:59:59.5'"]
            )
        )
        e = ts
        for _ in range(draw(st.integers(1, 3))):
            n = draw(st.integers(0, 48))
            unit = draw(
                st.sampled_from(["HOUR", "MINUTE", "SECOND", "DAY",
                                 "MONTH"])
            )
            sign = draw(st.sampled_from(["+", "-"]))
            e = f"({e} {sign} INTERVAL '{n}' {unit})"
        q = f"CAST({e} AS STRING)"
        return q, q
    if kind == "seq":
        lo, hi, step = draw(st.sampled_from(_SEQ_TRIPLES))
        # DATE chains need the re-date on the DuckDB side (the
        # date+interval TIMESTAMP-widening exclusion above); TIMESTAMP
        # chains render shared
        d_elem = (
            "CAST(x AS STRING)" if lo.startswith("TIMESTAMP")
            else "CAST(CAST(x AS DATE) AS STRING)"
        )
        return (
            f"array_join(transform(sequence({lo}, {hi}, {step}),"
            " x -> CAST(x AS STRING)), ',')",
            f"array_to_string(list_transform("
            f"generate_series({lo}, {hi}, {step}),"
            f" x -> {d_elem}), ',')",
        )
    s1, d1 = draw(paired_interval_date())
    if kind == "iso":
        return (
            f"CAST(CAST({s1} AS DATE) AS STRING)",
            f"CAST(CAST({d1} AS DATE) AS STRING)",
        )
    s2, d2 = draw(paired_interval_date())
    if kind == "day_diff":
        return (
            f"CAST(date_diff(DAY, {s2}, {s1}) AS BIGINT)",
            f"CAST(date_diff('day', CAST({d2} AS DATE),"
            f" CAST({d1} AS DATE)) AS BIGINT)",
        )
    if kind == "month_diff":
        return (
            f"CAST((year({s1}) - year({s2})) * 12"
            f" + month({s1}) - month({s2}) AS BIGINT)",
            f"CAST(date_diff('month', CAST({d2} AS DATE),"
            f" CAST({d1} AS DATE)) AS BIGINT)",
        )
    return (
        f"CAST((CAST({s1} AS DATE) < CAST({s2} AS DATE)) AS INT)",
        f"CAST((CAST({d1} AS DATE) < CAST({d2} AS DATE)) AS INT)",
    )


@given(pairs=st.lists(paired_interval_scalar(), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_translated_interval_parity(spark, duck, pairs):
    """Interval-pair parity: month/day-time interval chains (clamping,
    leap days, multiplication, add_months/date_add translations) agree
    through the DATE-cast, day-diff, month-diff, and ordering bridges."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    sq = f"SELECT {s_sel} FROM {TABLE}"
    dq = f"SELECT {d_sel} FROM {TABLE}"
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Decimal translation pairs (round-9, paired-rendering harness). Decimals
# were EXCLUDED from the shared scalar core by design (module header);
# this core admits the probe-verified exact subset the money-style
# oracles would use, and fences the rest. Probe-verified identical
# (2026-08-16, Spark 4.1.2 / DuckDB 1.x): string→DECIMAL casts round
# HALF_UP in both ('1.005'→1.01, '2.675'→2.68, negatives away from
# zero); +/-/* values agree wherever neither engine overflows its
# (different) result width; round(dec, d) for d in [-2, 2] rounds
# half-away-from-zero in both (2.5→3, 1250@-2→1300, -1250@-2→-1300);
# min/max/sum/count agree (result WIDTHS differ — Spark sum → p+10,
# DuckDB sum → DECIMAL(38,s) — so every terminal bridges through
# CAST(… AS DECIMAL(38,6))); division is exact and identical when the
# divisor is 2^a·5^b (quotient terminates within the 6-digit bridge)
# with Spark try_divide(a, b) ↔ DuckDB (a / b) pairing the ÷0 → NULL
# behavior (ANSI Spark raises on bare /0; DuckDB returns NULL).
# Probe-verified EXCLUSIONS (fenced out of the grammar): decimal ÷
# decimal TYPING — Spark keeps DECIMAL(p, max(6, …)) where DuckDB
# widens to DOUBLE, so free-form division (non-terminating quotients)
# diverges in the 6th digit's rounding; avg(DECIMAL) — DECIMAL(p+4, s+4)
# in Spark vs DOUBLE in DuckDB (sum/12 never terminates); decimal →
# decimal DOWN-rescale — Spark rounds HALF_UP where DuckDB TRUNCATES
# toward zero (CAST(DECIMAL(4,3) '0.015' AS DECIMAL(10,2)) → 0.02 vs
# 0.01 — the nastiest trap this probe found), so every generated
# rescale is value-exact (widening only) and the grammar tracks scale;
# width-capped multiplication overflow (DuckDB raises at its storage
# width where Spark's wider result survives) — leaf magnitudes ≤ 99.99
# and ≤ 2 multiplications bound |v| < 2·10⁸ ≪ both widths.

_DEC_LITS = ["0.00", "1.10", "-2.25", "99.99", "-99.99", "0.05",
             "7.31", "-1.17", "42.42", "0.01", "-0.01", "13.00"]
_DEC_VALUES = ", ".join(
    f"('{x}', '{y}')"
    for x, y in zip(_DEC_LITS, _DEC_LITS[3:] + _DEC_LITS[:3])
)
# p is non-null everywhere; q carries two NULLs (via nullif on markers).
_DEC_TABLE = (
    "(SELECT CAST(x AS DECIMAL(12,2)) AS p,"
    " CAST(nullif(nullif(y, '0.05'), '13.00') AS DECIMAL(12,2)) AS q"
    f" FROM (VALUES {_DEC_VALUES}) AS v(x, y)) dt"
)
# Exact-terminating divisors: 2^a·5^b, so a scale-2 dividend's quotient
# has at most 2+4 fractional digits — inside the (38,6) bridge exactly.
_DEC_DIVISORS = ["2", "4", "5", "8", "10", "16", "20", "25"]


@st.composite
def dec_expr(
    draw, depth: int = 3, scale: int = 2, allow_divide: bool = True
) -> tuple[str, str, int]:
    """(spark_sql, duck_sql, result_scale) for a decimal expression.

    Shared text except the division pair; `scale` is threaded so no
    generated expression ever needs a DOWN-rescale (the fenced
    truncation-vs-HALF_UP trap) and multiplication stops at scale 6.

    `divide` is TERMINAL: only the top-level draw (consumed directly by
    the (38,6) bridge) may produce it. DuckDB types a decimal quotient
    DOUBLE, so a quotient nested under round() re-enters the fenced
    rounding trap (round(7.31/2, 2): exact-decimal 3.66 vs double
    3.65) and under mul pushes true scale past the bridge's 6. The
    quotient is also re-anchored to DECIMAL(38,6) at the node itself so
    aggregate consumers (sum) accumulate exactly on both sides.
    """
    if depth <= 0 or draw(st.integers(0, 2)) == 0:
        leaf = draw(
            st.sampled_from(
                ["p", "q", "CAST('1.50' AS DECIMAL(12,2))",
                 "CAST('-0.25' AS DECIMAL(12,2))",
                 "CAST('99.99' AS DECIMAL(12,2))",
                 "CAST(NULL AS DECIMAL(12,2))"]
            )
        )
        return leaf, leaf, 2
    d = depth - 1
    ops = ["add", "sub", "mul", "abs", "neg", "least", "greatest",
           "coalesce", "nullif", "case", "round"]
    if allow_divide:
        ops.append("divide")
    op = draw(st.sampled_from(ops))
    if op == "divide":
        # dividend is a LEAF (scale 2) so the quotient terminates; the
        # pair carries the ÷0→NULL bridge: try_divide ↔ bare /. The
        # DuckDB quotient re-anchors to DECIMAL(38,6) at the node so an
        # aggregate consumer (sum) accumulates exactly, not in DOUBLE.
        a_s, a_d, _ = draw(dec_expr(0, allow_divide=False))
        b = draw(st.sampled_from(_DEC_DIVISORS + ["0"]))
        return (
            f"try_divide({a_s}, CAST({b} AS DECIMAL(12,2)))",
            f"CAST(({a_d} / CAST({b} AS DECIMAL(12,2)))"
            f" AS DECIMAL(38,6))",
            6,
        )
    if op == "mul" and scale <= 4:
        # one factor is a leaf: magnitude ≤ ×100 per level, scale +2
        a_s, a_d, a_sc = draw(dec_expr(d, scale + 2, allow_divide=False))
        b_s, b_d, _ = draw(dec_expr(0, allow_divide=False))
        return f"({a_s} * {b_s})", f"({a_d} * {b_d})", a_sc + 2
    if op == "round":
        nd = draw(st.integers(-2, 2))
        a_s, a_d, _ = draw(dec_expr(d, scale, allow_divide=False))
        return (
            f"round({a_s}, {nd})",
            f"round({a_d}, {nd})",
            max(0, nd),
        )
    if op in ("abs", "neg"):
        a_s, a_d, a_sc = draw(dec_expr(d, scale, allow_divide=False))
        f = "abs" if op == "abs" else "-"
        return f"{f}({a_s})", f"{f}({a_d})", a_sc
    if op in ("least", "greatest", "coalesce", "nullif"):
        a_s, a_d, a_sc = draw(dec_expr(d, scale, allow_divide=False))
        b_s, b_d, b_sc = draw(dec_expr(d, scale, allow_divide=False))
        return (
            f"{op}({a_s}, {b_s})",
            f"{op}({a_d}, {b_d})",
            max(a_sc, b_sc),
        )
    if op == "case":
        c_s, c_d, _ = draw(dec_expr(d, scale, allow_divide=False))
        t_s, t_d, t_sc = draw(dec_expr(d, scale, allow_divide=False))
        e_s, e_d, e_sc = draw(dec_expr(d, scale, allow_divide=False))
        cmp = draw(st.sampled_from(["<", "<=", ">", "IS NULL"]))
        cond_s = (
            f"{c_s} IS NULL" if cmp == "IS NULL" else f"{c_s} {cmp} p"
        )
        cond_d = (
            f"{c_d} IS NULL" if cmp == "IS NULL" else f"{c_d} {cmp} p"
        )
        return (
            f"(CASE WHEN {cond_s} THEN {t_s} ELSE {e_s} END)",
            f"(CASE WHEN {cond_d} THEN {t_d} ELSE {e_d} END)",
            max(t_sc, e_sc),
        )
    a_s, a_d, a_sc = draw(dec_expr(d, scale, allow_divide=False))
    b_s, b_d, b_sc = draw(dec_expr(d, scale, allow_divide=False))
    sign = "+" if op == "add" else "-"
    return f"({a_s} {sign} {b_s})", f"({a_d} {sign} {b_d})", max(a_sc, b_sc)


def _dec_bridge(e: str) -> str:
    # widening rescale only (exact in both engines), then text
    return f"CAST(CAST({e} AS DECIMAL(38,6)) AS STRING)"


@st.composite
def paired_dec_scalar(draw):
    kind = draw(st.sampled_from(["row", "row", "agg"]))
    s, d, _ = draw(dec_expr())
    if kind == "row":
        return _dec_bridge(s), _dec_bridge(d)
    fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
    if fn == "count":
        return f"CAST(count({s}) AS BIGINT)", f"CAST(count({d}) AS BIGINT)"
    return _dec_bridge(f"{fn}({s})"), _dec_bridge(f"{fn}({d})")


@given(pairs=st.lists(paired_dec_scalar(), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_translated_decimal_parity(spark, duck, pairs):
    """Decimal-pair parity: the exact-arithmetic money subset (cast
    rounding, +/-/*, round, terminating division with ÷0→NULL pairing,
    sum/min/max/count) agrees through the widening DECIMAL(38,6) text
    bridge; the known divergence classes (÷ typing, avg, down-rescale
    truncation, width-capped overflow) are fenced out by construction."""
    agg = any("sum(" in s or "min(" in s or "max(" in s or "count(" in s
              for s, _ in pairs)
    # aggregates and row expressions can't share one SELECT — split by
    # rendering every pair in its own aggregate context when any pair
    # aggregates (row pairs wrap in max() over the single group).
    if agg:
        s_sel = ", ".join(
            (s if any(f"{f}(" in s for f in ("sum", "min", "max", "count"))
             else f"max({s})") + f" AS x{i}"
            for i, (s, _) in enumerate(pairs)
        )
        d_sel = ", ".join(
            (d if any(f"{f}(" in d for f in ("sum", "min", "max", "count"))
             else f"max({d})") + f" AS x{i}"
            for i, (_, d) in enumerate(pairs)
        )
    else:
        s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
        d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    sq = f"SELECT {s_sel} FROM {_DEC_TABLE}"
    dq = f"SELECT {d_sel} FROM {_DEC_TABLE}"
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Format-token translation pairs (round-9, paired-rendering harness):
# date_format's Java-style pattern letters vs DuckDB strftime's C-style
# % tokens — the translation every human-readable-date oracle
# hand-writes, and an easy place to mistranslate a single token.
# Probe-verified identical (2026-08-16): yyyy/%Y, yy/%y, MM/%m, M/%-m,
# dd/%d, d/%-d, DDD/%j, D/%-j (unpadded day-of-year), MMM/%b, MMMM/%B
# (↔ monthname()), EEE/%a, EEEE/%A (↔ dayname()), HH/%H, H/%-H, hh/%I
# (12 at midnight AND noon), a/%p, mm/%M, ss/%S, SSS/%g (DuckDB's
# nonstandard milliseconds token), SSSSSS/%f (zero-padded micros incl.
# '.5' → 500000 and whole seconds → 000000), NULL input → NULL in both,
# and the strptime round-trips (full timestamp, dd/MM/yyyy ↔ %d/%m/%Y,
# month-name parse MMMM ↔ %B, bare-year parse defaulting to Jan 1,
# try_to_timestamp ↔ try_strptime on garbage). Calendar-number bridges:
# dayofweek(d) ↔ DuckDB dayofweek(d) + 1 (Sunday is 1 in Spark, 0 in
# DuckDB — found by this core's probe), extract(DAYOFWEEK_ISO) ↔
# isodow, weekofyear ↔ weekofyear (ISO in both) ↔ CAST(strftime '%V'),
# dayofyear, quarter, last_day shared. Probe-verified EXCLUSIONS:
# week-based pattern letters ('ww') — Spark 4 raises
# INCONSISTENT_BEHAVIOR_CROSS_VERSION (removed in the proleptic
# calendar change), so week numbers bridge through weekofyear()/%V
# only; extract(EPOCH) — unsupported field in Spark (bridged in the
# timestamp core via unix_micros); %W (Monday-week-of-year) has no
# surviving Spark twin.

_FMT_ROWS = (
    "(SELECT CAST(ds AS DATE) AS fd, CAST(ts AS TIMESTAMP) AS ft"
    " FROM (VALUES"
    " ('2020-02-29', '2020-02-29 12:00:00.5'),"
    " ('2021-01-01', '2021-01-01 00:07:03'),"
    " ('2021-01-03', '2021-01-03 23:59:59.999999'),"
    " ('1970-01-01', '1970-01-01 00:00:00'),"
    " ('1999-12-31', '1999-12-31 11:59:59.25'),"
    " ('2016-01-03', '2016-01-03 12:00:00'),"
    " ('2024-12-30', '2024-12-30 09:07:03.123456'),"
    " (NULL, NULL),"
    " ('2026-08-16', '2026-08-16 15:30:45.000001'))"
    " AS v(ds, ts)) ft"
)
_FMT_DATE_TOKENS = [
    ("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"), ("M", "%-m"),
    ("dd", "%d"), ("d", "%-d"), ("DDD", "%j"), ("D", "%-j"),
    ("MMM", "%b"), ("MMMM", "%B"), ("EEE", "%a"), ("EEEE", "%A"),
]
_FMT_TIME_TOKENS = [
    ("HH", "%H"), ("H", "%-H"), ("hh", "%I"), ("a", "%p"),
    ("mm", "%M"), ("ss", "%S"), ("SSS", "%g"), ("SSSSSS", "%f"),
]
_FMT_SEPS = ["-", " ", ":", "/", "."]


@st.composite
def paired_fmt_scalar(draw):
    """(spark_sql, duck_sql) for one format/calendar bridge."""
    kind = draw(
        st.sampled_from(
            ["fmt", "fmt", "fmt", "roundtrip", "calendar", "fn"]
        )
    )
    if kind == "fmt":
        use_ts = draw(st.booleans())
        col = "ft" if use_ts else "fd"
        pool = _FMT_DATE_TOKENS + (_FMT_TIME_TOKENS if use_ts else [])
        toks = draw(st.lists(st.sampled_from(pool), min_size=1, max_size=3))
        sep = draw(st.sampled_from(_FMT_SEPS))
        sp = sep.join(t[0] for t in toks)
        dp = sep.join(t[1] for t in toks)
        return (
            f"date_format({col}, '{sp}')",
            f"strftime({col}, '{dp}')",
        )
    if kind == "roundtrip":
        sp, dp = draw(
            st.sampled_from(
                [("yyyy-MM-dd", "%Y-%m-%d"), ("dd/MM/yyyy", "%d/%m/%Y"),
                 ("MMMM d, yyyy", "%B %-d, %Y")]
            )
        )
        return (
            f"CAST(to_date(date_format(fd, '{sp}'), '{sp}') AS STRING)",
            f"CAST(CAST(strptime(strftime(fd, '{dp}'), '{dp}')"
            " AS DATE) AS STRING)",
        )
    if kind == "calendar":
        which = draw(
            st.sampled_from(
                ["dow", "isodow", "week", "week_v", "doy", "quarter",
                 "lastday"]
            )
        )
        if which == "dow":
            return "dayofweek(fd)", "(dayofweek(fd) + 1)"
        if which == "isodow":
            return "extract(DAYOFWEEK_ISO FROM fd)", "isodow(fd)"
        if which == "week":
            return "weekofyear(fd)", "weekofyear(fd)"
        if which == "week_v":
            return (
                "weekofyear(fd)",
                "CAST(strftime(fd, '%V') AS BIGINT)",
            )
        if which == "doy":
            return "dayofyear(fd)", "dayofyear(fd)"
        if which == "quarter":
            return "quarter(fd)", "quarter(fd)"
        return "CAST(last_day(fd) AS STRING)", "CAST(last_day(fd) AS STRING)"
    fn = draw(st.sampled_from(["monthname", "dayname"]))
    if fn == "monthname":
        return "date_format(fd, 'MMMM')", "monthname(fd)"
    return "date_format(fd, 'EEEE')", "dayname(fd)"


@given(pairs=st.lists(paired_fmt_scalar(), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_translated_strftime_parity(spark, duck, pairs):
    """Format-token parity: multi-token date_format patterns and their
    strftime renderings, parse round-trips, and the calendar-number
    bridges (dayofweek+1, isodow, %V weeks) agree over leap days, ISO
    week-53 boundaries, midnight/noon, fractional seconds, and NULLs."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    sq = f"SELECT {s_sel} FROM {_FMT_ROWS}"
    dq = f"SELECT {d_sel} FROM {_FMT_ROWS}"
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Bitwise + string-function translation pairs (round-9, paired-rendering
# harness). Probe-verified identical (2026-08-16): & | ~ and bit_count
# shared; shiftleft/shiftright ↔ << / >> (arithmetic on negatives: -33
# >> 2 = -9 in both); % and DIV ↔ // follow C truncation on negative
# operands in BOTH engines (the shared core's blanket signed-mod
# exclusion is engine-parity-safe — it stays excluded there only
# because the grammar predates this probe); pmod(x, m) ↔ ((x % m) + m)
# % m; locate/instr ↔ strpos (ARGUMENT ORDER FLIPS: needle-first in
# Spark, haystack-first in DuckDB), 0 on miss in both;
# substring/left/right/translate (incl. short-to delete semantics)/
# repeat (0 and negative counts → '')/reverse/levenshtein/ascii/
# char↔chr/lpad/rpad (multi-char pads, truncating rpad)/split_part
# (negative = from-the-end, out-of-bounds = '') shared;
# format_string ↔ printf (%d, %s, %05d, %.3f); startswith/endswith ↔
# starts_with/ends_with; contains shared; digests — md5/hex/unhex
# shared, sha2(s,256) ↔ sha256(s), base64(s) ↔ base64(CAST(s AS BLOB))
# — bit-exact incl. '' and NULL (sha1/crc32: Spark-only, excluded;
# bit_and/bit_or/bit_xor AGGREGATES probed identical too, incl.
# negatives, but live with the aggregate cores). Probe-verified EXCLUSIONS
# (fenced): the caret — `12 ^ 10` is bitwise XOR = 6 in Spark but
# POWER = 6.2e10 in DuckDB (the single most dangerous token in the
# whole translation space; bridged as Spark ^ ↔ DuckDB xor());
# substring with start 0 — Spark clamps to 1 ('hel') where DuckDB
# consumes a position ('he'), so generated starts skip 0; left/right
# with negative counts — '' in Spark vs drop-|n|-from-the-other-end in
# DuckDB; lpad/rpad with '' padding — Spark no-ops where DuckDB raises
# Insufficient padding; overlay() and initcap() — absent in DuckDB;
# ÷0 and %0 — ANSI Spark raises (try_divide/try_mod bridge in the
# decimal core; divisor literals here are nonzero); split_part(NULL, …)
# — NULL in Spark but '' in DuckDB (found by this core's FIRST HUNT,
# not the probe — the probe used literal haystacks only; bridged with
# an IS NULL guard on the DuckDB side); negative LEFT-shift operands —
# DuckDB << raises Out of Range where Spark shiftleft wraps Java-style
# (also hunt-found; left-shift operands are abs()-guarded, right shifts
# stay signed — arithmetic in both).

_BS_NEEDLES = ["'a'", "'b'", "'bc'", "'z'", "' '"]
_BS_HAYS = ["s", "'abcb'", "'Hello World'", "''"]
_BS_SHIFTS = list(range(0, 9))
_BS_MODULI = ["3", "7", "16", "-5"]


@st.composite
def paired_bitstring_scalar(draw):
    """(spark_sql, duck_sql) for one bitwise or string-function bridge."""
    kind = draw(
        st.sampled_from(
            ["bit", "bit", "shift", "modplus", "find", "slice",
             "pad", "misc", "printf", "predicate", "digest", "likeops",
             "trimops"]
        )
    )
    x = draw(st.sampled_from(["a", "b", "c", "CAST(12 AS BIGINT)",
                              "CAST(-7 AS BIGINT)"]))
    y = draw(st.sampled_from(["a", "b", "CAST(10 AS BIGINT)",
                              "CAST(-3 AS BIGINT)"]))
    if kind == "bit":
        op = draw(st.sampled_from(["&", "|", "^", "~", "bit_count"]))
        if op == "~":
            return f"(~{x})", f"(~{x})"
        if op == "bit_count":
            return f"bit_count({x})", f"bit_count({x})"
        if op == "^":
            # THE trap: caret is XOR in Spark, POWER in DuckDB
            return f"({x} ^ {y})", f"xor({x}, {y})"
        return f"({x} {op} {y})", f"({x} {op} {y})"
    if kind == "shift":
        k = draw(st.sampled_from(_BS_SHIFTS))
        fn, sym = draw(
            st.sampled_from([("shiftleft", "<<"), ("shiftright", ">>")])
        )
        if fn == "shiftleft":
            # found by this core's first hunt: DuckDB << RAISES on a
            # negative left operand where Spark shiftleft wraps
            # Java-style — left-shift operands are abs()-guarded
            return f"{fn}(abs({x}), {k})", f"(abs({x}) {sym} {k})"
        return f"{fn}({x}, {k})", f"({x} {sym} {k})"
    if kind == "modplus":
        m = draw(st.sampled_from(_BS_MODULI))
        which = draw(st.sampled_from(["mod", "intdiv", "pmod"]))
        if which == "mod":
            return f"({x} % {m})", f"({x} % {m})"
        if which == "intdiv":
            return f"({x} DIV {m})", f"({x} // {m})"
        mm = m.lstrip("-")  # pmod bridge needs a positive modulus
        return (
            f"pmod({x}, {mm})",
            f"((({x} % {mm}) + {mm}) % {mm})",
        )
    if kind == "find":
        needle = draw(st.sampled_from(_BS_NEEDLES))
        hay = draw(st.sampled_from(_BS_HAYS))
        fn = draw(st.sampled_from(["locate", "instr", "split_part"]))
        if fn == "locate":
            return f"locate({needle}, {hay})", f"strpos({hay}, {needle})"
        if fn == "instr":
            return f"instr({hay}, {needle})", f"strpos({hay}, {needle})"
        idx = draw(st.sampled_from([-2, -1, 1, 2, 9]))
        # found by this core's first hunt: split_part(NULL, …) is NULL
        # in Spark but '' in DuckDB — the only string function probed
        # here that swallows a NULL input
        return (
            f"split_part({hay}, {needle}, {idx})",
            f"(CASE WHEN {hay} IS NULL THEN NULL"
            f" ELSE split_part({hay}, {needle}, {idx}) END)",
        )
    if kind == "slice":
        hay = draw(st.sampled_from(_BS_HAYS))
        which = draw(st.sampled_from(["substr", "substr_n", "left", "right"]))
        start = draw(st.sampled_from([-5, -3, -1, 1, 2, 5]))  # never 0
        if which == "substr":
            return f"substring({hay}, {start})", f"substring({hay}, {start})"
        if which == "substr_n":
            n = draw(st.integers(0, 4))
            q = f"substring({hay}, {start}, {n})"
            return q, q
        n = draw(st.integers(0, 6))  # negative counts are fenced
        return f"{which}({hay}, {n})", f"{which}({hay}, {n})"
    if kind == "pad":
        hay = draw(st.sampled_from(_BS_HAYS))
        fn = draw(st.sampled_from(["lpad", "rpad"]))
        n = draw(st.integers(0, 8))
        pad = draw(st.sampled_from(["'x'", "'ab'"]))  # non-empty: fenced
        q = f"{fn}({hay}, {n}, {pad})"
        return q, q
    if kind == "misc":
        hay = draw(st.sampled_from(_BS_HAYS))
        which = draw(
            st.sampled_from(
                ["translate", "repeat", "reverse", "levenshtein",
                 "ascii", "chr"]
            )
        )
        if which == "translate":
            q = f"translate({hay}, 'ab', 'xy')"
            return q, q
        if which == "repeat":
            n = draw(st.integers(-1, 3))
            q = f"repeat({hay}, {n})"
            return q, q
        if which == "reverse":
            return f"reverse({hay})", f"reverse({hay})"
        if which == "levenshtein":
            other = draw(st.sampled_from(_BS_HAYS))
            q = f"levenshtein({hay}, {other})"
            return q, q
        if which == "ascii":
            return f"ascii({hay})", f"ascii({hay})"
        code = draw(st.integers(65, 90))
        return f"char({code})", f"chr({code})"
    if kind == "trimops":
        # r09 probe: trim(BOTH/LEADING/TRAILING chars FROM s) is shared
        # (character-SET semantics in both); btrim(s, chars) ↔
        # trim(s, chars); the || operator concats with NULL propagation
        # and implicit int→string casts identically. Trap: two-arg
        # ltrim/rtrim ARGUMENT ORDER FLIPS — Spark ltrim(trimStr, str)
        # vs DuckDB ltrim(str, chars).
        hay = draw(st.sampled_from(_BS_HAYS))
        chars = draw(st.sampled_from(["'x'", "'ab'", "' '"]))
        which = draw(
            st.sampled_from(
                ["both", "leading", "trailing", "btrim", "lr2", "concat"]
            )
        )
        if which in ("both", "leading", "trailing"):
            q = f"trim({which.upper()} {chars} FROM {hay})"
            return q, q
        if which == "btrim":
            return f"btrim({hay}, {chars})", f"trim({hay}, {chars})"
        if which == "lr2":
            fn = draw(st.sampled_from(["ltrim", "rtrim"]))
            return (
                f"{fn}({chars}, {hay})",
                f"{fn}({hay}, {chars})",
            )
        other = draw(st.sampled_from(_BS_HAYS + ["CAST(7 AS BIGINT)"]))
        q = f"({hay} || {other})"
        return q, q
    if kind == "likeops":
        # r09 probe: like/ilike/%_/escapes agree — but the ESCAPE
        # RENDERING differs: Spark reads '\\_' as an escaped literal
        # from the string literal alone, DuckDB needs an explicit
        # ESCAPE '\' clause
        hay = draw(st.sampled_from(_BS_HAYS))
        op = draw(st.sampled_from(["like", "ilike", "not like",
                                   "not ilike", "escape"]))
        if op == "escape":
            return (
                f"CAST(('a_c' like 'a\\\\_c') AS INT)",
                "CAST(('a_c' LIKE 'a\\_c' ESCAPE '\\') AS INT)",
            )
        pat = draw(st.sampled_from(["'a%'", "'%b%'", "'A_'", "'%'",
                                    "''", "'ab'"]))
        q = f"CAST(({hay} {op} {pat}) AS INT)"
        return q, q
    if kind == "digest":
        # probe-verified 2026-08-16: md5 / sha2-256↔sha256 / base64 over
        # BLOB / hex / unhex round-trips agree bit-exact incl. '' and
        # NULL; sha1 and crc32 are Spark-only (excluded)
        hay = draw(st.sampled_from(_BS_HAYS))
        which = draw(
            st.sampled_from(["md5", "sha256", "base64", "hex", "unhex_rt"])
        )
        if which == "md5":
            return f"md5({hay})", f"md5({hay})"
        if which == "sha256":
            return f"sha2({hay}, 256)", f"sha256({hay})"
        if which == "base64":
            return f"base64({hay})", f"base64(CAST({hay} AS BLOB))"
        if which == "hex":
            return f"hex({hay})", f"hex({hay})"
        return (
            f"CAST(unhex(hex({hay})) AS STRING)",
            f"CAST(unhex(hex({hay})) AS STRING)",
        )
    if kind == "printf":
        fmt_s, fmt_d, args = draw(
            st.sampled_from(
                [("'%d-%s'", "'%d-%s'", "7, 'x'"),
                 ("'%05d'", "'%05d'", "42"),
                 ("'%.3f'", "'%.3f'", "CAST(2.5 AS DOUBLE)"),
                 ("'[%s]'", "'[%s]'", "'q'")]
            )
        )
        return (
            f"format_string({fmt_s}, {args})",
            f"printf({fmt_d}, {args})",
        )
    hay = draw(st.sampled_from(_BS_HAYS))
    needle = draw(st.sampled_from(_BS_NEEDLES))
    which = draw(
        st.sampled_from(
            ["startswith", "endswith", "contains", "nullsafe_eq"]
        )
    )
    if which == "nullsafe_eq":
        # Spark's <=> spelling ↔ the standard IS NOT DISTINCT FROM
        # (probe-verified on NULL/NULL, value/NULL, value/value)
        other = draw(st.sampled_from(_BS_HAYS))
        return (
            f"CAST(({hay} <=> {other}) AS INT)",
            f"CAST(({hay} IS NOT DISTINCT FROM {other}) AS INT)",
        )
    if which == "contains":
        return (
            f"CAST(contains({hay}, {needle}) AS INT)",
            f"CAST(contains({hay}, {needle}) AS INT)",
        )
    return (
        f"CAST({which}({hay}, {needle}) AS INT)",
        f"CAST({which.replace('swith', 's_with')}({hay}, {needle}) AS INT)",
    )


@given(pairs=st.lists(paired_bitstring_scalar(), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_translated_bitstring_parity(spark, duck, pairs):
    """Bitwise/string-function parity: shifts, masks, the ^↔xor() bridge,
    signed mod/intdiv, pmod, needle-order-flipped locate↔strpos, slicing,
    padding, printf, and the predicate renames agree over the shared
    12-row relation (fenced: caret-power, substring start 0, negative
    left/right, empty pads, overlay/initcap)."""
    s_sel = ", ".join(f"{s} AS x{i}" for i, (s, _) in enumerate(pairs))
    d_sel = ", ".join(f"{d} AS x{i}" for i, (_, d) in enumerate(pairs))
    sq = f"SELECT {s_sel} FROM {TABLE}"
    dq = f"SELECT {d_sel} FROM {TABLE}"
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# PIVOT translation pairs (round-9, paired-rendering harness): the wide
# direction of the unpivot family above — Spark's subquery PIVOT
# (… PIVOT (agg(n) FOR k IN ('v' AS v, …))) vs DuckDB's statement-level
# PIVOT (PIVOT … ON k IN ('v', …) USING agg(n) GROUP BY g) — plus both
# engines' shared conditional-CASE and FILTER-clause renderings, which
# the d_agg_pivot/d_agg_conditional oracles hand-write. Probe-verified
# identical (2026-08-16): sum/min/max cells, absent pivot values
# (all-NULL column in both), NULL pivot keys (match no IN value in
# both), string-valued cells, and cross-rendering equivalence
# (PIVOT ≡ CASE ≡ FILTER). Probe-verified EXCLUSION (fenced):
# count() over an EMPTY cell — Spark's pivot writes NULL into missing
# cells for EVERY aggregate where DuckDB's count (and a shared
# count(CASE …)) gives 0, so counting pivots must coalesce the Spark
# side; the grammar admits sum/min/max only.

_PIVOT_VALS = ["a", "ab", "aa", "AB", "xyz"]
_PIVOT_GROUPS = ["abs(b) % 2", "a % 3", "(CASE WHEN c IS NULL THEN 0 ELSE 1 END)"]


@st.composite
def paired_pivot(draw):
    """(spark_sql, duck_sql) for one PIVOT rendering pair."""
    g = draw(st.sampled_from(_PIVOT_GROUPS))
    n = draw(st.sampled_from(["a", "b", "c", "a + b"]))
    fn = draw(st.sampled_from(["sum", "min", "max"]))
    vals = draw(
        st.lists(st.sampled_from(_PIVOT_VALS), min_size=1, max_size=3,
                 unique=True)
    )
    src = f"(SELECT {g} AS g, s AS k, {n} AS n FROM {TABLE}) src"
    s_in = ", ".join(f"'{v}' AS {v}" for v in vals)
    d_in = ", ".join(f"'{v}'" for v in vals)
    sq = f"SELECT * FROM {src} PIVOT ({fn}(n) FOR k IN ({s_in}))"
    form = draw(st.sampled_from(["pivot", "case", "filter"]))
    if form == "pivot":
        dq = (f"PIVOT {src} ON k IN ({d_in})"
              f" USING {fn}(n) GROUP BY g")
        return sq, dq
    if form == "case":
        cells = ", ".join(
            f"{fn}(CASE WHEN k = '{v}' THEN n END) AS {v}" for v in vals
        )
    else:
        cells = ", ".join(
            f"{fn}(n) FILTER (WHERE k = '{v}') AS {v}" for v in vals
        )
    return sq, f"SELECT g, {cells} FROM {src} GROUP BY g"


@given(q=paired_pivot())
@settings(**SETTINGS)
def test_translated_pivot_parity(spark, duck, q):
    """PIVOT parity: Spark's subquery PIVOT matches DuckDB's PIVOT
    statement, the conditional-CASE rendering, and the FILTER-clause
    rendering cell-for-cell over computed group keys, absent values,
    and NULL pivot keys (count is fenced: Spark NULLs empty cells,
    DuckDB counts 0)."""
    sq, dq = q
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# IGNORE NULLS + multi-DISTINCT translation pairs (round-9, paired
# rendering): the gap-fill idiom behind e_win_interpolate and the
# multi-column distinct-count idiom. The SYNTAX POSITION differs —
# Spark only parses the postfix form `f(x) IGNORE NULLS OVER (…)`
# while DuckDB only parses the in-argument form `f(x IGNORE NULLS)
# OVER (…)` (probe-verified both directions: each engine REJECTS the
# other's spelling with a parse error). Probe-verified identical
# through the paired spellings (2026-08-16): first_value/last_value/
# nth_value(x, k) under explicit ROWS frames, lead/lag with offsets
# 0–2 — all gap-fill semantics agree including all-NULL tails.
# count(DISTINCT p, q) is Spark-only syntax; DuckDB's struct form
# count(DISTINCT (p, q)) COUNTS rows with NULL fields where Spark
# drops them (probed: 3 vs 5) — the bridge is a FILTER (WHERE every
# arg IS NOT NULL) on the DuckDB side.

_IGN_VALS = ["c", "nullif(b, 13)", "nullif(a, 0)"]


@st.composite
def paired_ignore_nulls(draw):
    part = draw(st.sampled_from(["", "PARTITION BY abs(b) % 2 "]))
    x = draw(st.sampled_from(_IGN_VALS))
    kind = draw(st.sampled_from(["valpos", "leadlag", "cnt_distinct"]))
    if kind == "cnt_distinct":
        cols = draw(
            st.lists(st.sampled_from(["a", "b", "c", "s"]), min_size=2,
                     max_size=3, unique=True)
        )
        guard = " AND ".join(f"{col} IS NOT NULL" for col in cols)
        return (
            f"SELECT count(DISTINCT {', '.join(cols)}) AS n FROM {TABLE}",
            f"SELECT count(DISTINCT ({', '.join(cols)}))"
            f" FILTER (WHERE {guard}) AS n FROM {TABLE}",
        )
    if kind == "valpos":
        # DuckDB's IGNORE NULLS sits after the LAST argument
        s_fn, d_fn = draw(
            st.sampled_from(
                [("first_value({x})", "first_value({x} IGNORE NULLS)"),
                 ("last_value({x})", "last_value({x} IGNORE NULLS)"),
                 ("nth_value({x}, 2)", "nth_value({x}, 2 IGNORE NULLS)"),
                 ("nth_value({x}, 3)", "nth_value({x}, 3 IGNORE NULLS)")]
            )
        )
        frame = draw(st.sampled_from(_ROWS_FRAMES[1:]))  # explicit only
        over = f"({part}ORDER BY a{frame})"
        s = f"CAST({s_fn.format(x=x)} IGNORE NULLS OVER {over} AS BIGINT)"
        d = f"CAST({d_fn.format(x=x)} OVER {over} AS BIGINT)"
        return f"SELECT a, {s} AS f FROM {TABLE}", \
               f"SELECT a, {d} AS f FROM {TABLE}"
    fn = draw(st.sampled_from(["lead", "lag"]))
    n = draw(st.integers(0, 2))
    over = f"({part}ORDER BY a)"
    s = f"CAST({fn}({x}, {n}) IGNORE NULLS OVER {over} AS BIGINT)"
    d = f"CAST({fn}({x}, {n} IGNORE NULLS) OVER {over} AS BIGINT)"
    return f"SELECT a, {s} AS f FROM {TABLE}", \
           f"SELECT a, {d} AS f FROM {TABLE}"


@given(q=paired_ignore_nulls())
@settings(**SETTINGS)
def test_translated_ignore_nulls_parity(spark, duck, q):
    """IGNORE NULLS parity: the postfix (Spark) and in-argument (DuckDB)
    spellings of gap-fill window functions agree over nullable values,
    and multi-column count(DISTINCT …) matches DuckDB's struct-distinct
    under the every-arg-NOT-NULL filter bridge."""
    sq, dq = q
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Statistical-aggregate + windowed-collect translation pairs (round-9).
# Probe-verified identical (2026-08-16) through the %.9e rendering
# bridge (_stats_bridge — the first hunt showed engines differ in the
# LAST ULP on exact-rational results like covar_samp = −434.25, which
# flips any commensurate floor-quantize across its grid boundary):
# stddev_samp/stddev_pop/var_samp/var_pop, corr, covar_samp — same
# numerically-stable merge formulas, agreeing to ~15 digits on
# NULL-bearing inputs. Windowed collect: Spark collect_list OVER a ROWS frame ↔
# DuckDB list() OVER the same frame — but collect_list DROPS NULLs
# where DuckDB's list() KEEPS them (probed: frame lengths 1 vs 2 over
# a NULL row), so the DuckDB side carries a list_filter NOT-NULL
# bridge; frame order makes the contents deterministic, read back via
# join and length. Probe-verified EXCLUSIONS (fenced): skewness and
# kurtosis — DIFFERENT ESTIMATOR FAMILIES (Spark's biased population
# g1/g2 vs DuckDB's sample-corrected G1/G2: 0.65 vs 1.14 skew on the
# same five rows), not a bridgeable rendering; any_value/first —
# nondeterministic by contract.

_STATS_XS = ["a", "b", "c", "a + b"]


def _stats_bridge(expr: str) -> tuple[str, str]:
    """10-significant-digit rendering bridge for spread/corr values.

    A floor-quantize bridge is WRONG here (first hunt): covariances of
    integer inputs are small-denominator rationals that land exactly on
    any commensurate grid (covar_samp = −434.25), and the two engines'
    last-ulp difference flips floor() across the boundary. %.9e
    rounding is tie-free for such rationals — a 10-digit half-boundary
    would need an exact (k+½)·10^(e−9) value, which a q ≤ 144 rational
    at these magnitudes cannot be — so both renderings collapse the
    ulp noise to the same text. NULL (empty/degenerate group) guards
    the format call on both sides.
    """
    return (
        f"(CASE WHEN {expr} IS NOT NULL"
        f" THEN format_string('%.9e', {expr}) END)",
        f"(CASE WHEN {expr} IS NOT NULL"
        f" THEN printf('%.9e', {expr}) END)",
    )


@st.composite
def paired_stats(draw):
    kind = draw(
        st.sampled_from(
            ["spread", "pair", "win_collect", "regr", "boolagg",
             "argminmax", "median"]
        )
    )
    if kind == "regr":
        # r09 probe: the whole regr_* family (slope/intercept/r2/avgx/
        # avgy/sxx/sxy/count) matches through %.9e, incl. the
        # both-non-NULL pair rule (regr_count excludes half-NULL rows)
        fn = draw(
            st.sampled_from(
                ["regr_slope", "regr_intercept", "regr_r2", "regr_avgx",
                 "regr_avgy", "regr_sxx", "regr_sxy"]
            )
        )
        y = draw(st.sampled_from(_STATS_XS))
        x = draw(st.sampled_from([e for e in _STATS_XS if e != y]))
        sv, dv = _stats_bridge(f"{fn}({y}, {x})")
        return (f"SELECT {sv} AS v FROM {TABLE}",
                f"SELECT {dv} AS v FROM {TABLE}")
    if kind == "boolagg":
        pred = draw(
            st.sampled_from(["a > 0", "c IS NULL", "b % 2 = 0", "c > b"])
        )
        fn_s, fn_d = draw(
            st.sampled_from(
                [("bool_and", "bool_and"), ("bool_or", "bool_or"),
                 ("every", "bool_and"), ("any", "bool_or")]
            )
        )
        return (
            f"SELECT CAST({fn_s}({pred}) AS INT) AS v FROM {TABLE}",
            f"SELECT CAST({fn_d}({pred}) AS INT) AS v FROM {TABLE}",
        )
    if kind == "argminmax":
        # key is column a — unique in every row, so no tie
        # nondeterminism; DuckDB also accepts the min_by spelling but
        # arg_min/arg_max is its native name. Hunt-found trap: when the
        # value at the winning key is NULL, Spark's min_by/max_by
        # RETURNS that NULL where DuckDB's arg_min/arg_max SKIPS
        # null-valued rows and answers from the next-best key — the
        # Spark side carries a FILTER (value IS NOT NULL) to pin
        # DuckDB's semantics.
        val = draw(st.sampled_from(["s", "b", "c"]))
        fn_s, fn_d = draw(
            st.sampled_from(
                [("min_by", "arg_min"), ("max_by", "arg_max"),
                 ("min_by", "min_by"), ("max_by", "max_by")]
            )
        )
        return (
            f"SELECT {fn_s}({val}, a)"
            f" FILTER (WHERE {val} IS NOT NULL) AS v FROM {TABLE}",
            f"SELECT {fn_d}({val}, a) AS v FROM {TABLE}",
        )
    if kind == "median":
        x = draw(st.sampled_from(_STATS_XS))
        grp = draw(st.sampled_from(["", " GROUP BY abs(b) % 2"]))
        sv, dv = _stats_bridge(f"median({x})")
        return (f"SELECT {sv} AS v FROM {TABLE}{grp}",
                f"SELECT {dv} AS v FROM {TABLE}{grp}")
    if kind == "spread":
        fn = draw(
            st.sampled_from(
                ["stddev_samp", "stddev_pop", "var_samp", "var_pop"]
            )
        )
        x = draw(st.sampled_from(_STATS_XS))
        grp = draw(st.sampled_from(["", " GROUP BY abs(b) % 2"]))
        sv, dv = _stats_bridge(f"{fn}({x})")
        return (f"SELECT {sv} AS v FROM {TABLE}{grp}",
                f"SELECT {dv} AS v FROM {TABLE}{grp}")
    if kind == "pair":
        fn = draw(st.sampled_from(["corr", "covar_samp"]))
        x = draw(st.sampled_from(_STATS_XS))
        y = draw(st.sampled_from([e for e in _STATS_XS if e != x]))
        sv, dv = _stats_bridge(f"{fn}({x}, {y})")
        return (f"SELECT {sv} AS v FROM {TABLE}",
                f"SELECT {dv} AS v FROM {TABLE}")
    x = draw(st.sampled_from(["a", "c"]))  # c injects NULLs
    frame = draw(st.sampled_from(_ROWS_FRAMES[1:]))
    over = f"(ORDER BY a{frame})"
    bridge = draw(st.sampled_from(["join", "len"]))
    s_arr = f"collect_list({x}) OVER {over}"
    d_arr = (f"list_filter(list({x}) OVER {over},"
             " v -> v IS NOT NULL)")
    if bridge == "join":
        return (
            f"SELECT a, array_join({s_arr}, ',') AS l FROM {TABLE}",
            f"SELECT a, coalesce(array_to_string({d_arr}, ','), '')"
            f" AS l FROM {TABLE}",
        )
    # r10 (found by the backward-only-frame extension the moment it
    # landed): over an EMPTY frame Spark collect_list is [] (size 0)
    # while DuckDB list() is NULL — coalesce the length like the join
    # bridge already coalesces the text.
    return (
        f"SELECT a, size({s_arr}) AS n FROM {TABLE}",
        f"SELECT a, coalesce(len({d_arr}), 0) AS n FROM {TABLE}",
    )


@given(q=paired_stats())
@settings(**SETTINGS)
def test_translated_stats_parity(spark, duck, q):
    """Stats parity: spread/correlation aggregates match through the
    quantization bridge, and frame-ordered collect_list matches
    DuckDB's list() under the NOT-NULL filter bridge (collect_list
    drops NULLs, list() keeps them); skewness/kurtosis are fenced —
    the engines implement different estimator families."""
    sq, dq = q
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# ---------------------------------------------------------------------------
# Recursive-CTE core (round-9, shared text): WITH RECURSIVE landed in
# Spark 4, giving both engines the same syntax for the iteration
# idioms graph/hierarchy oracles want. Probe-verified admissions
# (2026-08-16): UNION ALL recursion with single- and multi-column
# state (linear recurrences — fib(12) = 144 in both), string
# accumulation, several recursive CTEs in one WITH, and join-seeded
# DAG reachability with depth guards (duplicate path multiplicity
# agrees — UNION ALL keeps both arrivals). Probe-verified EXCLUSION
# (fenced): UNION-distinct recursion — Spark raises
# UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE where DuckDB iterates to a
# fixpoint, so every generated recursion is UNION ALL with an explicit
# bound (also keeps well under Spark's recursion row limit).

_REC_DAG = "(VALUES (1,2),(1,3),(2,4),(3,4),(4,5),(2,5),(5,6)) e(a,b)"


@st.composite
def recursive_query(draw) -> str:
    kind = draw(st.sampled_from(["chain", "recur2", "reach", "strgrow"]))
    if kind == "chain":
        seed = draw(st.integers(0, 3))
        step = draw(st.integers(1, 3))
        bound = draw(st.integers(5, 40))
        agg = draw(st.sampled_from(["sum(n)", "count(*)", "min(n)",
                                    "max(n)"]))
        return (
            f"WITH RECURSIVE r(n) AS (SELECT {seed} UNION ALL"
            f" SELECT n + {step} FROM r WHERE n < {bound})"
            f" SELECT CAST({agg} AS BIGINT) AS v FROM r"
        )
    if kind == "recur2":
        ca = draw(st.integers(1, 2))
        cb = draw(st.integers(1, 2))
        depth = draw(st.integers(3, 18))
        return (
            "WITH RECURSIVE f(i, a, b) AS ("
            " SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)"
            f" UNION ALL SELECT i + 1, b, {ca} * a + {cb} * b"
            f" FROM f WHERE i < {depth})"
            " SELECT CAST(max(b) AS BIGINT) AS v,"
            " CAST(sum(a) AS BIGINT) AS t FROM f"
        )
    if kind == "reach":
        seed = draw(st.sampled_from([1, 2, 3]))
        dmax = draw(st.integers(1, 5))
        return (
            f"WITH RECURSIVE edges(a, b) AS (SELECT * FROM {_REC_DAG}),"
            f" reach(n, d) AS (SELECT {seed}, 0 UNION ALL"
            " SELECT e.b, r.d + 1 FROM edges e JOIN reach r ON e.a = r.n"
            f" WHERE r.d < {dmax})"
            " SELECT count(*) AS c, CAST(sum(n) AS BIGINT) AS s,"
            " CAST(max(d) AS BIGINT) AS md FROM reach"
        )
    depth = draw(st.integers(2, 6))
    piece = draw(st.sampled_from(["'b'", "'xy'", "CAST(n AS STRING)"]))
    return (
        "WITH RECURSIVE p(n, s) AS ("
        " SELECT 1, CAST('a' AS STRING)"
        f" UNION ALL SELECT n + 1, s || {piece} FROM p WHERE n < {depth})"
        " SELECT max(length(s)) AS l, count(*) AS c,"
        " max(s) AS tail FROM p"
    )


@given(q=recursive_query())
@settings(**SETTINGS)
def test_recursive_cte_parity(spark, duck, q):
    """Recursive-CTE parity: bounded UNION ALL recursions — arithmetic
    chains, two-column linear recurrences, string growth, and DAG
    reachability with duplicate-path multiplicity — produce identical
    aggregates in both engines (UNION-distinct recursion is fenced:
    Spark-unsupported)."""
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"


# listagg translation pairs (round-9). Spark 4's listagg lives in its
# OWN test rather than paired_aggregate for a hunt-found reason: an
# ordered listagg co-planned with TWO different-child DISTINCT
# aggregates in one SELECT crashes Spark 4.1.2's planner outright —
# minimal repro
#   SELECT count(DISTINCT a % 2), count(DISTINCT a % 3),
#          listagg(s, ',') WITHIN GROUP (ORDER BY s) FROM t
# → ClassCastException: AttributeReference cannot be cast to SortOrder
# (the Expand-based multi-distinct rewrite mishandles the WITHIN GROUP
# sort order). That is an ENGINE BUG, not a dialect divergence; the
# paired harness mixes up to 4 arbitrary pairs per SELECT, so listagg
# gets a SELECT of its own. Probe-verified pairs: listagg … WITHIN
# GROUP (ORDER BY) ↔ DuckDB string_agg/listagg with order-inside,
# both directions, grouped and global, DISTINCT included (safe here —
# no co-planned multi-distinct).


@given(
    sep=st.sampled_from([",", "|"]),
    direction=st.sampled_from(["", " DESC"]),
    dist=st.sampled_from(["", "DISTINCT "]),
    d_fn=st.sampled_from(["string_agg", "listagg"]),
    grp=st.sampled_from(["", " GROUP BY g"]),
)
@settings(**SETTINGS)
def test_translated_listagg_parity(spark, duck, sep, direction, dist,
                                   d_fn, grp):
    """listagg parity: Spark's WITHIN GROUP spelling matches DuckDB's
    order-inside string_agg/listagg, grouped and global, with DISTINCT
    and DESC — isolated per-SELECT to stay clear of the co-planned
    multi-distinct planner crash documented above."""
    src = f"(SELECT abs(a) % 3 AS g, s FROM {TABLE} WHERE s IS NOT NULL) v"
    gcol = "g, " if grp else ""
    sq = (
        f"SELECT {gcol}listagg({dist}s, '{sep}')"
        f" WITHIN GROUP (ORDER BY s{direction}) AS l FROM {src}{grp}"
    )
    dq = (
        f"SELECT {gcol}{d_fn}({dist}s, '{sep}'"
        f" ORDER BY s{direction}) AS l FROM {src}{grp}"
    )
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Collation translation pairs (round-10, probe-first): Spark's collate()
# expression ↔ DuckDB's COLLATE clause. Admitted by probe:
# case-insensitive compares (=, <>, <, <=, >, >=) with Spark UTF8_LCASE ↔
# DuckDB NOCASE over ASCII and NULLs; case+accent-insensitive equality
# and ordering with Spark UNICODE_CI_AI ↔ DuckDB NOCASE.NOACCENT over the
# probe-verified accent alphabet (à â ç è é É ï ñ ö ü — each folds
# identically in both engines); min/max aggregates (lower()-normalized —
# the winning EQUIVALENCE CLASS is deterministic, its representative is
# not); rank() over a collated order with a totalizing tiebreak; GROUP BY
# a collated key with a lower()-normalized output key; equi-JOINs whose
# ON compares two collated sides; IN over literal lists; ORDER BY +
# LIMIT with a totalizing tiebreak; collated CASE WHEN predicates; and
# DISTINCT row-sets over lower()-normalized collated keys. Probe-fenced
# REAL traps: (a) count(DISTINCT x COLLATE NOCASE) — DuckDB IGNORES the
# collation in distinct aggregation (counts 5 where Spark's
# count(DISTINCT collate(x,'UTF8_LCASE')) counts the 3 fold classes);
# (b) IN (SELECT …) — DuckDB likewise DROPS the collation in the
# subquery semi-join (binary matches only: {5,6,7} where Spark's
# fold-class match returns {2,3,5,6,7} on the probe relation) even with
# COLLATE on both the outer key and the inner projection — and the same
# class covers ALL SET OPERATIONS (UNION DISTINCT keeps both 'a' and
# 'A', INTERSECT of {'a','AB'} ∩ {'A','ab'} is EMPTY, EXCEPT keeps
# 'AB' − {'ab'}): DuckDB's collation is comparison/GROUP-BY-deep only,
# never dedup-deep, where Spark's is a TYPE property; (c) full case
# folding — Spark's ICU UNICODE_CI_AI folds ß→ss (and ligatures) where
# DuckDB NOCASE.NOACCENT does not, so ß never enters the alphabet;
# (d) nullif over a collated operand — Spark raises
# INDETERMINATE_COLLATION_IN_EXPRESSION where DuckDB computes;
# (e) bare-s grouping representatives are first-seen and
# engine-specific — outputs always normalize through lower().

_COLL_LITS = ["'a'", "'ab'", "'AB'", "'b c'", "''", "CAST(NULL AS STRING)"]
_ACCENT_CHARS = ["a", "b", "A", "B", "e", "E", "é", "É", "à", "ç", "ü",
                 "ö", "ñ", "ï", "â", "è"]


@st.composite
def paired_collation_query(draw):
    """(spark_query, duck_query) exercising one collation construct."""
    kind = draw(
        st.sampled_from(["cmp", "minmax", "rank", "group", "accent",
                         "join", "inlist", "order_limit", "case_when"])
    )
    if kind == "cmp":
        op = draw(st.sampled_from(_CMP_OPS))
        lit = draw(st.sampled_from(_COLL_LITS))
        return (
            f"SELECT a, (collate(s, 'UTF8_LCASE') {op} {lit}) AS x"
            f" FROM {TABLE}",
            f"SELECT a, (s {op} {lit} COLLATE NOCASE) AS x FROM {TABLE}",
        )
    if kind == "join":
        return (
            f"SELECT t.a AS la, t2.a AS ra FROM {TABLE} JOIN {_T2}"
            f" ON collate(t.s, 'UTF8_LCASE')"
            f" = collate(t2.s, 'UTF8_LCASE') AND t.a < t2.a",
            f"SELECT t.a AS la, t2.a AS ra FROM {TABLE} JOIN {_T2}"
            f" ON t.s = t2.s COLLATE NOCASE AND t.a < t2.a",
        )
    if kind == "inlist":
        lits = draw(
            st.lists(st.sampled_from(["'a'", "'ab'", "'B C'", "'Q'"]),
                     min_size=1, max_size=3, unique=True)
        )
        in_list = ", ".join(lits)
        return (
            f"SELECT a FROM {TABLE}"
            f" WHERE collate(s, 'UTF8_LCASE') IN ({in_list})",
            f"SELECT a FROM {TABLE}"
            f" WHERE s COLLATE NOCASE IN ({in_list})",
        )
    if kind == "order_limit":
        n = draw(st.integers(1, 8))
        direction = draw(st.sampled_from(["ASC NULLS LAST",
                                          "DESC NULLS FIRST"]))
        return (
            f"SELECT a FROM {TABLE} ORDER BY collate(s, 'UTF8_LCASE')"
            f" {direction}, a LIMIT {n}",
            f"SELECT a FROM {TABLE} ORDER BY s COLLATE NOCASE"
            f" {direction}, a LIMIT {n}",
        )
    if kind == "case_when":
        lit = draw(st.sampled_from(["'ab'", "'b c'", "''"]))
        return (
            f"SELECT a, (CASE WHEN collate(s, 'UTF8_LCASE') = {lit}"
            f" THEN 1 ELSE 0 END) AS x FROM {TABLE}",
            f"SELECT a, (CASE WHEN s = {lit} COLLATE NOCASE"
            f" THEN 1 ELSE 0 END) AS x FROM {TABLE}",
        )
    if kind == "minmax":
        fn = draw(st.sampled_from(["min", "max"]))
        return (
            f"SELECT lower({fn}(collate(s, 'UTF8_LCASE'))) AS x"
            f" FROM {TABLE}",
            f"SELECT lower({fn}(s COLLATE NOCASE)) AS x FROM {TABLE}",
        )
    if kind == "rank":
        fn = draw(st.sampled_from(["rank()", "dense_rank()",
                                   "row_number()"]))
        direction = draw(st.sampled_from(["ASC NULLS LAST",
                                          "DESC NULLS FIRST"]))
        return (
            f"SELECT a, {fn} OVER (ORDER BY collate(s, 'UTF8_LCASE')"
            f" {direction}, a, b) AS x FROM {TABLE}",
            f"SELECT a, {fn} OVER (ORDER BY s COLLATE NOCASE"
            f" {direction}, a, b) AS x FROM {TABLE}",
        )
    if kind == "group":
        return (
            f"SELECT lower(collate(s, 'UTF8_LCASE')) AS k,"
            f" CAST(count(*) AS BIGINT) AS n,"
            f" CAST(sum(a) AS BIGINT) AS t FROM {TABLE}"
            f" GROUP BY collate(s, 'UTF8_LCASE')",
            f"SELECT lower(s COLLATE NOCASE) AS k,"
            f" CAST(count(*) AS BIGINT) AS n,"
            f" CAST(sum(a) AS BIGINT) AS t FROM {TABLE}"
            f" GROUP BY s COLLATE NOCASE",
        )
    # accent: literal-only equality/ordering under CI+AI folding
    l_str = "".join(draw(st.lists(st.sampled_from(_ACCENT_CHARS),
                                  min_size=0, max_size=4)))
    r_str = "".join(draw(st.lists(st.sampled_from(_ACCENT_CHARS),
                                  min_size=0, max_size=4)))
    op = draw(st.sampled_from(_CMP_OPS))
    return (
        f"SELECT (collate('{l_str}', 'UNICODE_CI_AI') {op} '{r_str}')"
        f" AS x",
        f"SELECT ('{l_str}' {op} '{r_str}' COLLATE NOCASE.NOACCENT)"
        f" AS x",
    )


@given(q=paired_collation_query())
@settings(**SETTINGS)
def test_translated_collation_parity(spark, duck, q):
    """Collation parity: case-insensitive and case+accent-insensitive
    compares, aggregates, window orders and groupings agree through the
    collate() ↔ COLLATE translation within the probe-fenced grammar
    (see the block comment above)."""
    sq, dq = q
    s_rows = _canon(spark.sql(sq).toPandas())
    o_rows = _canon(duck.execute(dq).df())
    assert s_rows == o_rows, f"divergence for: {sq}  VS  {dq}"


# Name-resolution pairs (round-10, probe-first): where an output alias
# SHADOWS a base column, both engines resolve ORDER BY to the ALIAS
# (the output column) and GROUP BY to the BASE column; GROUP BY/ORDER BY
# ordinals, HAVING over select-list aliases, ORDER BY expressions under
# SELECT *, aggregates in ORDER BY (including HIDDEN aggregates not in
# the select list), and OFFSET / LIMIT-OFFSET pagination all agree.
# Probe-fenced asymmetries: a lateral alias in WHERE (SELECT a+1 AS c
# ... WHERE c > 2) resolves in DuckDB but is UNRESOLVED_COLUMN in Spark
# — WHERE never sees the select list there, so the shared grammar keeps
# aliases out of WHERE; FETCH FIRST n ROWS ONLY and ordered
# any_value(x ORDER BY …) are DuckDB-only spellings (Spark parse
# errors).

_A_EXPRS = ["abs(a)", "(a % 2)", "(a + 1)", "(0 - a)", "greatest(a, 0)"]


@st.composite
def resolution_query(draw) -> str:
    ae = draw(st.sampled_from(_A_EXPRS))
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    kind = draw(
        st.sampled_from(
            ["order_shadow", "group_shadow", "group_ordinal",
             "having_alias", "order_ordinal", "order_by_agg", "offset"]
        )
    )
    if kind == "order_by_agg":
        # aggregate in ORDER BY — drawn hidden (not in the select list)
        # or visible; both probe-identical
        agg = draw(st.sampled_from(["count(*)", "sum(a)", "max(b)"]))
        return (
            f"SELECT abs(b) % 3 AS g FROM {TABLE} GROUP BY 1"
            f" ORDER BY {agg} {direction}, g LIMIT {draw(st.integers(1, 4))}"
        )
    if kind == "offset":
        n = draw(st.integers(0, 13))
        lim = draw(st.sampled_from(["", f" LIMIT {draw(st.integers(1, 5))}"]))
        # OFFSET after LIMIT in shared syntax: LIMIT x OFFSET y / bare OFFSET
        return (
            f"SELECT a FROM {TABLE} ORDER BY a {direction}, b"
            f"{lim} OFFSET {n}"
        )
    if kind == "order_shadow":
        n = draw(st.integers(1, 12))
        return (
            f"SELECT {ae} AS a, b FROM {TABLE}"
            f" ORDER BY a {direction}, b LIMIT {n}"
        )
    if kind == "group_shadow":
        return (
            f"SELECT {ae} AS a, CAST(count(*) AS BIGINT) AS n"
            f" FROM {TABLE} GROUP BY a"
        )
    if kind == "group_ordinal":
        return (
            f"SELECT {ae} AS p, CAST(sum(b) AS BIGINT) AS s"
            f" FROM {TABLE} GROUP BY 1"
        )
    if kind == "having_alias":
        k = draw(st.integers(1, 3))
        return (
            f"SELECT {ae} AS p, CAST(count(*) AS BIGINT) AS n"
            f" FROM {TABLE} GROUP BY 1 HAVING n >= {k}"
        )
    n = draw(st.integers(1, 12))
    return (
        f"SELECT b, {ae} AS x FROM {TABLE}"
        f" ORDER BY 2 {direction}, b LIMIT {n}"
    )


@given(q=resolution_query())
@settings(**SETTINGS)
def test_resolution_parity(spark, duck, q):
    """Name-resolution parity: alias-shadowing ORDER BY (alias wins),
    GROUP BY under a shadowing alias (base column wins), ordinals,
    and HAVING over select-list aliases evaluate identically — the
    resolution rules every hand-written oracle implicitly relies on."""
    s_rows, o_rows = _both(spark, duck, q)
    assert s_rows == o_rows, f"divergence for: {q}"
