"""Adversarial-input fuzz lap for the parse layer (round 7, VERDICT r6
stretch ask #7): hypothesis throws random malformed cells — mixed
scripts, BR numbers with multiple separators, dates in all the
reference formats plus garbage — at every parse expression and at the
S14 silver connector, asserting the full null-on-malformed contract:

1. never crash, under BOTH ANSI modes;
2. output schema is stable (same dtype regardless of input content);
3. ANSI-on and ANSI-off produce IDENTICAL results cell-for-cell — the
   round-6 try_cast contract is mode-independence, not just survival.

One batched Spark job per hypothesis example keeps the lap fast
(max_examples bounded, deadline off — JVM latency is not a property
failure)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pyield_spark.functions.dates import converter_datas_expr
from pyield_spark.functions.numbers import (
    br_int_expr,
    br_num_expr,
    inteiro_br_expr,
    inteiro_m_expr,
    pct_para_decimal_expr,
)

# --- cell strategies -------------------------------------------------------

_digits = st.text(alphabet="0123456789", min_size=0, max_size=8)

# BR-ish numbers with a RANDOM number of separators in random places —
# covers the well-formed grid and the '1.2.3,4,5' malformed family
_br_numberish = st.lists(
    st.one_of(_digits, st.sampled_from([",", ".", "-", " "])),
    min_size=1,
    max_size=6,
).map("".join)

_date_fmt = st.sampled_from(
    ["{d:02d}/{m:02d}/{y:04d}", "{d:02d}-{m:02d}-{y:04d}",
     "{y:04d}-{m:02d}-{d:02d}", "{d:02d}/{m:02d}/{y2:02d}"]
)
# day/month deliberately range past validity (32, 13) and year past the
# calendar; sometimes garbage is appended
_dateish = st.builds(
    lambda fmt, d, m, y, suffix: fmt.format(d=d, m=m, y=y, y2=y % 100) + suffix,
    _date_fmt,
    st.integers(0, 32),
    st.integers(0, 13),
    st.integers(1800, 2200),
    st.sampled_from(["", " 10:30", "x", " "]),
)

# arbitrary text including non-Latin scripts and controls (the "mixed
# encodings" class: any byte soup a latin-1/utf-8 confusion can yield
# IS some unicode string by the time it reaches a Column)
_weird = st.text(min_size=0, max_size=12)

_cell = st.one_of(_br_numberish, _dateish, _weird,
                  st.sampled_from(["", "-", "N/D", "código título", "1.234,56"]))

_EXPRS = [
    ("br_num", br_num_expr, ("double",)),
    ("br_int", br_int_expr, ("bigint", "int")),
    ("inteiro_br", inteiro_br_expr, ("bigint", "int")),
    ("inteiro_m", inteiro_m_expr, ("bigint", "int")),
    ("pct", pct_para_decimal_expr, ("double",)),
    ("datas", converter_datas_expr, ("date",)),
]


@pytest.fixture(scope="module")
def both_modes(spark):
    """(ansi_on, ansi_off) session pair over one SparkContext."""
    on = spark.newSession()
    on.conf.set("spark.sql.ansi.enabled", "true")
    off = spark.newSession()
    off.conf.set("spark.sql.ansi.enabled", "false")
    return on, off


@settings(max_examples=8, deadline=None)
@given(st.lists(_cell, min_size=1, max_size=40))
def test_parse_exprs_never_crash_and_are_ansi_independent(both_modes, cells):
    on, off = both_modes
    rows = [(c,) for c in cells]
    for name, fn, dtypes in _EXPRS:
        out = {}
        for label, sess in (("on", on), ("off", off)):
            df = sess.createDataFrame(rows, "raw string").select(
                fn(F.col("raw")).alias("v")
            )
            # schema stability: the output dtype is input-independent
            assert df.dtypes[0][1] in dtypes, (name, df.dtypes)
            out[label] = [r["v"] for r in df.collect()]  # no crash
        assert out["on"] == out["off"], (
            f"{name}: ANSI mode changed results on {cells!r}"
        )


_line_cell = st.one_of(_cell, st.just(""))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(_line_cell, min_size=0, max_size=20).map(";".join),
        min_size=0,
        max_size=15,
    )
)
def test_mensal_silver_fuzz_lines_both_modes(both_modes, lines):
    """The S14 silver connector over arbitrary garbage lines: no crash,
    stable 20-column schema, identical frames under both ANSI modes.
    A real header line is prepended so some garbage rows parse as data
    (the interesting path); the rest must null out, not throw."""
    from pyield_spark.sources.mensal import _HEADER_FIRST_FIELD, mensal_silver_from_lines

    header = (
        _HEADER_FIRST_FIELD
        + ";SIGLA;CODIGO;CODIGO ISIN;EMISSAO;VENCIMENTO;NUM DE OPER;"
        "QUANT NEGOCIADA;VALOR NEGOCIADO;PU MIN;PU MED;PU MAX;PU LASTRO;"
        "VALOR PAR;TAXA MIN;TAXA MED;TAXA MAX;NUM OPER COM CORRETAGEM;"
        "QUANT NEG COM CORRETAGEM"
    )
    on, off = both_modes
    all_lines = [header, *lines]
    rows = [("fuzz.zip", "m1", i, ln) for i, ln in enumerate(all_lines)]
    schema = "source_file string, member_name string, line_idx long, line string"
    results = {}
    for label, sess in (("on", on), ("off", off)):
        df = mensal_silver_from_lines(sess.createDataFrame(rows, schema))
        results[label] = (
            df.dtypes,
            sorted(map(str, df.collect())),
        )
    assert results["on"][0] == results["off"][0]
    assert results["on"][1] == results["off"][1], (
        f"ANSI mode changed silver rows on {lines!r}"
    )
