"""S6 intradia connector + benchmark-vigency pipeline tests.

Reference shapes: pyield/b3/derivativos_intradia.py (DerivativeQuotation
payload, dotted-path column map, optional columns) and
pyield/tpf/benchmark.py (registros payload, vigency selection).
"""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

PAYLOAD = {
    "Scty": [
        {
            "symb": "DI1J30",
            "desc": "DI DE 1 DIA",
            "asset": {
                "code": "DI1",
                "AsstSummry": {
                    "mtrtyCode": "2030-04-01",
                    "opnCtrcts": 64037,
                    "grssAmt": 5272867.79,
                    "tradQty": 36,
                    "traddCtrctsQty": 89,
                },
            },
            "mkt": {"cd": "FUT"},
            "SctyQtn": {
                "curPrc": 14.105,
                "opngPric": 14.22,
                "minPric": 14.02,
                "maxPric": 14.22,
                "avrgPric": 14.1013,
                "prvsDayAdjstmntPric": 14.127,
                "bottomLmtPric": 13.16,
                "topLmtPric": 15.385,
            },
            "buyOffer": {"price": 14.105},
            "sellOffer": {"price": 14.13},
        },
        {
            "symb": "DI1F27",
            "desc": "DI DE 1 DIA",
            "asset": {"code": "DI1", "AsstSummry": {"mtrtyCode": "not-a-date"}},
            "mkt": {"cd": "FUT"},
            "SctyQtn": {"curPrc": 13.0},
        },
        {
            "symb": "DI1OPT",
            "desc": "OPCAO",
            "asset": {"code": "DI1", "AsstSummry": {"mtrtyCode": "2027-01-04"}},
            "mkt": {"cd": "OPTEXER"},
            "SctyQtn": {"curPrc": 1.0},
        },
    ]
}


@pytest.fixture()
def snapshot_path(tmp_path):
    p = tmp_path / "di1.json"
    p.write_text(json.dumps(PAYLOAD))
    return str(p)


def test_read_derivativos_json_column_map(spark, snapshot_path):
    from pyield_spark.sources.intradia_json import read_derivativos_json

    df = read_derivativos_json(spark, snapshot_path)
    rows = {r["codigo_negociacao"]: r for r in df.collect()}
    assert set(rows) == {"DI1J30", "DI1F27", "DI1OPT"}
    r = rows["DI1J30"]
    assert r["codigo_ativo"] == "DI1"
    assert r["codigo_mercado"] == "FUT"
    assert r["data_vencimento"] == dt.date(2030, 4, 1)
    assert r["preco_ultimo"] == 14.105
    assert r["preco_ajuste_anterior"] == 14.127
    assert r["contratos_abertos"] == 64037
    assert r["volume_financeiro"] == 5272867.79
    assert r["preco_oferta_compra"] == 14.105
    assert r["preco_oferta_venda"] == 14.13
    # tolerant maturity parse: invalid string → null, row kept
    assert rows["DI1F27"]["data_vencimento"] is None
    # optional paths absent from the payload are omitted entirely
    assert "preco_exercicio" not in df.columns
    assert "tipo_lado" not in df.columns


def test_read_derivativos_json_unavailable(spark, tmp_path):
    from pyield_spark.sources.intradia_json import read_derivativos_json

    p = tmp_path / "empty.json"
    p.write_text(json.dumps({"msg": "Quotation not available"}))
    df = read_derivativos_json(spark, str(p))
    assert df.count() == 0
    assert "codigo_negociacao" in df.columns  # full canonical schema


def test_processar_intradia_di1(spark, snapshot_path):
    from pyield_spark.sources.intradia_json import (
        processar_intradia,
        read_derivativos_json,
    )

    raw = read_derivativos_json(spark, snapshot_path)
    out = processar_intradia(raw, "DI1", dt.date(2026, 8, 14))
    rows = out.collect()
    # OPTEXER row filtered (FUT slice); null-maturity row dropped
    assert [r["codigo_negociacao"] for r in rows] == ["DI1J30"]
    r = rows[0]
    assert r["data_referencia"] == dt.date(2026, 8, 14)
    assert r["dias_corridos"] == (dt.date(2030, 4, 1) - dt.date(2026, 8, 14)).days
    assert r["dias_uteis"] > 0
    # percent → decimal on the renamed rate columns
    assert abs(r["taxa_ultima"] - 0.14105) < 1e-12
    # DI1 price-from-rate: 100k discounted at taxa_ultima over du/252
    expected = round(100_000.0 / (1 + 0.14105) ** (r["dias_uteis"] / 252.0), 2)
    assert abs(r["preco_ultimo"] - expected) < 1e-9
    assert r["dv01"] > 0
    # single-point curve: forward == spot
    assert abs(r["taxa_forward"] - r["taxa_ultima"]) < 1e-9
    # preco_* fully renamed away for a rate contract
    assert not [c for c in out.columns if c.startswith("preco_") and c != "preco_ultimo"]


def test_benchmarks_json_roundtrip(spark, tmp_path):
    from pyield_spark.bonds.benchmark import (
        benchmarks_vigentes,
        parse_benchmarks,
        read_benchmarks_json,
    )

    payload = {
        "registros": [
            {
                "BENCHMARK": "LFT 6 anos",
                "VENCIMENTO": "2032-03-01",
                "TÍTULO": "LFT",
                "INÍCIO": "2026-01-01",
                "TERMINO": "2026-03-31",
            },
            {
                "BENCHMARK": "LTN 6 meses",
                "VENCIMENTO": "2026-10-01",
                "TÍTULO": " LTN ",
                "INÍCIO": "2026-07-01",
                "TERMINO": "2026-09-30",
            },
            {
                "BENCHMARK": "broken",
                "VENCIMENTO": "n/d",
                "TÍTULO": "LTN",
                "INÍCIO": "2026-07-01",
                "TERMINO": "2026-09-30",
            },
        ]
    }
    p = tmp_path / "benchmarks.json"
    p.write_text(json.dumps(payload))
    parsed = parse_benchmarks(read_benchmarks_json(spark, str(p)))
    # drop-nulls removed the malformed row; strip normalized the title
    assert parsed.count() == 2
    vig = benchmarks_vigentes(parsed, hoje=dt.date(2026, 8, 14)).collect()
    assert [r["benchmark"] for r in vig] == ["LTN 6 meses"]
    assert vig[0]["titulo"] == "LTN"
    # historic mode keeps everything, sorted by vigency start
    hist = benchmarks_vigentes(
        parsed, hoje=dt.date(2026, 8, 14), incluir_historico=True
    ).collect()
    assert [r["data_inicio"] for r in hist] == [
        dt.date(2026, 1, 1),
        dt.date(2026, 7, 1),
    ]
    # titulo filter is exact + upper-cased
    lft = benchmarks_vigentes(
        parsed, hoje=dt.date(2026, 2, 1), titulo="lft"
    ).collect()
    assert [r["titulo"] for r in lft] == ["LFT"]


def test_intradia_stream_replay_equals_batch(spark, tmp_path):
    """§2.10 ∘ S6: a directory of poll snapshots driven through the
    streaming source + foreachBatch enrichment equals the batch flow
    over the same payloads (enrichment is per-snapshot, so micro-batch
    boundaries cannot change the result)."""
    import copy

    from pyield_spark.sources.intradia_json import (
        processar_intradia,
        read_derivativos_json,
    )
    from pyield_spark.streaming.intradia import intradia_stream_enrich

    snap_dir = tmp_path / "snaps"
    snap_dir.mkdir()
    p2 = copy.deepcopy(PAYLOAD)
    p2["Scty"][0]["SctyQtn"]["curPrc"] = 14.2  # the rate moved between polls
    (snap_dir / "t0.json").write_text(json.dumps(PAYLOAD))
    (snap_dir / "t1.json").write_text(json.dumps(p2))

    hoje = dt.date(2026, 8, 14)
    sink = str(tmp_path / "sink")
    out = intradia_stream_enrich(spark, str(snap_dir), sink, "DI1", hoje)
    import os as _os

    rows = {_os.path.basename(r["snapshot_file"]): r for r in out.collect()}
    # one enriched DI1J30 row per snapshot, each reflecting its own quote
    # (the tag is the full path — basename only for the assert)
    assert set(rows) == {"t0.json", "t1.json"}
    assert abs(rows["t0.json"]["taxa_ultima"] - 0.14105) < 1e-12
    assert abs(rows["t1.json"]["taxa_ultima"] - 0.142) < 1e-12

    # batch twin over one payload matches the stream's rows for it
    batch = processar_intradia(
        read_derivativos_json(spark, str(snap_dir / "t0.json")), "DI1", hoje
    ).collect()
    assert len(batch) == 1
    b, s = batch[0], rows["t0.json"]
    for c in ("dias_uteis", "dias_corridos", "taxa_ultima", "preco_ultimo",
              "dv01", "taxa_forward"):
        assert b[c] == s[c], c


def test_intradia_stream_checkpoint_scoped_per_filter(spark, tmp_path):
    """Reusing one sink_dir with a DIFFERENT (contrato, data) must still
    enrich already-seen snapshots: source-file checkpoints are
    filter-independent, so before the round-7 scoping a second call
    with a new filter silently skipped every checkpointed file and
    returned only the old filter's rows (ADVICE r6)."""
    from pyield_spark.streaming.intradia import intradia_stream_enrich

    snap_dir = tmp_path / "snaps"
    snap_dir.mkdir()
    sink = str(tmp_path / "sink")
    (snap_dir / "t0.json").write_text(json.dumps(PAYLOAD))

    first = intradia_stream_enrich(
        spark, str(snap_dir), sink, "DI1", dt.date(2026, 8, 14)
    )
    assert first.count() == 1

    # same sink, new reference date: t0.json must be re-enriched under
    # the new filter (its own checkpoint scope), not skipped
    out = intradia_stream_enrich(
        spark, str(snap_dir), sink, "DI1", dt.date(2026, 8, 13)
    )
    assert out.count() == 2
    assert sorted(r["dias_uteis"] for r in out.collect()) != [0, 0]


def test_processar_intradia_price_quoted_contract(spark, tmp_path):
    """Price-quoted contracts (DOL/WIN family): NO preco->taxa rename,
    no percent conversion, no DV01/forward — preco_* columns pass
    through (pyield/futuro/intradia.py:144-172 non-rate branch)."""
    import copy

    from pyield_spark.sources.intradia_json import (
        processar_intradia,
        read_derivativos_json,
    )

    p = copy.deepcopy(PAYLOAD)
    p["Scty"] = [p["Scty"][0]]
    p["Scty"][0]["symb"] = "DOLF27"
    p["Scty"][0]["asset"]["code"] = "DOL"
    p["Scty"][0]["SctyQtn"]["curPrc"] = 5123.5
    f = tmp_path / "dol.json"
    f.write_text(json.dumps(p))

    out = processar_intradia(
        read_derivativos_json(spark, str(f)), "DOL", dt.date(2026, 8, 14)
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["preco_ultimo"] == 5123.5  # untouched price
    for absent in ("taxa_ultima", "dv01", "taxa_forward"):
        assert absent not in out.columns, absent
    assert r["dias_uteis"] > 0 and r["dias_corridos"] > 0


def test_url_canonicalization_idempotent(spark):
    """Canonicalizing an already-canonical URL is a no-op — the dedup
    key is stable under re-ingestion of cleaned corpora. Exercises the
    PRODUCT helper (operators.text.canonical_url_expr), the same
    expression q_url_dedup builds on."""
    from pyield_spark.operators.text import canonical_url_expr

    raw = [
        "HTTPS://WWW.SrcA.Example.COM/Docs/3/?utm_source=feed&ref=1&utm_campaign=x#sec2",
        "https://srcb.example.com/Docs/5/?ref=2",
        "http://Host.Org/Path?utm_medium=m",
        # boundary regressions (ADVICE r4): params merely CONTAINING
        # 'utm_' are not tracking params and must survive intact
        "http://h.org/p?my_utm_source=x&a=1",
        "http://h.org/p?xutm_a=1",
        # consecutive utm params collapse fully, no dangling '&'
        "http://h.org/p?utm_a=1&utm_b=2&x=1",
        "http://h.org/p?x=1&utm_a=2&utm_b=3",
        # pathless URL: host stops at '?' — the query string keeps its
        # case (review fix: '[^/]*' used to swallow and lower-case it)
        "http://Example.com?ID=AbC",
        "http://WWW.Example.com#Frag",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "u STRING")
    once = df.select(canonical_url_expr("u").alias("u"))
    twice = once.select(canonical_url_expr("u").alias("u"))
    assert [r["u"] for r in once.collect()] == [r["u"] for r in twice.collect()]
    got = [r["u"] for r in once.collect()]
    assert got[0] == "https://srca.example.com/Docs/3/?ref=1"
    assert got[2] == "http://host.org/Path"
    assert got[3] == "http://h.org/p?my_utm_source=x&a=1"
    assert got[4] == "http://h.org/p?xutm_a=1"
    assert got[5] == "http://h.org/p?x=1"
    assert got[6] == "http://h.org/p?x=1"
    assert got[7] == "http://example.com?ID=AbC"
    assert got[8] == "http://example.com"


def test_multi_snapshot_directory_per_snapshot_forwards(spark, tmp_path):
    """A directory of polls read in ONE batch scan keeps per-snapshot
    identity: duplicate maturities across snapshots must NOT collide
    into the dup-vertex null cascade — each snapshot is its own forward
    curve."""
    import copy

    from pyield_spark.sources.intradia_json import (
        processar_intradia,
        read_derivativos_json,
    )

    d = tmp_path / "snaps"
    d.mkdir()
    p2 = copy.deepcopy(PAYLOAD)
    p2["Scty"][0]["SctyQtn"]["curPrc"] = 14.2
    (d / "t0.json").write_text(json.dumps(PAYLOAD))
    (d / "t1.json").write_text(json.dumps(p2))

    raw = read_derivativos_json(spark, str(d))
    assert "snapshot_file" in raw.columns
    out = processar_intradia(raw, "DI1", dt.date(2026, 8, 14))
    import os as _os

    rows = {_os.path.basename(r["snapshot_file"]): r for r in out.collect()}
    assert set(rows) == {"t0.json", "t1.json"}
    # same maturity in both snapshots, yet each keeps a non-null forward
    # (single-point curve per snapshot: forward == its own spot)
    assert abs(rows["t0.json"]["taxa_forward"] - 0.14105) < 1e-9
    assert abs(rows["t1.json"]["taxa_forward"] - 0.142) < 1e-9


def test_read_derivativos_schema_drift_required_nulls(spark, tmp_path):
    """A drifted payload (mapped paths missing) still yields the
    required column head as typed nulls instead of an unresolved-column
    failure downstream."""
    from pyield_spark.sources.intradia_json import (
        processar_intradia,
        read_derivativos_json,
    )

    f = tmp_path / "drift.json"
    f.write_text(json.dumps({"Scty": [{"foo": 1}]}))
    df = read_derivativos_json(spark, str(f))
    for c in ("codigo_negociacao", "codigo_mercado", "data_vencimento"):
        assert c in df.columns, c
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["codigo_mercado"] is None
    # and the enrichment degrades to empty, not AnalysisException —
    # including the DI1/DAP rate branch that dereferences taxa_ultima
    assert processar_intradia(df, "DOL", dt.date(2026, 8, 14)).count() == 0
    assert processar_intradia(df, "DI1", dt.date(2026, 8, 14)).count() == 0


def test_intradia_stream_empty_dir(spark, tmp_path):
    """Quotation-unavailable payloads produce an EMPTY canonical frame
    from the stream flow, not a sink read error."""
    from pyield_spark.streaming.intradia import intradia_stream_enrich

    d = tmp_path / "empty_snaps"
    d.mkdir()
    (d / "t0.json").write_text(json.dumps({"msg": "Quotation not available"}))
    out = intradia_stream_enrich(
        spark, str(d), str(tmp_path / "sink"), "DI1", dt.date(2026, 8, 14)
    )
    assert out.count() == 0
    assert "codigo_negociacao" in out.columns


def test_intradia_stream_precreated_empty_sink(spark, tmp_path):
    """Regression (ADVICE r4): a PRE-CREATED empty sink_dir (the
    tempfile.mkdtemp pattern) must also take the canonical-empty-frame
    fallback — the gate is 'no parquet files', not 'dir missing'."""
    from pyield_spark.streaming.intradia import intradia_stream_enrich

    d = tmp_path / "empty_snaps2"
    d.mkdir()
    (d / "t0.json").write_text(json.dumps({"msg": "Quotation not available"}))
    sink = tmp_path / "pre_sink"
    sink.mkdir()  # exists but holds no parquet
    out = intradia_stream_enrich(
        spark, str(d), str(sink), "DI1", dt.date(2026, 8, 14)
    )
    assert out.count() == 0
    assert "codigo_negociacao" in out.columns


def test_ascii_payload_null_text_passes(spark):
    """NULL text packs to NULL payload (assert passes), matching the
    oracle guard's NULL-through CASE."""
    from pyield_spark.operators import multimodal as mm

    df = spark.createDataFrame([(None,), ("ok",)], "text STRING").select(
        mm.ascii_payload_expr("text").alias("p")
    )
    vals = [r["p"] for r in df.collect()]
    assert vals == [None, b"ok"]


# === property tests =======================================================

from hypothesis import given, settings, strategies as st  # noqa: E402

_dates = st.dates(min_value=dt.date(2020, 1, 1), max_value=dt.date(2030, 12, 31))
_titles = st.sampled_from(["LTN", "LFT", "NTN-B", "NTN-F"])


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(_titles, _dates, _dates, _dates), min_size=1, max_size=12
    ),
    _dates,
)
def test_benchmarks_vigentes_matches_python_model(spark, recs, hoje):
    """benchmarks_vigentes == the obvious per-row Python filter for ANY
    set of (titulo, vencimento, inicio, fim) windows and any reference
    date (pyield/tpf/benchmark.py:118 semantics: inclusive BETWEEN)."""
    from pyield_spark.bonds.benchmark import benchmarks_vigentes

    rows = [
        (t, ven, f"{t} bench", ini, fim) for t, ven, ini, fim in recs
    ]
    df = spark.createDataFrame(
        rows,
        "titulo STRING, data_vencimento DATE, benchmark STRING,"
        " data_inicio DATE, data_fim DATE",
    )
    got = sorted(
        (r["titulo"], r["data_vencimento"], r["data_inicio"])
        for r in benchmarks_vigentes(df, hoje).collect()
    )
    want = sorted(
        (t, ven, ini)
        for t, ven, ini, fim in recs
        if ini <= hoje <= fim
    )
    assert got == want


def test_multi_snapshot_same_basename_across_dirs(spark, tmp_path):
    """Date-partitioned poll layouts re-use file NAMES across dirs
    (days/*/snap.json) — the snapshot tag must be the full path so the
    per-snapshot forward curves don't collide into the dup-vertex null
    cascade."""
    import copy
    import os

    from pyield_spark.sources.intradia_json import (
        processar_intradia,
        read_derivativos_json,
    )

    for d, prc in (("d1", 14.105), ("d2", 14.2)):
        sub = tmp_path / d
        sub.mkdir()
        p = copy.deepcopy(PAYLOAD)
        p["Scty"][0]["SctyQtn"]["curPrc"] = prc
        (sub / "snap.json").write_text(json.dumps(p))

    raw = read_derivativos_json(spark, str(tmp_path / "*" / "snap.json"))
    out = processar_intradia(raw, "DI1", dt.date(2026, 8, 14)).collect()
    assert len(out) == 2
    # both snapshots keep a NON-NULL forward (each is its own curve)
    fwd = sorted(round(r["taxa_forward"], 6) for r in out)
    assert fwd == [0.14105, 0.142]
    assert len({r["snapshot_file"] for r in out}) == 2
    assert all(os.path.basename(r["snapshot_file"]) == "snap.json" for r in out)


def test_intradia_stream_pretty_printed_snapshot(spark, tmp_path):
    """A pretty-printed (multi-line) payload — the format the batch
    reader explicitly handles via multiLine — must enrich in the
    streaming twin too, not silently parse to null Scty and vanish
    (round-6 review fix: the stream source was missing the option)."""
    from pyield_spark.streaming.intradia import intradia_stream_enrich

    snap_dir = tmp_path / "snaps"
    snap_dir.mkdir()
    (snap_dir / "pretty.json").write_text(json.dumps(PAYLOAD, indent=2))
    out = intradia_stream_enrich(
        spark, str(snap_dir), str(tmp_path / "sink"), "DI1",
        dt.date(2026, 8, 14),
    )
    rows = out.collect()
    assert len(rows) == 1
    assert abs(rows[0]["taxa_ultima"] - 0.14105) < 1e-12


def test_intradia_stream_incremental_recall_no_duplicates(spark, tmp_path):
    """The poll-loop cadence: calling intradia_stream_enrich again with
    the same snapshot/sink dirs after a new file lands must enrich ONLY
    the new snapshot (checkpoint inside the sink) — before round 6 every
    recall replayed all files and appended duplicates."""
    import copy
    import os as _os

    from pyield_spark.streaming.intradia import intradia_stream_enrich

    snap_dir = tmp_path / "snaps"
    snap_dir.mkdir()
    sink = str(tmp_path / "sink")
    hoje = dt.date(2026, 8, 14)
    (snap_dir / "t0.json").write_text(json.dumps(PAYLOAD))
    first = intradia_stream_enrich(spark, str(snap_dir), sink, "DI1", hoje)
    assert first.count() == 1

    p2 = copy.deepcopy(PAYLOAD)
    p2["Scty"][0]["SctyQtn"]["curPrc"] = 14.2
    (snap_dir / "t1.json").write_text(json.dumps(p2))
    out = intradia_stream_enrich(spark, str(snap_dir), sink, "DI1", hoje)
    rows = {_os.path.basename(r["snapshot_file"]): r for r in out.collect()}
    assert set(rows) == {"t0.json", "t1.json"}  # no duplicate t0 rows
    assert out.count() == 2
