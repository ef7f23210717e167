"""End-to-end golden parity: the BCB treasury-auction pipeline over the
reference's OWN captured CSV, compared against its golden parquet.

This is the reference's test_pipeline_leiloes (tests/bc/test_leiloes.py)
re-run on this engine: same 2025-08-19 Olinda CSV, same pinned PTAX,
full 34-column output — dates/ints/strings exact, floats within 1e-9
relative (duration/DV01 go through pow chains where Polars and the JVM
may differ in the last ulp; everything else lands bit-equal).

Skipped when the reference fixture directory is absent.
"""

import datetime as dt
from pathlib import Path

import numpy as np
import pytest

DATA_DIR = Path("/root/reference/tests/bc/data")

pytestmark = pytest.mark.skipif(
    not DATA_DIR.is_dir(), reason="reference fixture payloads not available"
)


def test_bc_leiloes_golden_parity(spark):
    import pandas as pd

    from pyield_spark.analytics.leiloes_bc import (
        CHAVES_ORDENACAO,
        ORDEM_COLUNAS_FINAL,
        processar_leiloes,
    )
    from pyield_spark.sources.readers import read_odata_csv

    raw = read_odata_csv(spark, str(DATA_DIR / "leiloes_20250819.csv"))
    # the PTAX the reference pinned when generating the golden
    ptax = spark.createDataFrame(
        [(dt.date(2025, 8, 19), 5.4716)], "data_ref DATE, ptax DOUBLE"
    )
    mine = processar_leiloes(raw, ptax).toPandas()
    gold = pd.read_parquet(DATA_DIR / "leiloes_20250819.parquet")

    assert list(mine.columns) == list(gold.columns) == ORDEM_COLUNAS_FINAL
    assert len(mine) == len(gold) > 0
    # canonical sort keys line up row-for-row
    for k in CHAVES_ORDENACAO:
        assert list(mine[k]) == list(gold[k]), k

    for c in gold.columns:
        g, m = gold[c], mine[c]
        if g.dtype.kind == "f":
            gv, mv = g.to_numpy(float), m.to_numpy(float)
            assert (np.isnan(gv) == np.isnan(mv)).all(), f"{c}: null layout"
            ok = np.isnan(gv) | np.isclose(gv, mv, rtol=1e-9, atol=1e-9)
            assert ok.all(), f"{c}: {gv[~ok]} vs {mv[~ok]}"
        else:
            assert (g.fillna("@") == m.fillna("@")).all() if g.dtype == object \
                else list(g) == list(m), c

    # spot-check the economically meaningful derived values exist
    assert mine.duration.notna().any()
    assert (mine.dv01_total.dropna() >= 0).all()
    assert mine.ptax.eq(5.4716).all()


TPF_DATA_DIR = Path("/root/reference/tests/tpf/data")


@pytest.mark.skipif(
    not TPF_DATA_DIR.is_dir(), reason="reference fixture payloads not available"
)
def test_tpf_leiloes_golden_parity(spark):
    """The reference's test_pipeline_leiloes_por_data rerun on this
    engine: its captured 2025-10-23 auctions-API payload + pinned PTAX
    reproduce its golden parquet across all 43 columns. This golden is
    what exposed (and now pins) the decimal-repr-aware truncation
    semantics of the reference's truncar."""
    import pandas as pd

    from pyield_spark.analytics.leiloes_tpf import (
        ORDEM_FINAL_COLUNAS,
        processar_leiloes_tpf,
        read_leiloes_json,
    )

    raw = read_leiloes_json(spark, str(TPF_DATA_DIR / "leilao_20251023.json"))
    ptax = spark.createDataFrame(
        [
            (dt.date(2025, 10, 22), 5.3898),
            (dt.date(2025, 10, 23), 5.384),
            (dt.date(2025, 10, 24), 5.3797),
        ],
        "data_ref DATE, ptax DOUBLE",
    )
    mine = processar_leiloes_tpf(raw, ptax).toPandas()
    gold = pd.read_parquet(TPF_DATA_DIR / "leilao_20251023.parquet")

    assert list(mine.columns) == list(gold.columns) == ORDEM_FINAL_COLUNAS
    assert len(mine) == len(gold) > 0
    for c in gold.columns:
        g, m = gold[c], mine[c]
        if g.dtype.kind == "f":
            gv, mv = g.to_numpy(float), m.to_numpy(float)
            assert (np.isnan(gv) == np.isnan(mv)).all(), f"{c}: null layout"
            ok = np.isnan(gv) | np.isclose(gv, mv, rtol=1e-9, atol=1e-9)
            assert ok.all(), f"{c}: {gv[~ok]} vs {mv[~ok]}"
        elif g.dtype == object:
            assert (g.fillna("@") == m.fillna("@")).all(), c
        else:
            assert list(g) == list(m), c


def test_null_quantidade_aceita_propagates(spark):
    """Polars null-predicate parity (round-6 review fix): a null
    quantidade_aceita_1v yields NULL financeiro_1v/2v, not 0.0 with the
    whole value attributed to the second round."""
    from pyield_spark.analytics.leiloes_bc import processar_leiloes

    raw = spark.createDataFrame(
        [
            {
                "id": "x1", "ofertante": "Tesouro Nacional",
                "dataMovimento": "2026-08-14 00:00:00",
                "dataLiquidacao": "2026-08-15 00:00:00",
                "edital": "77", "tipoPublico": "TODOS",
                "codigoTitulo": "100000",
                "dataVencimento": "2030-01-01 00:00:00",
                "tipoOferta": "Venda", "cotacaoMedia": "98,50",
                "cotacaoCorte": "98,40", "taxaMedia": "10,5",
                "taxaCorte": "10,6", "financeiro": "1,5",
                "quantidadeOfertada": "1000", "quantidadeAceita": None,
                "quantidadeLiquidada": "0",
                "quantidadeOfertadaSegundaRodada": "0",
                "quantidadeAceitaSegundaRodada": "0",
                "quantidadeLiquidadaSegundaRodada": "0",
            }
        ],
        schema=", ".join(
            f"{c} string" for c in (
                "id", "ofertante", "dataMovimento", "dataLiquidacao",
                "edital", "tipoPublico", "codigoTitulo", "dataVencimento",
                "tipoOferta", "cotacaoMedia", "cotacaoCorte", "taxaMedia",
                "taxaCorte", "financeiro", "quantidadeOfertada",
                "quantidadeAceita", "quantidadeLiquidada",
                "quantidadeOfertadaSegundaRodada",
                "quantidadeAceitaSegundaRodada",
                "quantidadeLiquidadaSegundaRodada",
            )
        ),
    )
    row = processar_leiloes(raw).collect()[0]
    assert row["financeiro_1v"] is None
    assert row["financeiro_2v"] is None


def test_unmapped_codigo_selic_raises(spark):
    """replace_strict parity (round-6 review fix): an unknown non-null
    instrument code fails loudly instead of publishing titulo-null rows
    with fabricated zero metrics."""
    import pytest as _pytest

    from pyield_spark.analytics.leiloes_bc import processar_leiloes

    raw = spark.createDataFrame(
        [
            {
                "id": "x2", "ofertante": "Tesouro Nacional",
                "dataMovimento": "2026-08-14 00:00:00",
                "dataLiquidacao": "2026-08-15 00:00:00",
                "edital": "78", "tipoPublico": "TODOS",
                "codigoTitulo": "999999",  # not in MAPA_TITULOS
                "dataVencimento": "2030-01-01 00:00:00",
                "tipoOferta": "Venda", "cotacaoMedia": "98,50",
                "cotacaoCorte": "98,40", "taxaMedia": "10,5",
                "taxaCorte": "10,6", "financeiro": "1,5",
                "quantidadeOfertada": "1000", "quantidadeAceita": "900",
                "quantidadeLiquidada": "900",
                "quantidadeOfertadaSegundaRodada": "0",
                "quantidadeAceitaSegundaRodada": "0",
                "quantidadeLiquidadaSegundaRodada": "0",
            }
        ]
    )
    with _pytest.raises(Exception, match="unmapped codigo_selic"):
        processar_leiloes(raw).collect()
