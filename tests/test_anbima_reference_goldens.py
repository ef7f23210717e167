"""ANBIMA golden parity on the reference's own captured fixtures:

- S3 taxas: the real 2026-02-06 '@'-CSV download (latin1, BOM, bare-CR
  meta line) through ``read_anbima_csv_bronze`` + ``anbima_silver``
  must equal the reference's golden parquet across the FULL 15-column
  surface (pyield/anbima/taxas.py:149-166; tests/tpf/test_taxas.py).
- S11 IMA-Q estoque: the real 2026-02-04 HTML page through
  ``read_html_tables`` + ``imaq_estoque_silver`` must equal the golden
  stock parquet (pyield/anbima/imaq.py:103-126; tests/tpf/test_estoque.py).

Skipped wholesale when the fixture directory isn't present.
"""

import datetime as dt
from pathlib import Path

import numpy as np
import pytest

DATA_DIR = Path("/root/reference/tests/tpf/data")

pytestmark = pytest.mark.skipif(
    not DATA_DIR.is_dir(), reason="reference fixture payloads not available"
)


def _assert_frames_equal(mine, gold, sort_keys, float_rtol=1e-12):
    import pandas as pd

    assert list(mine.columns) == list(gold.columns)
    assert len(mine) == len(gold) > 0
    ms = mine.sort_values(sort_keys).reset_index(drop=True)
    gs = gold.sort_values(sort_keys).reset_index(drop=True)
    for c in gs.columns:
        g, m = gs[c], ms[c]
        if g.dtype.kind == "f":
            gv, mv = g.to_numpy(float), m.to_numpy(float)
            assert (np.isnan(gv) == np.isnan(mv)).all(), f"{c}: null layout"
            ok = np.isnan(gv) | np.isclose(gv, mv, rtol=float_rtol, atol=0)
            assert ok.all(), f"{c}: {gv[~ok][:3]} vs {mv[~ok][:3]}"
        elif g.dtype == object:
            assert (g.fillna("@") == m.fillna("@")).all(), c
        else:
            assert list(g) == list(m), c


def test_anbima_taxas_golden_parity(spark):
    import pandas as pd

    from pyield_spark.sources.readers import anbima_silver, read_anbima_csv_bronze

    bronze = read_anbima_csv_bronze(spark, str(DATA_DIR / "tpf_20260206.txt"))
    mine = anbima_silver(bronze).toPandas()
    gold = pd.read_parquet(DATA_DIR / "tpf_20260206.parquet")
    _assert_frames_equal(
        mine, gold, ["titulo", "data_vencimento", "data_base"]
    )


def test_imaq_estoque_golden_parity(spark):
    import pandas as pd

    from pyield_spark.sources.html_table import imaq_estoque_silver, read_html_tables

    tables = read_html_tables(
        spark, str(DATA_DIR / "imaq_20260204.html"), encoding="iso-8859-1"
    )
    mine = imaq_estoque_silver(tables, dt.date(2026, 2, 4)).toPandas()
    gold = pd.read_parquet(DATA_DIR / "imaq_20260204.parquet")
    _assert_frames_equal(mine, gold, ["titulo", "data_vencimento"])
