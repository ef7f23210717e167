"""Reference-shaped public namespace — the "switch" surface.

A user of the reference toolkit (crdcj/PYield) imports ``pyield as yd``
and reaches ``yd.forwards_expr``, ``yd.interpolar``, ``yd.du.contar``,
``yd.ltn.pu``, ``yd.ntnb.taxas_zero``, … This module exposes the same
names (the reference's ``__init__.__all__``,
/root/reference/pyield/__init__.py:25-50) bound to the Spark-first
implementations, so the migration is::

    import pyield_spark.api as yd

Shape changes are the documented ones (MIGRATION.md): scalar
convenience functions keep their scalar signatures (parity-tested twins
in :mod:`pyield_spark.scalar`); panel operations take/return DataFrames
or Columns. HTTP fetch wrappers (``ptax``/``di_over``/``*.dados``) map
to the local readers + expressions that keep the parse/transform
semantics — transport is out of scope by design (see MIGRATION.md).
"""

from __future__ import annotations

from types import SimpleNamespace

from pyield_spark import du  # noqa: F401  — same module name as the reference
from pyield_spark import scalar
from pyield_spark.bonds import bootstrap as _bootstrap
from pyield_spark.bonds import cashflows as _cashflows
from pyield_spark.bonds import pricing as _pricing
from pyield_spark.bonds import vna as _vna
from pyield_spark.curves.forwards import forwards_expr
from pyield_spark.curves.interpolate import interpolar  # noqa: F401
from pyield_spark.relogio import agora, agora_expr, hoje, hoje_expr  # noqa: F401
from pyield_spark.sources.readers import read_sgs_json as ptax_serie  # noqa: F401

# forward/forwards: the reference's pair (scalar / series) collapses to
# one Column combinator — apply it in a select over a 2-row frame for
# the scalar case (MIGRATION.md top-level table).
forward = forwards = forwards_expr


class Interpolador:
    """Callable single-curve interpolator (reference
    pyield/interpolador.py): construct with the vertices, call with a
    business-day count. Scalar shape — the distributed path is
    :func:`interpolar` (multi-curve, one window shuffle)."""

    def __init__(
        self,
        dias_uteis: list[int],
        taxas: list[float],
        metodo: str = "flat_forward",
        extrapolar: bool = False,
    ) -> None:
        if metodo not in ("flat_forward", "linear"):
            raise ValueError(f"unknown metodo {metodo!r}")
        self._metodo = metodo
        # reference cleaning (interpolador.py:62-80): drop null/NaN
        # vertices, dedupe duplicate du keep='last' (later input wins)
        import math as _math

        clean: dict[int, float] = {}
        for d, t in zip(dias_uteis, taxas):
            if d is None or t is None:
                continue
            t = float(t)
            if _math.isnan(t):
                continue
            clean[int(d)] = t
        self._verts = sorted(clean.items())
        self._extrapolar = extrapolar

    def __call__(self, du_alvo: int) -> float:
        # reference: negative du -> NaN (interpolador.py:252-253)
        if du_alvo is not None and du_alvo < 0:
            return float("nan")
        out = scalar.interpolar_taxa(
            self._verts,
            du_alvo,
            method=self._metodo,
            extrapolar=self._extrapolar,
        )
        # the reference class returns NaN (not None) outside the curve
        return float("nan") if out is None else out


# --- bond-family namespaces (reference: pyield.tpf.titulos.*) -----------
# expr members are Column combinators; df members take/return DataFrames;
# bare names mirror the reference's scalar signatures.

ltn = SimpleNamespace(
    pu=scalar.ltn_pu,
    taxa=scalar.ltn_taxa,
    pu_expr=_pricing.ltn_pu_expr,
    taxa_expr=_pricing.ltn_taxa_expr,
    dv01_expr=_pricing.dv01_expr,
)

ntnf = SimpleNamespace(
    pu=scalar.ntnf_pu,
    price=_pricing.price_coupon_bond,
    datas_pagamento=_cashflows.explode_payment_dates,
    taxa=_bootstrap.implied_rates,
    premio_limpo=_bootstrap.premio_limpo,
    rentabilidade_expr=_pricing.rentabilidade_expr,
    premio_expr=_pricing.premio_bps_expr,
    taxas_zero=_bootstrap.ntnb_taxas_zero,  # hybrid path, MIGRATION.md
)

ntnb = SimpleNamespace(
    cotacao=scalar.ntnb_cotacao,
    cotacao_df=_pricing.ntnb_cotacao,
    pu=scalar.pu_from_vna,
    pu_expr=_pricing.pu_from_vna_expr,
    vna_projetado=scalar.vna_projetado,
    vna_projetado_expr=_vna.vna_projetado_expr,
    taxas_zero=_bootstrap.ntnb_taxas_zero,
    taxas_zero_scalar=scalar.ntnb_taxas_zero,
)

ntnb1 = SimpleNamespace(
    fluxos_caixa=_cashflows.amortization_flows,
)

ntnbp = SimpleNamespace(
    cotacao=scalar.ntnbp_cotacao,
    pu=scalar.ntnbp_pu,
    dv01=scalar.ntnbp_dv01,
    cotacao_expr=_pricing.ntnbp_cotacao_expr,
    dv01_expr=_pricing.ntnbp_dv01_expr,
)

ntnc = SimpleNamespace(
    cotacao_df=_pricing.ntnc_cotacao,
    coupon_expr=_pricing.ntnc_coupon_expr,
)

lft = SimpleNamespace(
    cotacao=scalar.lft_cotacao,
    taxa=scalar.lft_taxa,
    cotacao_expr=_pricing.lft_cotacao_expr,
    taxas=_bootstrap.lft_taxas,
    rentabilidade_expr=_pricing.rentabilidade_expr,
)

__all__ = [
    "agora",
    "agora_expr",
    "du",
    "forward",
    "forwards",
    "forwards_expr",
    "hoje",
    "hoje_expr",
    "Interpolador",
    "interpolar",
    "lft",
    "ltn",
    "ntnb",
    "ntnb1",
    "ntnbp",
    "ntnc",
    "ntnf",
    "ptax_serie",
]
