"""Scalar convenience API (§1.1 scalar duality).

The reference's public functions accept scalars or arrays and return
matching shapes (overloads in pyield/du/core.py:89-98,287-316). On
Spark, array workloads are DataFrame operations; these scalar twins run
DRIVER-SIDE on the same generated calendar and the same truncation
rules — no Spark session needed, mirroring PYield's scalar fast path.

Parity between these and the DataFrame operators is asserted in
tests/test_scalar_parity.py (the reference's own test pattern:
tests/tpf/test_expr_titulos.py).
"""

from __future__ import annotations

import datetime as dt
import math

from pyield_spark import du as du_mod

VALOR_FACE = 1000.0
NTNF_CUPOM = 48.80885
NTNB_CUPOM = 0.02956301


def truncar(x: float, decimals: int) -> float:
    """Decimal-repr-aware truncation toward zero (reference
    pyield/_internal/numbers.py semantics — see truncar_expr)."""
    if isinstance(x, float) and not math.isfinite(x):
        return x  # NaN/±inf pass through, like the Spark twin
    s = 10**decimals
    a = abs(x)
    y = a * s
    k = round(y)  # rint; the equality below disambiguates
    t = k if (k / s) == a else math.floor(y)
    return math.copysign(t, x) / s


def _add_months(d: dt.date, months: int) -> dt.date:
    """Spark add_months semantics: day clamps to the target month's end."""
    import calendar as _cal

    m = d.month + months
    y = d.year + (m - 1) // 12
    m = (m - 1) % 12 + 1
    return dt.date(y, m, min(d.day, _cal.monthrange(y, m)[1]))


def _payment_dates(liq: dt.date, ven: dt.date, interval_months: int = 6) -> list[dt.date]:
    # each date derives from VEN directly (add_months(ven, -i*interval)),
    # exactly like the vector path in bonds/cashflows.py — an iterative
    # month walk would drift after a month-end clamp (Aug 31 → Feb 28 →
    # Aug 28), breaking scalar/vector parity for day-29-31 maturities
    out = []
    i = 0
    while True:
        d = _add_months(ven, -i * interval_months)
        if d <= liq:
            break
        out.append(d)
        i += 1
    return sorted(out)


def ltn_pu(data_liquidacao: dt.date, data_vencimento: dt.date, taxa: float) -> float:
    """STN LTN price (pyield/tpf/titulos/ltn.py:137-156)."""
    du = du_mod.contar_scalar(data_liquidacao, data_vencimento)
    if du is None:
        return float("nan")
    au = truncar(du / 252.0, 14)
    return truncar(VALOR_FACE / (1 + truncar(taxa, 8)) ** au, 6)


def ltn_taxa(data_liquidacao: dt.date, data_vencimento: dt.date, pu: float) -> float:
    du = du_mod.contar_scalar(data_liquidacao, data_vencimento)
    if du is None or du == 0 or pu <= 0:
        # du == 0 (pricing on the maturity itself) has no implied rate
        return float("nan")
    au = truncar(du / 252.0, 14)
    return truncar((VALOR_FACE / pu) ** (1 / au) - 1, 8)


def ntnf_pu(data_liquidacao: dt.date, data_vencimento: dt.date, taxa: float) -> float:
    """STN NTN-F price (ntnf.py:283-301): PV bround9 per flow, trunc6."""
    taxa = truncar(taxa, 8)
    total = 0.0
    dates = _payment_dates(data_liquidacao, data_vencimento)
    if not dates:
        return float("nan")
    for d in dates:
        du = du_mod.contar_scalar(data_liquidacao, d)
        if du is None:  # flow beyond the generated calendar
            return float("nan")
        au = truncar(du / 252.0, 14)
        cf = VALOR_FACE + NTNF_CUPOM if d == data_vencimento else NTNF_CUPOM
        # bround9 (half-to-even) on the discounted flow
        vp = cf / (1 + taxa) ** au
        total += _bround(vp, 9)
    return truncar(total, 6)


def ntnb_cotacao(data_liquidacao: dt.date, data_vencimento: dt.date, taxa: float) -> float:
    """STN NTN-B quote factor (ntnb.py:255-316): PV bround12, trunc6."""
    taxa = truncar(taxa, 8)
    dates = _payment_dates(data_liquidacao, data_vencimento)
    if not dates:
        return float("nan")
    total = 0.0
    for d in dates:
        du = du_mod.contar_scalar(data_liquidacao, d)
        if du is None:  # flow beyond the generated calendar
            return float("nan")
        au = truncar(du / 252.0, 14)
        cf = 1.0 + NTNB_CUPOM if d == data_vencimento else NTNB_CUPOM
        total += _bround(cf / (1 + taxa) ** au, 12)
    return truncar(total, 6)


def ntnbp_cotacao(data_liquidacao: dt.date, data_vencimento: dt.date, taxa: float) -> float:
    """NTN-B Principal quote (pyield/tpf/titulos/ntnbp.py:14-40):
    trunc6((1+taxa)^-trunc14(du/252)) — no trunc8 on the input rate."""
    du = du_mod.contar_scalar(data_liquidacao, data_vencimento)
    if du is None:
        return float("nan")
    au = truncar(du / 252.0, 14)
    return truncar(1.0 / (1.0 + taxa) ** au, 6)


def ntnbp_pu(vna: float, cotacao: float) -> float:
    """NTN-B Principal PU = trunc6(vna·cotacao) (ntnbp.py:43-63) —
    computed on the exact decimal grid like pu_from_vna."""
    return pu_from_vna(vna, cotacao)


def ntnbp_dv01(
    data_liquidacao: dt.date, data_vencimento: dt.date, taxa: float, pu: float
) -> float:
    """NTN-B Principal DV01 (ntnbp.py:119-154): pu·(1 − f/f_1bp)."""
    du = du_mod.contar_scalar(data_liquidacao, data_vencimento)
    if du is None:
        return float("nan")
    au = truncar(du / 252.0, 14)
    f0 = (1.0 + taxa) ** au
    f1 = (1.0 + taxa + 0.0001) ** au
    return pu * (1.0 - f0 / f1)


def pu_from_vna(vna: float, cotacao: float) -> float:
    """Exact-decimal outer truncation — see pu_from_vna_expr rationale."""
    from decimal import ROUND_FLOOR, Decimal

    v6 = Decimal(repr(truncar(vna, 6)))
    c6 = Decimal(repr(truncar(cotacao, 6)))
    prod = v6 * c6
    return float(prod.scaleb(6).to_integral_value(rounding=ROUND_FLOOR).scaleb(-6))


def vna_projetado(data: dt.date, vna_base: float, inflacao_pct: float,
                  day_start: int = 15) -> float:
    """Projected VNA (pyield/tpf/vna/ntnb.py:91-139, ntnc.py:110-158,
    _utils.py:38-65): vigência window per family, STN precision chain
    trunc6/bround2/trunc14/trunc6.

    Domain rules (reference `_aplicar_variacao_pro_rata`,
    tests/tpf/vna/test_vna.py): empty inputs → NaN; the VNA-base must
    be positive and the inflação variation > -100% (ValueError
    otherwise — a non-positive base or a ≤-100% projection is data
    corruption, not a price)."""
    if data is None or vna_base is None or inflacao_pct is None:
        return float("nan")
    # validate AFTER the reference's own precision steps (trunc6 base,
    # bround2 projection): a 1e-9 base truncates to 0 and a -99.996%
    # projection rounds to -100 — both must raise exactly as there
    if truncar(vna_base, 6) <= 0:
        raise ValueError("VNA-base deve ser positivo")
    if _bround(inflacao_pct, 2) <= -100:
        raise ValueError("projeção de inflação deve ser maior que -100%")
    if day_start == 1:
        inicio = data.replace(day=1)
        fim = _add_months(inicio, 1)
    elif data.day >= day_start:
        inicio = data.replace(day=day_start)
        fim = _add_months(inicio, 1)
    else:
        fim = data.replace(day=day_start)
        inicio = _add_months(fim, -1)
    expoente = truncar((data - inicio).days / (fim - inicio).days, 14)
    variacao = _bround(inflacao_pct, 2) / 100.0
    return truncar(truncar(vna_base, 6) * (1 + variacao) ** expoente, 6)


def _pround(x: float, decimals: int) -> float:
    """Portable half-away round — twin of pround_expr/pround_sql.
    NaN/±inf pass through like the Spark twin (math.floor would raise
    ValueError/OverflowError on them — round-6 review fix)."""
    if isinstance(x, float) and not math.isfinite(x):
        return x
    s = float(10**decimals)
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s


def interpolar_taxa(
    vertices: list[tuple[int | None, float | None]],
    du: int | None,
    method: str = "flat_forward",
    extrapolar: bool = False,
) -> float | None:
    """Scalar twin of ``curves.interpolate.interpolar`` — the
    reference's scalar path (pyield/futuro/di1.py:296-309 collecting
    ``.item()`` from the vectorized engine; ladder
    pyield/interpolador.py:481-491). Same cleaning (drop null/NaN
    vertices, dedupe (du) keep-max-rate), same ladder: null du or empty
    curve → None; exact hit → vertex rate; below minimum → first rate;
    above maximum → last rate if ``extrapolar`` else None.

    Parity with BOTH distributed routes asserted in
    tests/test_scalar_parity.py.
    """
    import bisect

    if method not in ("flat_forward", "linear"):
        raise ValueError("method must be 'flat_forward' or 'linear'")
    if du is None:
        return None
    # match the distributed twin, which casts the target key to long
    # (truncation toward zero, like int())
    du = int(du)
    clean: dict[int, float] = {}
    for d, t in vertices or []:
        if d is None or t is None or (isinstance(t, float) and math.isnan(t)):
            continue
        d = int(d)
        if d not in clean or t > clean[d]:
            clean[d] = float(t)
    if not clean:
        return None
    verts = sorted(clean.items())
    dus = [d for d, _ in verts]
    if du < dus[0]:
        return verts[0][1]
    if du > dus[-1]:
        return verts[-1][1] if extrapolar else None
    i = bisect.bisect_left(dus, du)
    if dus[i] == du:
        return verts[i][1]
    du_j, tx_j = verts[i - 1]
    du_k, tx_k = verts[i]
    if method == "linear":
        out = tx_j + (du - du_j) * (tx_k - tx_j) / (du_k - du_j)
    else:
        au, au_j, au_k = du / 252.0, du_j / 252.0, du_k / 252.0
        fa_j = (1 + tx_j) ** au_j
        fa_k = (1 + tx_k) ** au_k
        ft = (au - au_j) / (au_k - au_j)
        out = (fa_j * (fa_k / fa_j) ** ft) ** (1.0 / au) - 1.0
    return None if math.isnan(out) else out


def _interp_flat_forward(verts: list[tuple[int, float]], du: int) -> float:
    """Flat-forward ladder on sorted (du, taxa) vertices — scalar twin of
    curves/interpolate.py (reference: pyield/interpolador.py:306-497)."""
    if not verts:
        return float("nan")
    dus = [v[0] for v in verts]
    if du <= dus[0]:
        return verts[0][1]  # at-or-below the first vertex
    for i in range(1, len(verts)):
        if du == dus[i]:
            return verts[i][1]
        if du < dus[i]:
            du_j, tx_j = verts[i - 1]
            du_k, tx_k = verts[i]
            au, au_j, au_k = du / 252.0, du_j / 252.0, du_k / 252.0
            fa_j = (1 + tx_j) ** au_j
            fa_k = (1 + tx_k) ** au_k
            ft = (au - au_j) / (au_k - au_j)
            return (fa_j * (fa_k / fa_j) ** ft) ** (1.0 / au) - 1.0
    return verts[-1][1]


def ntnb_taxas_zero(
    data_liquidacao: dt.date,
    vencimentos: list[dt.date],
    taxas: list[float],
    include_coupons: bool = False,
) -> list[tuple[dt.date, int, float]]:
    """Scalar replica of the sequential NTN-B zero-curve bootstrap
    (reference: pyield/tpf/titulos/ntnb.py:454-578; Spark twin:
    bonds/bootstrap.py ntnb_taxas_zero — parity asserted in
    tests/test_kernels_analytics.py).

    Returns [(data_vencimento, dias_uteis, taxa_zero)] in date order.
    """
    liq = data_liquidacao
    pairs: dict[dt.date, float] = {}
    for v, t in zip(vencimentos, taxas):
        if v > liq:
            pairs[v] = max(t, pairs.get(v, float("-inf")))
    if not pairs:
        return []
    vens = sorted(pairs)
    first_ven, last_ven = vens[0], vens[-1]
    raw_verts = [(du_mod.contar_scalar(liq, v), pairs[v]) for v in vens]
    if any(du is None for du, _ in raw_verts):
        return []  # a vertex beyond the generated calendar: no curve
    verts = sorted(raw_verts)
    grid = _payment_dates(liq, last_ven, 3)

    out: list[tuple[dt.date, int, float]] = []
    pv = [0.0, 0.0]
    for i, d in enumerate(grid, start=1):
        du = du_mod.contar_scalar(liq, d)
        if du is None:  # grid point beyond the generated calendar
            return []
        anos = du / 252.0
        tir = _pround(_interp_flat_forward(verts, du), 10)
        if d <= first_ven:
            z = tir
        else:
            cot = ntnb_cotacao(liq, d, tir)
            fator = (1.0 + NTNB_CUPOM) / (cot - pv[i % 2])
            z = _pround(fator ** (1.0 / anos) - 1.0, 10)
        pv[i % 2] += NTNB_CUPOM / (1.0 + z) ** anos
        if include_coupons or d in pairs:
            out.append((d, du, z))
    return out


def _bround(x: float, decimals: int) -> float:
    """Half-to-even rounding matching Spark bround / Polars round."""
    from decimal import ROUND_HALF_EVEN, Decimal

    q = Decimal(10) ** -decimals
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_EVEN))


def lft_cotacao(data_liquidacao: dt.date, data_vencimento: dt.date, taxa: float) -> float:
    """STN LFT quote (lft.py:104-158): trunc6((1+trunc8(taxa))^-trunc14(du/252))."""
    du = du_mod.contar_scalar(data_liquidacao, data_vencimento)
    if du is None:
        return float("nan")
    t = truncar(taxa, 8)
    au = truncar(du / 252.0, 14)
    return truncar(1.0 / (1.0 + t) ** au, 6)


def lft_taxa(
    data_liquidacao: dt.date, data_vencimento: dt.date, vna: float, pu: float
) -> float:
    """Implied LFT rate from price (lft.py:161-204): root of
    ``trunc6(vna·cotacao(taxa)) − pu`` via the reference's bracket
    sweep + bisection (encontrar_raiz, _utils.py:262-348), trunc8."""
    from pyield_spark.bonds.bootstrap import _encontrar_raiz

    if pu <= 0:
        return float("nan")

    def diff(t: float) -> float:
        return pu_from_vna(vna, lft_cotacao(data_liquidacao, data_vencimento, t)) - pu

    return truncar(_encontrar_raiz(diff), 8)
