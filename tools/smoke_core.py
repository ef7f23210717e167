"""Quick driver-side smoke of calendar/du/asof/interp/forwards/bonds
against golden values from the reference's docstrings."""

import datetime as dt

from pyspark.sql import functions as F

from pyield_spark.session import get_session
from pyield_spark import du
from pyield_spark.curves.interpolate import interpolar
from pyield_spark.curves.forwards import forwards_expr
from pyield_spark.bonds.pricing import ltn_pu_expr, price_coupon_bond, ntnb_cotacao

spark = get_session("smoke")

ok = True


def check(name, got, want, tol=0.0):
    global ok
    good = (got == want) if tol == 0 else (abs(got - want) <= tol)
    if not good:
        ok = False
    print(("PASS" if good else "FAIL"), name, "got", got, "want", want)


# --- du.contar (docstring: du/core.py contar_expr examples) ---
df = spark.createDataFrame(
    [(dt.date(2024, 1, 1), dt.date(2024, 1, 5)), (dt.date(2024, 2, 9), dt.date(2024, 2, 12))],
    "inicio DATE, fim DATE",
)
res = du.contar(df, "inicio", "fim").orderBy("inicio").collect()
check("contar[0]", res[0].dias_uteis, 3)
check("contar[1]", res[1].dias_uteis, 1)
res2 = du.contar(df, "inicio", F.lit(dt.date(2024, 12, 31))).orderBy("inicio").collect()
check("contar_eoy[0]", res2[0].dias_uteis, 252)
check("contar_eoy[1]", res2[1].dias_uteis, 224)
# scalar parity
check("contar_scalar", du.contar_scalar(dt.date(2024, 1, 1), dt.date(2024, 1, 5)), 3)
check("contar_scalar_eoy", du.contar_scalar(dt.date(2024, 2, 9), dt.date(2024, 12, 31)), 224)

# --- du.deslocar (docstring: deslocar_expr examples) ---
df = spark.createDataFrame(
    [(dt.date(2023, 12, 22), 1), (dt.date(2023, 12, 29), 5)], "data DATE, n INT"
)
res = du.deslocar(df, "data", "n").orderBy("data").collect()
check("deslocar[0]", res[0].data_deslocada, dt.date(2023, 12, 26))
check("deslocar[1]", res[1].data_deslocada, dt.date(2024, 1, 8))
check("deslocar_scalar", du.deslocar_scalar(dt.date(2023, 12, 22), 1), dt.date(2023, 12, 26))

# --- interpolar (docstrings: Interpolador + yd.interpolar) ---
curve = spark.createDataFrame([(30, 0.045), (60, 0.05), (90, 0.055)], "dias_uteis INT, taxa DOUBLE")
tgt = spark.createDataFrame([(45,), (100,), (-10,), (10,)], "dias_uteis INT")
res = {r.dias_uteis: r.taxa_interpolada for r in interpolar(tgt, curve).collect()}
check("ff(45)", round(res[45], 15), round(0.04833068080970859, 15), tol=1e-12)
check("ff(100) no extrap", res[100], None)
check("ff(10) short end", res[10], 0.045)
res = {r.dias_uteis: r.taxa_interpolada for r in interpolar(tgt, curve, extrapolar=True).collect()}
check("ff(100) extrap", res[100], 0.055)
lin = {r.dias_uteis: r.taxa_interpolada for r in interpolar(tgt, curve, method="linear").collect()}
check("linear(45)", round(lin[45], 10), 0.0475, tol=1e-12)

# multi-curve (yd.interpolar docstring)
curve2 = spark.createDataFrame(
    [("2025-01-02", 5, 0.10), ("2025-01-02", 20, 0.12), ("2025-01-02", 50, 0.13)],
    "data_referencia STRING, dias_uteis INT, taxa DOUBLE",
)
tgt2 = spark.createDataFrame(
    [("2025-01-02", 10), ("2025-01-02", 25)], "data_referencia STRING, dias_uteis INT"
)
res = {r.dias_uteis: r.taxa_interpolada for r in interpolar(tgt2, curve2, by="data_referencia").collect()}
check("mc(10)", round(res[10], 6), 0.113293, tol=1e-6)
check("mc(25)", round(res[25], 6), 0.123323, tol=1e-6)

# --- forwards (fwd.py docstring) ---
fdf = spark.createDataFrame(
    [("a", 10, 0.05), ("a", 20, 0.06), ("a", 30, 0.07)], "g STRING, du INT, tx DOUBLE"
)
res = {r.du: r.fwd for r in fdf.withColumn("fwd", forwards_expr("du", "tx", "g")).collect()}
check("fwd(10)", res[10], 0.05)
check("fwd(20)", round(res[20], 6), 0.070095, tol=1e-6)
check("fwd(30)", round(res[30], 6), 0.090284, tol=1e-6)
# duplicate cascade
fdf2 = spark.createDataFrame(
    [("b", 10, 0.05), ("b", 20, 0.06), ("b", 20, 0.061), ("b", 30, 0.07)],
    "g STRING, du INT, tx DOUBLE",
)
res = [r.fwd for r in fdf2.withColumn("fwd", forwards_expr("du", "tx", "g")).orderBy("du", "tx").collect()]
check("fwd dup nulls", res[1:], [None, None, None])
check("fwd dup first ok", res[0], 0.05)

# --- LTN pu (ltn.py docstring) ---
bdf = spark.createDataFrame(
    [(dt.date(2024, 7, 5), dt.date(2030, 1, 1), 0.12145),
     (dt.date(2008, 5, 21), dt.date(2010, 7, 1), 0.143600009)],
    "liq DATE, ven DATE, taxa DOUBLE",
)
bdf = du.contar(bdf, "liq", "ven")
res = [r.pu for r in bdf.withColumn("pu", ltn_pu_expr("dias_uteis", "taxa")).orderBy("liq").collect()]
check("ltn_pu 2008", res[0], 753.315323)
check("ltn_pu 2024", res[1], 535.279902)

# --- NTN-F pu (ntnf.py docstring: pu("15-05-2024","01-01-2027", ?) flows) ---
# docstring example for _calcular_pu not shown; use mask-style: price NTN-F
# maturing 2027-01-01 settled 2024-05-15 at 10% — flow dates per docstring.
ndf = spark.createDataFrame(
    [(1, dt.date(2024, 5, 15), dt.date(2027, 1, 1), 0.10)],
    "id INT, data_liquidacao DATE, data_vencimento DATE, taxa DOUBLE",
)
from pyield_spark.bonds.cashflows import explode_payment_dates
flows = explode_payment_dates(ndf, "data_liquidacao", "data_vencimento").orderBy("data_pagamento").collect()
want_dates = [dt.date(2024, 7, 1), dt.date(2025, 1, 1), dt.date(2025, 7, 1),
              dt.date(2026, 1, 1), dt.date(2026, 7, 1), dt.date(2027, 1, 1)]
check("ntnf flow dates", [r.data_pagamento for r in flows], want_dates)
pu = price_coupon_bond(ndf, ["id"]).collect()[0].pu
print("ntnf pu @10%:", pu)

# --- NTN-B cotacao (ntnb.py docstring values) ---
cdf = spark.createDataFrame(
    [
        (1, dt.date(2024, 5, 31), dt.date(2035, 5, 15), 0.061490, 0.993651),
        (2, dt.date(2024, 5, 31), dt.date(2060, 8, 15), 0.061878, 0.995341),
        (3, dt.date(2024, 8, 15), dt.date(2032, 8, 15), 0.05929, 1.006409),
        (4, dt.date(2024, 5, 15), dt.date(2025, 5, 15), 0.10, 0.964454),
        (5, dt.date(2008, 5, 21), dt.date(2010, 8, 15), 0.082900009, 0.970813),
    ],
    "id INT, data_liquidacao DATE, data_vencimento DATE, taxa DOUBLE, want DOUBLE",
)
res = ntnb_cotacao(cdf, ["id"]).join(cdf.select("id", "want"), "id").collect()
for r in sorted(res, key=lambda r: r.id):
    check(f"ntnb cotacao id{r.id}", r.cotacao, r.want)

print("ALL OK" if ok else "FAILURES PRESENT")
