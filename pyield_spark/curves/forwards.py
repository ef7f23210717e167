"""Forward rates from zero rates — Column-returning combinator.

Reference semantics (pyield/fwd.py:9-171, docstring contract verified):

    fwd_k = (f_k^au_k / f_j^au_j)^(1/(au_k - au_j)) - 1,  f_x = 1 + tx_x

ordered by ``dias_uteis`` within each group **without reordering the
frame**; the first row of each group (min du) is the spot: fwd = tx.

Null/duplicate contract (fwd.py:47-52,154-158): duplicate
(group, du) vertices are ambiguous → their rate is nulled, and the null
cascades to the immediately-following row (whose previous vertex is now
invalid); the row after that returns to normal. A null du sorts last and
affects only its own row.

Spark: pure window functions (count/lag/min over), whole-stage codegen,
one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F

DAYS_PER_YEAR = 252.0


def forwards_expr(
    dias_uteis: str | Column,
    taxas: str | Column,
    agrupar_por: str | Column | None = None,
) -> Column:
    """Forward-rate Column; name it at use site (e.g. .alias('taxa_forward'))."""
    du_k = F.col(dias_uteis) if isinstance(dias_uteis, str) else dias_uteis
    tx_k = F.col(taxas) if isinstance(taxas, str) else taxas
    if agrupar_por is None:
        grupo: Column = F.lit(0)
    elif isinstance(agrupar_por, str):
        grupo = F.col(agrupar_por)
    else:
        grupo = agrupar_por

    # duplicate (group, du) vertices invalidate the rate; the natural
    # null cascade handles the following row. The dup flag is a PEER
    # COUNT over the same (grupo)-partitioned du-ordered window as the
    # lag pass — RANGE [current, current] counts rows with equal du —
    # so both windows share ONE exchange+sort; the old
    # partitionBy(grupo, du) count window hashed on (grupo, du), which
    # does not satisfy the (grupo) clustering and forced a second
    # exchange into every forward-curve plan (review fix).
    w = Window.partitionBy(grupo).orderBy(du_k.asc_nulls_last())
    dup = (
        F.count(F.lit(1)).over(
            w.rangeBetween(Window.currentRow, Window.currentRow)
        )
        > 1
    )
    tx_valid = F.when(dup, F.lit(None).cast("double")).otherwise(tx_k.cast("double"))
    au_k = du_k.cast("double") / DAYS_PER_YEAR
    tx_j = F.lag(tx_valid, 1).over(w)
    au_j = F.lag(au_k, 1).over(w)

    fk = F.lit(1.0) + tx_valid
    fj = F.lit(1.0) + tx_j
    fwd = (
        F.pow(
            F.pow(fk, au_k) / F.pow(fj, au_j),
            F.lit(1.0) / (au_k - au_j),
        )
        - F.lit(1.0)
    )

    first_row = du_k == F.min(du_k).over(Window.partitionBy(grupo))
    return F.when(first_row, tx_valid).otherwise(fwd)
