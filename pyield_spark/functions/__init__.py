from pyield_spark.functions.numbers import (  # noqa: F401
    truncar_expr,
    bround_expr,
    br_num_expr,
    br_int_expr,
    pct_para_decimal_expr,
)
from pyield_spark.functions.dates import converter_datas_expr  # noqa: F401
