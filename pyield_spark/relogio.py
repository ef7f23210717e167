"""Market clock — America/Sao_Paulo timezone (F14).

The reference anchors "now"/"today" to the B3 timezone
(pyield/relogio.py:17-54). Scalar twins here, plus Column expressions
for distributed use: Spark keeps timestamps in the session timezone, so
the expression variants convert the cluster clock explicitly instead of
trusting ``spark.sql.session.timeZone``.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from pyspark.sql import Column, functions as F

BR_TZ = ZoneInfo("America/Sao_Paulo")
BR_TZ_NAME = "America/Sao_Paulo"


def agora() -> dt.datetime:
    """Current datetime in the B3 timezone (scalar twin)."""
    return dt.datetime.now(BR_TZ)


def hoje() -> dt.date:
    """Today's date in the B3 timezone (scalar twin)."""
    return agora().date()


def agora_expr() -> Column:
    """Cluster-now as a wall-clock timestamp in America/Sao_Paulo,
    independent of the session timezone (current_timestamp is
    session-tz; convert UTC-instant → B3 wall clock)."""
    utc = F.to_utc_timestamp(F.current_timestamp(), F.current_timezone())
    return F.from_utc_timestamp(utc, BR_TZ_NAME)


def hoje_expr() -> Column:
    """Today's date on the B3 wall clock."""
    return F.to_date(agora_expr())
