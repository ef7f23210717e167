"""pyield_spark — a PySpark-native fixed-income analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference toolkit (crdcj/PYield, a Polars-based Brazilian fixed-income
library) re-expressed Spark-first:

- ``calendar_br`` / ``du``: business-day arithmetic as broadcast-join
  column operations over a generated holiday dimension
  (reference semantics: pyield/du/core.py).
- ``operators.asof``: a reusable as-of join built from union + ordered
  windows (reference consumer: pyield/interpolador.py:452-468).
- ``curves``: flat-forward / linear multi-curve interpolation and
  forward-rate expressions (pyield/interpolador.py:306-497, pyield/fwd.py).
- ``bonds``: columnar cash-flow generation, STN-faithful pricing with
  truncation semantics, duration/DV01 by explode-and-aggregate
  (pyield/tpf/titulos/*).
- ``operators.dedup`` / ``operators.similarity`` / ``operators.text`` /
  ``operators.multimodal``: LLM-data-pipeline extensions designed for
  100 TB scale (no driver-side loops, broadcast-able dims, AQE-friendly).
- ``streaming``: Structured Streaming windows/watermark layer over the
  ``events`` table.

Everything is DataFrame/Catalyst-first; Python UDFs appear only in the
genuinely sequential kernels (root finding, curve bootstrap) and are
Arrow-vectorized (``applyInPandas``).
"""

__version__ = "0.1.0"
