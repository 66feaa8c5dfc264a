"""data_integration_project_spark — a PySpark-native analytics/ETL engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (surveyed in SURVEY.md):
sources, per-entity transform pipelines, a declarative data-quality rule
engine, dual-source merge/reconciliation, a star-schema DWH build with
SCD2, monitoring aggregations, and a Structured Streaming ingest path —
plus large-scale training-data operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything is declared through the DataFrame/SQL API so Catalyst handles
pushdown, pruning, join selection, and AQE; Python UDFs appear only where
built-ins genuinely cannot express the semantics (Arrow-batched, never
row-at-a-time).
"""

__version__ = "0.1.0"

# Make the package importable inside Spark's Python WORKERS regardless
# of the launch cwd: custom Python DataSources (sources/pydb.py,
# sources/pygen.py) and Arrow UDFs are cloudpickled BY REFERENCE, so the
# forked worker must be able to `import data_integration_project_spark`
# itself. Workers inherit the driver process environment at JVM launch;
# the repo root is only implicitly on sys.path when the driver happens
# to run from it. Exporting PYTHONPATH here (package import time —
# always before this package builds or touches a session) removes that
# cwd dependency. No-op when already present.
import os as _os

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + (_os.pathsep + _pp if _pp else "")
    )
del _os, _pp, _repo_root
