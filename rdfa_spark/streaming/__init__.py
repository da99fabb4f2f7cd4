"""Structured Streaming operators (incremental crawl extraction,
stateful sessionization).

This __init__ is load-bearing: workers import the package from the
shipped dist/rdfa_spark.zip (addPyFile), and zipimport does NOT
support PEP-420 namespace packages — without it,
``import rdfa_spark.streaming`` works from a repo checkout but
raises ModuleNotFoundError inside executors when the driver runs
from any other cwd.
"""
