"""Scalar function library: pure-Python cores + vectorized Spark UDFs.

The pure functions in :mod:`derzis_spark.functions.core` are shared by
the single-threaded oracle (tests) and the Arrow-vectorized pandas UDFs
in :mod:`derzis_spark.functions.udfs` — guaranteeing both sides compute
identical values (the exact-match requirement of BASELINE.json).
"""
