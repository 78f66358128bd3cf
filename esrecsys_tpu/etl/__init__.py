"""ETL: raw data → dictionaries → training shards, plain Python + numpy.

Replaces the reference's PySpark jobs (wikipedia) and ad-hoc scripts
(spotify/pinterest) with shared, testable modules; at the reference's data
scales (single workstation, Spark `local[4]`) multiprocessing pools match or
beat JVM round-trips, and the hot inner loops have a C++ fast path in
:mod:`esrecsys_tpu.native`.
"""
