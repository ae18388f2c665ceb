"""Relational operator surface (SURVEY.md §2.2).

Each module exposes a ``QUERIES`` dict of ``name -> (spark, sf_dir) ->
DataFrame`` and an ``ORACLE`` dict of ``name -> ANSI SQL`` (DuckDB) used by
the driver's differential correctness harness.
"""
