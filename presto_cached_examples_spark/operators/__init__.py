"""Relational operators — the Presto-class query surface, Spark-first.

Each module declares DataFrame builders plus their DuckDB oracle SQL.
All plans are declarative (Catalyst optimizes); no RDDs, no driver-side
loops over data.
"""
