"""Column-expression builders (JVM-side, whole-stage-codegen friendly).

Every builder in this package exists in two mirrored forms:

- a PySpark ``Column`` expression (used by the engine's operators), and
- a DuckDB SQL snippet built from the SAME constants (used by
  ``__spark_entry__.oracle_sql`` so the correctness oracle and the
  engine can never drift apart).

Nothing in here is a Python UDF — the hot path stays inside codegen.
"""
