"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference portfolio-tracker (see SURVEY.md).

Layout:
    session.py    SparkSession factory (AQE on, tuned for local[N] testing,
                  designed for multi-executor clusters)
    schemas.py    explicit StructTypes for every table (never inferSchema
                  on correctness paths)
    io.py         readers over the harness parquet tables + idempotent
                  dedup-append writer (reference `INSERT OR IGNORE`)
    derive.py     deterministic derivation of the domain tables
                  (prices / trades / universe) from the harness tables —
                  mirrored 1:1 by SQL CTEs in `oracle.py`
    oracle.py     DuckDB SQL twins for every derivation/query
    operators/    one module per operator family from SURVEY.md §2
    functions/    reusable column-expression helpers (ffill, cumprod, ...)
    streaming/    Structured Streaming tier (§2.12)
"""

__version__ = "0.1.0"
