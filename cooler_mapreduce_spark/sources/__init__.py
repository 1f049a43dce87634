"""Sources: readers for the engine's supported formats + the test catalog.

The reference supports exactly one source — a newline-delimited text file on
a shared POSIX volume, split on line boundaries (reference
coordinator/server.py:209-243, task_executor.py:124-151). Spark's file
sources subsume that (TextInputFormat line-aligned splits, driven by
``spark.sql.files.maxPartitionBytes``) and add columnar formats with
predicate pushdown. ``catalog`` exposes the driver's parquet test tables.
"""

from .catalog import TABLES, load_all, table  # noqa: F401
from .text import read_lines  # noqa: F401
