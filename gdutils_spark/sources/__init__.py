"""Source adapters.

The reference reads everything as blocking HTTP CSV GETs parsed by pandas
(``/root/reference/gdutils/__init__.py:406,507,567``). Here every source is a
Spark reader so scans are partitioned, predicate/projection pushdown reaches
the format layer, and the N+1 per-dataset fetch loop of the reference
(``/root/reference/gdutils/__init__.py:544-616``) becomes a single
partitioned scan + shuffle.
"""

from gdutils_spark.sources.tables import TABLES, load_table, load_tables, register_views
from gdutils_spark.sources.csv import read_erddap_csv, read_dataset_csv_batch
from gdutils_spark.sources.rest import read_json_records

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_erddap_csv",
    "read_dataset_csv_batch",
    "read_json_records",
]
