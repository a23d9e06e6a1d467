"""Glider-id derivation.

The reference extracts the glider name from ``dataset_id`` with
``re.compile(r'^(.*)-\\d{8}T\\d{4}')`` at
``/root/reference/gdutils/__init__.py:487,591-592``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GLIDER_RE = r"^(.*)-\d{8}T\d{4}"


def glider_from_dataset_id(col: Column) -> Column:
    return F.regexp_extract(col, GLIDER_RE, 1)
