"""ERDDAP tabledap DataSource with real predicate/projection pushdown.

The reference pushes predicates to ERDDAP by string-building constraint
URLs per request (``/root/reference/gdutils/__init__.py:770-805`` — the
``{var}>=value`` suffixes; ``/root/reference/gdutils/osmc/__init__.py:
180-213``). This module lifts that into the engine as a PySpark
**Python Data Source** (SPARK-44076): Catalyst hands the reader its
filters via ``pushFilters``, supported ones become tabledap constraint
suffixes (evaluated server-side), the rest are re-applied by Spark —
i.e. the optimizer work SURVEY §4 called the "only non-free piece".

Scan parallelism: ``partition_col`` + ``partition_bounds`` split the
request into per-executor time windows (ERDDAP handles range constraints
efficiently on its time index), so a year of data arrives as N
concurrent fetches instead of the reference's single blocking GET.

Transport: ``server`` may be an ``http(s)://`` ERDDAP base (live, needs
network) or a ``file://`` directory for offline use — the file transport
parses the SAME constraint query string and applies it with pandas,
acting as a faithful local stand-in for the server (unit-testable
pushdown semantics; ERDDAP's units row is skipped like
``skiprows=[1]`` at ``gdutils/__init__.py:757``).
"""

from __future__ import annotations

import urllib.parse
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _constraint(f: Filter) -> str | None:
    """Filter → ERDDAP constraint suffix, or None if not expressible."""
    op = _OPS.get(type(f))
    if op is None or len(f.attribute) != 1:
        return None
    v = f.value
    if isinstance(v, str):
        value = v
    elif hasattr(v, "isoformat"):
        value = v.isoformat()
    else:
        value = repr(v)
    return f"{f.attribute[0]}{op}{value}"


@dataclass
class _Window(InputPartition):
    lo: str | None
    hi: str | None


class ErddapReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self._schema = schema
        self._server = options.get("server", "")
        self._dataset_id = options.get("dataset_id", "")
        self._protocol = options.get("protocol", "tabledap")
        self._distinct = options.get("distinct", "false").lower() == "true"
        self._partition_col = options.get("partition_col")
        bounds = options.get("partition_bounds", "")
        self._bounds = [b for b in bounds.split(",") if b]
        self._constraints: list[str] = []

    # -- pushdown ------------------------------------------------------------

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            c = _constraint(f)
            if c is None:
                yield f  # unsupported → Spark re-applies it
            else:
                self._constraints.append(c)

    # -- partitioning --------------------------------------------------------

    def partitions(self):
        if self._partition_col and len(self._bounds) >= 2:
            return [
                _Window(self._bounds[i], self._bounds[i + 1])
                for i in range(len(self._bounds) - 1)
            ]
        return [_Window(None, None)]

    # -- URL build (the reference's string-building, now optimizer-driven) ---

    def request_url(self, partition: _Window | None = None) -> str:
        cols = ",".join(f.name for f in self._schema.fields)
        cons = list(self._constraints)
        if partition is not None and partition.lo is not None:
            cons.append(f"{self._partition_col}>={partition.lo}")
            cons.append(f"{self._partition_col}<{partition.hi}")
        parts = [cols] + [urllib.parse.quote(c, safe="=<>!") for c in cons]
        if self._distinct:
            parts.append("distinct()")
        query = "&".join(parts)
        return f"{self._server}/{self._protocol}/{self._dataset_id}.csv?{query}"

    # -- read ----------------------------------------------------------------

    def read(self, partition: _Window):
        import pandas as pd

        url = self.request_url(partition)
        if self._server.startswith("file://"):
            pdf = _file_transport(url, self._schema)
        else:
            # live ERDDAP: the server evaluates the constraint suffix;
            # units row dropped like the reference's skiprows=[1]
            pdf = pd.read_csv(url, skiprows=[1])
        for f in self._schema.fields:
            if f.dataType.typeName() == "timestamp" and f.name in pdf.columns:
                # ERDDAP times are UTC; Spark's row converter needs tz-aware
                pdf[f.name] = pd.to_datetime(pdf[f.name], utc=True)
        cols = [f.name for f in self._schema.fields]
        for row in pdf[cols].itertuples(index=False, name=None):
            yield row


def _file_transport(url: str, schema: StructType):
    """Offline stand-in for the ERDDAP server: reads
    ``{dir}/{dataset_id}.csv`` and evaluates the constraint query string
    exactly as tabledap would (comparisons + distinct())."""
    import pandas as pd

    parsed = urllib.parse.urlparse(url)
    path, query = parsed.path.split("?", 1) if "?" in parsed.path else (parsed.path, parsed.query)
    if not query:
        query = parsed.query
    dataset_csv = path.rsplit("/", 1)[-1].replace(".csv", "") + ".csv"
    base_dir = path.rsplit("/", 2)[0]
    pdf = pd.read_csv(f"{base_dir}/{dataset_csv}")
    parts = [urllib.parse.unquote(p) for p in query.split("&")]
    cols = parts[0].split(",")
    for c in parts[1:]:
        if c == "distinct()":
            pdf = pdf.drop_duplicates()
            continue
        for op in (">=", "<=", "!=", ">", "<", "="):
            if op in c:
                name, value = c.split(op, 1)
                series = pdf[name]
                if "time" in name.lower() or series.dtype == object and value[:2].isdigit():
                    try:
                        series = pd.to_datetime(series, utc=True)
                        value = pd.to_datetime(value, utc=True)
                    except (ValueError, TypeError):
                        pass
                else:
                    try:
                        value = float(value)
                    except ValueError:
                        pass
                pdf = pdf[
                    series == value if op in ("=",) else
                    series >= value if op == ">=" else
                    series <= value if op == "<=" else
                    series > value if op == ">" else
                    series < value if op == "<" else
                    series != value
                ]
                break
    return pdf[cols]


class ErddapDataSource(DataSource):
    """``spark.read.format("erddap")`` — see module docstring.

    Required options: ``server``, ``dataset_id``; the schema must be
    supplied by the caller (ERDDAP's info CSV carries it; live schema
    inference would cost a blocking metadata request per plan).
    """

    @classmethod
    def name(cls) -> str:
        return "erddap"

    def schema(self):
        raise NotImplementedError(
            "erddap source needs an explicit .schema(...) — see the info "
            "CSV (S6) for the dataset's variables"
        )

    def reader(self, schema: StructType) -> ErddapReader:
        return ErddapReader(schema, self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ErddapDataSource)
