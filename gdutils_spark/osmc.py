"""DuoProfilesClient: GTS observations client facade (OSMC parity).

Parity surface for ``/root/reference/gdutils/osmc/__init__.py:11``
(DuoProfilesClient) over a pluggable Spark observations table instead of
the OSMC ERDDAP endpoint. The obs table is long-format GTS fixes:
``time, platform_code, platform_type, country[, latitude, longitude]``
(``/root/reference/gdutils/osmc/__init__.py:46-56``).

Spark-first differences:

* ``get_profiles_by_wmo_id`` (``osmc/__init__.py:180-213``) is a
  predicate + projection + ``dropDuplicates`` — the reference's
  server-side ``platform_code=``/``time>=``/``time<=`` constraints and
  ``&distinct()`` URL suffix become Catalyst filters pushed to the scan.
* ``get_dataset_profiles`` (``osmc/__init__.py:215-239``) — the
  reference loops per deployment, one HTTP fetch each (N+1). Here it is
  ONE key+range interval join: ``obs.platform_code = wmo_id AND
  start_date <= obs.time <= end_date``, hash-partitioned on the equi
  key with the range as residual — the N-deployment harvest is a single
  shuffle, and deployments (catalog-sized) broadcast.
* calendars (``osmc/__init__.py:241-324``; free functions
  ``osmc/calendar.py:8-81``) delegate to the one parameterized
  ``calendar`` operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdutils_spark.operators.calendar import calendar, calendar_long
from gdutils_spark.operators.joins import interval_join

PROFILE_VARS = ["time", "platform_code", "platform_type", "country"]
PROFILE_GPS_VARS = PROFILE_VARS + ["latitude", "longitude"]


class DuoProfilesClient:
    """Spark-native GTS observations client.

    Parameters
    ----------
    spark : SparkSession
    obs : DataFrame
        Long GTS fixes table (see module docstring). At 100 TB this is
        the big fact table: partition/cluster it by date so the
        time-range predicates prune files.
    """

    def __init__(self, spark: SparkSession, obs: DataFrame):
        self._spark = spark
        self._obs_source = obs
        self._obs: DataFrame | None = None  # last harvest (lazy plan)

    @property
    def obs(self) -> DataFrame:
        if self._obs is None:
            raise RuntimeError("No GTS observations have been fetched")
        return self._obs

    # -- selection ----------------------------------------------------------

    def get_profiles_by_wmo_id(
        self,
        wmo_id: str,
        start_date,
        end_date,
        gps: bool = False,
    ) -> DataFrame:
        """Distinct GTS fixes for one platform in a time window
        (S5: filter + projection + dedup, all pushed into the scan)."""
        cols = [c for c in (PROFILE_GPS_VARS if gps else PROFILE_VARS)
                if c in self._obs_source.columns]
        out = (
            self._obs_source.where(
                (F.col("platform_code") == wmo_id)
                & F.col("time").between(F.lit(start_date), F.lit(end_date))
            )
            .select(*cols)
            .dropDuplicates()
        )
        self._obs = out
        return out

    def get_dataset_profiles(self, deployments: DataFrame) -> DataFrame:
        """GTS fixes for every deployment, tagged with ``dataset_id``.

        ``deployments`` needs ``dataset_id, wmo_id, start_date,
        end_date`` (the reference's summary-row schema,
        ``osmc/__init__.py:32-44``). Rows with NULL/'None' wmo_id are
        skipped like the reference (``osmc/__init__.py:224-226``).
        One interval join replaces the reference's per-row fetch loop.
        """
        d = deployments.where(
            F.col("wmo_id").isNotNull() & (F.col("wmo_id") != "None")
        ).select("dataset_id", "wmo_id", "start_date", "end_date")
        out = interval_join(
            self._obs_source,
            d,
            fact_key="platform_code",
            dim_key="wmo_id",
            fact_time="time",
            dim_start="start_date",
            dim_end="end_date",
        ).select("dataset_id", *[c for c in PROFILE_GPS_VARS
                                 if c in self._obs_source.columns]).dropDuplicates()
        self._obs = out
        return out

    # -- aggregation / calendars --------------------------------------------

    def profiles_per_yyyymmdd(self) -> DataFrame:
        """Daily obs counts (``osmc/__init__.py:90-102``) — long form."""
        return (
            self.obs.groupBy(F.to_date("time").alias("date"))
            .agg(F.count("platform_code").alias("n_obs"))
            .orderBy("date")
        )

    def ymd_observations_calendar(self) -> DataFrame:
        return calendar(self.obs, "time", "ymd", "count")

    def ym_observations_calendar(self) -> DataFrame:
        return calendar(self.obs, "time", "ym", "count")

    def md_observations_calendar(self) -> DataFrame:
        return calendar(self.obs, "time", "md", "count")

    def get_ymd_obs_calendar(self, deployments: DataFrame) -> DataFrame:
        """Harvest + ymd calendar in one plan (``osmc/__init__.py:241-271``)."""
        return calendar(self.get_dataset_profiles(deployments), "time", "ymd", "count")

    def get_ym_obs_calendar(self, deployments: DataFrame) -> DataFrame:
        return calendar(self.get_dataset_profiles(deployments), "time", "ym", "count")

    def get_md_obs_calendar(self, deployments: DataFrame) -> DataFrame:
        return calendar(self.get_dataset_profiles(deployments), "time", "md", "count")

    def __repr__(self) -> str:
        return "<DuoProfilesClient(source=DataFrame)>"


# -- free-function calendar parity (/root/reference/gdutils/osmc/calendar.py)


def ymd_obs_calendar(obs: DataFrame) -> DataFrame:
    """``osmc/calendar.py:8-32`` — wide (year,month)×day counts."""
    return calendar(obs, "time", "ymd", "count")


def ym_obs_calendar(obs: DataFrame) -> DataFrame:
    """``osmc/calendar.py:35-57`` — wide year×month counts."""
    return calendar(obs, "time", "ym", "count")


def md_obs_calendar(obs: DataFrame) -> DataFrame:
    """``osmc/calendar.py:60-81`` — wide month×day counts."""
    return calendar(obs, "time", "md", "count")


def obs_calendar_long(obs: DataFrame, variant: str = "ymd") -> DataFrame:
    """Scale-friendly long form of the above (stays distributed)."""
    return calendar_long(obs, "time", variant, "count")
