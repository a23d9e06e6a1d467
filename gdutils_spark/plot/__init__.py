"""Driver-side presentation: heatmap rendering of collected calendars.

Parity surface for ``/root/reference/gdutils/plot/__init__.py:21-82``
(``plot_calendar``). Calendars in this engine are tiny by construction
(years × 12 rows regardless of input size — the aggregation happened
distributed), so collecting to the driver for rendering is the correct
boundary. seaborn/matplotlib are optional: everything degrades to a
pandas matrix if they aren't installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MONTH_LABELS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]


def calendar_to_pandas(calendar_df: DataFrame):
    """Collect a wide calendar (`year`/`month` keys + c01.. value columns)
    into the reference's presentation shape: a pandas matrix indexed by
    the period keys with integer day/month column labels.

    This is the engine↔presentation boundary (SURVEY.md §2.5 / R1): the
    distributed plan produced the tiny matrix; pandas only re-labels it.
    """
    pdf = calendar_df.toPandas()
    # key detection by SCHEMA, not contents: the old `not pdf[c].empty`
    # clause dropped every key exactly when the frame had zero rows,
    # so an empty calendar crashed set_index([]) with an opaque pandas
    # error (r12 latent-hunt). An empty calendar now returns an empty
    # matrix with the right index/column labels.
    keys = [c for c in ("year", "month") if c in pdf.columns]
    value_cols = [c for c in pdf.columns if c.startswith("c") and c[1:].isdigit()]
    pdf = pdf.set_index(keys)[value_cols]
    pdf.columns = [int(c[1:]) for c in value_cols]
    # column axis name drives plot_calendar's layout choice, like the
    # reference's `calendar.columns.name` checks
    pdf.columns.name = "day" if len(value_cols) > 12 else "month"
    pdf.index.names = keys
    return pdf


def plot_calendar(calendar, center=None, **hm_kwargs):
    """Seaborn heatmap of a collected calendar matrix
    (``/root/reference/gdutils/plot/__init__.py:21-82`` semantics:
    day-vs-month layouts, month-name tick labels, annotation formatting).

    Accepts either the pandas matrix from :func:`calendar_to_pandas` or a
    wide calendar DataFrame (collected automatically). Raises
    ImportError if seaborn/matplotlib are unavailable.
    """
    if isinstance(calendar, DataFrame):
        calendar = calendar_to_pandas(calendar)
    try:
        import matplotlib.pyplot as plt
        import seaborn as sns
    except ImportError as e:  # pragma: no cover - plotting libs optional
        raise ImportError(
            "plot_calendar needs seaborn+matplotlib; use calendar_to_pandas"
            " for the raw matrix"
        ) from e

    fontsize = 10.0
    if calendar.columns.name == "day":
        if "ax" not in hm_kwargs:
            _, hm_kwargs["ax"] = plt.subplots(figsize=(11.0, 8.5))
    elif calendar.columns.name == "month":
        if "ax" not in hm_kwargs:
            _, hm_kwargs["ax"] = plt.subplots(figsize=(8.5, 8.5))
        fontsize = 14.0
    else:
        raise ValueError(f"unrecognized calendar columns: {calendar.columns.name!r}")

    heatmap_kwargs = {
        "annot": True,
        "square": True,
        "cbar": False,
        "fmt": ".0f",
        "linewidths": 0.5,
        "annot_kws": {"fontsize": fontsize},
    }
    heatmap_kwargs.update(hm_kwargs)
    if center is not None:
        heatmap_kwargs["center"] = center
    ax = sns.heatmap(calendar, **heatmap_kwargs)
    ax.set_ylabel("")
    ax.set_xlabel("")

    if calendar.columns.name == "month":
        ax.set_xticklabels(
            [MONTH_LABELS[int(x.get_text()) - 1] for x in ax.get_xticklabels()],
            rotation=90,
        )
    if list(calendar.index.names) == ["month"]:
        ax.set_yticklabels(
            [MONTH_LABELS[int(y.get_text()) - 1][:3] for y in ax.get_yticklabels()],
            rotation=0,
        )
    elif list(calendar.index.names) == ["year", "month"]:
        labels = []
        for ylabel in ax.get_yticklabels():
            y, m = ylabel.get_text().split("-")
            labels.append(f"{MONTH_LABELS[int(m) - 1][:3]} {y}")
        ax.set_yticklabels(labels, rotation=0)
    return ax
