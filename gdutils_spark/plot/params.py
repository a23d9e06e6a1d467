"""Functional plot-parameter helpers (parity with the reference's
``gdutils/plot/erddap.py:125-206`` module-level ``set_*`` functions).

Each helper returns a ``{param_key: encoded_value}`` dict ready to merge
into a plot-parameter mapping (``ErddapPlotter.plot_parameters`` uses the
same encoding); invalid input returns ``{}`` (the reference mixes ``None``
and ``{}`` returns — normalized to ``{}`` here so results always merge).

ERDDAP graph parameter encodings::

    .bgColor:   value (0xAARRGGBB)
    .colorBar:  palette|continuous|scale|min|max|nSections
    .color:     value (0xAARRGGBB)
    .draw:      value (lines|linesAndMarkers|markers|sticks|vectors)
    .legend:    value (Bottom|Off|Only)
    .marker:    markerType|markerSize
    .trim:      trimPixels
    .xRange:    min|max|ascending|scale
    .yRange:    min|max|ascending|scale
"""

from __future__ import annotations

from gdutils_spark.plot.plotter import (
    COLORBARS,
    COLORS,
    CONTINUOUS_OPTIONS,
    LEGEND_OPTIONS,
    LINE_STYLES,
    MARKER_TYPES,
    SCALE_OPTIONS,
    ZOOM_LEVELS,
)

__all__ = [
    "set_bg_color",
    "set_colorbar",
    "set_marker_color",
    "set_line_style",
    "set_legend_loc",
    "set_marker_style",
    "set_x_range",
    "set_y_range",
    "set_zoom",
    "set_trim_pixels",
]


def set_bg_color(color: str = "white") -> dict:
    if color not in COLORS:
        return {}
    return {".bgColor=": f"0x{COLORS[color]}"}


def set_colorbar(
    colorbar: str,
    continuous: str = CONTINUOUS_OPTIONS[0],
    scale: str = SCALE_OPTIONS[0],
    minval: object = "",
    maxval: object = "",
    num_sections: object = "",
) -> dict:
    if (
        colorbar not in COLORBARS
        or continuous not in CONTINUOUS_OPTIONS
        or scale not in SCALE_OPTIONS
    ):
        return {}
    return {
        ".colorBar=": f"{colorbar}|{continuous}|{scale}|{minval}|{maxval}|{num_sections}"
    }


def set_marker_color(color: str = "white") -> dict:
    if color not in COLORS:
        return {}
    return {".color=": f"0x{COLORS[color]}"}


def set_line_style(line_style: str = "markers") -> dict:
    if line_style not in LINE_STYLES:
        return {}
    return {".draw=": line_style}


def set_legend_loc(location: str = "Bottom") -> dict:
    if location not in LEGEND_OPTIONS:
        return {}
    return {".legend=": location}


def set_marker_style(marker: str = "Circle", marker_size: int = 5) -> dict:
    if marker not in MARKER_TYPES:
        return {}
    return {".marker=": f"{MARKER_TYPES.index(marker)}|{marker_size}"}


def set_x_range(
    min_val: object = "",
    max_val: object = "",
    ascending: bool = True,
    scale: str = SCALE_OPTIONS[0],
) -> dict:
    if scale not in SCALE_OPTIONS:
        return {}
    return {".xRange=": f"{min_val}|{max_val}|{str(ascending).lower()}|{scale}"}


def set_y_range(
    min_val: object = "",
    max_val: object = "",
    ascending: bool = False,
    scale: str = SCALE_OPTIONS[0],
) -> dict:
    # default ascending=False to match ErddapPlotter.set_y_range and
    # DEFAULT_PLOT_PARAMETERS (depth axes plot descending). The
    # reference's functional helper defaults True, inconsistently with
    # its own plotter method — deliberate deviation, or merging the two
    # styles silently flips every depth plot.
    if scale not in SCALE_OPTIONS:
        return {}
    return {".yRange=": f"{min_val}|{max_val}|{str(ascending).lower()}|{scale}"}


def set_zoom(zoom_level: str = "in") -> dict:
    if zoom_level not in ZOOM_LEVELS:
        return {}
    return {".zoom=": zoom_level}


def set_trim_pixels(num_pixels: int = 10) -> dict:
    return {".trim=": str(num_pixels)}
