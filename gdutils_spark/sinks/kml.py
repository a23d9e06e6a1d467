"""KML track sink (K5).

The reference renders KML from GeoJSON tracks through a jinja2 template
(``/root/reference/scripts/dac/recent_datasets_to_kml.py:41-57``). Same
document shape here with stdlib formatting — no template dependency. KML
is presentation: the distributed work (quantize, order, assemble) happens
in :mod:`gdutils_spark.sinks.geojson`; this renders the collected strings.
"""

from __future__ import annotations

import json

_KML_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
  <Document>
    <name>{name}</name>
{placemarks}
  </Document>
</kml>
"""

_PLACEMARK = """    <Placemark>
      <name>{dataset_id}</name>
      <LineString>
        <coordinates>
{coords}
        </coordinates>
      </LineString>
    </Placemark>"""


def tracks_to_kml(tracks: list[tuple[str, str]], name: str = "glider tracks") -> str:
    """Render (dataset_id, geojson string) pairs — the output of
    :func:`gdutils_spark.sinks.geojson.track_geojson` — into one KML doc."""
    from xml.sax.saxutils import escape

    placemarks = []
    for dataset_id, geojson_str in tracks:
        doc = json.loads(geojson_str)
        # `or {}` — GeoJSON allows "geometry": null on a Feature, which
        # .get("geometry", {}) passes through as None
        line = next(
            (
                f["geometry"]["coordinates"]
                for f in doc.get("features", [])
                if (f.get("geometry") or {}).get("type") == "LineString"
            ),
            [],
        )
        # positions may carry an optional third (altitude) element per
        # the GeoJSON spec — preserve it, default 0 when absent
        coords = "\n".join(
            f"          {c[0]},{c[1]},{c[2] if len(c) > 2 else 0}"
            for c in line
        )
        # ids/names are data, the document is XML: an '&' or '<' in a
        # dataset id (or the doc name) must render as an entity, not
        # break every downstream KML parser
        placemarks.append(
            _PLACEMARK.format(dataset_id=escape(str(dataset_id)), coords=coords)
        )
    return _KML_DOC.format(
        name=escape(str(name)), placemarks="\n".join(placemarks)
    )
