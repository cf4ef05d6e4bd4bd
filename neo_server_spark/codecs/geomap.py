"""GEOMAP sink — leaflet JS assets + JSON envelope with byte parity to the
reference encoder (mods/codec/internal/geomap/geomap.go, leafletobj.go,
mods/util/geomapjs; goldens mods/tql/test/js-geojson-{point,polygon}.js).

The encoder consumes LAYER VALUES — dicts of the leaflet layer forms
(marker/circleMarker/circle/polyline/polygon with [lat,lon] coordinates) or
GeoJSON objects (Feature / FeatureCollection / bare geometries, [lon,lat]
order) — accumulates the lat/lon bound, and emits:

- ``<id>_opt.js``: the static per-map options var (geomapjs
  mapOptionsPopupOnly, verbatim);
- ``<id>.js``: the IIFE that builds the map, sets initBounds/initPoint and
  adds one ``L.<type>(...)`` object per layer (geomap.go Close:226-338);
- the JSON envelope {geomapID, style{width,height,grayscale}, jsAssets,
  cssAssets, jsCodeAssets} (rendertpls.go JsonTemplate fields).
"""

from __future__ import annotations

MAP_OPTIONS_TEMPLATE = '''var %s = {
    geojson: {
        pointToLayer: function (feature, latlng) {
            if (feature.properties && feature.properties.icon) {
                return L.marker(latlng, {icon: feature.properties.icon});
            }
            return L.circleMarker(latlng, {
                radius: (feature.properties && feature.properties.radius) ? feature.properties.radius : 10,
                stroke: (feature.properties && feature.properties.stroke != undefined) ? feature.properties.stroke : true,
                color:  (feature.properties && feature.properties.color) ? feature.properties.color : "#3388ff", 
                opacity: (feature.properties && feature.properties.opacity) ? feature.properties.opacity : 1.0,
                fillOpacity: (feature.properties && feature.properties.fillOpacity) ? feature.properties.fillOpacity : 0.2
            });
        },
        style: function (feature) {
            return {
                radius: (feature.properties && feature.properties.radius) ? feature.properties.radius : 4,
                stroke: (feature.properties && feature.properties.stroke != undefined) ? feature.properties.stroke : true,
                weight: (feature.properties && feature.properties.weight) ? feature.properties.weight : 3,
                color:  (feature.properties && feature.properties.color) ? feature.properties.color : "#3388ff", 
                opacity: (feature.properties && feature.properties.opacity) ? feature.properties.opacity : 1.0,
                fillOpacity: (feature.properties && feature.properties.fillOpacity) ? feature.properties.fillOpacity : 0.2
            };
        },
        onEachFeature: function (feature, layer) {
            if (feature.properties && feature.properties.popup && feature.properties.popup.content) {
                if (feature.properties.popup.open) {
                    layer.bindPopup(feature.properties.popup.content).openPopup();
                } else {
                    layer.bindPopup(feature.properties.popup.content);
                }
            }
        },
    },
};
'''


def _num(v) -> str:
    """Go %v of a float64/int — Python repr is the same shortest
    round-trip representation for the doubles GeoJSON carries."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    r = repr(float(v))
    return r[:-2] if r.endswith(".0") else r


def _quote(s: str) -> str:
    """Go %q for the strings that appear in layer specs."""
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\r":
            out.append("\\r")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


class GeoFeature(dict):
    """A dict marked as a parsed GeoJSON Feature: MarshalJS renders it in
    the reference's FIELD order (id, geometry, type, bbox, properties —
    leafletobj.go *geojson.Feature arm) instead of sorted keys."""


def marshal_js(value) -> str:
    """leafletobj.go MarshalJS: sorted-key object literals with BARE keys,
    %q strings, %v numbers."""
    if value is None:
        return "null"
    if isinstance(value, GeoFeature):
        fields = []
        if value.get("id") is not None:
            fields.append(f"id:{marshal_js(value['id'])}")
        geom = value.get("geometry") or {}
        fields.append(
            "geometry:{coordinates:%s,type:%s}"
            % (marshal_js(geom.get("coordinates")),
               _quote(str(geom.get("type")))))
        fields.append(f"type:{marshal_js(value.get('type'))}")
        if value.get("bbox") is not None:
            fields.append(f"bbox:{marshal_js(value['bbox'])}")
        if value.get("properties") is not None:
            fields.append(f"properties:{marshal_js(value['properties'])}")
        return "{" + ",".join(fields) + "}"
    if isinstance(value, dict):
        fields = [f"{k}:{marshal_js(value[k])}" for k in sorted(value)]
        return "{" + ",".join(fields) + "}"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return _num(value)
    if isinstance(value, str):
        return _quote(value)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(marshal_js(v) for v in value) + "]"
    return _quote(str(value))


_GEOM_TYPES = {"Point", "MultiPoint", "LineString", "MultiLineString",
               "Polygon", "MultiPolygon", "GeometryCollection"}
_LEAFLET_TYPES = {"marker", "circleMarker", "circle", "polyline", "polygon"}


def _walk_lonlat(coord, extend):
    """GeoJSON coordinate tree: leaves are [lon, lat] pairs."""
    if not isinstance(coord, (list, tuple)) or not coord:
        return
    if all(isinstance(c, (int, float)) and not isinstance(c, bool)
           for c in coord):
        if len(coord) >= 2:
            extend(float(coord[1]), float(coord[0]))
        return
    for c in coord:
        _walk_lonlat(c, extend)


def _walk_latlon(coord, extend):
    """Leaflet coordinate tree: leaves are [lat, lon] pairs
    (leafletobj.go ConvCoordinates)."""
    if not isinstance(coord, (list, tuple)) or not coord:
        return
    if all(isinstance(c, (int, float)) and not isinstance(c, bool)
           for c in coord):
        if len(coord) == 2:
            extend(float(coord[0]), float(coord[1]))
        return
    for c in coord:
        _walk_latlon(c, extend)


class GeoMapBuilder:
    """Accumulate layers + the lat/lon bound; emit assets and envelope."""

    def __init__(self, geomap_id: str, width: str = "600px",
                 height: str = "600px", grayscale: float = 0.0,
                 zoom: int = 0, tile_template: str | None = None):
        self.id = geomap_id
        self.width, self.height = width, height
        self.grayscale = grayscale
        self.zoom = zoom
        self.tile = tile_template or \
            "https://tile.openstreetmap.org/{z}/{x}/{y}.png"
        self.layers: list[tuple[str, object, dict]] = []
        self.bound: list[float] | None = None  # [minLat, minLon, maxLat, maxLon]

    # ------------------------------------------------------------ layers

    def _extend(self, lat: float, lon: float) -> None:
        if self.bound is None:
            self.bound = [lat, lon, lat, lon]
        else:
            b = self.bound
            b[0], b[1] = min(b[0], lat), min(b[1], lon)
            b[2], b[3] = max(b[2], lat), max(b[3], lon)

    def add_value(self, val) -> None:
        """AddRow arm for one DICT record value (geomap.go:177-215 +
        leafletobj.go NewLayer): leaflet-typed layers extend the bound in
        [lat,lon] order and marshal their (popup-stripped) properties;
        GeoJSON objects extend in [lon,lat] order and marshal WHOLE —
        popups stay inline AND bind (matching the reference, whose layer
        Properties are an unmarshal copy while Coordinates alias the
        original map)."""
        if not isinstance(val, dict):
            return
        typ = val.get("type")
        if typ in _LEAFLET_TYPES:
            coord = val.get("coordinates")
            _walk_latlon(coord, self._extend)
            self.layers.append(
                (typ, coord, dict(val.get("properties") or {})))
        elif typ == "FeatureCollection":
            # a dict FC is ONE layer of the whole object; its top-level
            # popup is NOT a layer property (NewLayer FC arm sets none)
            for feat in val.get("features") or []:
                _walk_lonlat((feat.get("geometry") or {}).get("coordinates"),
                             self._extend)
            self.layers.append(("geoJSON", val, {}))
        elif typ == "Feature":
            _walk_lonlat((val.get("geometry") or {}).get("coordinates"),
                         self._extend)
            self.layers.append(("geoJSON", val,
                                dict(val.get("properties") or {})))
        elif typ in _GEOM_TYPES:
            _walk_lonlat(val.get("coordinates"), self._extend)
            self.layers.append(("geoJSON", val, {}))

    # ------------------------------------------------------------- emit

    def js_codes(self) -> list[str]:
        lines = [
            "var map;",
            "if (opt && opt.map) {",
            "  map = opt.map;",
            "  opt.map.eachLayer(function (layer) {",
            "    if (!(layer instanceof L.TileLayer)) {",
            "      opt.map.removeLayer(layer);",
            "    }",
            "  });",
            "} else {",
            f'  map = L.map("{self.id}", '
            "{crs: L.CRS.EPSG3857, attributionControl:false});",
            f'  L.tileLayer("{self.tile}").addTo(map);',
            "  opt.map = map;",
            "}",
        ]
        b = self.bound
        is_point = b is not None and b[0] == b[2] and b[1] == b[3]
        if b is not None and not is_point:
            lines.append(
                "opt.initBounds = [[%s,%s],[%s,%s]];"
                % (_num(b[0]), _num(b[1]), _num(b[2]), _num(b[3])))
            lines.append("map.fitBounds(opt.initBounds);")
        else:
            if b is not None:
                lat, lon = (b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0
            else:
                lat, lon = 51.505, -0.09  # <- London (geomap.go:231)
            zoom = self.zoom or 13
            lines.append("opt.initPoint = {center:[%s,%s], zoomLevel:%d};"
                         % (_num(lat), _num(lon), zoom))
            lines.append("map.setView(opt.initPoint.center, "
                         "opt.initPoint.zoomLevel);")
        for i, (typ, coord, props) in enumerate(self.layers):
            props = dict(props)
            popup = props.pop("popup", None)
            tooltip = props.pop("tooltip", None)
            if typ == "geoJSON":
                js = f"L.geoJSON({marshal_js(coord)},opt.geojson)"
            else:
                js = f"L.{typ}({marshal_js(coord)},{marshal_js(props)})"
            lines.append(f"var obj{i} = {js}.addTo(map);")
            for kind, m in (("Popup", popup), ("Tooltip", tooltip)):
                if not isinstance(m, dict):
                    continue
                m = dict(m)
                content = m.pop("content", "")
                open_ = bool(m.pop("open", False))
                suffix = f".open{kind}()" if open_ else ""
                lines.append(
                    f"var {kind.lower()}{i} = obj{i}.bind{kind}("
                    f"{_quote(str(content))}, {marshal_js(m)}){suffix};")
        return lines

    def opt_js(self) -> str:
        return MAP_OPTIONS_TEMPLATE % self.id

    def js(self) -> str:
        return "\n".join(["((opt)=>{", *self.js_codes(), f"}})({self.id});"])

    def html(self, page_title: str = "") -> str:
        """The default text/html rendering (rendertpls.go Header/Base/Html
        templates, compared trim-per-line by the reference's own test)."""
        g = int(100 * min(max(self.grayscale, 0.0), 1.0))
        env = self.envelope()
        head = [
            "<!DOCTYPE html>", "<html>", "<head>",
            '    <meta charset="UTF-8">',
            f"    <title>{page_title}</title>",
            "<style>",
            "    .geomap_container { width:100%; height:100%; display: "
            "flex;justify-content: center;align-items: center;}",
            "    .geomap_item {margin: auto;}",
            "    .leaflet-tile-pane{ -webkit-filter: grayscale(%d%%); "
            "filter: grayscale(%d%%);}" % (g, g),
            "</style>",
        ]
        head += [f'    <link href="{c}" rel="stylesheet">'
                 for c in env["cssAssets"]]
        head += [f'    <script src="{j}"></script>'
                 for j in env["jsAssets"]]
        head += ["</head>", ""]
        body = [
            '<body style="width:100vw; height:100vh">',
            '<div class="geomap_container">',
            f'    <div class="geomap_item" id="{self.id}" '
            f'style="width:{self.width};height:{self.height};"></div>',
            "</div>", "",
            "<script>",
            "    " + self.opt_js(),
            "    " + self.js(),
            "</script>", "</body>", "</html>",
        ]
        return "\n".join(head + body)

    def envelope(self) -> dict:
        g = min(max(self.grayscale, 0.0), 1.0)
        return {
            "geomapID": self.id,
            "style": {"width": self.width, "height": self.height,
                      "grayscale": int(100 * g)},
            "jsAssets": ["/web/geomap/leaflet.js"],
            "cssAssets": ["/web/geomap/leaflet.css"],
            "jsCodeAssets": [f"/web/api/tql-assets/{self.id}_opt.js",
                             f"/web/api/tql-assets/{self.id}.js"],
        }
