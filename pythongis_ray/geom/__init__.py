"""Pure-numpy geometry kernel.

Neither shapely nor any compiled GEOS binding exists in this
environment, so the engine carries its own vectorized geometry layer:

wkb      WKB encode/decode (Point, LineString, Polygon, Multi*)
algo     planar predicates & measures (point-in-polygon crossing test,
         bbox, area, length, centroid, point/segment distances,
         polygon-polygon intersects, rectangle clip)
geodesy  great-circle / Vincenty measures and geodetic point buffers
         (semantics of /root/reference/pythongis/vector/_helpers.py)

Design note: the reference stores geometries as GeoJSON dicts per
Feature (/root/reference/pythongis/vector/data.py:132-139); here the
canonical storage is a ``geometry: binary`` Arrow column holding WKB,
with a sidecar bbox struct computed at ingest, so blocks stay zero-copy
Arrow end to end.
"""

from pythongis_ray.geom import algo, geodesy, wkb  # noqa: F401
