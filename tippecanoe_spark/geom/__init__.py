"""Pure-numpy geometry kernels (no GEOS/shapely in this environment).

Modules:
- :mod:`clip` — Cohen–Sutherland line clip, Sutherland–Hodgman polygon
  clip, point-in-polygon (reference: clip.cpp)
- :mod:`simplify` — Douglas–Peucker / Visvalingam (reference:
  clip.cpp:909-1001, visvalingam.cpp)
- :mod:`polygon` — winding, signed area, tiny-polygon accumulation
  (reference: clip.cpp:1048-1140, 1755-1901)
"""
