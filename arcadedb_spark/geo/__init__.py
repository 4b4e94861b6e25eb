"""Geospatial layer: WKT geometry kernel + Spark bindings.

Reference surface: function/sql/geo/*.java (26 files, JTS/spatial4j)
and query/sql/method/geo/*.java.  See core.py for parity notes and
documented approximations.
"""
