"""End-to-end pipelines (the layer-15 "CLI" of the reference:
`pytests/sfm_pipeline.py`, `pyexamples/*.py`) as importable library code."""

from . import fountain, synthetic_global  # noqa: F401
