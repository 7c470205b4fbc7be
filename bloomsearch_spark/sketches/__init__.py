"""Mergeable sketch library (the north rule's HLL / count-min / t-digest /
KLL / Bloom family) — built from scratch as numpy-kernel states with
associative merges, serialized partials, and the shared two-stage Spark
pipeline in ``pipeline.py`` (map-side partials -> manifest-sized merge).
The Bloom member of the family is the engine itself (``bloomsearch_spark.
bloom`` + the index build plans)."""

from .countmin import CountMin
from .hll import HLL
from .kll import KLL
from .pipeline import estimate_col, sketch_merged, sketch_partials
from .tdigest import TDigest

__all__ = [
    "HLL",
    "CountMin",
    "KLL",
    "TDigest",
    "estimate_col",
    "sketch_merged",
    "sketch_partials",
]
