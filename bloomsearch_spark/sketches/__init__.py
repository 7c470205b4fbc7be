"""Mergeable sketch library (the north rule's HLL / count-min / t-digest /
KLL / Bloom family) — built from scratch as numpy-kernel states with
associative merges, serialized partials, and the shared two-stage Spark
pipeline in ``pipeline.py`` (map-side partials -> manifest-sized merge).
The Bloom member of the family is both the engine itself (``bloomsearch_
spark.bloom`` + the index build plans) and a first-class sketch UDAF
(``bloomsketch.BloomSketch`` through the same pipeline)."""

from .bloomsketch import BloomSketch
from .countmin import CountMin
from .hll import HLL
from .kll import KLL
from .pipeline import estimate_col, sketch_merged, sketch_partials
from .tdigest import TDigest

__all__ = [
    "HLL",
    "BloomSketch",
    "CountMin",
    "KLL",
    "TDigest",
    "estimate_col",
    "sketch_merged",
    "sketch_partials",
]
