"""pynomaly_ray — a Ray-Data-native schema + constraint validation engine.

The distribution-drift detector is an exact from-scratch reimplementation of
PyNomaly's LoOP math (``pynomaly_ray.loop_core``); everything else is a
streaming ``ray.data.Dataset`` pipeline of zero-copy Arrow ``map_batches``
kernels, groupby shuffles, and stateful actor stages.

Public surface:

- ``loop_core``: LoOP core + the reference-compatible exception hierarchy.
- ``stages``: per-batch validators, stats partials, dedup, text analysis.
- ``pipelines``: end-to-end validation pipeline (violations + partition
  stats + LoOP drift + lineage manifest + resume).
"""

from pynomaly_ray.loop_core import (
    ClusterSizeError,
    LocalOutlierProbability,
    MissingValuesError,
    PyNomalyError,
    ValidationError,
)

__version__ = "0.1.0"

__all__ = [
    "ClusterSizeError",
    "LocalOutlierProbability",
    "MissingValuesError",
    "PyNomalyError",
    "ValidationError",
    "__version__",
]
