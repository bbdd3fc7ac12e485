"""Pure-NumPy LoOP math (no Ray). Parity target: reference PyNomaly v0.4.0."""

from pynomaly_ray.loop_core.core import (
    ClusterSizeError,
    LocalOutlierProbability,
    MissingValuesError,
    PyNomalyError,
    ValidationError,
    erf_vec,
)

__all__ = [
    "ClusterSizeError",
    "LocalOutlierProbability",
    "MissingValuesError",
    "PyNomalyError",
    "ValidationError",
    "erf_vec",
]
