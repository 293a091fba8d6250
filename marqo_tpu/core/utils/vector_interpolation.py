"""Vector interpolation: LERP, NLERP, SLERP.

Parity: reference src/marqo/core/utils/vector_interpolation.py:49-237 —
weighted linear interpolation, normalized LERP, spherical LERP with
sequential reduction, zero-sum-weight and zero-magnitude error cases.
"""

import math
from abc import ABC, abstractmethod
from enum import Enum
from typing import List, Optional

import numpy as np

from marqo_tpu.core.exceptions import (InvalidArgumentError,
                                       ZeroMagnitudeVectorError)


class InterpolationMethod(str, Enum):
    LERP = "lerp"
    NLERP = "nlerp"
    SLERP = "slerp"


class VectorInterpolation(ABC):
    @abstractmethod
    def interpolate(self, vectors: List[List[float]],
                    weights: Optional[List[float]] = None) -> List[float]:
        ...

    @staticmethod
    def _validate(vectors, weights):
        if not vectors:
            raise InvalidArgumentError("No vectors to interpolate")
        if weights is None:
            weights = [1.0] * len(vectors)
        if len(weights) != len(vectors):
            raise InvalidArgumentError(
                f"Number of weights ({len(weights)}) must match number of "
                f"vectors ({len(vectors)})")
        return [np.asarray(v, dtype=np.float64) for v in vectors], \
            [float(w) for w in weights]


class Lerp(VectorInterpolation):
    def interpolate(self, vectors, weights=None) -> List[float]:
        vecs, ws = self._validate(vectors, weights)
        total = sum(ws)
        if total == 0:
            raise InvalidArgumentError(
                "Sum of weights is zero; cannot interpolate (lerp)")
        acc = sum(v * w for v, w in zip(vecs, ws)) / total
        return acc.tolist()


class Nlerp(VectorInterpolation):
    def interpolate(self, vectors, weights=None) -> List[float]:
        lerped = np.asarray(Lerp().interpolate(vectors, weights))
        norm = np.linalg.norm(lerped)
        if norm == 0:
            raise ZeroMagnitudeVectorError(
                "Interpolated vector has zero magnitude; cannot normalize "
                "(nlerp)")
        return (lerped / norm).tolist()


class Slerp(VectorInterpolation):
    """Spherical interpolation, sequentially reduced pairwise
    (reference slerp sequential reduction, vector_interpolation.py:121-237).
    """

    def __init__(self, epsilon: float = 1e-9):
        self.epsilon = epsilon

    def _slerp_pair(self, v0: np.ndarray, v1: np.ndarray, t: float) -> np.ndarray:
        n0, n1 = np.linalg.norm(v0), np.linalg.norm(v1)
        if n0 == 0 or n1 == 0:
            raise ZeroMagnitudeVectorError(
                "Cannot slerp a zero-magnitude vector")
        u0, u1 = v0 / n0, v1 / n1
        dot = float(np.clip(np.dot(u0, u1), -1.0, 1.0))
        theta = math.acos(dot)
        if abs(theta) < self.epsilon:
            return v0 * (1 - t) + v1 * t  # nearly parallel: fall back to lerp
        sin_theta = math.sin(theta)
        return (math.sin((1 - t) * theta) / sin_theta) * v0 + \
            (math.sin(t * theta) / sin_theta) * v1

    def interpolate(self, vectors, weights=None) -> List[float]:
        vecs, ws = self._validate(vectors, weights)
        if len(vecs) == 1:
            return vecs[0].tolist()
        acc = vecs[0]
        acc_weight = ws[0]
        for vec, w in zip(vecs[1:], ws[1:]):
            total = acc_weight + w
            if total == 0:
                raise InvalidArgumentError(
                    "Sum of weights is zero; cannot interpolate (slerp)")
            t = w / total
            acc = self._slerp_pair(acc, vec, t)
            acc_weight = total
        return acc.tolist()


def from_interpolation_method(method: InterpolationMethod) -> VectorInterpolation:
    if method == InterpolationMethod.LERP:
        return Lerp()
    if method == InterpolationMethod.NLERP:
        return Nlerp()
    if method == InterpolationMethod.SLERP:
        return Slerp()
    raise InvalidArgumentError(f"Unknown interpolation method {method}")
