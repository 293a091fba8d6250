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


class SlerpMethod(str, Enum):
    SEQUENTIAL = "sequential"
    HIERARCHICAL = "hierarchical"


class Slerp(VectorInterpolation):
    """Spherical interpolation with two reduction orders (reference
    vector_interpolation.py:121-237): SEQUENTIAL folds left-to-right,
    HIERARCHICAL (the reference's DEFAULT, :126-128) pairwise-reduces like
    a balanced tree — order-robust and the semantics recommend() users get.
    Both halve the combined weight after each pair (reference :207, :227),
    so later vectors keep proportionate influence."""

    def __init__(self, method: SlerpMethod = SlerpMethod.HIERARCHICAL,
                 epsilon: float = 1e-9):
        self.method = method
        self.epsilon = epsilon

    def _slerp_pair(self, v0: np.ndarray, v1: np.ndarray, t: float) -> np.ndarray:
        n0, n1 = np.linalg.norm(v0), np.linalg.norm(v1)
        if n0 == 0 or n1 == 0:
            raise ZeroMagnitudeVectorError(
                "Cannot slerp a zero-magnitude vector")
        u0, u1 = v0 / n0, v1 / n1
        dot = float(np.clip(np.dot(u0, u1), -1.0, 1.0))
        theta = math.acos(dot)
        if abs(theta) < self.epsilon or math.sin(theta) == 0:
            return v0 * (1 - t) + v1 * t  # co-linear: fall back to lerp
        sin_theta = math.sin(theta)
        return (math.sin((1 - t) * theta) / sin_theta) * v0 + \
            (math.sin(t * theta) / sin_theta) * v1

    def _pair_t(self, w0: float, w1: float) -> float:
        total = w0 + w1
        if total == 0:
            raise InvalidArgumentError(
                f"Sum of weights {w0} and {w1} is zero. SLERP cannot "
                f"interpolate vectors with a sum weight of zero")
        return w1 / total

    def interpolate(self, vectors, weights=None) -> List[float]:
        vecs, ws = self._validate(vectors, weights)
        if len(vecs) == 1:
            return vecs[0].tolist()
        if self.method == SlerpMethod.SEQUENTIAL:
            return self._interpolate_sequential(vecs, ws)
        return self._interpolate_hierarchical(vecs, ws)

    def _interpolate_sequential(self, vecs, ws) -> List[float]:
        acc = vecs[0]
        acc_weight = ws[0]
        for vec, w in zip(vecs[1:], ws[1:]):
            acc = self._slerp_pair(acc, vec, self._pair_t(acc_weight, w))
            # reference :207 — combined weight halves after each fold
            acc_weight = (acc_weight + w) / 2
        return acc.tolist()

    def _interpolate_hierarchical(self, vecs, ws) -> List[float]:
        while len(vecs) > 1:
            next_vecs, next_ws = [], []
            for i in range(0, len(vecs), 2):
                if i + 1 == len(vecs):  # odd tail passes through
                    next_vecs.append(vecs[i])
                    next_ws.append(ws[i])
                    continue
                next_vecs.append(np.asarray(self._slerp_pair(
                    vecs[i], vecs[i + 1], self._pair_t(ws[i], ws[i + 1]))))
                next_ws.append((ws[i] + ws[i + 1]) / 2)
            vecs, ws = next_vecs, next_ws
        return vecs[0].tolist() if hasattr(vecs[0], "tolist") else vecs[0]


def from_interpolation_method(method: InterpolationMethod) -> VectorInterpolation:
    if method == InterpolationMethod.LERP:
        return Lerp()
    if method == InterpolationMethod.NLERP:
        return Nlerp()
    if method == InterpolationMethod.SLERP:
        return Slerp()
    raise InvalidArgumentError(f"Unknown interpolation method {method}")
