"""Ported reference tests: vector interpolation golden values.

Source: /root/reference/tests/core/utils/test_vector_interpolation.py —
LERP weighted means (incl. zero vectors), SLERP sequential golden cases
(45-degree rotation, identical-vector collapse), zero-sum-weight and
shape-mismatch errors, statelessness.
"""

import math

import numpy as np
import pytest

from marqo_tpu.core.utils.vector_interpolation import (Lerp, Nlerp, Slerp,
                                                       SlerpMethod)

RT = math.sqrt(0.5)


class TestLerp:
    CASES = [
        ([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1]], [1, 1, 1, 1],
         [1 / 4, 1 / 4, 1 / 2], "equal weights"),
        ([[1, 0, 0], [0, 1, 0], [0, 0, 1]], [3, 1, 1],
         [3 / 5, 1 / 5, 1 / 5], "different weights"),
        ([[RT, RT, 0]], [1], [RT, RT, 0], "single vector"),
        ([[RT, RT, 0]], [2], [RT, RT, 0], "single vector weight 2"),
        ([[RT, RT, 0]] * 2, [1] * 2, [RT, RT, 0], "same vector x2"),
        ([[RT, RT, 0]] * 5, [1] * 5, [RT, RT, 0], "same vector x5"),
        ([[1, 0, 0], [0, 0, 0], [0, 0, 1]], [1, 1, 1],
         [1 / 3, 0, 1 / 3], "zero vector"),
        ([[0, 0, 0]] * 3, [1, 1, 1], [0, 0, 0], "all zero vectors"),
    ]

    @pytest.mark.parametrize("vectors,weights,expected,msg", CASES)
    def test_lerp_golden(self, vectors, weights, expected, msg):
        lerp = Lerp()
        np.testing.assert_array_almost_equal(
            lerp.interpolate(vectors, weights), expected, decimal=5)

    def test_zero_sum_weights_fail(self):
        with pytest.raises(Exception):
            Lerp().interpolate([[1, 0], [0, 1]], [1, -1])

    def test_shape_mismatch_fails(self):
        with pytest.raises(Exception):
            Lerp().interpolate([[1, 0], [0, 1, 0]], [1, 1])
        with pytest.raises(Exception):
            Lerp().interpolate([[1, 0], [0, 1]], [1, 1, 1])

    def test_empty_vectors_fail(self):
        with pytest.raises(Exception):
            Lerp().interpolate([], [])


class TestNlerp:
    def test_result_is_normalized(self):
        out = np.asarray(Nlerp().interpolate(
            [[2, 0, 0], [0, 2, 0]], [1, 1]))
        np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-6)
        np.testing.assert_array_almost_equal(out, [RT, RT, 0], decimal=5)

    def test_zero_magnitude_fails(self):
        with pytest.raises(Exception):
            Nlerp().interpolate([[1, 0], [-1, 0]], [1, 1])


class TestSlerpSequential:
    CASES = [
        ([[RT, RT, 0]], [1], [RT, RT, 0], "single vector"),
        ([[RT, RT, 0]] * 2, [1] * 2, [RT, RT, 0], "same vector x2"),
        ([[RT, RT, 0]] * 5, [1] * 5, [RT, RT, 0], "same vector x5"),
        ([[1, 0, 0], [0, 1, 0]], [0.5, 0.5],
         [math.sqrt(2) / 2, math.sqrt(2) / 2, 0],
         "45 degree rotation around z"),
    ]

    @pytest.mark.parametrize("vectors,weights,expected,msg", CASES)
    def test_slerp_sequential_golden(self, vectors, weights, expected, msg):
        slerp = Slerp(SlerpMethod.SEQUENTIAL)
        np.testing.assert_array_almost_equal(
            slerp.interpolate(vectors, weights), expected, decimal=5)

    @pytest.mark.parametrize("vectors,weights,expected,msg", CASES)
    def test_slerp_hierarchical_golden(self, vectors, weights, expected,
                                       msg):
        slerp = Slerp(SlerpMethod.HIERARCHICAL)
        np.testing.assert_array_almost_equal(
            slerp.interpolate(vectors, weights), expected, decimal=5)

    def test_colinear_vectors(self):
        out = Slerp(SlerpMethod.SEQUENTIAL).interpolate(
            [[1, 0, 0], [1, 0, 0]], [1, 3])
        np.testing.assert_array_almost_equal(out, [1, 0, 0], decimal=5)

    def test_zero_sum_pair_fails(self):
        with pytest.raises(Exception) as e:
            Slerp(SlerpMethod.SEQUENTIAL).interpolate(
                [[1, 0], [0, 1]], [1, -1])
        assert "SLERP" in str(e.value) or "zero" in str(e.value).lower()

    def test_stateless_reuse(self):
        slerp = Slerp(SlerpMethod.SEQUENTIAL)
        a = slerp.interpolate([[1, 0, 0], [0, 1, 0]], [0.5, 0.5])
        b = slerp.interpolate([[1, 0, 0], [0, 1, 0]], [0.5, 0.5])
        np.testing.assert_array_equal(a, b)
