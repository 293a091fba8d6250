"""JAX-accelerated exact vector scoring for the store engine.

SURVEY.md §2.2: "optionally a JAX/Pallas brute-force/IVF scorer … sharded
across TPU devices" — the exact (``approximate=False``) path scores every
chunk; numpy on the API host's CPU tops out around 1 GFLOP/s, while one
accelerator matmul covers millions of vectors per query. The field matrix
is cached on the device (re-uploaded only after mutations) and top-k runs
via ``lax.top_k`` so only k ids/scores return to the host.

Used when the corpus is large enough to amortize dispatch and a non-CPU
device is healthy; numpy remains the fallback (and the CPU-test path).
"""

from typing import Optional, Tuple

import numpy as np

from marqo_tpu.logging import get_logger

logger = get_logger(__name__)

# below this row count numpy wins (device dispatch ≈ ms)
MIN_ROWS_FOR_DEVICE = 50_000
_MAX_K = 4096


def device_available() -> bool:
    try:
        import jax
        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


class JaxExactScorer:
    """Device-resident (N, d) matrix with top-k closeness scoring."""

    def __init__(self, metric: str = "prenormalized-angular"):
        self.metric = metric
        self._device_matrix = None
        self._version = -1

    def _ensure(self, matrix: np.ndarray, version: int):
        import jax
        import jax.numpy as jnp
        if self._device_matrix is None or self._version != version:
            self._device_matrix = jax.device_put(
                jnp.asarray(matrix, dtype=jnp.bfloat16))
            self._version = version

    def top_k(self, matrix: np.ndarray, version: int, query: np.ndarray,
              k: int, valid_mask: np.ndarray
              ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Returns (row_indices, closeness_scores) of the top-k valid rows,
        or None when the device path shouldn't be used."""
        if matrix.shape[0] < MIN_ROWS_FOR_DEVICE or not device_available():
            return None
        if self.metric not in ("dotproduct", "euclidean", "angular",
                               "prenormalized-angular"):
            # hamming/geodegrees: no device kernel — the else-branch below
            # would silently score prenorm-angular; use the numpy exact
            # path instead
            return None
        try:
            import jax
            import jax.numpy as jnp
            self._ensure(matrix, version)
            k = min(k, _MAX_K, matrix.shape[0])
            q = jnp.asarray(query, dtype=jnp.bfloat16)
            mask = jnp.asarray(valid_mask)

            @jax.jit
            def score(m, qv, valid):
                if self.metric == "dotproduct":
                    s = (m @ qv).astype(jnp.float32)
                elif self.metric == "euclidean":
                    d2 = jnp.sum((m.astype(jnp.float32) -
                                  qv.astype(jnp.float32)[None]) ** 2, axis=1)
                    s = 1.0 / (1.0 + jnp.sqrt(d2))
                elif self.metric == "angular":
                    # true angle on possibly non-unit vectors: matches the
                    # numpy exact path (closeness = 1/(1+arccos))
                    mf = m.astype(jnp.float32)
                    qf = qv.astype(jnp.float32)
                    mn = jnp.maximum(jnp.linalg.norm(mf, axis=1), 1e-12)
                    qn = jnp.maximum(jnp.linalg.norm(qf), 1e-12)
                    cos = jnp.clip((mf @ qf) / (mn * qn), -1.0, 1.0)
                    s = 1.0 / (1.0 + jnp.arccos(cos))
                else:  # prenormalized-angular (unit vectors by contract)
                    s = (1.0 / (2.0 - (m @ qv).astype(jnp.float32)))
                s = jnp.where(valid, s, -jnp.inf)
                return jax.lax.top_k(s, k)

            scores, idx = score(self._device_matrix, q, mask)
            scores = np.asarray(scores)
            idx = np.asarray(idx)
            keep = np.isfinite(scores)
            return idx[keep], scores[keep]
        except Exception as e:
            logger.warning(f"Device exact scoring failed ({e}); numpy fallback")
            return None
