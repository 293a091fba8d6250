"""bfloat16 vector-cell storage, end to end through the engine.

Role parity: Vespa's bfloat16 tensor cell type selected by the index
setting vectorNumericType (reference marqo_index.py VectorNumericType,
vespa_schema tensor cell type) — halves vector memory; ANN and exact
scoring both read the single bf16 store copy.
"""

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import (IndexDescriptor,
                                         TensorFieldDescriptor)
from marqo_tpu.engine.store import StoreEngine, np_cell_dtype


def _mk_engine(cell_dtype="bfloat16", dim=32):
    eng = StoreEngine()
    eng.create_index(IndexDescriptor(
        name="bf", model_dimensions=dim, cell_dtype=cell_dtype,
        tensor_fields=[TensorFieldDescriptor(
            name="v", dimensions=dim,
            distance_metric="prenormalized-angular")]))
    return eng


def _feed(eng, n, dim, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(n):
        eng.feed("bf", f"d{i}", {"n": i},
                 {"v": {"chunks": [f"c{i}"], "embeddings": [vecs[i]]}})
    return vecs


class TestBf16CellStore:
    def test_store_is_half_the_bytes(self):
        dim = 32
        eng16 = _mk_engine("bfloat16", dim)
        eng32 = _mk_engine("float32", dim)
        _feed(eng16, 100, dim)
        _feed(eng32, 100, dim)
        ts16 = eng16._indexes["bf"][0].tensors["v"]
        ts32 = eng32._indexes["bf"][0].tensors["v"]
        assert ts16.matrix()[0].dtype == np_cell_dtype("bfloat16")
        assert ts16.matrix()[0].nbytes * 2 == ts32.matrix()[0].nbytes

    def test_exact_search_ranks_like_fp32(self):
        dim = 32
        eng = _mk_engine("bfloat16", dim)
        vecs = _feed(eng, 300, dim)
        q = vecs[17]
        res = eng.query_tensor("bf", q, limit=5, approximate=False)
        assert res.hits[0].doc_id == "d17"
        assert res.hits[0].score > 0.99  # bf16 rounding only

    def test_approximate_search_through_bf16_hnsw(self):
        from marqo_tpu.engine.native import native_available
        if not native_available():
            pytest.skip("native engine not built")
        dim = 32
        eng = _mk_engine("bfloat16", dim)
        vecs = _feed(eng, 2000, dim)  # above APPROX_MIN_ROWS → HNSW path
        sims = vecs @ vecs[42]
        truth = set(f"d{i}" for i in np.argsort(-sims)[:10])
        res = eng.query_tensor("bf", vecs[42], limit=10, approximate=True)
        got = {h.doc_id for h in res.hits}
        assert len(truth & got) >= 9, (truth, got)

    def test_get_tensors_returns_json_floats(self):
        dim = 8
        eng = _mk_engine("bfloat16", dim)
        _feed(eng, 3, dim)
        import json
        out = eng.get_tensors("bf", "d1")
        json.dumps(out)  # must serialize
        assert len(out["v"][0]["embedding"]) == dim
        assert isinstance(out["v"][0]["embedding"][0], float)

    def test_snapshot_restore_preserves_cell_dtype(self, tmp_path):
        from marqo_tpu.engine.native import native_available
        dim = 16
        eng = _mk_engine("bfloat16", dim)
        vecs = _feed(eng, 1500, dim)
        if native_available():
            # materialize the HNSW so the graph-only blob is exercised
            eng.query_tensor("bf", vecs[0], limit=5, approximate=True)
        eng.snapshot(str(tmp_path))
        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        ts = fresh._indexes["bf"][0].tensors["v"]
        assert ts.cell_dtype == "bfloat16"
        assert ts.matrix()[0].dtype == np_cell_dtype("bfloat16")
        res = fresh.query_tensor("bf", vecs[7], limit=1, approximate=False)
        assert res.hits[0].doc_id == "d7"

    def test_upsert_and_delete_tombstones(self):
        dim = 8
        eng = _mk_engine("bfloat16", dim)
        _feed(eng, 10, dim)
        unit = np.ones(dim, np.float32) / np.sqrt(dim)
        eng.feed("bf", "d3", {"n": 3},
                 {"v": {"chunks": ["new"], "embeddings": [unit]}})
        eng.delete("bf", "d5")
        res = eng.query_tensor("bf", unit, limit=3, approximate=False)
        assert res.hits[0].doc_id == "d3"
        assert all(h.doc_id != "d5" for h in res.hits)
