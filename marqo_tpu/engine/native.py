"""ctypes bindings for the native C++ engine (libmarqo_engine.so).

Builds the shared library on first use (g++, see engine/cpp/Makefile) and
degrades gracefully to the Python/numpy paths when no toolchain is present.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from marqo_tpu.logging import get_logger

logger = get_logger(__name__)

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libmarqo_engine.so")
_lib = None
_lib_lock = threading.Lock()
_build_failed = False

# descriptor metric → native metric id (hnsw.cpp Metric enum)
METRIC_IDS = {
    "prenormalized-angular": 0,
    "euclidean": 1,
    "dotproduct": 2,
    "angular": 3,        # native 1-cos with a per-node norm cache
}

# vector cell type → native cell id (hnsw.cpp CellType enum; Vespa tensor
# cell-type option / marqo vectorNumericType — bfloat16 halves vector memory)
CELL_IDS = {"float32": 0, "bfloat16": 1}

# the graph-only external-storage ABI; a stale .so is detected and rebuilt
ENGINE_ABI_VERSION = 2


def _build() -> bool:
    try:
        subprocess.run(["make", "-s"], cwd=_CPP_DIR, check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        logger.warning(f"Native engine build failed ({e}); using Python "
                       f"fallback paths")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning(f"Could not load native engine: {e}")
            _build_failed = True
            return None
        # a stale .so from an older build misses newer symbols or speaks an
        # older ABI: rebuild once and reload instead of raising
        # AttributeError / silently corrupting memory on every call
        def _stale(candidate) -> bool:
            if not hasattr(candidate, "engine_abi_version") or \
                    not hasattr(candidate, "bm25_add_raw"):
                return True
            candidate.engine_abi_version.restype = ctypes.c_int32
            return candidate.engine_abi_version() != ENGINE_ABI_VERSION

        if _stale(lib):
            logger.warning("Native engine binary is stale (ABI mismatch); "
                           "rebuilding")
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            if not _build():
                _build_failed = True
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            if _stale(lib):
                logger.warning("Rebuilt native engine still has an ABI "
                               "mismatch; using Python fallback paths")
                _build_failed = True
                return None
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.c_uint64]
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        lib.hnsw_link.restype = ctypes.c_int32
        lib.hnsw_link.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int32, ctypes.c_int32]
        lib.hnsw_remove.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.hnsw_size.restype = ctypes.c_int32
        lib.hnsw_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_capacity.restype = ctypes.c_int32
        lib.hnsw_capacity.argtypes = [ctypes.c_void_p]
        lib.hnsw_search.restype = ctypes.c_int
        lib.hnsw_search.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        lib.hnsw_save_size.restype = ctypes.c_int64
        lib.hnsw_save_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_save.restype = ctypes.c_int64
        lib.hnsw_save.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int64]
        lib.hnsw_load.restype = ctypes.c_void_p
        lib.hnsw_load.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int64]
        # bm25
        lib.bm25_create.restype = ctypes.c_void_p
        lib.bm25_free.argtypes = [ctypes.c_void_p]
        lib.bm25_add_raw.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                     ctypes.c_char_p]
        lib.bm25_add.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                 ctypes.c_char_p]
        lib.bm25_remove.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.bm25_num_docs.restype = ctypes.c_int32
        lib.bm25_num_docs.argtypes = [ctypes.c_void_p]
        lib.bm25_score.restype = ctypes.c_int
        lib.bm25_score.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32]
        lib.bm25_phrase_docs.restype = ctypes.c_int
        lib.bm25_phrase_docs.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.bm25_idf.restype = ctypes.c_float
        lib.bm25_idf.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.bm25_score_global.restype = ctypes.c_int
        lib.bm25_score_global.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32]
        lib.bm25_stats.restype = ctypes.c_int64
        lib.bm25_stats.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        logger.info("Native engine loaded (libmarqo_engine.so)")
        return _lib


def native_available() -> bool:
    return get_lib() is not None


class NativeHnsw:
    """One HNSW graph over EXTERNAL vector storage (ABI v2).

    The graph holds no vector data: the caller owns ONE contiguous
    (capacity, dim) array — float32 or bfloat16 cells — and passes it to
    every call. Node ids ARE row indices into that array, so the single
    fp32 copy the Python store keeps is the only copy in the process
    (Vespa's attribute store is likewise the one owner of tensor cells;
    its HNSW references attribute ids). Not thread-safe; callers hold the
    shard lock, which also guarantees the base pointer is stable for the
    duration of each call even though the store reallocates on growth
    between calls.
    """

    def __init__(self, dim: int, m: int = 16, ef_construction: int = 512,
                 metric: str = "prenormalized-angular",
                 cell_dtype: str = "float32", seed: int = 42,
                 _handle=None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native engine unavailable")
        self._lib = lib
        self.dim = dim
        self.metric = metric
        self.cell_dtype = cell_dtype
        if cell_dtype not in CELL_IDS:
            raise ValueError(f"unsupported cell dtype: {cell_dtype}")
        if metric not in METRIC_IDS:
            # fail LOUDLY: silently defaulting to prenorm-angular would
            # return wrong neighbors for hamming/geodegrees indexes
            raise ValueError(f"metric `{metric}` has no native distance "
                             "kernel (exact scoring handles it)")
        if _handle is not None:
            self._handle = _handle
        else:
            self._handle = lib.hnsw_create(
                dim, m, ef_construction,
                METRIC_IDS[metric], CELL_IDS[cell_dtype], seed)

    def _base_ptr(self, store: np.ndarray, min_rows: int):
        if store.ndim != 2 or store.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) store array")
        if not store.flags["C_CONTIGUOUS"]:
            raise ValueError("store array must be C-contiguous")
        if store.itemsize != (4 if self.cell_dtype == "float32" else 2):
            raise ValueError(f"store dtype {store.dtype} does not match "
                             f"cell dtype {self.cell_dtype}")
        if store.shape[0] < min_rows:
            raise ValueError(f"store has {store.shape[0]} rows; graph "
                             f"needs {min_rows}")
        return ctypes.c_void_p(store.ctypes.data)

    def link(self, store: np.ndarray, n_total: int, n_threads: int = 0
             ) -> int:
        """Link rows [capacity, n_total) of ``store`` into the graph
        (parallel across n_threads with per-node locks; role parity with
        Vespa's multi-threaded feed into its HNSW). Returns the first new
        node id; ids are contiguous row indices."""
        if n_threads <= 0:
            n_threads = os.cpu_count() or 1
        return self._lib.hnsw_link(
            self._handle, self._base_ptr(store, n_total), n_total, n_threads)

    def remove(self, node_id: int) -> None:
        self._lib.hnsw_remove(self._handle, node_id)

    def __len__(self) -> int:
        return self._lib.hnsw_size(self._handle)

    @property
    def capacity(self) -> int:
        return self._lib.hnsw_capacity(self._handle)

    def search(self, store: np.ndarray, query: np.ndarray, k: int, ef: int,
               filter_mask: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (node_ids, distances), ascending distance. The query is
        always float32 regardless of cell dtype."""
        query = np.ascontiguousarray(query, dtype=np.float32)
        out_ids = np.empty(k, dtype=np.int32)
        out_dists = np.empty(k, dtype=np.float32)
        mask_ptr = None
        if filter_mask is not None:
            filter_mask = np.ascontiguousarray(filter_mask, dtype=np.uint8)
            mask_ptr = filter_mask.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8))
        n = self._lib.hnsw_search(
            self._handle, self._base_ptr(store, self.capacity),
            query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            k, ef, mask_ptr, out_ids.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            out_dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out_ids[:n], out_dists[:n]

    def save(self) -> bytes:
        """Graph-only blob (vectors are snapshotted by the owning store)."""
        size = self._lib.hnsw_save_size(self._handle)
        buf = np.empty(size, dtype=np.uint8)
        written = self._lib.hnsw_save(
            self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size)
        if written < 0:
            raise RuntimeError("hnsw_save failed")
        return buf[:written].tobytes()

    @classmethod
    def load(cls, blob: bytes, metric: str = "prenormalized-angular"
             ) -> "NativeHnsw":
        """Rejects malformed/truncated blobs AND pre-v2 blobs (which embed
        vectors the graph no longer owns) — callers fall back to a lazy
        graph rebuild from the store's vectors."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native engine unavailable")
        if len(blob) < 40:  # magic+abi+8-int32 header
            raise ValueError("HNSW snapshot blob truncated")
        buf = np.frombuffer(blob, dtype=np.uint8)
        handle = lib.hnsw_load(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(blob))
        if not handle:  # malformed, corrupt, or legacy-format blob
            raise ValueError("HNSW snapshot blob malformed or pre-v2; "
                             "caller should fall back to a lazy rebuild")
        header = np.frombuffer(blob[:40], dtype=np.int32)
        dim = int(header[2])
        cell = int(header[6])
        cell_dtype = {v: k for k, v in CELL_IDS.items()}.get(cell, "float32")
        return cls(dim, metric=metric, cell_dtype=cell_dtype, _handle=handle)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.hnsw_free(self._handle)
                self._handle = None
        except Exception:
            pass


class NativeBm25:
    """One BM25 field index over int32 doc handles. Not thread-safe;
    callers hold the shard lock. Tokens must be pre-normalized,
    space-separated (the engine tokenizer guarantees this)."""

    MAX_RESULTS = 65536

    def __init__(self):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native engine unavailable")
        self._lib = lib
        self._handle = lib.bm25_create()

    def add(self, doc: int, tokens: str) -> None:
        self._lib.bm25_add(self._handle, doc, tokens.encode("utf-8"))

    def add_raw(self, doc: int, text: str) -> None:
        """Raw text in; tokenization happens in C++ (byte-identical to the
        Python engine tokenizer — see bm25.cpp bm25_add_raw)."""
        # NUL bytes would truncate the C string; they are separators in
        # the Python tokenizer, so map them to spaces
        self._lib.bm25_add_raw(self._handle, doc,
                               text.encode("utf-8").replace(b"\x00", b" "))

    def remove(self, doc: int) -> None:
        self._lib.bm25_remove(self._handle, doc)

    def __len__(self) -> int:
        return self._lib.bm25_num_docs(self._handle)

    def score(self, terms: str, allowed_mask: Optional[np.ndarray] = None,
              idfs: Optional[np.ndarray] = None,
              avgdl: Optional[float] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        """Top scored docs. When `idfs` (per-term, aligned with the
        space-separated term order) and `avgdl` are given, they replace the
        local corpus statistics — cluster global-IDF scoring."""
        out_docs = np.empty(self.MAX_RESULTS, dtype=np.int32)
        out_scores = np.empty(self.MAX_RESULTS, dtype=np.float32)
        mask_ptr, mask_len = None, 0
        if allowed_mask is not None:
            allowed_mask = np.ascontiguousarray(allowed_mask, dtype=np.uint8)
            mask_ptr = allowed_mask.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8))
            mask_len = len(allowed_mask)
        docs_ptr = out_docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        scores_ptr = out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if idfs is not None:
            idfs = np.ascontiguousarray(idfs, dtype=np.float32)
            n = self._lib.bm25_score_global(
                self._handle, terms.encode("utf-8"), mask_ptr, mask_len,
                idfs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                float(avgdl if avgdl and avgdl > 0 else 1.0),
                docs_ptr, scores_ptr, self.MAX_RESULTS)
        else:
            n = self._lib.bm25_score(
                self._handle, terms.encode("utf-8"), mask_ptr, mask_len,
                docs_ptr, scores_ptr, self.MAX_RESULTS)
        return out_docs[:n].copy(), out_scores[:n].copy()

    def stats(self, terms: str) -> Tuple[int, int, np.ndarray]:
        """(live_doc_count, total_token_length, per-term document
        frequencies aligned with the space-separated term order)."""
        term_count = len(terms.split())
        out_df = np.zeros(max(term_count, 1), dtype=np.int64)
        total_len = ctypes.c_int64(0)
        n_docs = self._lib.bm25_stats(
            self._handle, terms.encode("utf-8"),
            out_df.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(out_df), ctypes.byref(total_len))
        return int(n_docs), int(total_len.value), out_df[:term_count].copy()

    def phrase_docs(self, phrase: str) -> np.ndarray:
        out = np.empty(self.MAX_RESULTS, dtype=np.int32)
        n = self._lib.bm25_phrase_docs(
            self._handle, phrase.encode("utf-8"),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.MAX_RESULTS)
        return out[:n].copy()

    def idf(self, term: str) -> float:
        return float(self._lib.bm25_idf(self._handle, term.encode("utf-8")))

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bm25_free(self._handle)
                self._handle = None
        except Exception:
            pass
