"""In-process index-metadata cache with a background refresh daemon.

Parity: reference src/marqo/tensor_search/index_meta_cache.py — dict cache
(get_index :44, populate_cache :136) + 1s daemon refresh thread
(:28, :85-129); add-documents calls force_refresh (tensor_search.py:112).
"""

import threading
from typing import Dict, Optional

from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.index_management.index_management import IndexManagement
from marqo_tpu.core.models.marqo_index import MarqoIndex
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)

DEFAULT_REFRESH_INTERVAL_SECONDS = 1.0


class IndexMetaCache:
    def __init__(self, index_management: IndexManagement):
        self._index_management = index_management
        self._cache: Dict[str, MarqoIndex] = {}
        self._lock = threading.Lock()
        self._refresh_thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def get_index(self, index_name: str, force_refresh: bool = False) -> MarqoIndex:
        if force_refresh or index_name not in self._cache:
            self.refresh_index(index_name)
        index = self._cache.get(index_name)
        if index is None:
            raise IndexNotFoundError(f"Index {index_name} not found")
        return index

    def refresh_index(self, index_name: str) -> None:
        try:
            index = self._index_management.get_index(index_name)
            with self._lock:
                self._cache[index_name] = index
        except IndexNotFoundError:
            with self._lock:
                self._cache.pop(index_name, None)

    def empty_cache(self) -> None:
        """Drop everything; subsequent get_index calls repopulate on demand
        (reference index_meta_cache.py:35-37 empty_cache)."""
        with self._lock:
            self._cache = {}

    def get_cache(self) -> Dict[str, MarqoIndex]:
        """Snapshot of the cached name→index map (reference :40-41)."""
        with self._lock:
            return dict(self._cache)

    def populate(self) -> None:
        indexes = {i.name: i for i in self._index_management.get_all_indexes()}
        with self._lock:
            self._cache = indexes

    def remove_index(self, index_name: str) -> None:
        with self._lock:
            self._cache.pop(index_name, None)

    def start_refresh_thread(
            self, interval: float = DEFAULT_REFRESH_INTERVAL_SECONDS) -> None:
        if self._refresh_thread is not None and self._refresh_thread.is_alive():
            return

        def loop():
            while not self._stop.wait(interval):
                try:
                    self.populate()
                except Exception as e:  # refresh must never kill the daemon
                    logger.warning(f"Index cache refresh failed: {e}")

        self._stop.clear()
        self._refresh_thread = threading.Thread(
            target=loop, daemon=True, name="index-meta-cache-refresh")
        self._refresh_thread.start()

    def stop_refresh_thread(self) -> None:
        self._stop.set()
