"""Embedding-result cache: LRU/LFU keyed (model_cache_key, content).

Parity: reference src/marqo/inference/inference_cache/ (MarqoInferenceCache,
marqo_lru_cache.py, marqo_lfu_cache.py — cachetools + fair RW lock). Ours is
self-contained (no cachetools in the image): an OrderedDict LRU and a
counter-based LFU behind one lock. Only string content is cached, and only
when MARQO_INFERENCE_CACHE_SIZE > 0 — same gating as the reference.
"""

import threading
from collections import OrderedDict
from typing import List, Optional

from marqo_tpu.api import configs
from marqo_tpu.exceptions import InvalidArgumentError


class _LRUCache:
    def __init__(self, maxsize: int):
        self.maxsize = maxsize
        self._data: OrderedDict = OrderedDict()

    def get(self, key):
        if key not in self._data:
            return None
        self._data.move_to_end(key)
        return self._data[key]

    def set(self, key, value):
        self._data[key] = value
        self._data.move_to_end(key)
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)

    def __contains__(self, key):
        return key in self._data

    def __len__(self):
        return len(self._data)

    def clear(self):
        self._data.clear()


class _LFUCache:
    def __init__(self, maxsize: int):
        self.maxsize = maxsize
        self._data = {}
        self._counts = {}

    def get(self, key):
        if key not in self._data:
            return None
        self._counts[key] += 1
        return self._data[key]

    def set(self, key, value):
        if key not in self._data and len(self._data) >= self.maxsize:
            evict = min(self._counts, key=self._counts.get)
            del self._data[evict]
            del self._counts[evict]
        self._data[key] = value
        self._counts[key] = self._counts.get(key, 0) + 1

    def __contains__(self, key):
        return key in self._data

    def __len__(self):
        return len(self._data)

    def clear(self):
        self._data.clear()
        self._counts.clear()


class MarqoInferenceCache:
    """Thread-safe embedding cache (reference marqo_inference_cache.py:10)."""

    _CACHE_TYPES = {"LRU": _LRUCache, "LFU": _LFUCache}

    def __init__(self, cache_size: Optional[int] = None,
                 cache_type: Optional[str] = None):
        if cache_size is None:
            cache_size = configs.read_env_vars_and_defaults_ints(
                "MARQO_INFERENCE_CACHE_SIZE") or 0
        if cache_type is None:
            cache_type = str(configs.read_env_vars_and_defaults(
                "MARQO_INFERENCE_CACHE_TYPE") or "LRU")
        # reference marqo_inference_cache.py validates both via EnvVarError:
        # non-string/unknown type and non-int/negative size are rejected
        if not isinstance(cache_type, str) or \
                cache_type.upper() not in self._CACHE_TYPES:
            raise InvalidArgumentError(
                f"Invalid cache type `{cache_type}`. "
                f"Must be one of {list(self._CACHE_TYPES)}")
        cache_type = cache_type.upper()
        if not isinstance(cache_size, int) or isinstance(cache_size, bool) \
                or cache_size < 0:
            raise InvalidArgumentError(
                f"Invalid cache size `{cache_size}`. "
                f"Must be a non-negative integer")
        self._maxsize = cache_size
        self._cache = self._CACHE_TYPES[cache_type](cache_size) if cache_size else None
        self._lock = threading.Lock()

    @property
    def enabled(self) -> bool:
        return self._cache is not None

    def is_enabled(self) -> bool:
        return self.enabled

    @property
    def maxsize(self) -> int:
        """Configured capacity (reference MarqoInferenceCache.maxsize)."""
        return self._maxsize

    @property
    def currsize(self) -> int:
        """Current entry count (reference MarqoInferenceCache.currsize)."""
        return len(self)

    @staticmethod
    def _key(model_cache_key: str, content: str) -> str:
        return f"{model_cache_key}||{content}"

    # public alias matching the reference test surface
    _generate_key = _key

    def get(self, model_cache_key: str, content,
            default=None) -> Optional[List[float]]:
        if not self.enabled or not isinstance(content, str):
            return default
        with self._lock:
            value = self._cache.get(self._key(model_cache_key, content))
        return default if value is None else value

    def __contains__(self, key) -> bool:
        """Membership by (model_cache_key, content) pair (reference
        __contains__); does not bump LRU/LFU stats."""
        if not self.enabled or not (isinstance(key, tuple) and len(key) == 2):
            return False
        with self._lock:
            return self._key(*key) in self._cache

    def set(self, model_cache_key: str, content, embedding: List[float]):
        if not self.enabled or not isinstance(content, str):
            return
        with self._lock:
            self._cache.set(self._key(model_cache_key, content), embedding)

    def clear(self):
        if self.enabled:
            with self._lock:
                self._cache.clear()

    def __len__(self):
        return len(self._cache) if self.enabled else 0
