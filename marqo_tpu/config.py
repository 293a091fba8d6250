"""Config aggregate: wires the engine, settings store, index management,
meta cache and services (parity: reference src/marqo/config.py:21-87).
"""

from typing import Optional

from marqo_tpu.api import configs
from marqo_tpu.core.index_management.index_management import IndexManagement
from marqo_tpu.core.index_management.settings_store import IndexSettingsStore
from marqo_tpu.engine.store import StoreEngine
from marqo_tpu.logging import get_logger
from marqo_tpu.tensor_search.index_meta_cache import IndexMetaCache

logger = get_logger(__name__)


class Config:
    def __init__(self, engine: Optional[StoreEngine] = None,
                 settings_store: Optional[IndexSettingsStore] = None,
                 default_device: Optional[str] = None):
        if engine is None:
            # remote engine when MARQO_ENGINE_QUERY_URL is set (reference
            # external-Vespa mode, run_marqo.sh:38-100); in-process otherwise
            from marqo_tpu.engine.client import engine_from_env
            engine = engine_from_env()
        self.engine = engine
        data_dir = configs.read_env_vars_and_defaults("MARQO_ENGINE_DATA_DIR")
        self.settings_store = settings_store or IndexSettingsStore(data_dir)
        self.index_management = IndexManagement(self.engine, self.settings_store)
        self.index_meta_cache = IndexMetaCache(self.index_management)
        self.default_device = default_device
        # services are wired lazily to avoid import cycles
        self._monitoring = None
        self._document = None
        self._recommender = None
        self._embed = None

    @property
    def monitoring(self):
        if self._monitoring is None:
            from marqo_tpu.core.monitoring import Monitoring
            self._monitoring = Monitoring(self)
        return self._monitoring

    @property
    def document(self):
        if self._document is None:
            from marqo_tpu.core.document import Document
            self._document = Document(self)
        return self._document

    @property
    def recommender(self):
        if self._recommender is None:
            from marqo_tpu.core.search.recommender import Recommender
            self._recommender = Recommender(self)
        return self._recommender

    @property
    def embed(self):
        if self._embed is None:
            from marqo_tpu.core.embed import Embed
            self._embed = Embed(self)
        return self._embed
