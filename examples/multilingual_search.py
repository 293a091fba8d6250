"""Cross-lingual search walkthrough (reference examples/MultiLingual, BASELINE
config 4: multilingual-e5 / stsb-xlm-r).

Runs offline with the `test` model; with hub access use
"hf/multilingual-e5-base" (XLM-R architecture — position-offset conversion
verified in tests/test_bert_parity.py::TestXlmRobertaParity).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.tensor_search import tensor_search

MODEL = "test"  # offline; use "hf/multilingual-e5-base" with hub access

DOCS = [
    {"_id": "en", "lang": "en",
     "text": "The weather today is sunny with a light breeze."},
    {"_id": "de", "lang": "de",
     "text": "Das Wetter heute ist sonnig mit einer leichten Brise."},
    {"_id": "fr", "lang": "fr",
     "text": "Le temps aujourd'hui est ensoleille avec une brise legere."},
    {"_id": "recipe", "lang": "en",
     "text": "Mix flour, eggs and milk to make pancake batter."},
]


def main():
    config = Config()
    config.index_management.bootstrap()
    config.index_management.create_index(
        IndexSettings(model=MODEL).to_marqo_index("multilingual-index"))
    config.index_meta_cache.populate()

    tensor_search.add_documents(config, AddDocsParams(
        index_name="multilingual-index", docs=DOCS, tensor_fields=["text"]))

    res = tensor_search.search(config, "multilingual-index",
                               text="how is the weather today",
                               filter="lang:de")
    print("German-filtered weather query →",
          [(h["_id"], round(h["_score"], 3)) for h in res["hits"]])

    res = tensor_search.search(config, "multilingual-index",
                               text="weather sunny breeze")
    print("unfiltered →", [h["_id"] for h in res["hits"]])


if __name__ == "__main__":
    main()
