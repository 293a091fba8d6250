"""Quick-start walkthrough (reference README quick-start, adapted).

Runs fully in-process — no server needed. For the HTTP flavor, start
`python -m marqo_tpu.api.app` and replace these calls with requests to
:8882 (see README.md).

Uses the `test` model so it runs anywhere; switch to "hf/e5-base-v2" when
HF weights are reachable.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.tensor_search import tensor_search


def main():
    config = Config()
    config.index_management.bootstrap()

    settings = IndexSettings(model="test")
    config.index_management.create_index(
        settings.to_marqo_index("my-first-index"))
    config.index_meta_cache.populate()

    tensor_search.add_documents(config, AddDocsParams(
        index_name="my-first-index",
        docs=[
            {"_id": "article_591",
             "Title": "The Travels of Marco Polo",
             "Description": "A 13th-century travelogue describing Polo's "
                            "travels"},
            {"_id": "article_602",
             "Title": "Extravehicular Mobility Unit (EMU)",
             "Description": "The EMU is a spacesuit that provides "
                            "environmental protection, mobility, life "
                            "support, and communications for astronauts"},
        ],
        tensor_fields=["Title", "Description"]))

    results = tensor_search.search(
        config, "my-first-index",
        text="What is the best outfit to wear on the moon?")

    for hit in results["hits"]:
        print(f"{hit['_id']}  score={hit['_score']:.4f}  "
              f"highlight={hit['_highlights']}")
    print(f"processingTimeMs={results['processingTimeMs']}")

    # hybrid search with score modifiers
    hybrid = tensor_search.search(
        config, "my-first-index", text="travels",
        search_method="HYBRID",
        hybrid_parameters={"retrievalMethod": "disjunction",
                           "rankingMethod": "rrf", "alpha": 0.6})
    print("hybrid top hit:", hybrid["hits"][0]["_id"])


if __name__ == "__main__":
    main()
