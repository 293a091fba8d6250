"""marqo_tpu — a TPU-native, end-to-end vector search framework.

"Documents in, documents out": embedding inference (JAX/XLA/Pallas encoders),
index schema management, and hybrid tensor+lexical retrieval (native C++
engine) behind one HTTP API, with the capabilities of Marqo v2.13
(reference mounted at /root/reference; see SURVEY.md).
"""

from marqo_tpu.version import __version__

__all__ = ["__version__"]
