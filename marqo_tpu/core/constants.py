"""Core constants (parity: reference src/marqo/core/constants.py)."""

MARQO_RESERVED_PREFIX = "marqo__"
MARQO_DOC_TENSORS = "marqo__tensors"
MARQO_DOC_HIGHLIGHTS = "_highlights"
MARQO_DOC_CHUNKS = "chunks"
MARQO_DOC_EMBEDDINGS = "embeddings"
MARQO_DOC_MULTIMODAL_PARAMS = "marqo__multimodal_params"  # reference unstructured_vespa_index/common.py:23
MARQO_DOC_ID = "_id"

MARQO_SEARCH_METHOD_TENSOR = "tensor"
MARQO_SEARCH_METHOD_LEXICAL = "lexical"

MARQO_DOC_HYBRID_TENSOR_SCORE = "_tensor_score"
MARQO_DOC_HYBRID_LEXICAL_SCORE = "_lexical_score"

# score-modifier query-input tensor names (engine rank-expression inputs)
QUERY_INPUT_SCORE_MODIFIERS_MULT_WEIGHTS = "marqo__mult_weights"
QUERY_INPUT_SCORE_MODIFIERS_ADD_WEIGHTS = "marqo__add_weights"
QUERY_INPUT_SCORE_MODIFIERS_MULT_WEIGHTS_LEXICAL = "marqo__mult_weights_lexical"
QUERY_INPUT_SCORE_MODIFIERS_ADD_WEIGHTS_LEXICAL = "marqo__add_weights_lexical"
QUERY_INPUT_SCORE_MODIFIERS_MULT_WEIGHTS_TENSOR = "marqo__mult_weights_tensor"
QUERY_INPUT_SCORE_MODIFIERS_ADD_WEIGHTS_TENSOR = "marqo__add_weights_tensor"

# protected document-level field names
PROTECTED_FIELD_NAMES = ["_id", "_tensor_facets", "_highlights", "_score", "_found"]
