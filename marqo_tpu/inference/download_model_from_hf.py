"""HF-hub checkpoint download, reference-shaped.

Parity: reference core/inference/download_model_from_hf.py — unset
location fields are omitted from the hf_hub_download call, auth adds the
token, download_dir maps to cache_dir, RepositoryNotFoundError becomes
ModelDownloadError with the reference's message, and any other error
propagates unchanged.
"""

from typing import Any, Dict, Optional

from marqo_tpu.core.exceptions import ModelDownloadError
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


def _as_kwargs(obj, fields) -> Dict[str, Any]:
    from marqo_tpu.inference.model_download import field_of
    out = {}
    for name in fields:
        value = field_of(obj, name)
        if value is not None:
            out[name] = value
    return out


def download_model_from_hf(location, auth=None,
                           download_dir: Optional[str] = None):
    """hf_hub_download with exact reference call semantics
    (download_model_from_hf.py:11-42)."""
    from huggingface_hub import hf_hub_download
    try:
        from huggingface_hub.errors import RepositoryNotFoundError
    except ImportError:  # older hub layouts
        from huggingface_hub.utils import RepositoryNotFoundError

    download_kwargs = _as_kwargs(location, ("repo_id", "filename"))
    if auth is not None:
        download_kwargs.update(_as_kwargs(auth, ("token",)))
    try:
        return hf_hub_download(**download_kwargs, cache_dir=download_dir)
    except RepositoryNotFoundError:
        raise ModelDownloadError(
            "Could not find the specified Hugging Face model repository. "
            "Please ensure that the request's model_auth's `hf` "
            "credentials and the index's model_location are correct. "
            "If the index's model_location is not correct, please create "
            "a new index with the corrected model_location")
