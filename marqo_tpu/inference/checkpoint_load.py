"""Robust torch-checkpoint loading: corrupt files are removed + reported.

Parity: reference core/inference/embedding_models/open_clip_model.py:143-162
and hugging_face_model.py:244-264 — a checkpoint that fails to
deserialize is deleted from disk (so a retry re-downloads instead of
reusing the broken cache) and surfaces as an invalid-model-properties
error naming the file; a failure to delete raises the
"report this issue" RuntimeError.
"""

import os

from marqo_tpu.exceptions import InvalidArgumentError


def load_torch_checkpoint(path: str, family: str = "open_clip",
                          weights_only: bool = True):
    import torch
    try:
        return torch.load(path, map_location="cpu",
                          weights_only=weights_only)
    except Exception as e:
        try:
            os.remove(path)
        except Exception as remove_e:
            raise RuntimeError(
                f"Marqo encountered an error while attempting to delete a "
                f"corrupted file '{path}'. Please report this issue and "
                f"replace the problematic Marqo instance with a new one. \n "
                f"Error message: `{remove_e}`") from e
        raise InvalidArgumentError(
            f"Marqo encountered a corrupted file when loading {family} "
            f"file '{path}'. Marqo has removed this file from the disk. "
            f"Some possible causes are: "
            f"1. the file was not a valid {family} checkpoint, "
            f"2. the file was corrupted during download or incompletely "
            f"downloaded. Please check and update your model properties "
            f"and retry.") from e
