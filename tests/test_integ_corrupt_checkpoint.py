"""Ported reference tests: corrupt checkpoint file handling.

Source: /root/reference/tests/core/inference/
test_corrupt_file_error_handling.py — a checkpoint that fails to
deserialize is REMOVED from disk (so a retry re-downloads instead of
reusing the broken cache) and raises an invalid-model-properties-class
error containing "Marqo encountered a corrupted file"; a failure to
delete surfaces the "error while attempting to delete" RuntimeError.
"""

import os
from unittest import mock

import pytest

from marqo_tpu.exceptions import InvalidArgumentError
from marqo_tpu.inference.checkpoint_load import load_torch_checkpoint


@pytest.fixture
def corrupt_file(tmp_path):
    path = tmp_path / "corrupted-model.pt"
    path.write_bytes(b"this is definitely not a torch checkpoint")
    return str(path)


class TestCorruptCheckpointHandling:
    def test_corrupted_file_removed_and_reported(self, corrupt_file):
        with pytest.raises(InvalidArgumentError) as e:
            load_torch_checkpoint(corrupt_file, family="open_clip")
        assert "Marqo encountered a corrupted file when loading " \
               "open_clip file" in str(e.value)
        assert "removed this file from the disk" in str(e.value)
        assert not os.path.exists(corrupt_file)

    def test_family_named_in_error(self, corrupt_file):
        with pytest.raises(InvalidArgumentError) as e:
            load_torch_checkpoint(corrupt_file, family="multilingual_clip")
        assert "multilingual_clip file" in str(e.value)

    def test_removal_failure_raises_runtime_error(self, corrupt_file):
        with mock.patch("os.remove",
                        side_effect=OSError("Permission denied")):
            with pytest.raises(RuntimeError) as e:
                load_torch_checkpoint(corrupt_file)
        assert ("Marqo encountered an error while attempting to delete a "
                "corrupted file") in str(e.value)
        assert os.path.exists(corrupt_file)  # untouched

    def test_valid_checkpoint_loads(self, tmp_path):
        import torch
        path = str(tmp_path / "good.pt")
        torch.save({"weight": torch.ones(2, 2)}, path)
        state = load_torch_checkpoint(path)
        assert "weight" in state
        assert os.path.exists(path)  # kept

    def test_loader_hf_bin_path_covered(self, tmp_path):
        """_load_state_dict routes pytorch_model.bin through the corrupt
        handler (reference hugging_face_model.py extraction parity)."""
        from marqo_tpu.inference.loaders import _load_state_dict
        bad = tmp_path / "pytorch_model.bin"
        bad.write_bytes(b"garbage bytes")
        with pytest.raises(InvalidArgumentError) as e:
            _load_state_dict(str(tmp_path))
        assert "corrupted file" in str(e.value)
        assert not bad.exists()
