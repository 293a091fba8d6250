"""Streaming audio/video chunking via ffmpeg.

Parity: reference src/marqo/tensor_search/streaming_media_processor.py —
ffprobe the media, then transcode fixed-length overlapping clips (defaults:
video/audio split 20s with 3s overlap, :46-47; audio → wav 44.1 kHz, video
→ mp4/h264, :108-115), each clip preprocessed into model tensors.

ffmpeg is an external binary (the reference shells out too); when it is not
on PATH, audio/video ingestion raises a clear error and the rest of the
framework is unaffected.
"""

import json
import os
import shutil
import subprocess
import tempfile
from typing import List

from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.inference.types import Modality
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None and \
        shutil.which("ffprobe") is not None


class StreamingMediaProcessor:
    """Chunk one audio/video file into fixed-length overlapping clips."""

    def __init__(self, modality: Modality, split_length: int = 20,
                 split_overlap: int = 3):
        if modality not in (Modality.AUDIO, Modality.VIDEO):
            raise InvalidArgumentError(
                f"StreamingMediaProcessor handles audio/video, got "
                f"{modality.value}")
        if not ffmpeg_available():
            raise InvalidArgumentError(
                "Audio/video processing requires ffmpeg + ffprobe on PATH; "
                "they are not available in this deployment.")
        self.modality = modality
        self.split_length = split_length
        self.split_overlap = split_overlap

    def fetch_file_metadata(self, path: str) -> dict:
        """ffprobe duration/size (reference _fetch_file_metadata, :59)."""
        out = subprocess.run(
            ["ffprobe", "-v", "error", "-show_entries",
             "format=duration,size", "-of", "json", path],
            capture_output=True, check=True, timeout=30)
        info = json.loads(out.stdout)["format"]
        return {"duration": float(info.get("duration", 0.0)),
                "size": int(info.get("size", 0))}

    def process_media(self, path: str) -> List[dict]:
        """Returns chunks: [{"start_time", "end_time", "path"}] of
        transcoded clip files (reference process_media, :86-136)."""
        meta = self.fetch_file_metadata(path)
        duration = meta["duration"]
        if duration <= 0:
            raise InvalidArgumentError(f"Could not read duration of {path}")
        step = max(1, self.split_length - self.split_overlap)
        chunks = []
        tmpdir = tempfile.mkdtemp(prefix="marqo_media_")
        start = 0.0
        index = 0
        while start < duration:
            length = min(self.split_length, duration - start)
            if self.modality == Modality.AUDIO:
                clip = os.path.join(tmpdir, f"chunk_{index}.wav")
                cmd = ["ffmpeg", "-y", "-v", "error", "-ss", str(start),
                       "-t", str(length), "-i", path,
                       "-ar", "44100", "-ac", "1", clip]
            else:
                clip = os.path.join(tmpdir, f"chunk_{index}.mp4")
                cmd = ["ffmpeg", "-y", "-v", "error", "-ss", str(start),
                       "-t", str(length), "-i", path,
                       "-c:v", "libx264", "-preset", "ultrafast", "-an", clip]
            subprocess.run(cmd, capture_output=True, check=True, timeout=120)
            chunks.append({"start_time": start, "end_time": start + length,
                           "path": clip})
            index += 1
            if start + self.split_length >= duration:
                break
            start += step
        return chunks
