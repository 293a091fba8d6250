"""Audio search walkthrough (reference examples/SpeechProcessing, BASELINE
config 5 — adapted: the reference transcribes speech externally then embeds
text; this framework additionally embeds audio DIRECTLY via the
LanguageBind-class audio tower (on-device log-mel → ViT), so clips are
searchable without an ASR step. Runs fully offline with generated tones +
random-init towers.
"""

import os
import sys
import tempfile
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.tensor_search import tensor_search

LB_PROPS = {
    "type": "languagebind", "dimensions": 32, "random_init": True,
    "image_size": 32,
    "architecture": {"patch_size": 8, "audio_frames": 496,
                     "audio_patch": 16},
}


def write_tone(path, freq, duration=3.0, sr=16000):
    t = np.linspace(0, duration, int(sr * duration), endpoint=False)
    data = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return path


def main():
    config = Config()
    config.index_management.bootstrap()
    settings = IndexSettings(
        model="my-audio-model", modelProperties=LB_PROPS,
        treatUrlsAndPointersAsImages=True, treatUrlsAndPointersAsMedia=True,
        audioPreprocessing={"splitLength": 2, "splitOverlap": 1})
    config.index_management.create_index(settings.to_marqo_index("audio-index"))
    config.index_meta_cache.populate()

    with tempfile.TemporaryDirectory() as tmpdir:
        clips = {
            "bass": write_tone(os.path.join(tmpdir, "bass.wav"), 110),
            "mid": write_tone(os.path.join(tmpdir, "mid.wav"), 880),
            "treble": write_tone(os.path.join(tmpdir, "treble.wav"), 5000),
        }
        docs = [{"_id": name, "clip": path, "note": f"{name} tone"}
                for name, path in clips.items()]
        result = tensor_search.add_documents(config, AddDocsParams(
            index_name="audio-index", docs=docs,
            tensor_fields=["clip", "note"]))
        assert not result["errors"], result["items"]
        stats = config.monitoring.get_index_stats("audio-index")
        print(f"indexed {stats['numberOfDocuments']} clips, "
              f"{stats['numberOfVectors']} vectors (overlapping 2s chunks)")

        # query BY AUDIO: nearest clip to a fresh 120 Hz tone
        probe = write_tone(os.path.join(tmpdir, "probe.wav"), 120)
        res = tensor_search.search(config, "audio-index", text=probe)
        print("110Hz-probe nearest clips →",
              [(h["_id"], round(h["_score"], 3)) for h in res["hits"]])
        print("best matching chunk:", res["hits"][0]["_highlights"])


if __name__ == "__main__":
    main()
