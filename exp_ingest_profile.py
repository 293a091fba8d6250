"""Stage-level profile of the e2e ingest path (bench.py ingest_bench
shape): where does non-tokenize host time go?"""
import cProfile, io, pstats, time, os, datetime
os.environ.setdefault("MARQO_MAX_ADD_DOCS_COUNT", "512")
import numpy as np
from bench import build_text_corpus, WORD_POOL_SIZE
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.loaders import load_model
from marqo_tpu.inference.types import Device
from marqo_tpu.models.tokenizer import TextTokenizer
from marqo_tpu.tensor_search import tensor_search

props = {"name": "bench-e5-base", "dimensions": 768, "tokens": 128,
         "type": "hf", "random_init": True, "pooling_method": "mean",
         "architecture": {"vocab_size": 30522, "hidden_size": 768,
                          "num_layers": 12, "num_heads": 12,
                          "intermediate_size": 3072}}
model = load_model("bench-e5-base", props, Device.TPU)
docs_text, pool = build_text_corpus(4096)
model.tokenizer = TextTokenizer.build_test_wordpiece(extra_words=pool,
                                                     max_length=128)
cache_key = inference._create_model_cache_key("bench-e5-base", "tpu", props)
inference._available_models[cache_key] = {
    "model": model, "most_recently_used_time": datetime.datetime.now(),
    "model_size": 1.0}
cfg = Config()
cfg.index_management.bootstrap()
cfg.index_management.create_index(
    IndexSettings(model="bench-e5-base",
                  modelProperties=props).to_marqo_index("bench-ingest"))
cfg.index_meta_cache.populate()
docs = [{"_id": f"d{i}", "text": t} for i, t in enumerate(docs_text)]

def add(batch):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name="bench-ingest", docs=batch, tensor_fields=["text"],
        device="tpu"))
    assert res["errors"] is False

add(docs[:512])  # warm
t0 = time.perf_counter()
profiler = cProfile.Profile()
profiler.enable()
for b in range(1, 7):
    add(docs[b*512:(b+1)*512] if (b+1)*512 <= len(docs) else docs[:512])
profiler.disable()
elapsed = time.perf_counter() - t0
print(f"6 batches in {elapsed:.2f}s = {6*512/elapsed:.0f} docs/s", flush=True)
s = io.StringIO()
ps = pstats.Stats(profiler, stream=s).sort_stats("cumulative")
ps.print_stats(32)
print(s.getvalue()[:5500])
cfg.index_meta_cache.stop_refresh_thread()
