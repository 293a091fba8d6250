"""Headline benchmarks, wedge-proof (VERDICT r3 items 1+8).

Four metrics, each printed as ONE JSON line
{"metric", "value", "unit", "vs_baseline"} the moment it is measured:

  1. query_embed_device_p50_ms   - cheapest, least wedge-prone, FIRST
  2. add_documents_embed_throughput (packed headline)
  3. clip_vit_l14_image_throughput
  4. add_documents_e2e_ingest    - slowest, most wedge-prone, LAST

Wedge-proofing: the parent process runs each section as a SUBPROCESS with
its own timeout and streams its stdout through. A hang (the axon chip
wedges spontaneously - CLAUDE.md round-1 lessons) kills only that
section; every other section still runs and its metric line still prints.
The child keeps a SIGALRM watchdog as a backstop; its os._exit kills only
the child. A final line {"metric": "bench_events", ...} records timeouts,
failures, and degraded-run rechecks so the driver artifact distinguishes
"chip was sick" from "code got slower" without prose.

Degraded-run cross-check (CLAUDE.md: timing can be silently 4x degraded
right before a wedge): any section whose value lands >25% below its
round-2/3 measured band is re-run once and the better value is kept, with
both recorded in bench_events.

Model: e5-base-v2 architecture (BERT-base 12L/768H), bf16 - the reference
quick-start model (BASELINE.md config 1). Packed corpus: synthetic
passages, log-normal lengths (mean ~70 tokens) packed into dense 128-token
rows (ops/packing.py) so the MXU never sees padding.

Execution notes: the axon TPU platform defers execution until a host
fetch, so each timed iteration's input carries a data dependency on the
previous output and the loop is forced with a single scalar fetch at the
end.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

# child-side backstop only; the parent enforces per-section timeouts
CHILD_WATCHDOG_SECONDS = 600


def _watchdog(signum, frame):
    print("bench watchdog: TPU execution did not complete within "
          f"{CHILD_WATCHDOG_SECONDS}s - device/tunnel likely wedged",
          file=sys.stderr)
    os._exit(1)


def build_corpus(n_docs: int, seed: int = 0):
    """Token-id sequences with a realistic passage-length distribution."""
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.lognormal(mean=4.1, sigma=0.45, size=n_docs),
                      16, 128).astype(np.int32)
    return [rng.integers(1, 30522, size=int(L)).tolist() for L in lengths]


WORD_POOL_SIZE = 2000


def build_text_corpus(n_docs: int, seed: int = 1):
    """Raw-text passages from a word pool sized so tokenized lengths match
    the headline's log-normal distribution (1 pool word ~ 1 wordpiece)."""
    rng = np.random.default_rng(seed)
    pool = [f"word{i:04d}" for i in range(WORD_POOL_SIZE)]
    lengths = np.clip(rng.lognormal(mean=4.1, sigma=0.45, size=n_docs),
                      16, 126).astype(np.int32)
    return [" ".join(rng.choice(pool, size=int(L))) for L in lengths], pool


# --- sections ------------------------------------------------------------


def query_p50_bench() -> None:
    """BASELINE.md target: batch-1 query embed p50 < 5 ms device-side.
    Measured with an in-jit loop (BENCH_NOTES measurement rule #2 - the
    dev tunnel adds ~6 ms per dispatch that locally-attached serving
    doesn't pay). vs_baseline = target/value, so >=1.0 meets the target."""
    import jax
    import jax.numpy as jnp
    from marqo_tpu.models.bert import (TextEncoderConfig, encode_tokens,
                                       init_params)
    config = TextEncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072)
    params = jax.device_put(
        init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16),
        jax.devices()[0])
    seq, loops = 32, 32
    ids = jnp.ones((1, seq), jnp.int32)
    mask = jnp.ones((1, seq), jnp.int32)

    @jax.jit
    def run(dep):
        def body(i, carry):
            dep, acc = carry
            out = encode_tokens(params, ids + dep, mask, config)
            return jnp.isnan(out[0, 0]).astype(jnp.int32), acc + out[0, 0]
        return jax.lax.fori_loop(0, loops, body,
                                 (dep, jnp.zeros((), jnp.float32)))[1]

    float(run(jnp.zeros((), jnp.int32)))  # compile
    start = time.perf_counter()
    float(run(jnp.zeros((), jnp.int32)))
    per_query_ms = (time.perf_counter() - start) / loops * 1000
    print(json.dumps({
        "metric": "query_embed_device_p50_ms",
        "value": round(per_query_ms, 3),
        "unit": "ms (batch-1, seq 32, e5-base bf16; lower is better)",
        "vs_baseline": round(5.0 / per_query_ms, 3),
        "baseline": "5ms target / measured; >=1.0 meets the target",
    }), flush=True)


def packed_bench() -> None:
    """The headline: packed-sequence add_documents embed throughput."""
    import jax
    import jax.numpy as jnp
    from marqo_tpu.models.bert import (TextEncoderConfig,
                                       encode_tokens_packed, init_params)
    from marqo_tpu.ops.packing import pack_sequences, packing_efficiency

    config = TextEncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072)
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.device_put(params, jax.devices()[0])

    seq_len, rows_per_batch = 128, 256
    # pack a large corpus, then split into fixed (256, 128) row-batches
    corpus = build_corpus(20000)
    packed = pack_sequences(corpus, seq_len=seq_len, row_bucket=rows_per_batch)
    packing_efficiency(packed)
    n_rows = packed.input_ids.shape[0]
    n_batches = n_rows // rows_per_batch

    batches = []
    for b in range(n_batches):
        sl = slice(b * rows_per_batch, (b + 1) * rows_per_batch)
        seq_index = packed.seq_index[sl]
        # remap sequence indices to a per-batch range for segment_sum
        uniq, remapped = np.unique(seq_index, return_inverse=True)
        remapped = remapped.reshape(seq_index.shape)
        has_pad = uniq[0] == -1
        n_seqs = len(uniq) - (1 if has_pad else 0)
        if has_pad:
            remapped = remapped - 1  # pad becomes -1 again
        batches.append({
            "ids": jnp.asarray(packed.input_ids[sl]),
            "segs": jnp.asarray(packed.segment_ids[sl]),
            "pos": jnp.asarray(packed.positions[sl]),
            "idx": jnp.asarray(remapped.astype(np.int32)),
            "n": int(n_seqs),
        })

    # one static n_seqs bucket for all batches (max, rounded up)
    n_bucket = max(b["n"] for b in batches)
    n_bucket = int(np.ceil(n_bucket / 64) * 64)

    fn = jax.jit(lambda p, i, s, po, ix: encode_tokens_packed(
        p, i, s, po, ix, n_bucket, config, compute_dtype=jnp.bfloat16),
        static_argnames=())

    b0 = batches[0]
    out = fn(params, b0["ids"], b0["segs"], b0["pos"], b0["idx"])
    float(out.sum())  # compile + force

    def run(iters):
        start = time.perf_counter()
        docs = 0
        out = None
        dep = jnp.zeros((), jnp.int32)
        for it in range(iters):
            b = batches[it % n_batches]
            out = fn(params, b["ids"] + dep, b["segs"], b["pos"], b["idx"])
            dep = jnp.isnan(out[0, 0]).astype(jnp.int32)
            docs += b["n"]
        float(out.sum())
        return time.perf_counter() - start, docs

    run(3)  # warm the dependency-chained graph shape
    elapsed, docs = run(30)

    docs_per_sec = docs / elapsed
    print(json.dumps({
        "metric": "add_documents_embed_throughput",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec/chip",
        "vs_baseline": round(docs_per_sec / 10000.0, 3),
        "baseline": "fraction of the reference's 10k docs/s headline",
    }), flush=True)


def clip_vit_l14_bench() -> None:
    """BASELINE.md config 3: ViT-L/14 image embedding (bf16, uint8 in,
    on-device normalize+patch-embed). Speed-of-light ~ 883 imgs/s
    (155 GFLOP/img at the chip's measured 137 TFLOP/s)."""
    import jax
    import jax.numpy as jnp
    from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                       encode_clip_image_jit,
                                       init_clip_params)
    vision = CLIPVisionConfig(image_size=224, patch_size=14,
                              hidden_size=1024, num_layers=24, num_heads=16,
                              intermediate_size=4096, projection_dim=768)
    text = CLIPTextConfig(hidden_size=768, num_layers=12, num_heads=12,
                          intermediate_size=3072, projection_dim=768)
    params = jax.device_put(
        init_clip_params(text, vision, jax.random.PRNGKey(0),
                         dtype=jnp.bfloat16), jax.devices()[0])
    batch = 16  # measured sweet spot (64: 668, 128: 613 imgs/s)
    pixels = jnp.zeros((batch, 224, 224, 3), dtype=jnp.uint8)
    out = encode_clip_image_jit(params, pixels, vision)
    float(out.sum())
    dep = jnp.zeros((), jnp.uint8)
    for _ in range(3):
        out = encode_clip_image_jit(params, pixels + dep, vision)
        dep = jnp.isnan(out[0, 0]).astype(jnp.uint8)
    float(out.sum())
    iters = 12
    start = time.perf_counter()
    dep = jnp.zeros((), jnp.uint8)
    for _ in range(iters):
        out = encode_clip_image_jit(params, pixels + dep, vision)
        dep = jnp.isnan(out[0, 0]).astype(jnp.uint8)
    float(out.sum())
    rate = batch * iters / (time.perf_counter() - start)
    print(json.dumps({
        "metric": "clip_vit_l14_image_throughput",
        "value": round(rate, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(rate / 883.0, 3),
        "baseline": "fraction of 883 imgs/s = bf16 MXU speed-of-light for "
                    "ViT-L/14 on this chip (NOT fraction of a 10k target)",
    }), flush=True)


def ingest_bench() -> None:
    """True end-to-end ingest: raw text in -> validate -> chunk -> tokenize
    (host) -> pack -> encode (TPU) -> engine feed, through the real
    add_documents orchestration (the packed headline above measures the
    device encode stage only)."""
    import datetime

    os.environ.setdefault("MARQO_MAX_ADD_DOCS_COUNT", "512")
    from marqo_tpu.api.models.index_settings import IndexSettings
    from marqo_tpu.config import Config
    from marqo_tpu.core.models.add_docs_params import AddDocsParams
    from marqo_tpu.inference import vectorise as inference
    from marqo_tpu.inference.loaders import load_model
    from marqo_tpu.inference.types import Device
    from marqo_tpu.models.tokenizer import TextTokenizer
    from marqo_tpu.tensor_search import tensor_search

    props = {
        "name": "bench-e5-base", "dimensions": 768, "tokens": 128,
        "type": "hf", "random_init": True, "pooling_method": "mean",
        "architecture": {"vocab_size": 30522, "hidden_size": 768,
                         "num_layers": 12, "num_heads": 12,
                         "intermediate_size": 3072},
    }
    model = load_model("bench-e5-base", props, Device.TPU)
    # 11 timed batches: the chip shows +-15% run-to-run timing drift
    # (BENCH_NOTES round-2 continuation), so a short window is noisy
    docs_text, pool = build_text_corpus(6144)
    # word-level tokenizer (same Rust tokenizers runtime as production;
    # the random-init default is char-level, which would distort lengths)
    model.tokenizer = TextTokenizer.build_test_wordpiece(
        extra_words=pool, max_length=128)
    cache_key = inference._create_model_cache_key("bench-e5-base", "tpu",
                                                  props)
    inference._available_models[cache_key] = {
        "model": model,
        "most_recently_used_time": datetime.datetime.now(),
        "model_size": 1.0,
    }

    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="bench-e5-base",
                      modelProperties=props).to_marqo_index("bench-ingest"))
    cfg.index_meta_cache.populate()

    docs = [{"_id": f"d{i}", "text": text}
            for i, text in enumerate(docs_text)]
    batch_size = 512

    def add(batch):
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="bench-ingest", docs=batch, tensor_fields=["text"],
            device="tpu"))
        assert res["errors"] is False, res

    add(docs[:batch_size])  # warm: compiles the encode buckets
    # two concurrent add_documents requests, like the reference's
    # client-side batching (its 10k/s headline is measured with parallel
    # client requests; a lone sequential client leaves the chip idle
    # during each request's final drain+feed tail). 2 is the measured
    # sweet spot on this 1-core host - 3+ regress on GIL contention.
    from concurrent.futures import ThreadPoolExecutor
    start = time.perf_counter()
    batches = [docs[b * batch_size:(b + 1) * batch_size]
               for b in range(1, len(docs) // batch_size)]
    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(add, batches))
    done = sum(len(b) for b in batches)
    elapsed = time.perf_counter() - start
    print(json.dumps({
        "metric": "add_documents_e2e_ingest",
        "value": round(done / elapsed, 1),
        "unit": "docs/sec/chip",
        "vs_baseline": round(done / elapsed / 10000.0, 3),
        "baseline": "fraction of the reference's 10k docs/s headline",
    }), flush=True)
    cfg.index_meta_cache.stop_refresh_thread()


# --- orchestration -------------------------------------------------------

# (name, function, parent-side timeout seconds, degraded floor)
# Order: cheap device-side metrics FIRST, the wedge-prone full-index e2e
# ingest LAST, so one wedge cannot zero the whole artifact (VERDICT r3
# weak #1). Floors are 25% below the round-2/3 measured band; p50 is
# lower-is-better so its "floor" is a ceiling.
# Timeouts sized from measured cold-compile section durations (r4):
# query_p50 ~125 s, clip ViT-L compile is the longest; each child is a
# fresh process so every section pays its own compile.
SECTIONS = [
    ("query_p50", query_p50_bench, 360,
     ("query_embed_device_p50_ms", "max", 1.9)),     # band 1.1-1.7 ms
    ("packed", packed_bench, 420,
     ("add_documents_embed_throughput", "min", 5900)),  # band ~7900-8000
    ("clip", clip_vit_l14_bench, 480,
     ("clip_vit_l14_image_throughput", "min", 540)),    # band ~720
    ("ingest", ingest_bench, 540,
     ("add_documents_e2e_ingest", "min", 1500)),        # band ~2000-2100
]
def chip_probe() -> None:
    """Tiny conv-shaped matmul + fetch: a cheap liveness probe run before
    the wedge-prone ViT-L section (round-4 saw three clip-section hangs),
    so a clip timeout attributes itself — chip already wedged before clip
    vs wedged BY the clip compile. Exit 0 = chip answered."""
    import jax.numpy as jnp
    x = jnp.ones((256, 256), jnp.bfloat16)
    y = float((x @ x).sum())
    assert y == 256.0 * 256 * 256


SECTION_FNS = {name: fn for name, fn, _, _ in SECTIONS}
SECTION_FNS["chip_probe"] = chip_probe

PROBE_TIMEOUT_S = 120  # process start + jax import + tiny compile + fetch


def _preprobe_chip(events: list) -> bool:
    """Run chip_probe as a subprocess. A clean fast probe stays silent
    (bench_events must remain empty on healthy runs); slow or failed
    probes are recorded. Returns False when the chip looks wedged."""
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section",
             "chip_probe"],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        events.append({"event": "chip_preprobe_timeout",
                       "timeout_s": PROBE_TIMEOUT_S,
                       "note": "chip wedged BEFORE the clip section"})
        return False
    elapsed = time.perf_counter() - t0
    if proc.returncode != 0:
        events.append({"event": "chip_preprobe_failed", "rc": proc.returncode,
                       "elapsed_s": round(elapsed, 1),
                       "stderr_tail": (proc.stderr or "").strip()[-200:]})
        return False
    if elapsed > 60:
        events.append({"event": "chip_preprobe_slow",
                       "elapsed_s": round(elapsed, 1),
                       "note": "probe answered but slowly; chip may be "
                               "degrading"})
    return True


def _run_child(name: str) -> None:
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(CHILD_WATCHDOG_SECONDS)
    SECTION_FNS[name]()
    signal.alarm(0)


def _run_section(name: str, timeout: float, events: list):
    """Run one section as a subprocess; return {metric: line_dict}.
    Timeouts and failures are recorded in events, never fatal."""
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        events.append({"event": "section_timeout", "section": name,
                       "timeout_s": timeout,
                       "note": "killed by parent; chip/tunnel likely wedged"})
        # a killed child may still have printed earlier metric lines
        out = e.stdout or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return _parse_metrics(out)
    metrics = _parse_metrics(proc.stdout)
    if proc.returncode != 0:
        events.append({
            "event": "section_failed", "section": name,
            "rc": proc.returncode,
            "elapsed_s": round(time.perf_counter() - t0, 1),
            "stderr_tail": (proc.stderr or "").strip()[-400:],
        })
    return metrics


def _parse_metrics(stdout: str):
    found = {}
    for line in (stdout or "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" in obj and "value" in obj:
            found[obj["metric"]] = obj
    return found


def _is_degraded(check, metrics) -> bool:
    metric, kind, bound = check
    if metric not in metrics:
        return False
    v = metrics[metric]["value"]
    return v > bound if kind == "max" else v < bound


def orchestrate() -> int:
    events = []
    printed = set()
    budget_deadline = time.monotonic() + 2400  # hard cap on total wall
    for name, _, timeout, check in SECTIONS:
        remaining = budget_deadline - time.monotonic()
        if remaining < 60:
            events.append({"event": "budget_exhausted", "section": name,
                           "note": "skipped: global 40-min budget spent"})
            continue
        timeout = min(timeout, remaining)
        if name == "clip" and not _preprobe_chip(events):
            # chip is already unresponsive: skip the ViT-L section rather
            # than burning its full timeout (later sections still run and
            # may succeed if the wedge clears)
            events.append({"event": "section_skipped", "section": name,
                           "note": "chip_preprobe failed"})
            continue
        metrics = _run_section(name, timeout, events)
        if _is_degraded(check, metrics) and \
                budget_deadline - time.monotonic() > timeout:
            # CLAUDE.md: chip timing can be silently 4x degraded right
            # before a wedge - re-run once, keep the better value
            first = metrics[check[0]]["value"]
            retry = _run_section(name, timeout, events)
            events.append({"event": "degraded_recheck", "section": name,
                           "metric": check[0], "first_value": first,
                           "retry_value": retry.get(check[0], {}).get("value")})
            if check[0] in retry:
                better = (min if check[1] == "max" else max)(
                    first, retry[check[0]]["value"])
                if better == retry[check[0]]["value"]:
                    metrics = retry
        for metric, obj in metrics.items():
            if metric not in printed:
                print(json.dumps(obj), flush=True)
                printed.add(metric)
    print(json.dumps({
        "metric": "bench_events",
        "value": len(events),
        "unit": "anomalies (timeouts/failures/degraded-rechecks)",
        "vs_baseline": 1.0 if not events else 0.0,
        "events": events,
    }), flush=True)
    # rc=0 iff the packed headline was measured; completed metrics always
    # print regardless
    return 0 if "add_documents_embed_throughput" in printed else 1


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--section":
        _run_child(sys.argv[2])
    else:
        sys.exit(orchestrate())
