# marqo-tpu container (parity: reference Dockerfile — multi-stage with the
# native engine built in-stage; the reference builds the Vespa Java searcher
# with Maven, we build the C++ engine with g++/make).
#
# The runtime image must provide the TPU driver/runtime (libtpu) the same
# way CUDA bases provide GPU drivers for the reference; on Cloud TPU VMs
# the host runtime is used directly.

# Stage 1: build the native engine (HNSW + BM25 shared library)
FROM python:3.12-slim AS native_build
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*
WORKDIR /build
COPY marqo_tpu/engine/cpp ./cpp
RUN make -C cpp

# Stage 2: runtime
FROM python:3.12-slim
WORKDIR /app

COPY pyproject.toml ./
COPY marqo_tpu ./marqo_tpu
COPY scripts ./scripts
COPY --from=native_build /build/cpp/libmarqo_engine.so \
        ./marqo_tpu/engine/cpp/libmarqo_engine.so

# jax[tpu] pulls libtpu for Cloud TPU VMs; torch-cpu backs checkpoint
# conversion only (no CUDA anywhere)
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        && pip install --no-cache-dir \
        torch --index-url https://download.pytorch.org/whl/cpu \
        && pip install --no-cache-dir \
        transformers tokenizers pydantic httpx pillow opencv-python-headless \
        numpy huggingface_hub

ENV PYTHONPATH="/app"
EXPOSE 8882
RUN chmod +x ./scripts/run_marqo_tpu.sh
ENTRYPOINT ["./scripts/run_marqo_tpu.sh"]
