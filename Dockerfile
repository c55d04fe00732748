# Serving image: the whole platform in one container (replaces the
# reference's 22-service docker-compose + 8 GPU Dockerfiles).
#   docker build .                              # CPU image (default)
#   docker build --build-arg JAX_PLATFORM=tpu . # TPU-VM image (libtpu)
# TPU containers additionally need --privileged and the /dev/accel*
# devices at run time — see deploy/docker-compose.tpu.yml.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ ffmpeg libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY native/ native/
RUN mkdir -p native/build && \
    g++ -O3 -shared -fPIC native/lapjv.cpp -o native/build/liblapjv.so

ARG JAX_PLATFORM=cpu
RUN if [ "$JAX_PLATFORM" = "tpu" ]; then \
      pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
    else \
      pip install --no-cache-dir "jax[cpu]"; \
    fi && \
    pip install --no-cache-dir flax optax orbax-checkpoint chex \
    einops numpy scipy opencv-python-headless pillow scikit-learn \
    transformers pyyaml joblib httpx pandas

COPY lameness_tpu/ lameness_tpu/
COPY scripts/ scripts/
COPY bench.py __graft_entry__.py ./

ENV LAMENESS_DATA_ROOT=/data
VOLUME /data
EXPOSE 8000

CMD ["python", "-c", "\
from lameness_tpu.serve.app import LamenessApp; \
from lameness_tpu.pipeline.engine import LamenessEngine; \
app = LamenessApp(engine=LamenessEngine(), serve_api=True, api_port=8000); \
print('admin UI at :8000', flush=True); \
import threading; threading.Event().wait()"]
