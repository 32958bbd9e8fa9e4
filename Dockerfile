# TPU-host serving image (counterpart of the reference's CUDA Dockerfile).
# Expects to run on a TPU VM where libtpu is provided by the host runtime.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ gimp fonts-dejavu-core libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY manga_image_translator_tpu ./manga_image_translator_tpu
COPY native ./native
COPY bench.py docker_prepare.py ./

RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir . aiohttp websockets

# build the native wire codec
RUN cd native && python setup.py build_ext --inplace

# pre-download model checkpoints (skipped when offline)
RUN python docker_prepare.py || true

EXPOSE 8000
CMD ["python", "-m", "manga_image_translator_tpu.server.main", \
     "--host", "0.0.0.0", "--port", "8000", "--start-instance", "--use-gpu"]
