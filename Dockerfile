# TPU serving/training image (the reference ships a CUDA image,
# reference Dockerfile:1-10; this is the TPU-native equivalent).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgl1 libglib2.0-0 ffmpeg g++ && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

# jax[tpu] pulls libtpu on Cloud TPU VMs
RUN pip install --no-cache-dir "jax[tpu]" -f \
    https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .[io,train] \
    && python -m easy_vitpose_tpu.native.build

ENTRYPOINT ["python", "-m", "easy_vitpose_tpu.cli.infer"]
