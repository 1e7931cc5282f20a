# Reproducible environment for multiyolov5_tpu (reference analog:
# /root/reference/Dockerfile, which is CUDA/torch based).
#
# CPU image by default — runs the full test suite and the 8-virtual-device
# multi-chip dryrun.  For real TPU VMs, swap the jax install line for the
# libtpu wheel as noted below.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential git libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# Pin the stack; bump deliberately.
RUN pip install --no-cache-dir \
    "jax[cpu]>=0.5" flax optax chex einops numpy pyyaml \
    opencv-python-headless pillow pytest tensorboard \
    torch --extra-index-url https://download.pytorch.org/whl/cpu
# On a TPU VM instead:
#   pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . /workspace
RUN make -C native || echo "native build skipped (pure-numpy fallback)"

# Smoke: suite + virtual multi-chip dryrun.
RUN python -m pytest tests/ -q && python __graft_entry__.py 8

ENTRYPOINT ["python", "-m", "multiyolov5_tpu.cli.detect"]
