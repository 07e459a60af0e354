# Serving image (reference Dockerfile role, CUDA base swapped for TPU-ready
# python + libtpu via the jax[tpu] wheel index).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY adaptive_sd_tpu/ adaptive_sd_tpu/
COPY native/ native/
COPY configs/ configs/
COPY scripts/ scripts/
COPY bench.py run.sh Makefile ./

# TPU hosts: install jax[tpu] from the libtpu releases index instead.
RUN pip install --no-cache-dir -e ".[predictors,models,dev]" \
    && ./native/build.sh

EXPOSE 8000 9090
ENTRYPOINT ["python", "scripts/serve.py"]
CMD ["--mock"]
