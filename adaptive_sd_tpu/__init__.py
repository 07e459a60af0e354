"""adaptive_sd_tpu — TPU-native adaptive speculative-cascade inference framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``sa2shun/adaptive-speculative-decoding`` (see SURVEY.md): an N-tier quantized
model cascade in which each request is served by the cheapest tier whose
predicted quality suffices, governed by a dynamic-programming optimal-stopping
policy with O(sqrt(T log T)) regret guarantees.

Layering (bottom-up):
  core/      pure-Python contracts, records, exceptions
  policy/    optimal-stopping math (numpy + jit-able jnp twins)
  ops/       Pallas TPU kernels: quantized matmul, paged attention, sampling
  models/    functional Qwen-style transformer + weight loading/quantization
  parallel/  device mesh construction + sharding rules (GSPMD/pjit)
  engine/    paged KV cache, decode step compilation, continuous batching
  predict/   quality predictor (features, MLP, ensemble, training)
  cascade/   the adaptive pipeline orchestrator + cache/cost management
  serve/     HTTP API (aiohttp)
  evalx/     baselines, quality metrics, statistics, lambda sweeps
  config/    YAML + env dataclass config system
  utils/     timing, logging, validation, profiling, task taxonomy
"""

__version__ = "0.1.0"

DEFAULT_COST_RATIOS = (1.0, 2.0, 4.5, 10.0)  # 7B/14B/32B/72B, reference src/theory/optimal_stopping.py:43
LEGACY_COST_RATIOS = (1.0, 1.6, 4.2, 8.8)    # reference src/algorithms/dp_solver.py:205
