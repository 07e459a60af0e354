from .attention import paged_attention, paged_attention_ref, prefill_attention
from .matmul_q import linear_q, on_tpu, quantized_matmul, quantized_matmul_ref
from .quant import (
    QuantizedTensor,
    dequantize,
    dequantize_int4,
    dequantize_int8,
    dequantize_kv_int8,
    pack_int4,
    quantization_error,
    quantize_int4,
    quantize_int8,
    quantize_kv_int8,
    quantize_params_tree,
    unpack_int4,
)
from .sampling import SampleResult, greedy_sample, logprob_stats, sample

__all__ = [name for name in dir() if not name.startswith("_")]
