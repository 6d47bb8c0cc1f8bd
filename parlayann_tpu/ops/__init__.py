from parlayann_tpu.ops import distance, topk, quantize

__all__ = ["distance", "topk", "quantize"]
