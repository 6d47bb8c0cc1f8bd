from parlayann_tpu.ops.pallas import expand

__all__ = ["expand"]
