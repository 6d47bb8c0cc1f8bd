from parlayann_tpu.utils import synthetic

__all__ = ["synthetic"]
