from parlayann_tpu.build import vamana, prune, reverse

__all__ = ["vamana", "prune", "reverse"]
