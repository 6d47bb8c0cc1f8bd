from parlayann_tpu.parallel import mesh, sharded

__all__ = ["mesh", "sharded"]
