from parlayann_tpu.search import exact, beam

__all__ = ["exact", "beam"]
