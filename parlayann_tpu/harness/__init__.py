from parlayann_tpu.harness import recall, sweep, csv

__all__ = ["recall", "sweep", "csv"]
