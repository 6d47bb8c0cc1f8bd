from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.data.graph import GraphIndexData
from parlayann_tpu.data import io

__all__ = ["PointSet", "GraphIndexData", "io"]
