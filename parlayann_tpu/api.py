"""High-level Python API (ParlayANNpy parity — python/module.cpp:132,
python/wrapper.py). Filled in as builders land; see build/ and search/."""

from __future__ import annotations


def build_vamana_index(*args, **kwargs):
    from parlayann_tpu.build import vamana

    return vamana.build_vamana_index(*args, **kwargs)


def build_hcnng_index(*args, **kwargs):
    from parlayann_tpu.build import hcnng

    return hcnng.build_hcnng_index(*args, **kwargs)


def build_pynndescent_index(*args, **kwargs):
    from parlayann_tpu.build import pynndescent

    return pynndescent.build_pynndescent_index(*args, **kwargs)


def build_hnsw_index(*args, **kwargs):
    from parlayann_tpu.build import hnsw

    return hnsw.build_hnsw_index(*args, **kwargs)


def load_index(*args, **kwargs):
    from parlayann_tpu.index import Index

    return Index.load(*args, **kwargs)


class Index:  # re-exported lazily to avoid import cycles
    def __new__(cls, *args, **kwargs):
        from parlayann_tpu.index import Index as _Index

        return _Index(*args, **kwargs)
