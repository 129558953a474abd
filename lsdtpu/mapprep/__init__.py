from lsdtpu.mapprep.pipeline import prepare_map

__all__ = ["prepare_map"]
