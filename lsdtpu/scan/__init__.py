from lsdtpu.scan.featurize import ScanFeatures, featurize

__all__ = ["ScanFeatures", "featurize"]
