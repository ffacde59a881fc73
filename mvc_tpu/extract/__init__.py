from mvc_tpu.extract.features import FeatureExtractor

__all__ = ["FeatureExtractor"]
