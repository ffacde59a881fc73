from mvc_tpu.extract.features import FeatureExtractor
from mvc_tpu.extract.encoders import AudioEncoder, VisualEncoder

__all__ = ["FeatureExtractor", "AudioEncoder", "VisualEncoder"]
