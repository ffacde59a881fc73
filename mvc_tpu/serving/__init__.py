"""Online caption serving — continuous batching over the jitted predict path.

The reference's only inference surface is the offline notebook flow
(notebooks/predict_captions.ipynb -> scripts/predict_captions.py, SURVEY.md
§3.5).  This package adds the production-serving layer on top of the same
model contract: requests stream in one clip at a time, the service groups
them into static-shape batches (frame buckets x one fixed batch width, so
the compiled-executable set stays bounded — the TPU rule that shapes must
be static under jit), and answers each request with the caption text.
"""

from mvc_tpu.serving.http import make_http_server
from mvc_tpu.serving.router import CaptionRouter
from mvc_tpu.serving.service import (
    CaptionService,
    DeadlineExceeded,
    ServiceConfig,
    ServiceOverloaded,
)

__all__ = ["CaptionService", "CaptionRouter", "ServiceConfig",
           "ServiceOverloaded", "DeadlineExceeded", "make_http_server"]
