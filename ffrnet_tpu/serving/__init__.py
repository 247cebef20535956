from ffrnet_tpu.serving.http import EmbeddingHTTPServer
from ffrnet_tpu.serving.service import EmbeddingService, ServiceStats

__all__ = ["EmbeddingHTTPServer", "EmbeddingService", "ServiceStats"]
