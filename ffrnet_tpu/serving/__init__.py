from ffrnet_tpu.serving.service import EmbeddingService, ServiceStats

__all__ = ["EmbeddingService", "ServiceStats"]
