from ffrnet_tpu.ops import nn
from ffrnet_tpu.ops.similarity import cosine_sim, self_similarity
