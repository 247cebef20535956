from ffrnet_tpu.eval.lfw import kfold_verification, pair_cosine
from ffrnet_tpu.eval.search import Gallery, top_k_identify
