from ffrnet_tpu.eval.lfw import kfold_verification, pair_cosine
