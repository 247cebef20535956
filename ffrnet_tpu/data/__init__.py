from ffrnet_tpu.data.datasets import (
    CasiaPairs,
    LfwPairs,
    MaskVerificationPairs,
    SyntheticPairs,
    find_mask_twin,
    gen_occlusion_mask,
    parse_pairs_txt,
)
from ffrnet_tpu.data.pipeline import BatchLoader
