from ffrnet_tpu.data.datasets import (
    CasiaPairs,
    LfwPairs,
    SyntheticPairs,
    find_mask_twin,
    parse_pairs_txt,
)
from ffrnet_tpu.data.pipeline import BatchLoader
