from ffrnet_tpu.checkpoint.pth_io import load_pth, save_pth
from ffrnet_tpu.checkpoint.torch_convert import (
    backbone_from_torch,
    backbone_to_torch,
    recnet_from_torch,
    recnet_to_torch,
)
