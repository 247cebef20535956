from ffrnet_tpu.utils.logger import Logger
from ffrnet_tpu.utils.timer import Timer
