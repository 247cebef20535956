from ffrnet_tpu.training import losses, optimizers, schedules
from ffrnet_tpu.training.adabound import adabound
