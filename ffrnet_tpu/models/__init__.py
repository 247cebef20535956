from ffrnet_tpu.models import irse, layers, recnet
