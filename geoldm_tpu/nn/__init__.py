from geoldm_tpu.nn import core as core
from geoldm_tpu.nn import egnn as egnn
