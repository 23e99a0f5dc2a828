from geoldm_tpu.nn import core as core
from geoldm_tpu.nn import dynamics as dynamics
from geoldm_tpu.nn import egnn as egnn
from geoldm_tpu.nn import egnn_legacy as egnn_legacy
