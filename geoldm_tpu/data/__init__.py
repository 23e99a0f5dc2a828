from geoldm_tpu.data import collate as collate
from geoldm_tpu.data import datasets_config as datasets_config
from geoldm_tpu.data import geom as geom
from geoldm_tpu.data import md17 as md17
from geoldm_tpu.data import qm9 as qm9
from geoldm_tpu.data import synthetic as synthetic
