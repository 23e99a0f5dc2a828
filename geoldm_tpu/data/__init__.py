from geoldm_tpu.data import datasets_config as datasets_config
