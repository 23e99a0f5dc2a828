from geoldm_tpu.parallel import sharding as sharding
