from geoldm_tpu.evalsuite import analyze as analyze
from geoldm_tpu.evalsuite import bond_analyze as bond_analyze
from geoldm_tpu.evalsuite import visualizer as visualizer
