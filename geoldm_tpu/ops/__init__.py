from geoldm_tpu.ops import com as com
from geoldm_tpu.ops import distance as distance
