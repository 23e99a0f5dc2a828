from geoldm_tpu.utils import checkpoint as checkpoint
from geoldm_tpu.utils import logging_utils as logging_utils
