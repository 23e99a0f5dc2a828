from geoldm_tpu.models import factory as factory
from geoldm_tpu.models import distributions as distributions
