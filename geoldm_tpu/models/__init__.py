from geoldm_tpu.models import classifier as classifier
from geoldm_tpu.models import distributions as distributions
from geoldm_tpu.models import factory as factory
