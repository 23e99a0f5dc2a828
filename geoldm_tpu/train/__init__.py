from geoldm_tpu.train import augment as augment
from geoldm_tpu.train import conditioning as conditioning
from geoldm_tpu.train import optim as optim
from geoldm_tpu.train import sampling as sampling
from geoldm_tpu.train import train_step as train_step
from geoldm_tpu.train import trainer as trainer
