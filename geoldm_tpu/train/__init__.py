from geoldm_tpu.train import optim as optim
from geoldm_tpu.train import train_step as train_step
