from geoldm_tpu.diffusion import latent as latent
from geoldm_tpu.diffusion import priors as priors
from geoldm_tpu.diffusion import schedules as schedules
from geoldm_tpu.diffusion import vae as vae
from geoldm_tpu.diffusion import vdm as vdm
