from geoldm_tpu.diffusion import schedules as schedules
