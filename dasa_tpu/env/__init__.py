from dasa_tpu.env.obs import Obs  # noqa: F401
from dasa_tpu.env.r2r_env import R2REnv  # noqa: F401
