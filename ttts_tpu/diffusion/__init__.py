from ttts_tpu.diffusion.gaussian import GaussianDiffusion, SpacedDiffusion, get_named_beta_schedule  # noqa: F401
from ttts_tpu.diffusion.dpm import dpm_solver_pp_2m_sample  # noqa: F401
