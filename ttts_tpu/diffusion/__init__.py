from ttts_tpu.diffusion.gaussian import GaussianDiffusion, SpacedDiffusion, get_named_beta_schedule  # noqa: F401
from ttts_tpu.diffusion.dpm import dpm_solver_pp_2m_sample  # noqa: F401
from ttts_tpu.diffusion.unipc import uni_pc_sample  # noqa: F401


def get_ode_sampler(name: str):
    """Continuous-time ODE sampler registry (DiffusionProcessConfig.sampler).

    Mirrors the reference's sample_method switch
    (ttts/diffusion/diffusion_util.py:516-597: 'dpmsolver' | 'unipc'); both
    take (eps_fn, noise, steps=...) and integrate the same linear VP schedule.
    """
    if name in ("dpm++2m", "dpmsolver"):
        return dpm_solver_pp_2m_sample
    if name in ("unipc", "unipc_bh2"):
        return uni_pc_sample
    if name == "unipc_bh1":
        import functools

        return functools.partial(uni_pc_sample, variant="bh1")
    raise NotImplementedError(f"unknown ODE sampler {name!r}")
