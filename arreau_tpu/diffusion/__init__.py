from arreau_tpu.diffusion.ve import VESchedule, ve_forward_pbc, ve_reverse_step  # noqa: F401
from arreau_tpu.diffusion.vp import VPSchedule, vp_forward, vp_reverse_step, vp_reverse_given_x0  # noqa: F401
from arreau_tpu.diffusion.d3pm import D3PMTables, d3pm_sample_xt, d3pm_loss, d3pm_reverse_step  # noqa: F401
