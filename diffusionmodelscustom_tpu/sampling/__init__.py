"""Samplers: fused-scan ancestral, DDIM fast path, continuous-time, EDM
churn, flow-matching ODE, and parallel-in-time Picard (ParaDiGMS)."""

from .ancestral import ancestral_sample, ddim_restart_sample, ddim_sample
from .continuous import p_sample_loop_continuous
from .dpm_solver import dpmpp_2m_sample
from .edm import edm_sample
from .flow import flow_sample
from .picard import picard_sample

__all__ = [
    "ancestral_sample",
    "ddim_restart_sample",
    "ddim_sample",
    "dpmpp_2m_sample",
    "edm_sample",
    "flow_sample",
    "picard_sample",
    "p_sample_loop_continuous",
]
