from . import schedules
from .gaussian import (
    LossType,
    MeanType,
    Schedule,
    VarType,
    dynamic_threshold,
    extract,
    make_schedule,
    normal_kl,
    discretized_gaussian_log_likelihood,
    mean_flat,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
)
from .samplers import (
    DDIMTables,
    DPMTables,
    ddim_loop,
    ddim_respaced_loop,
    dpmpp_2m_loop,
    make_ddim_tables,
    make_dpmpp_tables,
    p_sample_loop,
    plms_loop,
)
