from .schedules import (
    DiffusionSchedule,
    betas_for_alpha_bar,
    ddim_timestep_sequence,
    get_named_beta_schedule,
)
from .gaussian import (
    LossType,
    ModelMeanType,
    ModelVarType,
    PMeanVariance,
    apply_inpainting_injection,
    condition_mean,
    condition_score,
    extract,
    mean_flat,
    noised_ground_truth,
    normal_kl,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    predict_xstart_from_xprev,
    q_mean_variance,
    q_posterior_mean_variance,
    q_sample,
    split_model_output,
    vb_terms_bpd,
)
from .losses import masked_mse, training_losses
