from aid_tpu.prior.beta import (
    BetaPriorPipeline,
    find_minimal_spread_and_path,
    fit_alpha_beta,
)
from aid_tpu.prior.bayes import GPOptimizer, bayesian_prior_selection
from aid_tpu.ops.interp import generate_beta_schedule as generate_beta_tensor

__all__ = [
    "BetaPriorPipeline",
    "find_minimal_spread_and_path",
    "fit_alpha_beta",
    "GPOptimizer",
    "bayesian_prior_selection",
    "generate_beta_tensor",
]
