from .loss import EDM2LossConfig, edm2_loss, learning_rate_schedule, top_losses
from .loss_weight import (MultiNoiseState, fit_and_broadcast, fourier_basis,
                          fourier_eval, init_coefs)
from .ema import (ema_update, init_ema, power_function_beta, std_to_exp,
                  exp_to_std, solve_posthoc_coefficients,
                  traditional_ema_beta)
from .optim import forced_weight_norm, make_optimizer
from .train_state import (TrainState, create_train_state, make_train_step,
                          make_replay_train_step, make_scanned_train_step)
from .quantize import quantize_variables, quantized_config
