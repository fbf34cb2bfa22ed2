from .sde import SDE, VESDE, VPSDE, DDPM, get_standard_sde
from .cg import cg
from .diffusion import eps_pred_from_s, tweedy, ddim
from .time_grids import score_time_grid, ddpm_time_pairs, schedule_jump
