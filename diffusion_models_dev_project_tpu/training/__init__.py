from .losses import score_matching_loss, epsilon_matching_loss
from .ema import EmaState, ema_init, ema_update
from .trainer import TrainState, make_train_step, train_score_model
