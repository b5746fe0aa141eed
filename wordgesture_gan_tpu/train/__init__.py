from .gan_step import gan_train_epoch, gan_train_step, make_epoch_batches
from .schedules import cosine_annealing_lr
from .state import init_gan_state, make_optimizer, param_count
