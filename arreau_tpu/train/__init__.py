from arreau_tpu.train.optim import cosine_warmup_schedule, make_optimizer  # noqa: F401
from arreau_tpu.train.state import TrainState, create_train_state, ema_update  # noqa: F401
