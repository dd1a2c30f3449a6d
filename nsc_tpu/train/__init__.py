from nsc_tpu.train.train import (  # noqa: F401
    TrainState,
    init_train_state,
    make_train_step,
)
