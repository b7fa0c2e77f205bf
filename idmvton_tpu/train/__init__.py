from idmvton_tpu.train.train_step import TrainState, make_train_step, make_optimizer
