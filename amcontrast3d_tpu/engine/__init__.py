from .train import (TrainState, build_tx, create_train_state, make_eval_step,
                    make_predict_step, make_sharded_eval_step,
                    make_sharded_train_step, make_train_step)

__all__ = [
    "TrainState", "build_tx", "create_train_state", "make_eval_step",
    "make_predict_step",
    "make_sharded_eval_step", "make_sharded_train_step", "make_train_step",
]
