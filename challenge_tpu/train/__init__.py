"""Training machinery: losses, metrics, optimizers, SWA, callbacks, loop
(reference: sj_train.py:133-188,406-529; utils.py:140-347; swa.py;
trainer.py:144-210)."""

from challenge_tpu.train.losses import (  # noqa: F401
    binary_crossentropy, density_loss, get_loss, mae, se_loss,
    sigmoid_focal_crossentropy,
)
from challenge_tpu.train.metrics import (  # noqa: F401
    batch_metrics, cos_sim, er_score, f1_counts, f1_from_counts,
)
from challenge_tpu.train.optim import (  # noqa: F401
    adaptive_clip_grad, custom_scheduler, make_optimizer, scale_by_adabelief,
    set_learning_rate, unitwise_norm,
)
from challenge_tpu.train.state import (  # noqa: F401
    TrainState, init_state, make_eval_step, make_grad_update,
    make_train_step, swa_update,
)
from challenge_tpu.train.checkpoint import (  # noqa: F401
    checkpoint_steps, load_weights, restore_train_state, save_train_state,
    save_weights,
)
from challenge_tpu.train.callbacks import (  # noqa: F401
    Callback, CSVLogger, EarlyStopping, EvalCallback, LearningRateScheduler,
    ModelCheckpoint, NO_SWA_ERROR, ReduceLROnPlateau, SWA, TensorBoard,
    TerminateOnNaN, TrainStateCheckpoint,
)
from challenge_tpu.train.loop import TrainLoop  # noqa: F401
