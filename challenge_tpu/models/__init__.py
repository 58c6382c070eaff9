"""Model families (flax.linen): VAD CRNN, EfficientNet SED, SE U-Net cascade
(reference: sj_train.py:191-403, trainer.py:222-236)."""

from challenge_tpu.models.registry import (  # noqa: F401
    ModelBundle, get_density_model, get_model,
)
from challenge_tpu.models.vad import VADModel  # noqa: F401
from challenge_tpu.models.effnet import EffNetSED, EfficientNetBackbone  # noqa: F401
from challenge_tpu.models.senet import SECascade, SpeechEnhancementModel  # noqa: F401
